#!/bin/bash
# Round-5 serialized TPU measurement queue. Waits for the 800^2 quality
# resume (r5_supervisor.sh) to finish, then measures in value order.
# ALL output lands in measurements/r5/ (committed — VERDICT r4 task 9:
# round-4's equivalents went to /tmp and were lost).
#
# Ordered so that a kill at ANY point still leaves the most valuable
# record behind: the full two-pass bench comes FIRST (complete
# BENCH-row coverage + warms .jax_cache for the driver's end-of-round
# run), then the FPS remeasure, shell bisect, and sparse512 A/B
# contrast.
set -x
cd /root/repo
mkdir -p measurements/r5

# serialize behind the quality supervisor: ONE axon client at a time
# (NOTES_ROUND4 r4e)
while [ -z "$(grep -l SUPERVISOR_DONE quality_runs/r4_800/resume_r5.log 2>/dev/null)" ]; do
  sleep 60
done
echo "quality run done at $(date)" > measurements/r5/queue.log

# 1. full two-pass bench: complete BENCH-row coverage (VERDICT r4
#    tasks 1, 3, 8) AND warms .jax_cache for the driver's run.
#    BENCH_512_DOPT=2 default exercises the defer-split optimizer
#    (task 4).
timeout 1700 python -u bench.py \
  > measurements/r5/bench_full_r5.log 2>&1
echo "full bench rc=$? $(date)" >> measurements/r5/queue.log
cp -f measurements/bench_out.jsonl measurements/r5/bench_out_full.jsonl \
  2>/dev/null

# 2. FPS post-x-stage-fusion remeasure (VERDICT r4 task 6): r512 vs
#    r1024 tiles, cap fast modes
PROBE_SIGMA=1000 \
  PROBE_ONLY=r512,r512_cap20,r1024,r1024_cap28,r1024_gather,r1024_floor \
  timeout 1500 python -u scripts/probe_frame_fps.py \
  > measurements/r5/fps_postfusion.log 2>&1
echo "fps probe rc=$? $(date)" >> measurements/r5/queue.log

# 3. shipped shell-step bisect (VERDICT r4 task 7): where does the
#    256^3 flat+dense_optim step's time go now
BISECT_ONLY=touched_shell_flat_dopt_pv,touched_shell_flat_kexact,flat_kernels,flat_tail_compact,flat_tail_segsum,flat_tail_optim \
  timeout 1200 python -u scripts/bisect_plenoxels_step.py \
  > measurements/r5/shell_bisect.log 2>&1
echo "shell bisect rc=$? $(date)" >> measurements/r5/queue.log

# 4. sparse512 K-row contrast run (the defer number comes from step 1;
#    this records the A/B baseline against it — VERDICT r4 tasks 4+5)
BENCH_WORKLOADS=plenoxels_train_sparse512 BENCH_512_DOPT=0 \
  timeout 1200 python -u bench.py \
  > measurements/r5/sparse512_krow.log 2>&1
echo "sparse512 krow rc=$? $(date)" >> measurements/r5/queue.log

# 5. compile-only bisect: where exactly the 512^3 remote-compile
#    limit sits (fused vs defer halves vs scan-wrapped composites)
timeout 1200 python -u scripts/repro_dopt512.py \
  > measurements/r5/repro_dopt512.log 2>&1
echo "repro_dopt512 rc=$? $(date)" >> measurements/r5/queue.log

echo QUEUE_DONE >> measurements/r5/queue.log
