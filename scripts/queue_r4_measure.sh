#!/bin/bash
# Round-4 post-quality measurement queue (serialized TPU use).
set -x
cd /root/repo

# 1. dense_optim A/B + fused-kernel re-measure (256^3 shell)
BISECT_ONLY=touched_shell_flat_kexact,touched_shell_flat_dopt,touched_shell_flat_dopt_pv,flat_kernels \
  timeout 2400 python -u scripts/bisect_plenoxels_step.py \
  > /tmp/r4_bisect_dopt.log 2>&1

# 2. shell-train bench solo (ship config: flat + dense_optim)
BENCH_WORKLOADS=plenoxels_train_shell timeout 1800 python -u bench.py \
  > /tmp/r4_bench_shell.log 2>&1

# 3. sparse-512 bench solo (async chain + dense_optim)
BENCH_WORKLOADS=plenoxels_train_sparse512 timeout 2400 python -u bench.py \
  > /tmp/r4_bench_512.log 2>&1

# 4. FPS probe with the fused x-stage: the fusion shrank the march
# body, so the body-bound r1024 tiling may now lead — measure both
PROBE_SIGMA=1000 PROBE_ONLY=r512,r512_cap20,r1024,r1024_cap28 \
  timeout 2400 python -u scripts/probe_frame_fps.py \
  > /tmp/r4_probe_fps.log 2>&1

echo QUEUE_DONE
