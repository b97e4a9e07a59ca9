#!/bin/bash
# Round-5 step 1 (VERDICT task 2): resume the 800^2 reference-regime
# quality run from the latest phase_*.npz in quality_runs/r4_800 and
# finish the 512^3 phase. Restart-on-death (up to 3 attempts) — the
# round-4 run died mid-phase with no supervisor alive to restart it.
# All output stays in the repo (VERDICT task 9), not /tmp.
#
# Original run env (round 4 launch): IMG=800 VIEWS=16 RESO=512
# STEPS=6000 UPSAMPLE_AT=0.25,0.55 TILES=320 FLAT=1 DENSE_OPTIM=0
# DECAY=12000 EVAL_EVERY=1000. Resume from a phase checkpoint is
# EXACTLY equivalent (rms state rebuilds at each upsample boundary).
# CKPT_EVERY=500 bounds any further loss to 500 steps.
set -x
cd /root/repo
DIR=/root/repo/quality_runs/r4_800
mkdir -p "$DIR"
# persistent compile cache: restart attempts (and the measurement
# queue after) skip the minutes-long 512^3 remote recompiles
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

for attempt in 1 2 3; do
  echo "=== resume attempt $attempt at $(date) ===" >> "$DIR/resume_r5.log"
  env QUALITY_IMG=800 QUALITY_VIEWS=16 QUALITY_PLENOXEL_RESO=512 \
    QUALITY_PLENOXEL_STEPS=6000 QUALITY_UPSAMPLE_AT=0.25,0.55 \
    QUALITY_TILES=320 QUALITY_FLAT=1 QUALITY_DENSE_OPTIM=0 \
    QUALITY_DECAY_STEPS=12000 QUALITY_EVAL_EVERY=1000 \
    QUALITY_CKPT_EVERY=500 \
    QUALITY_SAVE="$DIR" QUALITY_RESUME=1 \
    timeout "${QUALITY_TIMEOUT:-9600}" \
    python -u scripts/quality_all_families.py plenoxels \
    >> "$DIR/resume_r5.log" 2>&1
  rc=$?
  echo "attempt $attempt rc=$rc at $(date)" >> "$DIR/resume_r5.log"
  # the run's last act is the exact-path eval; train_minutes marks the
  # main held-out summary — either means the 512^3 phase finished
  if grep -q '"train_minutes"' "$DIR/resume_r5.log"; then break; fi
  sleep 15
done
echo "SUPERVISOR_DONE rc=$rc $(date)" >> "$DIR/resume_r5.log"
