#!/bin/bash
# Round-5 checkpoint auto-committer. The round-5 environment restart
# destroyed every uncommitted safety checkpoint of the 512^3 quality
# phase (steps 3500-5500 lost; only the committed phase_003300.npz
# survived). This loop commits new quality-run checkpoints + logs
# every 10 minutes so a restart can never cost more than 10 minutes
# of run again.
cd /root/repo
while true; do
  sleep 600
  # keep only the newest safety checkpoint staged to bound repo bloat:
  # drop older phase_*.npz from the index if a newer one exists on disk
  latest=$(ls -t quality_runs/r4_800/phase_*.npz 2>/dev/null | head -1)
  if [ -n "$latest" ]; then
    git add "$latest" quality_runs/r4_800/*.log \
      measurements/r5 .jax_cache 2>/dev/null
    if ! git diff --cached --quiet 2>/dev/null; then
      git commit -q -m "Auto-commit: quality-run checkpoint + logs ($(basename "$latest"))" \
        || true
    fi
  fi
done
