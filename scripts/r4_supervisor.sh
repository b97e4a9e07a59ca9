#!/bin/bash
# Round-4 serialized work chain (1-core box, single TPU):
#   [wait for the running 800^2 quality run] -> measurement queue
#   -> full CPU test suite. Detach with setsid so a session death
#   does not kill the chain.
set -x
cd /root/repo

QPID=$(cat /tmp/quality.pid.real 2>/dev/null)
if [ -n "$QPID" ]; then
  while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
fi
echo "quality run finished at $(date)" >> /tmp/r4_chain.log
tail -6 /tmp/quality_800_v2.log >> /tmp/r4_chain.log

bash scripts/queue_r4_measure.sh >> /tmp/r4_chain.log 2>&1

echo "queue finished at $(date)" >> /tmp/r4_chain.log

JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3600 python -m pytest tests/ -q -x \
  > /tmp/r4_pytest.log 2>&1
echo "pytest rc=$? at $(date)" >> /tmp/r4_chain.log
tail -3 /tmp/r4_pytest.log >> /tmp/r4_chain.log
echo CHAIN_DONE >> /tmp/r4_chain.log
