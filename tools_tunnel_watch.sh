#!/bin/bash
# Watch for the axon tunnel to come back, then run the pending round-2
# TPU measurement matrix (tools_round2_measure.sh). Probe must run with
# the axon PYTHONPATH (default env) and a hard timeout: when the tunnel
# is down-but-hanging, `import jax` blocks forever (ROUND_NOTES.md).
set -u
cd /root/repo
LOG=/root/repo/tunnel_watch.log
echo "watch started $(date -u +%FT%TZ)" >> "$LOG"
for i in $(seq 1 200); do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; then
    echo "tunnel UP at $(date -u +%FT%TZ) (probe $i)" >> "$LOG"
    bash tools_round2_measure.sh /root/repo/MEASURE_r2.jsonl >> "$LOG" 2>&1
    echo "measurements done $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "probe $i down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 300
done
echo "gave up after 200 probes $(date -u +%FT%TZ)" >> "$LOG"
exit 1
