#!/bin/bash
# Round-4 retry arms: the three batched-offload measurements that died on
# tunnel broken-pipe during the ~20-min remote compile of _decode_first_b
# (it captured the 1 GB embed table as an HLO constant — fixed: operand),
# plus B=20/24 bench probes past the B=16 headline now that the jhist
# layout churn is gone. Arms SERIALIZED (one chip, ROUND_NOTES).
# Usage: bash tools_round4_retry.sh [out.jsonl]
set -u
OUT=${1:-MEASURE_r4.jsonl}
LOG=${OUT%.jsonl}.log
run() {
  # up to 2 attempts: a tunnel broken-pipe kills the process, but every
  # compiled program is in the persistent jit cache, so attempt 2 resumes
  # from where the compile died instead of starting over.
  local name="$1"; shift
  local rc=1 dt=0 js="" t0 tmp attempt
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt): $* ===" | tee -a "$LOG"
    t0=$(date +%s)
    tmp=$(mktemp)
    "$@" > "$tmp" 2>&1
    rc=$?
    dt=$(( dt + $(date +%s) - t0 ))
    cat "$tmp" >> "$LOG"
    js=$(grep -E '^\{' "$tmp" | tail -1)
    rm -f "$tmp"
    [ "$rc" = 0 ] && break
    sleep 30
  done
  python -c '
import json, sys
out, name, rc, dt, line = sys.argv[1:6]
row = {"arm": name, "rc": int(rc), "wall_s": int(dt)}
try:
    row["result"] = json.loads(line)
except Exception:
    row["result"] = line[-400:]
with open(out, "a") as f:
    f.write(json.dumps(row) + "\n")
print(f"[{name}] rc={rc} {dt}s", flush=True)
' "$OUT" "$name" "$rc" "$dt" "$js"
}

run offload_batch_B4_65k_fix timeout 5400 env CTX=65536 LAYERS=8 GEN=12 BATCH=4 \
    CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench
run offload_batch_B2_128k_fix timeout 5400 env CTX=131072 LAYERS=8 GEN=12 BATCH=2 \
    CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench
run offload_serve_B2_65k_fix timeout 5400 env CTX=65536 LAYERS=8 GEN=12 BATCH=2 \
    REQUESTS=6 CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
    KV_INT8=1 python -m pqcache_tpu.harness.offload_bench

# past-16 probes on the HBM serving engine (jhist layout fix headroom)
run bench_B20_32k timeout 5400 env BENCH_BATCH=20 BENCH_SKIP_BASE=1 python bench.py
run bench_B24_32k timeout 5400 env BENCH_BATCH=24 BENCH_SKIP_BASE=1 python bench.py

echo "done -> $OUT"
