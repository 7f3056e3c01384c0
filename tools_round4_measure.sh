#!/bin/bash
# Round-4 TPU measurement matrix — arms run SERIALIZED (one chip; a second
# TPU process gets UNAVAILABLE/RESOURCE_EXHAUSTED, ROUND_NOTES).
# Usage: bash tools_round4_measure.sh [out.jsonl]
set -u
OUT=${1:-MEASURE_r4.jsonl}
LOG=${OUT%.jsonl}.log
run() {
  local name="$1"; shift
  echo "=== $name: $* ===" | tee -a "$LOG"
  local t0=$(date +%s)
  local tmp=$(mktemp)
  "$@" > "$tmp" 2>&1
  local rc=$?
  local dt=$(( $(date +%s) - t0 ))
  cat "$tmp" >> "$LOG"
  # the harness prints one JSON line; take THIS arm's last json line only.
  # NOTE: pass the line as ARGV, not stdin — `python - <<EOF` reads the
  # script from stdin, so an `echo | python - <<EOF` pipe is silently
  # discarded (the round-4 ledger's empty "result" fields).
  local js=$(grep -E '^\{' "$tmp" | tail -1)
  rm -f "$tmp"
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

# 1. headline bench arms (int8 default); B=12/16 re-measure the jhist fix
run bench_B8_32k  env BENCH_BATCH=8  python bench.py
run bench_B12_32k env BENCH_BATCH=12 BENCH_SKIP_BASE=1 python bench.py
run bench_B16_32k env BENCH_BATCH=16 BENCH_SKIP_BASE=1 python bench.py
run bench_B8_65k  env BENCH_BATCH=8 BENCH_CTX=65536 BENCH_SKIP_BASE=1 python bench.py

# 2. serving tail latency: interleaved admission (pool=8, 12-req burst —
#    the VERDICT gate: tbt_p95 <= 3x tbt_p50, TTFT p50 no worse)
run serving_pool8_burst python -m pqcache_tpu.harness.serving \
    --ctx 32768 --pool 8 --requests 12 --gen 64 --kv-dtype int8 \
    --policies pq_search
# pool=16 int8 (VERDICT item 5: the OOM arm — must produce a row)
run serving_pool16_int8 python -m pqcache_tpu.harness.serving \
    --ctx 32768 --pool 16 --requests 20 --gen 64 --kv-dtype int8 \
    --policies pq_search

# 3. offload tier: int8 halves host bytes (192k bf16 vs int8), 256k int8
run offload_192k_bf16 env CTX=196608 LAYERS=8 GEN=12 CACHE_TOKENS=24576 \
    BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
    python -m pqcache_tpu.harness.offload_bench
run offload_192k_int8 env CTX=196608 LAYERS=8 GEN=12 CACHE_TOKENS=24576 \
    BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench
run offload_256k_int8 env CTX=262144 LAYERS=8 GEN=8 CACHE_TOKENS=24576 \
    BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench

# 4. batched offload serving (VERDICT item 7: one TPU row)
run offload_batch_B2_128k env CTX=131072 LAYERS=8 GEN=12 BATCH=2 \
    CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench
run offload_batch_B4_65k env CTX=65536 LAYERS=8 GEN=12 BATCH=4 \
    CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 KV_INT8=1 \
    python -m pqcache_tpu.harness.offload_bench

# 5. single-stream reference protocol arms
run single_32k env BENCH_BATCH=1 python bench.py
run single_128k env BENCH_BATCH=1 BENCH_CTX=131072 BENCH_SKIP_BASE=1 \
    python bench.py

# 6. int8 long-generation quality (trained copy model, gen 128)
run synthq_int8_gen128 python -m pqcache_tpu.harness.synth_quality \
    --n 160 --steps 400 --eval-n 8 --gen 128 --kv-dtype int8 \
    --policies original pq_search

echo "done -> $OUT"
