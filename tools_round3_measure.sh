#!/bin/bash
# Round-3 TPU measurement matrix (single v5e via the axon tunnel).
# Appends one JSON line per arm to $OUT. Arms run STRICTLY SERIALLY —
# two processes on the one chip evict each other (measured UNAVAILABLE /
# RESOURCE_EXHAUSTED when overlapped).
set -u
set -o pipefail
OUT="${1:-/root/repo/MEASURE_r3.jsonl}"
cd /root/repo

run() {
  local label="$1"; shift
  echo "=== $label ==="
  local t0=$(date +%s)
  local out
  out=$("$@" 2>&1 | tail -1)
  local rc=$?
  local dt=$(( $(date +%s) - t0 ))
  echo "{\"arm\": \"$label\", \"rc\": $rc, \"wall_s\": $dt, \"line\": $(python3 -c "import json,sys; print(json.dumps(sys.argv[1]))" "$out")}" >> "$OUT"
  echo "$out"
}

# 1. headline (B=8 @ 32k, block=256, bf16) — post-int8-refactor re-measure
run serving_B8_32k_bf16 timeout 3600 python bench.py

# 2. int8 tail at the same operating point (state 8.6 → 4.6 GiB)
run serving_B8_32k_int8 env BENCH_KV_INT8=1 timeout 3600 python bench.py

# 3. B=16 int8 — the pool the bf16 state cannot hold; dense at B=16 needs
#    ~17 GiB KV and OOMs outright, so pq runs alone (vs_baseline null)
run serving_B16_32k_int8 env BENCH_BATCH=16 BENCH_KV_INT8=1 \
    BENCH_SKIP_BASE=1 timeout 3600 python bench.py

# 4. B=8 @ 65k int8 — 8 concurrent 64k streams on ONE chip (bf16 pq state
#    alone is ~16 GiB; dense needs ~34 GiB)
run serving_B8_65k_int8 env BENCH_CTX=65536 BENCH_KV_INT8=1 \
    BENCH_SKIP_BASE=1 timeout 5400 python bench.py

# 5. single-stream int8 vs the round-2 bf16 numbers (1.088/1.147/1.281)
run single_32k_int8 env BENCH_BATCH=1 BENCH_KV_INT8=1 timeout 3600 python bench.py
run single_128k_int8 env BENCH_BATCH=1 BENCH_CTX=131072 BENCH_KV_INT8=1 \
    timeout 5400 python bench.py

# 6. serving-latency percentiles, pool=8 (round-2 arm OOMed in bf16) and
#    pool=16 — int8 tail
run serving_latency_32k_pool8_int8 timeout 5400 python -m \
    pqcache_tpu.harness.serving --ctx 32768 --pool 8 --requests 12 \
    --gen 32 --chunk 16 --policies pq_search --kv-dtype int8
run serving_latency_32k_pool16_int8 timeout 5400 python -m \
    pqcache_tpu.harness.serving --ctx 32768 --pool 16 --requests 24 \
    --gen 32 --chunk 16 --policies pq_search --kv-dtype int8

# 7. prefix caching under load at pool=8 int8 (round-2 arm OOMed)
run serving_latency_32k_prefix24k_int8 timeout 5400 python -m \
    pqcache_tpu.harness.serving --ctx 32768 --pool 8 --requests 12 \
    --gen 32 --chunk 16 --prefix-len 24576 --policies pq_search \
    --kv-dtype int8

# 8. offload tier at 192k with the cache sized to the working set
#    (round-2 arm ran CACHE_TOKENS=8192 against a ~20k/step working set
#    → 4.4% hit rate; topk at 196k ≈ 19.6k tokens)
run offload_192k_cache24k env CTX=196608 LAYERS=8 GEN=16 \
    PREFILL_CHUNK=32768 SKIP_HBM=1 CACHE_TOKENS=24576 \
    timeout 5400 python -m pqcache_tpu.harness.offload_bench

echo "done -> $OUT"
