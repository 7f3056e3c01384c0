#!/bin/bash
# Round-2 pending TPU measurements (run when the axon tunnel is back).
# Appends one JSON line per arm to $OUT. Each arm bounded by `timeout`
# (remote compiles are 1-10 min cold; generous bounds).
#
# Usage: bash tools_round2_measure.sh [outfile]
set -u
# pipefail so `cmd | tail -1` inside $() reports the BENCHMARK's exit
# status (timeout 124 / bench 1), not tail's unconditional 0
set -o pipefail
OUT="${1:-/root/repo/MEASURE_r2.jsonl}"
cd /root/repo

run() {
  local label="$1"; shift
  echo "=== $label ==="
  local t0=$(date +%s)
  local out
  out=$("$@" 2>&1 | tail -1)
  local rc=$?   # with pipefail: the benchmark's exit, not tail's
  local dt=$(( $(date +%s) - t0 ))
  echo "{\"arm\": \"$label\", \"rc\": $rc, \"wall_s\": $dt, \"line\": $(python3 -c "import json,sys; print(json.dumps(sys.argv[1]))" "$out")}" >> "$OUT"
  echo "$out"
}

# 1. headline serving protocol (bench defaults, after the bench fixes)
run serving_B8_32k_block256 timeout 3600 python bench.py

# 2. quality-safe granularity + pair fetch (round-notes item 5 experiment)
run serving_B8_32k_block128 env BENCH_PQ_BLOCK=128 BENCH_FETCH_PAR=4 \
    timeout 3600 python bench.py
run serving_B8_32k_block128_pair env BENCH_PQ_BLOCK=128 BENCH_FETCH_PAR=16 \
    BENCH_FETCH_PAIR=1 timeout 3600 python bench.py

# 3. single-stream arms (bench.py fixes changed none of these protocols)
run single_32k env BENCH_BATCH=1 timeout 3600 python bench.py
run single_65k env BENCH_BATCH=1 BENCH_CTX=65536 timeout 3600 python bench.py

# 4. 128k HBM-resident arm unlocked by chunked prefill (state ~9.5 GB
#    incl. the dense baseline; bench chunks automatically past 96k)
run single_128k_chunked env BENCH_BATCH=1 BENCH_CTX=131072 \
    timeout 5400 python bench.py

# 5. offload tier at 192k with chunked prefill (previously OOMed)
run offload_192k_chunked env CTX=196608 LAYERS=8 GEN=16 \
    PREFILL_CHUNK=32768 SKIP_HBM=1 \
    timeout 5400 python -m pqcache_tpu.harness.offload_bench

# 5b. 256k — the chunked-prefill headline target (2× the dense arm's OOM
#     point; only the per-layer chunk transients + one layer's KV live)
run offload_256k_chunked env CTX=262144 LAYERS=8 GEN=16 \
    PREFILL_CHUNK=32768 SKIP_HBM=1 \
    timeout 7200 python -m pqcache_tpu.harness.offload_bench

# 6. serving-latency percentiles under load (new harness; B=8 pool)
run serving_latency_32k_pool8 timeout 5400 python -m \
    pqcache_tpu.harness.serving --ctx 32768 --pool 8 --requests 12 \
    --gen 32 --chunk 16 --policies pq_search

# 7. prefix caching under load: 24k shared system prompt, 8k suffixes —
#    TTFT should drop to roughly the suffix slab + queue wait
run serving_latency_32k_prefix24k timeout 5400 python -m \
    pqcache_tpu.harness.serving --ctx 32768 --pool 8 --requests 12 \
    --gen 32 --chunk 16 --prefix-len 24576 --policies pq_search

# 8. in-program decode decomposition (global-timer parity: ONE traced run
#    joins the device trace against HLO op_name scopes — harness/trace.py)
run trace_decomp_32k_block256 env CTX=32768 LAYERS=8 STEPS=16 BLOCK=256 \
    timeout 3600 python -m pqcache_tpu.harness.trace pq_search
run trace_decomp_32k_block1 env CTX=32768 LAYERS=8 STEPS=16 BLOCK=1 \
    timeout 3600 python -m pqcache_tpu.harness.trace pq_search

# 9. prefill device trace (round-3 item 6: MLP 46% MFU — per-op times
#    with bytes_accessed; report via tools_trace_report.py afterwards)
run trace_prefill_32k env TRACE_PREFILL=1 CTX=32768 LAYERS=8 \
    TRACE_DIR=/root/repo/trace_prefill_32k \
    timeout 3600 python tools_profile_trace.py

echo "done -> $OUT"
