#!/bin/bash
# Round-5 TPU measurement matrix — arms run SERIALIZED (one chip; a second
# TPU process gets UNAVAILABLE/RESOURCE_EXHAUSTED, ROUND_NOTES).
# Usage: bash tools_round5_measure.sh <set> [out.jsonl]
#   set = stale | locality | serving | bench | deep
set -u
SET=${1:?set}
OUT=${2:-MEASURE_r5.jsonl}
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

case "$SET" in
stale)
  # A/B: one-step-stale selection vs exact per-layer sync chain at 192k,
  # and a CACHE-SIZE sweep: the per-step block selection at 192k touches
  # ~600 unique 256-token blocks (77/head × 8 heads) — the r4 cache held
  # 96, so hit ≈ cache fraction was structural, not an LFU failure. int8
  # leaves (1 MB/block vs 2) fund selection-working-set-sized caches.
  run offload_192k_int8_exact env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 python -m pqcache_tpu.harness.offload_bench
  run offload_192k_int8_stale env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=24576 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  run offload_192k_int8_stale_c384 env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=98304 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  run offload_192k_int8_stale_c640 env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=163840 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  run offload_192k_int8_exact_c384 env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=98304 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 python -m pqcache_tpu.harness.offload_bench
  run offload_batch_B4_65k_stale env CTX=65536 LAYERS=8 GEN=24 BATCH=4 \
      CACHE_TOKENS=98304 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  ;;
serving)
  # Operating curve: offered load (stagger) sweep at pool 8/16 — where is
  # the knee where ttft_p95 departs from service time? Plus the admission
  # disciplines under mixed prompt lengths (spf vs fifo).
  for S in 0 0.5 1 2; do
    run serving_pool16_s${S} python -m pqcache_tpu.harness.serving \
        --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
        --stagger $S --policies pq_search
  done
  run serving_pool8_s0 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 8 --requests 24 --gen 64 --kv-dtype int8 \
      --stagger 0 --policies pq_search
  run serving_pool8_s1 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 8 --requests 24 --gen 64 --kv-dtype int8 \
      --stagger 1 --policies pq_search
  run serving_mixed_fifo python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 8 --requests 24 --gen 64 --kv-dtype int8 \
      --stagger 0.5 --mixed-prompts --policies pq_search
  run serving_mixed_spf python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 8 --requests 24 --gen 64 --kv-dtype int8 \
      --stagger 0.5 --mixed-prompts --admission spf --policies pq_search
  ;;
redo)
  # clean re-runs of arms that ran concurrently with another TPU process
  run offload_192k_int8_stale_c384r env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=98304 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  run offload_192k_int8_exact_c640 env CTX=196608 LAYERS=8 GEN=48 \
      CACHE_TOKENS=163840 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 python -m pqcache_tpu.harness.offload_bench
  ;;
bench)
  # headline arms with weight-only int8 (BENCH_W_INT8) + the full-depth
  # 32L shape that int8 weights make fit (bf16 params alone are 16.05 GB)
  run bench_B8_w8 env BENCH_BATCH=8 BENCH_W_INT8=1 python bench.py
  run bench_B16 env BENCH_BATCH=16 BENCH_SKIP_BASE=1 python bench.py
  run bench_B16_w8 env BENCH_BATCH=16 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      python bench.py
  run bench_B20_w8 env BENCH_BATCH=20 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      python bench.py
  run bench_32L_B2_16k_w8 env BENCH_LAYERS=32 BENCH_BATCH=2 \
      BENCH_CTX=16384 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 python bench.py
  run bench_32L_B4_16k_w8 env BENCH_LAYERS=32 BENCH_BATCH=4 \
      BENCH_CTX=16384 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 python bench.py
  run serving_pool16_s2_retry python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
      --stagger 2 --policies pq_search
  ;;
bench2|bench3|final|final2|final3|final4|final5|final6|final7|final8)
  ;;     # handled below
*)
  echo "unknown set $SET" >&2; exit 2;;
esac
# appended sets run via: bash tools_round5_measure.sh <set>
if [ "$SET" = bench2 ]; then
  run bench_32L_B2_8k_w8 env BENCH_LAYERS=32 BENCH_BATCH=2 \
      BENCH_CTX=8192 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      BENCH_MLP_CHUNK=8192 python bench.py
  run bench_32L_B1_16k_w8 env BENCH_LAYERS=32 BENCH_BATCH=1 \
      BENCH_CTX=16384 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      BENCH_PREFILL_CHUNK=8192 BENCH_MLP_CHUNK=8192 python bench.py
  run bench_B16_w8_fp32par env BENCH_BATCH=16 BENCH_W_INT8=1 \
      BENCH_SKIP_BASE=1 BENCH_FETCH_PAR=32 python bench.py
  run bench_B16_w8_fp8 env BENCH_BATCH=16 BENCH_W_INT8=1 \
      BENCH_SKIP_BASE=1 BENCH_FETCH_PAR=8 python bench.py
  run bench_B24_w8 env BENCH_BATCH=24 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      python bench.py
fi
if [ "$SET" = bench3 ]; then
  run bench_32L_B2_8k_w8r env BENCH_LAYERS=32 BENCH_BATCH=2 \
      BENCH_CTX=8192 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      BENCH_MLP_CHUNK=8192 python bench.py
  run bench_32L_B2_16k_w8r env BENCH_LAYERS=32 BENCH_BATCH=2 \
      BENCH_CTX=16384 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      BENCH_PREFILL_CHUNK=8192 BENCH_MLP_CHUNK=8192 python bench.py
fi
if [ "$SET" = final ]; then
  # steady-state offload (hundreds of decode steps; LFU past cold start)
  run offload_192k_stale_c640_gen200 env CTX=196608 LAYERS=8 GEN=200 \
      CACHE_TOKENS=163840 BLOCK=256 PREFILL_CHUNK=32768 SKIP_HBM=1 \
      KV_INT8=1 STALE=1 python -m pqcache_tpu.harness.offload_bench
  # serving with weight-int8: pool 16 + the pool headroom it frees
  run serving_pool16_w8 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  run serving_pool24_w8 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 24 --requests 32 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  # headline defaults re-run (the driver's end-of-round command)
  run bench_headline python bench.py
fi
if [ "$SET" = final2 ]; then
  run serving_pool16_w8r python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  run serving_pool24_w8r python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 24 --requests 32 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  run bench_headline_w8 python bench.py
  run bench_B8_w8_fp32 env BENCH_FETCH_PAR=32 BENCH_SKIP_BASE=1 \
      python bench.py
fi
if [ "$SET" = final3 ]; then
  # post-fix serving W8 arms (pool24 RESOURCE_EXHAUSTED: bstate scales
  # ~0.55 GiB/slot; pool 20 matches the bench-measured B=20 W8 ceiling)
  run serving_pool16_w8 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  run serving_pool20_w8 python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 20 --requests 28 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --policies pq_search
  # peak single-chip number: B=20 W8 at the saturating fetch_par
  run bench_B20_w8_fp32 env BENCH_BATCH=20 BENCH_SKIP_BASE=1 \
      python bench.py
  # the driver's end-of-round command, post baseline-bf16 fix
  run bench_headline_final python bench.py
fi
if [ "$SET" = final4 ]; then
  # the reference's own regime: ONE stream. Single-stream decode is
  # weight-bandwidth-bound — W8 is the arm that moves it.
  run bench_B1_32k_w8 env BENCH_BATCH=1 python bench.py
  run bench_B1_128k_w8 env BENCH_BATCH=1 BENCH_CTX=131072 \
      BENCH_SKIP_BASE=1 python bench.py
  # TTFT/TT2T/per-token protocol (test_latency.py:74-141) with W8+int8
  run latency_w8 python -m pqcache_tpu.harness.latency \
      --ctx 4096 16384 32768 --select-block 256 \
      --kv-dtype int8 --weight-int8
fi
if [ "$SET" = final5 ]; then
  # W8 freed enough HBM that interleave=auto picks the interleaved path
  # at pool 16 (tbt p50 28 ms: admission slabs ride the decode chunks);
  # the monolithic arm is the throughput-mode twin of the r4/r5 pool16
  # rows (tbt ~14 ms)
  run serving_pool16_w8_mono python -m pqcache_tpu.harness.serving \
      --ctx 32768 --pool 16 --requests 24 --gen 64 --kv-dtype int8 \
      --weight-int8 --stagger 1 --interleave off --policies pq_search
fi
if [ "$SET" = final6 ]; then
  # full-depth SINGLE-STREAM (the reference's exact regime at real depth);
  # the earlier rc=1 predated host-side init+quantize (it materialized
  # 16.05 GB bf16 params on device before quantizing)
  run bench_32L_B1_16k_w8r env BENCH_LAYERS=32 BENCH_BATCH=1 \
      BENCH_CTX=16384 BENCH_W_INT8=1 BENCH_SKIP_BASE=1 \
      BENCH_PREFILL_CHUNK=8192 BENCH_MLP_CHUNK=8192 python bench.py
fi
if [ "$SET" = final7 ]; then
  # ring-128 decode chunks at the larger pools (the B=8 knee measured
  # 1172/1251/1288/1239 for ring 32/64/128/256)
  run bench_B16_w8_r128 env BENCH_BATCH=16 BENCH_SKIP_BASE=1 \
      python bench.py
  run bench_B20_w8_r128 env BENCH_BATCH=20 BENCH_SKIP_BASE=1 \
      python bench.py
  run bench_headline_r128 python bench.py
fi
if [ "$SET" = final8 ]; then
  run bench_B16_w8_r64 env BENCH_BATCH=16 BENCH_RING=64 BENCH_GEN=64 \
      BENCH_SKIP_BASE=1 python bench.py
  run bench_B20_w8_r64 env BENCH_BATCH=20 BENCH_RING=64 BENCH_GEN=64 \
      BENCH_SKIP_BASE=1 python bench.py
fi
