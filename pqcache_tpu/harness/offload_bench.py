"""Host-offload tier benchmark: step time, hit rate, wall decomposition.

Measures the offload engine (KV in host RAM, HBM block cache, native LFU)
against the HBM-resident engine at the same config — the analog of the
reference's latency decomposition for its CPU-offload hierarchy
(test_latency.py + global_timer pq/non-pq/transfer splits).

The decode's own retrieval pattern provides the block reuse (consecutive
queries of one sequence select overlapping top blocks — the locality the
reference's LFU exploits, cache_manager.py:364-380).

Prints one JSON line. Env: CTX (32768), LAYERS (8), GEN (24),
CACHE_TOKENS (8192), BLOCK (128), PREFILL_CHUNK (0 = full-length;
set e.g. 32768 for activation-bounded chunked prefill at 192k+).

NOTE (dev environment): through the axon tunnel every device dispatch
pays ~30 ms round-trip latency, and the offload tier dispatches per layer
by design (the reference's per-layer fetch does too, on a local PCIe bus).
The `wait_s` component is therefore tunnel-dominated here; `host_s` is
the true host-side cost of the tier (classify + stage + admit).
"""
import json
import os
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                ModelConfig, PQConfig, RuntimeConfig)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine
from pqcache_tpu.runtime.offload_engine import OffloadEngine

CTX = int(os.environ.get("CTX", "32768"))
LAYERS = int(os.environ.get("LAYERS", "8"))
GEN = int(os.environ.get("GEN", "24"))
CACHE_TOKENS = int(os.environ.get("CACHE_TOKENS", "8192"))
BLOCK = int(os.environ.get("BLOCK", "128"))
# chunked prefill slab (tokens); 0 = full-length single-shot prefill
PREFILL_CHUNK = int(os.environ.get("PREFILL_CHUNK", "0"))
# contexts beyond the HBM tier's fit (the tier's own regime): skip the
# HBM-resident comparison arm, it would OOM
SKIP_HBM = os.environ.get("SKIP_HBM", "0") == "1"
# int8 store: halves host RAM, host<->HBM DMA bytes, and cache HBM
KV = "int8" if os.environ.get("KV_INT8", "0") == "1" else "bf16"
# BATCH > 1: batched offload serving (runtime/offload_batch.py) — B slots
# share the host store; per-layer host round trips amortize over slots
BATCH = int(os.environ.get("BATCH", "1"))
# REQUESTS > BATCH (with BATCH > 1): CONTINUOUS serving — requests admit
# into free slots one prefill unit per decode step, finished slots retire
# and their block-id range is recycled (BatchOffloadEngine.serve)
REQUESTS = int(os.environ.get("REQUESTS", "0"))
# STALE=1: one-step-stale block selection (CacheConfig.stale_select) —
# O(1) blocking syncs per decode step instead of 2 per layer
STALE = os.environ.get("STALE", "0") == "1"


def main():
    model = ModelConfig(
        name=f"off{LAYERS}L", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=LAYERS, num_heads=32,
        num_kv_heads=8, head_dim=128, rope_theta=500000.0,
        rope_scaling_factor=8.0, max_position_embeddings=131072)
    cfg = EngineConfig(
        model=model,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                            sink_size=32),
        cache=CacheConfig(offload=True, block_size=BLOCK,
                          hbm_cache_tokens=CACHE_TOKENS,
                          cache_topk_blocks=64, kv_dtype=KV,
                          stale_select=STALE),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=1024,
                              max_new_tokens=GEN + 2, max_seq_len=CTX + 2048,
                              prefill_chunk=PREFILL_CHUNK))
    params = llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, model.vocab_size, size=CTX).astype(np.int32)

    # HBM-resident reference (same config, fused on-device decode)
    hbm_ms = None
    if not SKIP_HBM:
        import dataclasses
        cfg_hbm = dataclasses.replace(
            cfg, cache=dataclasses.replace(cfg.cache, offload=False))
        hbm = Engine(cfg_hbm, params)
        r = hbm.generate(ids, max_new_tokens=GEN)      # compile
        r = hbm.generate(ids, max_new_tokens=GEN)
        hbm_ms = r.decode_seconds / max(len(r.tokens) - 1, 1) * 1e3
        del hbm, r

    if BATCH > 1 and REQUESTS > BATCH:
        # continuous serving: REQUESTS streams through a B-slot pool with
        # interleaved admission + slot retirement/recycling
        from pqcache_tpu.runtime.offload_batch import BatchOffloadEngine
        be = BatchOffloadEngine(cfg, params, batch_size=BATCH)
        reqs = [(i, ids) for i in range(REQUESTS)]
        # warm-up MUST use the measured max_new_tokens: the budget (and so
        # every program's state shapes) depends on it — a smaller warm-up
        # value can round n_tail_max to a different 256-multiple and the
        # timed run would recompile everything inside the timed region
        be.serve(reqs[:BATCH], max_new_tokens=GEN)     # compile
        timing: dict = {}
        t0 = time.perf_counter()
        outs = be.serve(reqs, max_new_tokens=GEN, timing=timing)
        dt = time.perf_counter() - t0
        tm = be.timings
        steps = max(tm["steps"], 1)
        n_tok = sum(len(o) for o in outs.values())
        diffs = [np.diff(v["token_times"]) for v in timing.values()
                 if len(v.get("token_times", [])) > 1]
        # GEN=1 leaves every stream with a single token time: no tbt
        tbt = np.concatenate(diffs) if diffs else np.zeros((0,))
        ttft = np.asarray([v["first"] - v["arrive"]
                           for v in timing.values()])
        print(json.dumps({
            "metric": (f"continuous offload serving @ {CTX} ctx "
                       f"({LAYERS}L, pool={BATCH}, requests={REQUESTS})"),
            "per_step_ms": round(tm["decode_s"] / steps * 1e3, 2),
            "agg_tok_s": round(n_tok / dt, 2),
            "tbt_p50_ms": (round(float(np.percentile(tbt, 50)) * 1e3, 2)
                           if tbt.size else None),
            "tbt_p95_ms": (round(float(np.percentile(tbt, 95)) * 1e3, 2)
                           if tbt.size else None),
            "ttft_p50_s": round(float(np.percentile(ttft, 50)), 2),
            "ttft_p95_s": round(float(np.percentile(ttft, 95)), 2),
            "hit_rate": round(be.store.hit_rate, 4),
            "host_ms_per_step": round(tm["host_s"] / steps * 1e3, 2),
            "cache_tokens": CACHE_TOKENS, "block": BLOCK, "kv_dtype": KV,
            "stale": STALE, "device_wait_ms_per_step": round(
                tm["wait_s"] / steps * 1e3, 2),
            "batch": BATCH, "requests": REQUESTS, "tokens": n_tok,
            "total_s": round(dt, 1),
        }))
        return
    if BATCH > 1:
        from pqcache_tpu.runtime.offload_batch import BatchOffloadEngine
        be = BatchOffloadEngine(cfg, params, batch_size=BATCH)
        prompts = [ids] * BATCH
        # same max_new_tokens as the timed run: budget → program shapes
        be.generate_batch(prompts, max_new_tokens=GEN)  # compile
        t0 = time.perf_counter()
        outs = be.generate_batch(prompts, max_new_tokens=GEN)
        dt = time.perf_counter() - t0
        tm = be.timings
        steps = max(tm["steps"], 1)
        n_tok = sum(len(o) for o in outs)
        print(json.dumps({
            "metric": (f"batched offload-tier decode @ {CTX} ctx "
                       f"({LAYERS}L, B={BATCH})"),
            "per_step_ms": round(tm["decode_s"] / steps * 1e3, 2),
            "agg_tok_s": round(n_tok / dt, 2),
            "hbm_tier_per_step_ms": (round(hbm_ms, 2) if hbm_ms is not None
                                     else None),
            "hit_rate": round(be.store.hit_rate, 4),
            "host_ms_per_step": round(tm["host_s"] / steps * 1e3, 2),
            "device_wait_ms_per_step": round(tm["wait_s"] / steps * 1e3, 2),
            "cache_tokens": CACHE_TOKENS, "block": BLOCK, "kv_dtype": KV,
            "stale": STALE,
            "batch": BATCH, "tokens": n_tok, "total_s": round(dt, 1),
        }))
        return
    off = OffloadEngine(cfg, params)
    # warm-up MUST use the measured max_new_tokens: the budget's
    # n_tail_max rounds to 256-multiples, so a smaller warm-up GEN can
    # give different program shapes and the timed run recompiles
    # everything inside the timed region (same fix as the batch arms, r4)
    off.generate(ids, max_new_tokens=GEN)              # compile
    t0 = time.perf_counter()
    toks = off.generate(ids, max_new_tokens=GEN)
    dt = time.perf_counter() - t0
    tm = off.timings
    steps = max(tm["steps"], 1)
    print(json.dumps({
        "metric": f"offload-tier decode @ {CTX} ctx ({LAYERS}L)",
        "per_step_ms": round(tm["decode_s"] / steps * 1e3, 2),
        "hbm_tier_per_step_ms": (round(hbm_ms, 2) if hbm_ms is not None
                                 else None),
        "hit_rate": round(off.store.hit_rate, 4),
        "host_ms_per_step": round(tm["host_s"] / steps * 1e3, 2),
        "device_wait_ms_per_step": round(tm["wait_s"] / steps * 1e3, 2),
        "cache_tokens": CACHE_TOKENS, "block": BLOCK, "kv_dtype": KV,
        "stale": STALE,
        "tokens": len(toks), "total_s": round(dt, 1),
    }))


if __name__ == "__main__":
    main()
