"""Serving-latency harness: TTFT and inter-token latency PERCENTILES under
concurrent load on the slot-pool engine (runtime/batch_engine.py).

The reference measures latency only for one stream at a time
(test_latency.py:74-141); a serving deployment cares about tail latency
under load — time-to-first-token including queue wait, and decode pacing
while the pool is full. This harness submits N requests against a B-slot
pool on a (optionally staggered) arrival schedule and reports:

  * ttft_p50/p95_s   — first token available minus arrival (queue wait +
                       prefill; prefills serialize with decoding at chunk
                       boundaries, which is the engine's actual behavior)
  * wait_p50/p95_s   — admission delay (queue + chunk-boundary latency)
  * tbt_p50/p95_ms   — time between tokens from chunk-completion pacing
                       (chunk-granularity: each chunk's wall time divided
                       by the tokens it delivered)
  * agg_tok_s        — aggregate generated tokens / wall time
  * e2e_p95_s        — request completion minus arrival

Usage:
  python -m pqcache_tpu.harness.serving --ctx 32768 --pool 8 \
      --requests 16 --gen 64 [--stagger 0.2] [--policy pq_search]

Emits one JSON line per policy.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _pct(vals, q):
    return float(np.percentile(np.asarray(vals, np.float64), q))


def summarize(timing: dict, wall_s: float) -> dict:
    """Aggregate a BatchEngine.run timing dict into percentile metrics."""
    ttft, wait, e2e, tbt = [], [], [], []
    n_tokens = 0
    for ev in timing.values():
        ttft.append(ev["first"] - ev["arrive"])
        wait.append(ev["admit"] - ev["arrive"])
        if "done" in ev:
            e2e.append(ev["done"] - ev["arrive"])
        tt = ev.get("token_times", [])
        n_tokens += len(tt)
        # chunk pacing: consecutive DISTINCT completion times bound a chunk;
        # per-token time = chunk wall time / tokens delivered in it
        prev_t, prev_i = tt[0] if tt else 0.0, 0
        for i in range(1, len(tt)):
            if tt[i] != prev_t:
                tbt.extend([(tt[i] - prev_t) / (i - prev_i)] * (i - prev_i))
                prev_t, prev_i = tt[i], i
    out = {
        "ttft_p50_s": round(_pct(ttft, 50), 4),
        "ttft_p95_s": round(_pct(ttft, 95), 4),
        "wait_p50_s": round(_pct(wait, 50), 4),
        "wait_p95_s": round(_pct(wait, 95), 4),
        "e2e_p95_s": round(_pct(e2e, 95), 4) if e2e else None,
        "agg_tok_s": round(n_tokens / wall_s, 2),
    }
    if tbt:
        out["tbt_p50_ms"] = round(_pct(tbt, 50) * 1e3, 3)
        out["tbt_p95_ms"] = round(_pct(tbt, 95) * 1e3, 3)
    return out


def run(args) -> list[dict]:
    import jax

    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig,
                                    tiny_model_config)
    from pqcache_tpu.models import llama
    from pqcache_tpu.runtime.batch_engine import BatchEngine

    if args.tiny:
        # CPU-runnable smoke mode: exercises the full serving path
        # (prefix capture, admission waves, percentile summary) at toy
        # widths so the harness itself is verifiable asset-free
        model = tiny_model_config(max_position_embeddings=args.ctx + 2048)
    else:
        model = ModelConfig(
            name=f"llama31-{args.layers}L",
            vocab_size=128256, hidden_size=4096, intermediate_size=14336,
            num_layers=args.layers, num_heads=32, num_kv_heads=8,
            head_dim=128, rope_theta=500000.0, rope_scaling_factor=8.0,
            max_position_embeddings=131072)
    if args.weight_int8:
        # init + quantize on the host; ship int8 (a bf16-first init of
        # deep models OOMs the chip the quantization exists to fit)
        from pqcache_tpu.core import quant
        with jax.default_device(jax.devices("cpu")[0]):
            params = llama.init_params(model, jax.random.PRNGKey(0))
            params = quant.quantize_weight_tree(params)
        params = jax.device_put(params, jax.devices()[0])
    else:
        params = llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    if args.mixed_prompts:
        lens = rng.integers(args.ctx // 4, args.ctx + 1,
                            size=args.requests)
    else:
        lens = np.full((args.requests,), args.ctx)
    prompts = [rng.integers(0, model.vocab_size, size=int(n))
               .astype(np.int32) for n in lens]
    arrivals = {i: i * args.stagger for i in range(args.requests)}

    rows = []
    # shared system-prompt prefix: the KV capture is policy-independent
    # (dense prefill of the model), so build it ONCE — same prefix tokens
    # and one compile for every policy row (rebuilding per policy both
    # recompiled the capture program and, because rng advances, measured
    # each policy against different prefix content)
    prefix = None
    if args.prefix_len:
        from pqcache_tpu.runtime.generate import Engine
        pre_ids = rng.integers(0, model.vocab_size,
                               size=args.prefix_len).astype(np.int32)
        cap_cfg = EngineConfig(
            model=model,
            runtime=RuntimeConfig(policy="original", prefill_bucket=1024,
                                  max_new_tokens=args.gen,
                                  max_seq_len=args.ctx + 2048))
        prefix = Engine(cap_cfg, params).prefill_prefix(pre_ids)
        prompts = [p[: args.ctx - args.prefix_len] for p in prompts]
    from pqcache_tpu.config import CacheConfig
    for policy in args.policies:
        cfg = EngineConfig(
            model=model,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                        select_block=args.select_block,
                        fetch_par=args.fetch_par),
            cache=CacheConfig(
                kv_dtype=(args.kv_dtype if policy == "pq_search"
                          else "bf16")),
            budget=BudgetConfig(compress_ratio=args.compress,
                                recent_ratio=0.5, sink_size=32),
            runtime=RuntimeConfig(policy=policy, prefill_bucket=1024,
                                  max_new_tokens=args.gen,
                                  max_seq_len=args.ctx + 2048,
                                  prefill_chunk=args.prefill_chunk),
        )
        eng = BatchEngine(cfg, params, batch_size=args.pool,
                          prefill_len=args.ctx, max_new_tokens=args.gen,
                          prefix=prefix, interleave=args.interleave)
        # warm-up: compile prefill + insert + decode-chunk programs
        eng.run([(10_000, prompts[0])], chunk=args.chunk)

        timing: dict = {}
        t0 = time.perf_counter()
        res = eng.run(list(enumerate(prompts)), chunk=args.chunk,
                      arrivals=arrivals, timing=timing,
                      admission=args.admission)
        wall = time.perf_counter() - t0
        assert set(res) == set(range(args.requests))

        row = {"policy": policy, "ctx": args.ctx, "pool": args.pool,
               "requests": args.requests, "gen": args.gen,
               "chunk": args.chunk, "stagger_s": args.stagger,
               "prefix_len": args.prefix_len,
               "interleave": eng.interleave,
               "admission": args.admission,
               "weight_int8": args.weight_int8,
               "wall_s": round(wall, 3), **summarize(timing, wall)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        del eng
    return rows


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=32768)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--pool", type=int, default=8, help="slot-pool size B")
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--gen", type=int, default=64)
    p.add_argument("--chunk", type=int, default=16,
                   help="decode chunk (bounds admission latency)")
    p.add_argument("--stagger", type=float, default=0.0,
                   help="seconds between request arrivals (0 = burst)")
    p.add_argument("--admission", default="fifo", choices=["fifo", "spf"],
                   help="queue discipline among arrived requests: fifo, "
                        "or spf (shortest-prompt-first — mean TTFT over "
                        "worst-case wait under mixed prompt lengths)")
    p.add_argument("--mixed-prompts", dest="mixed_prompts",
                   action="store_true",
                   help="draw prompt lengths uniformly from [ctx/4, ctx] "
                        "instead of all-equal (what makes spf vs fifo "
                        "measurable)")
    p.add_argument("--prefix-len", dest="prefix_len", type=int, default=0,
                   help="shared system-prompt prefix length (prefilled "
                        "once, reused by every request; 0 = off)")
    p.add_argument("--prefill-chunk", dest="prefill_chunk", type=int,
                   default=8192,
                   help="admit-prefill activation chunk (0 = unchunked). "
                        "Admissions run with the pool's batched state "
                        "resident, so full-length prefill activations are "
                        "the pool's peak-memory term. IGNORED when "
                        "--prefix-len is set: prefix-cached admissions "
                        "already prefill only the (short) suffix slab")
    p.add_argument("--compress", type=float, default=0.2)
    p.add_argument("--kv-dtype", dest="kv_dtype", default="bf16",
                   choices=["bf16", "int8"],
                   help="pq_search HBM-tail dtype; int8 halves the pool "
                        "state (pool=8 @ 32k/8L no longer OOMs; pool=16 "
                        "fits one 16 GB chip)")
    p.add_argument("--interleave", default="auto",
                   choices=["auto", "on", "off"],
                   help="admission interleaving (BatchEngine): 'auto' = on "
                        "for chunked non-prefix configs. 'off' = monolithic "
                        "layer-major admission — ~0.6 GiB leaner peak; what "
                        "fits pool=16 int8 @ 32k/8L on a 16 GB chip (the "
                        "interleaved path's all-layer kbuf/vbuf OOM there)")
    p.add_argument("--select-block", type=int, default=256)
    p.add_argument("--fetch-par", type=int, default=16)
    p.add_argument("--policies", nargs="*",
                   default=["pq_search", "original"])
    p.add_argument("--weight-int8", dest="weight_int8",
                   action="store_true",
                   help="weight-only int8 (quantize_weight_tree): halves "
                        "weight-streaming bytes — the decode-chunk tbt "
                        "floor — and frees ~2.6 GiB of pool headroom")
    p.add_argument("--tiny", action="store_true",
                   help="toy model widths (CPU smoke test of the harness)")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
