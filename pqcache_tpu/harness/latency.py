"""Latency harness: TTFT / TT2T / steady per-token decode across context
lengths — the reference's test_latency.py:74-141 protocol, adapted to the
fused-decode engine (per-token time is measured from an on-device 28-step
loop, matching the reference's (elapsed-TT2T)/28 estimator at :114-136).

Usage: python -m pqcache_tpu.harness.latency [--ctx 4096 8192 ...]
Emits one JSON line per (ctx, policy).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run(args) -> list[dict]:
    import jax

    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.models import llama
    from pqcache_tpu.runtime.generate import Engine

    model = ModelConfig(
        name=f"llama31-{args.layers}L",
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=args.layers, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, rope_scaling_factor=8.0,
        max_position_embeddings=131072)
    if args.weight_int8:
        # quantize on the host; the pq arm streams int8 weights (the
        # binding cost of single-stream decode) — the dense baseline
        # keeps bf16 weights, as everywhere (bench.py contract)
        from pqcache_tpu.core import quant
        with jax.default_device(jax.devices("cpu")[0]):
            p_host = llama.init_params(model, jax.random.PRNGKey(0))
            p8_host = quant.quantize_weight_tree(p_host)
        params = jax.device_put(p_host, jax.devices()[0])
        params_w8 = jax.device_put(p8_host, jax.devices()[0])
        del p_host, p8_host
    else:
        params = llama.init_params(model, jax.random.PRNGKey(0))
        params_w8 = None
    rng = np.random.default_rng(0)

    rows = []
    for policy in args.policies:
        arm_params = (params_w8 if args.weight_int8
                      and policy != "original" else params)
        for ctx in args.ctx:
            from pqcache_tpu.config import CacheConfig
            cfg = EngineConfig(
                model=model,
                pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                            select_block=args.select_block),
                budget=BudgetConfig(compress_ratio=args.compress,
                                    recent_ratio=0.5, sink_size=32),
                cache=CacheConfig(
                    kv_dtype=(args.kv_dtype if policy != "original"
                              else "bf16")),
                runtime=RuntimeConfig(policy=policy, prefill_bucket=1024,
                                      max_new_tokens=32,
                                      max_seq_len=max(args.ctx) + 2048,
                                      prefill_chunk=args.prefill_chunk),
            )
            eng = Engine(cfg, arm_params)
            ids = rng.integers(0, model.vocab_size, size=ctx).astype(np.int32)

            # warm-up compiles prefill + both decode-chunk programs
            eng.generate(ids, max_new_tokens=2)
            eng.generate(ids, max_new_tokens=30)
            r1 = eng.generate(ids, max_new_tokens=1)
            ttft = r1.prefill_seconds
            r2 = eng.generate(ids, max_new_tokens=2)
            tt2t = r2.decode_seconds
            r30 = eng.generate(ids, max_new_tokens=30)
            per_token = (r30.decode_seconds) / max(len(r30.tokens) - 1, 1)
            row = {"policy": policy, "ctx": ctx, "ttft_s": round(ttft, 4),
                   "tt2t_s": round(tt2t, 4),
                   "per_token_ms": round(per_token * 1e3, 3),
                   "decode_tok_s": round(1.0 / per_token, 2),
                   "kv_dtype": cfg.cache.kv_dtype,
                   "weight_int8": bool(args.weight_int8
                                       and policy != "original")}
            rows.append(row)
            print(json.dumps(row), flush=True)
            del eng
    return rows


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, nargs="*",
                   default=[4096, 8192, 16384, 24576])
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--compress", type=float, default=0.2)
    p.add_argument("--select-block", type=int, default=1,
                   help="retrieval granularity (128 = fused-kernel path)")
    p.add_argument("--policies", nargs="*",
                   default=["pq_search", "original"])
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="chunked (activation-bounded) prefill slab; "
                        "0 = full-length (needed past ~96k on one chip)")
    p.add_argument("--kv-dtype", default="bf16", choices=["bf16", "int8"],
                   help="pq KV-tail dtype (baseline stays bf16)")
    p.add_argument("--weight-int8", dest="weight_int8",
                   action="store_true",
                   help="weight-only int8 for the pq arm "
                        "(core/quant.quantize_weight_tree); the dense "
                        "baseline keeps bf16 weights")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
