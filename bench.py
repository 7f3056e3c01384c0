"""Headline benchmark: pq_search decode throughput at long context vs the
full-attention baseline, on whatever accelerator JAX sees.

Protocol mirrors the reference's latency harness (test_latency.py:74-141):
prefill once, then time steady-state per-token decode; `vs_baseline` is the
speedup of PQ decode over dense-attention decode on the SAME model and
context — the quantity PQCache exists to improve.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": R}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pqcache_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.models import llama
    from pqcache_tpu.runtime.generate import Engine

    ctx = int(os.environ.get("BENCH_CTX", "32768"))
    gen = int(os.environ.get("BENCH_GEN", "48"))
    layers = int(os.environ.get("BENCH_LAYERS", "8"))

    # Llama-3.1 widths at reduced depth: per-layer cost identical to the
    # flagship; depth scaled so random weights + two KV states fit one chip.
    model = ModelConfig(
        name=f"llama31-{layers}L-bench",
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=layers, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, rope_scaling_factor=8.0,
        max_position_embeddings=131072)

    def make_engine(policy):
        cfg = EngineConfig(
            model=model,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6),
            budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                                sink_size=32),
            runtime=RuntimeConfig(policy=policy, prefill_bucket=1024,
                                  max_new_tokens=gen, max_seq_len=ctx + 1024),
        )
        return Engine(cfg, params)

    params = llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, model.vocab_size, size=ctx).astype(np.int32)

    results = {}
    for policy in ("pq_search", "original"):
        eng = make_engine(policy)
        # warm-up compiles the prefill and the SAME-chunk decode loop that
        # the timed run uses (chunk size is part of the compiled program)
        eng.generate(ids, max_new_tokens=gen)
        res = eng.generate(ids, max_new_tokens=gen)
        assert res.policy_name == policy, res.policy_name
        steps = max(len(res.tokens) - 1, 1)
        results[policy] = {
            "tok_s": steps / res.decode_seconds,
            "prefill_s": res.prefill_seconds,
        }
        del eng

    pq_tok_s = results["pq_search"]["tok_s"]
    base_tok_s = results["original"]["tok_s"]
    print(json.dumps({
        "metric": f"pq_search decode tok/s @ {ctx} ctx ({layers}L llama31-width)",
        "value": round(pq_tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(pq_tok_s / base_tok_s, 3),
        "detail": {
            "baseline_full_attn_tok_s": round(base_tok_s, 2),
            "pq_prefill_s": round(results["pq_search"]["prefill_s"], 3),
            "base_prefill_s": round(results["original"]["prefill_s"], 3),
            "ctx": ctx, "layers": layers,
        },
    }))


if __name__ == "__main__":
    main()
