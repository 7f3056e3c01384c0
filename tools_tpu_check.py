"""End-to-end TPU correctness check, teacher-forced.

Free-running greedy comparison is the wrong instrument on a tiny
random-weight model: its next-token distribution is near-uniform, so ANY
numeric difference (flash vs chunked prefill accumulation order, bf16
reduction order across kernels) flips some argmax and the token streams
diverge — which says nothing about kernel correctness. Instead both paths
consume the SAME fixed token sequence (teacher forcing) and we compare
per-step top-1 choices and logit gaps. Pass criteria:

  * top-1 agreement ≥ 90% across 24 forced steps (ties under bf16 noise
    may flip a few argmaxes on a random model), OR
  * agreement ≥ 75% with a median |logit gap| < 0.1× the logit scale —
    block-granular selection amplifies tiny numeric differences (online
    softmax in the fused kernel vs one-shot softmax in XLA shifts block
    masses by ~1e-3, which flips whole 128-token blocks on random data),
    so the gap criterion is the meaningful one there.

Run: python tools_tpu_check.py  (prints one JSON line per configuration)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build(policy="pq_search", kernels="auto", select_block=1):
    import jax
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.models import llama
    from pqcache_tpu.policies.base import get_policy

    model = ModelConfig(
        name="check", vocab_size=2048, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=128, rope_theta=10000.0, max_position_embeddings=8192)
    cfg = EngineConfig(
        model=model,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                    approx_topk=False, select_block=select_block),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                            sink_size=16),
        runtime=RuntimeConfig(policy=policy, prefill_bucket=512,
                              max_new_tokens=64, max_seq_len=8192,
                              kernels=kernels),
    )
    params = llama.init_params(model, jax.random.PRNGKey(0))
    budget = compute_budget(cfg.budget, 3072, cfg.runtime.max_new_tokens)
    pol = get_policy(cfg, budget)
    return cfg, params, pol


def forced_logits(cfg, params, pol, prompt, forced):
    """Prefill `prompt` then teacher-force `forced`; returns logits
    [len(forced)+1, V] (prefill last-token logits first)."""
    import jax
    import jax.numpy as jnp
    from pqcache_tpu.models import llama

    P = 3072
    pad = P - len(prompt)
    toks = np.zeros((P,), np.int32)
    toks[pad:] = prompt
    state = pol.init_state()

    @jax.jit
    def pre(params, state, tokens):
        return llama.prefill(cfg.model, params, pol, state, tokens,
                             jnp.asarray(pad, jnp.int32),
                             jnp.asarray(len(prompt), jnp.int32))

    @jax.jit
    def step(params, state, tok, pos):
        return llama.decode_step(cfg.model, params, pol, state, tok, pos)

    lg, state = pre(params, state, jnp.asarray(toks))
    out = [np.asarray(lg, np.float32)]
    pos = len(prompt)
    for t in forced:
        lg, state = step(params, state, jnp.asarray(t, jnp.int32),
                         jnp.asarray(pos, jnp.int32))
        out.append(np.asarray(lg, np.float32))
        pos += 1
    return np.stack(out)


def main():
    from pqcache_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 2048, 3000).astype(np.int32).tolist()
    forced = rng.integers(0, 2048, 24).astype(np.int32).tolist()

    for policy, blocks in (("pq_search", (1, 128)), ("original", (1,))):
        for blk in blocks:
            ref = None
            for kernels in ("xla", "auto"):
                cfg, params, pol = build(policy=policy, kernels=kernels,
                                         select_block=blk)
                lg = forced_logits(cfg, params, pol, prompt, forced)
                if kernels == "xla":
                    ref = lg
                    continue
                top_ref = ref.argmax(-1)
                top = lg.argmax(-1)
                agree = float((top == top_ref).mean())
                # logit gap of the ref's chosen token between paths
                gap = np.abs(np.take_along_axis(lg, top_ref[:, None], 1)
                             - np.take_along_axis(ref, top_ref[:, None], 1))
                scale = float(np.std(ref))
                rec = {"policy": policy, "select_block": blk,
                       "top1_agree": round(agree, 3),
                       "median_gap": round(float(np.median(gap)), 4),
                       "logit_std": round(scale, 3),
                       "pass": bool(agree >= 0.9 or
                                    (agree >= 0.75
                                     and np.median(gap) < 0.1 * scale))}
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
