"""Decode-time decomposition profiler (live device).

The reference's SYNC_TEST_TIME machinery (global_timer.py:33-54) decomposes
a decode step into pq / non-pq / transfer with paired CUDA events; here the
equivalent attribution comes from A/B runs of one fused program:
  * policy `original` vs `pq_search`  → retrieval overhead
  * PQ_ADC={v2,v1,xla}, PQ_FETCH={gather,masked}, BLOCK=n  → stage costs
States are randomized realistically (or PREFILL=1 for a true prefill) so
data-dependent costs (scattered gathers) are measured honestly.

Usage: python -m pqcache_tpu.harness.profile_decode [policy ...]
Env: CTX (4096), LAYERS (2), STEPS (8), BLOCK (1), PREFILL, PQ_ADC, PQ_FETCH
"""
import os
import sys
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                PQConfig, RuntimeConfig)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy

CTX = int(os.environ.get("CTX", "4096"))
LAYERS = int(os.environ.get("LAYERS", "2"))
STEPS = int(os.environ.get("STEPS", "8"))
BLOCK = int(os.environ.get("BLOCK", "1"))

model = ModelConfig(
    name=f"prof{LAYERS}L", vocab_size=128256, hidden_size=4096,
    intermediate_size=14336, num_layers=LAYERS, num_heads=32, num_kv_heads=8,
    head_dim=128, rope_theta=500000.0, rope_scaling_factor=8.0,
    max_position_embeddings=131072)
params = None  # allocated lazily in __main__ (avoid GBs on import)


def run(name):
    cfg = EngineConfig(
        model=model,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                    select_block=BLOCK,
                    adc_mode=os.environ.get("PQ_ADC", "v2"),
                    fetch_mode=os.environ.get("PQ_FETCH", "gather"),
                    gather_mode=os.environ.get("PQ_GATHER", "xla")),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=32),
        runtime=RuntimeConfig(policy=name, prefill_bucket=1024,
                              max_new_tokens=64, max_seq_len=CTX * 2))
    budget = compute_budget(cfg.budget, CTX, 64)
    policy = get_policy(cfg, budget)
    st = policy.init_state(jnp.bfloat16)
    if os.environ.get("PREFILL") == "1":
        rngp = np.random.default_rng(0)
        ids = jnp.asarray(rngp.integers(0, model.vocab_size, size=CTX),
                          jnp.int32)
        pf = jax.jit(lambda p, s, t: llama.prefill(
            model, p, policy, s, t, jnp.asarray(0, jnp.int32),
            jnp.asarray(CTX, jnp.int32)), donate_argnums=(1,))
        t0 = time.perf_counter()
        logits, st = pf(params, st, ids)
        np.asarray(logits[:4])
        print(f"{name}: prefill(compile+run) {time.perf_counter()-t0:.1f}s",
              flush=True)
    elif name == "pq_search":
        # realistic state: random codes/centroids so top-k indices scatter
        # like real retrieval (zero state ⇒ constant scores ⇒ contiguous
        # indices ⇒ optimistic gather timings)
        rng = np.random.default_rng(0)
        st = st.replace(
            n_cand=jnp.asarray(budget.n_cand_init, jnp.int32),
            pos=jnp.asarray(CTX, jnp.int32),
            codes=jnp.asarray(rng.integers(0, 64, size=st.codes.shape),
                              st.codes.dtype),
            centroids=jnp.asarray(
                rng.normal(size=st.centroids.shape), jnp.float32),
            kv_tail=jnp.asarray(
                rng.normal(size=st.kv_tail.shape) * 0.1, jnp.bfloat16))
    elif hasattr(st, "length"):
        st = st.replace(length=jnp.asarray(CTX, jnp.int32),
                        pos=jnp.asarray(CTX, jnp.int32))

    f = jax.jit(lambda p, s, t, pos: llama.decode_loop(
        model, p, policy, s, t, pos, STEPS))
    t0 = time.perf_counter()
    toks, st = f(params, st, jnp.asarray(3, jnp.int32),
                 jnp.asarray(CTX, jnp.int32))
    np.asarray(toks)
    print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        toks, st = f(params, st, jnp.asarray(3, jnp.int32),
                     jnp.asarray(CTX + STEPS * (rep + 1), jnp.int32))
        np.asarray(toks)
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"{name}: {dt:.2f} ms/step", flush=True)


if __name__ == "__main__":
    params = llama.init_params(model, jax.random.PRNGKey(0))
    for nm in (sys.argv[1:] or ["original", "pq_search"]):
        run(nm)
