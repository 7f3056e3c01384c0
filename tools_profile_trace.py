"""Attempt a jax.profiler device trace of the decode loop through the
axon tunnel. If the backend supports remote tracing, the trace lands in
/tmp/jaxtrace and the per-op breakdown explains the decode-body overhead
(knockout "base" 10.2 vs dense 8.8 ms/step at 32k/8L).

Usage: CTX=32768 LAYERS=8 BLOCK=256 STEPS=16 python tools_profile_trace.py
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pqcache_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                ModelConfig, PQConfig, RuntimeConfig)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy

CTX = int(os.environ.get("CTX", "32768"))
LAYERS = int(os.environ.get("LAYERS", "8"))
STEPS = int(os.environ.get("STEPS", "16"))
MAXNEW = int(os.environ.get("MAXNEW", "64"))
BLOCK = int(os.environ.get("BLOCK", "256"))
FETCH_PAR = int(os.environ.get("FETCH_PAR", "4"))   # bench.py uses 16
POLICY = os.environ.get("POLICY", "pq_search")
B = int(os.environ.get("BATCH", "1"))
KV = "int8" if os.environ.get("KV_INT8", "0") == "1" else "bf16"
OUT = os.environ.get("TRACE_DIR", "/tmp/jaxtrace")

model = ModelConfig(
    name=f"prof{LAYERS}L", vocab_size=128256, hidden_size=4096,
    intermediate_size=14336, num_layers=LAYERS, num_heads=32, num_kv_heads=8,
    head_dim=128, rope_theta=500000.0, rope_scaling_factor=8.0,
    max_position_embeddings=131072)
cfg = EngineConfig(
    model=model,
    pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                select_block=BLOCK, fetch_par=FETCH_PAR),
    budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=32),
    cache=CacheConfig(kv_dtype=KV),
    runtime=RuntimeConfig(policy=POLICY, prefill_bucket=1024,
                          max_new_tokens=MAXNEW, max_seq_len=CTX * 2))
budget = compute_budget(cfg.budget, CTX, MAXNEW)
policy = get_policy(cfg, budget)

if os.environ.get("W_INT8", "0") == "1":
    from pqcache_tpu.core import quant
    with jax.default_device(jax.devices("cpu")[0]):
        params = quant.quantize_weight_tree(
            llama.init_params(model, jax.random.PRNGKey(0)))
    params = jax.device_put(params, jax.devices()[0])
else:
    params = llama.init_params(model, jax.random.PRNGKey(0))


def _warm(st, shape=()):
    f = lambda v: jnp.full(shape, v, jnp.int32)
    if hasattr(st, "n_cand"):
        return st.replace(n_cand=f(budget.n_cand_init), pos=f(CTX))
    return st.replace(length=f(CTX), start=f(0), pos=f(CTX))


# --- jhist-join experiment variants (B=16 layout-churn hunt) -------------
# JOIN_VARIANT=flat3: scatter on a reshaped [L·BH, NB, C²] view
# JOIN_VARIANT=flat2: scatter on [L·BH, NB·C²]
# JOIN_VARIANT=batched: lax.scatter with operand_batching_dims (l, bh)
_JV = os.environ.get("JOIN_VARIANT", "")
if _JV:
    from pqcache_tpu.policies.pq_search import PQSearchPolicy
    from pqcache_tpu.core import pq as _pq

    def _join_variant(self, state, shared, B):
        L = state.codes.shape[0]
        Hk = self.H_kv
        BH = B * Hk
        joins = jnp.concatenate([
            jax.lax.dynamic_slice(
                state.codes, (0, b_i * Hk, 0, shared["n_cand"][b_i]),
                (L, Hk, self.S, 1))[..., 0]
            for b_i in range(B)], axis=1).astype(jnp.int32)
        pair = joins[..., 0] * self.C + joins[..., 1]         # [L, BH]
        blk = jnp.repeat(shared["n_cand"] // self.select_block, Hk)
        J = state.jhist
        Ldim, BHdim, NB, CC = J.shape
        cap = jnp.iinfo(J.dtype).max
        if _JV == "flat3":
            J3 = J.reshape(Ldim * BHdim, NB, CC)
            row = (jnp.arange(L)[:, None] * BHdim
                   + jnp.arange(BH)[None, :])
            idx = (row, jnp.broadcast_to(blk[None], (L, BH)), pair)
            cur = J3[idx].astype(jnp.int32)
            J3 = J3.at[idx].set(jnp.minimum(cur + 1, cap).astype(J.dtype))
            return J3.reshape(Ldim, BHdim, NB, CC)
        if _JV == "flat2":
            J2 = J.reshape(Ldim * BHdim, NB * CC)
            row = (jnp.arange(L)[:, None] * BHdim
                   + jnp.arange(BH)[None, :])
            col = blk[None, :] * CC + pair
            idx = (row, col)
            cur = J2[idx].astype(jnp.int32)
            J2 = J2.at[idx].set(jnp.minimum(cur + 1, cap).astype(J.dtype))
            return J2.reshape(Ldim, BHdim, NB, CC)
        if _JV == "nojoin":
            # perf CEILING probe: skip the join entirely (WRONG semantics —
            # boundary-block mass lags; never ship)
            return J
        if _JV == "batched":
            # one-cell-per-(l, bh) scatter with explicit batching dims
            from jax import lax
            idx2 = jnp.stack([
                jnp.broadcast_to(blk[None], (L, BH)), pair],
                axis=-1).astype(jnp.int32)              # [L, BH, 2]
            cur = jnp.take_along_axis(
                jnp.take_along_axis(
                    J, idx2[..., 0:1][..., None], axis=2)[..., 0, :],
                idx2[..., 1:2], axis=-1)                # [L, BH, 1]
            upd = jnp.minimum(cur.astype(jnp.int32) + 1,
                              cap).astype(J.dtype)[..., 0]
            dn = lax.ScatterDimensionNumbers(
                update_window_dims=(),
                inserted_window_dims=(2, 3),
                scatter_dims_to_operand_dims=(2, 3),
                operand_batching_dims=(0, 1),
                scatter_indices_batching_dims=(0, 1))
            return lax.scatter(J, idx2, upd, dn,
                               indices_are_sorted=True,
                               unique_indices=True)
        raise ValueError(_JV)

    PQSearchPolicy._jhist_join_batched = _join_variant
    print(f"jhist join variant: {_JV}", flush=True)

if os.environ.get("TRACE_PREFILL", "0") == "1":
    # profile the PREFILL program instead of decode
    rngx = np.random.default_rng(0)
    ids = jnp.asarray(
        rngx.integers(0, model.vocab_size, size=CTX).astype(np.int32))

    def prefill_fn(p, s, t):
        logits, stt = llama.prefill(model, p, policy, s, t,
                                    jnp.asarray(0, jnp.int32),
                                    jnp.asarray(CTX, jnp.int32))
        return jnp.argmax(logits).astype(jnp.int32), stt
    prefill = jax.jit(prefill_fn, donate_argnums=(1,))
    t0 = time.perf_counter()
    tok, st = prefill(params, policy.init_state(jnp.bfloat16), ids)
    np.asarray(tok)
    print(f"prefill compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    with jax.profiler.trace(OUT):
        t0 = time.perf_counter()
        tok, st = prefill(params, policy.init_state(jnp.bfloat16), ids)
        np.asarray(tok)
    print(f"prefill steady: {time.perf_counter()-t0:.2f}s")
    import glob as _g
    for p in sorted(_g.glob(os.path.join(OUT, "**", "*"), recursive=True)):
        if os.path.isfile(p):
            print(f"  {p}")
    sys.exit(0)

if B == 1:
    st = policy.init_state(jnp.bfloat16)
    st = _warm(st)
    f = jax.jit(lambda p, s, t, pos: llama.decode_loop(
        model, p, policy, s, t, pos, STEPS), donate_argnums=(1,))
    tok0 = jnp.asarray(3, jnp.int32)
    pos0 = jnp.asarray(CTX, jnp.int32)
elif os.environ.get("MIMIC", "0") == "1":
    # reproduce bench.py's exact flow: prefill one sequence, insert into
    # all B slots, then decode the batched state
    rngx = np.random.default_rng(0)
    ids = rngx.integers(0, model.vocab_size, size=CTX).astype(np.int32)

    def prefill_fn(p, s, t):
        logits, stt = llama.prefill(model, p, policy, s, t,
                                    jnp.asarray(0, jnp.int32),
                                    jnp.asarray(CTX, jnp.int32))
        return jnp.argmax(logits).astype(jnp.int32), stt
    prefill = jax.jit(prefill_fn, donate_argnums=(1,))
    s1 = policy.init_state(jnp.bfloat16)
    tok0_, s1 = prefill(params, s1, jnp.asarray(ids))
    st = policy.init_batched_state(B, jnp.bfloat16)
    insert = jax.jit(policy.insert_slot, donate_argnums=(0,))
    for slot in range(B):
        st = insert(st, s1, jnp.asarray(slot, jnp.int32))
    del s1
    f = jax.jit(lambda p, s, t, pos: llama.decode_loop_batched(
        model, p, policy, s, t, pos, STEPS), donate_argnums=(1,))
    tok0 = jnp.full((B,), 3, jnp.int32)
    pos0 = jnp.full((B,), CTX, jnp.int32)
else:
    st = policy.init_batched_state(B, jnp.bfloat16)
    st = _warm(st, (B,))
    f = jax.jit(lambda p, s, t, pos: llama.decode_loop_batched(
        model, p, policy, s, t, pos, STEPS), donate_argnums=(1,))
    tok0 = jnp.full((B,), 3, jnp.int32)
    pos0 = jnp.full((B,), CTX, jnp.int32)
t0 = time.perf_counter()
toks, st = f(params, st, tok0, pos0)
np.asarray(toks)
print(f"compile+first {time.perf_counter()-t0:.1f}s", flush=True)

try:
    with jax.profiler.trace(OUT):
        toks, st = f(params, st, tok0, pos0 + STEPS)
        np.asarray(toks)
    files = glob.glob(os.path.join(OUT, "**", "*"), recursive=True)
    print("trace files:")
    for p in sorted(files):
        if os.path.isfile(p):
            print(f"  {p} ({os.path.getsize(p)} B)")
except Exception as e:
    print(f"profiler trace FAILED: {type(e).__name__}: {e}")

t0 = time.perf_counter()
toks, st = f(params, st, tok0, pos0 + 2 * STEPS)
np.asarray(toks)
print(f"steady: {(time.perf_counter()-t0)/STEPS*1e3:.2f} ms/step")
