"""Knockout profiling of the pq decode loop: disable one stage at a time.

Usage: VARIANT={full|noadc|nogather|nowin} CTX=32768 LAYERS=8 python tools_knockout.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pqcache_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                PQConfig, RuntimeConfig)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy
from pqcache_tpu.policies import pq_search as pqs
from pqcache_tpu.core import pq as pqcore

VARIANT = os.environ.get("VARIANT", "full")
CTX = int(os.environ.get("CTX", "32768"))
LAYERS = int(os.environ.get("LAYERS", "8"))
STEPS = int(os.environ.get("STEPS", "16"))
BLOCK = int(os.environ.get("BLOCK", "1"))
FETCH_PAR = int(os.environ.get("FETCH_PAR", "4"))

if VARIANT == "noadc":
    # fixed top-k indices; ADC/softmax/topk removed
    def fake_topk(scores, n_valid, k, **kw):
        H_kv = 8
        idx = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (H_kv, 1))
        g = jnp.zeros((H_kv, scores.shape[-1]), jnp.float32)
        return idx, g
    pqs.pq.mips_topk = fake_topk
    # also skip the score computation entirely
    pqs.pq.adc_gather_scores = lambda lut, codes: jnp.zeros(
        (lut.shape[0] * (32 // 8), codes.shape[-1]), jnp.float32)
elif VARIANT == "noscore_blk":
    # block mode: constant block selection — XLA dead-code-eliminates the
    # whole ADC+softmax+top-k chain; measures base + fused block attention
    def fake_blocks(scores, n_valid, k_tokens, *, block, **kw):
        H_kv = 8
        kb = max((k_tokens + block - 1) // block, 1)
        idx = jnp.tile(jnp.arange(kb, dtype=jnp.int32)[None], (H_kv, 1))
        return idx, None
    pqs.pq.mips_topk_blocks = fake_blocks
    # fused-scorer path equivalents (adc_block_scores_pallas +
    # topk_from_block_mass): constant selection, kernel dead-code'd
    def fake_mass_topk(blk_mass, n_valid, k_tokens, *, group, block, **kw):
        H_kv = blk_mass.shape[0] // group
        kb = max((k_tokens + block - 1) // block, 1)
        return jnp.tile(jnp.arange(kb, dtype=jnp.int32)[None], (H_kv, 1))
    pqs.pq.topk_from_block_mass = fake_mass_topk
    import pqcache_tpu.ops.adc_pallas as adcp
    def fake_block_scores(lut, codes, n_cand, *, sel_block, head_dim, **kw):
        H_kv, g, S, C = lut.shape
        return jnp.zeros((H_kv * g, codes.shape[-1] // sel_block),
                         jnp.float32)
    adcp.adc_block_scores_pallas = fake_block_scores
elif VARIANT == "noblkattn":
    # block mode: fused block attention replaced by a null partial that
    # still consumes blk_idx (keeps ADC+top-k alive); measures
    # base + score/top-k
    import pqcache_tpu.ops.block_attn_pallas as bap
    def fake_bta(q, kv_tail, layer, blk_idx, n_cand, *, block,
                 interpret=False):
        H, _, D = q.shape
        H_kv = kv_tail.shape[1]
        g = H // H_kv
        dep = (jnp.sum(blk_idx) * 0).astype(jnp.float32)
        return (jnp.zeros((H_kv, g)) + dep, jnp.ones((H_kv, g)),
                jnp.zeros((H_kv, g, D)))
    bap.block_topk_attention = fake_bta
elif VARIANT == "nogather":
    import pqcache_tpu.ops.attention_xla as axla
    _orig = axla.decode_window_attention
    # keep ADC+topk, but attention window excludes gathered KV: replace the
    # gather results by slicing local again (cheap, defeats the gather)
elif VARIANT == "nowin":
    import pqcache_tpu.ops.attention_xla as axla
    def fake_win(q, k_win, v_win, mask=None):
        return (q + jnp.sum(k_win[:, :1, :1]) * 0
                + jnp.sum(v_win[:, :1, :1]) * 0).astype(q.dtype)
    def fake_win_segments(q, segments, partials=()):
        acc = q
        for k_seg, v_seg, _ in segments:
            acc = acc + (jnp.sum(k_seg[:, :1, :1])
                         + jnp.sum(v_seg[:, :1, :1])) * 0
        return acc.astype(q.dtype)
    axla.decode_window_attention = fake_win
    axla.decode_window_attention_segments = fake_win_segments
    pqs.decode_window_attention = fake_win
    pqs.decode_window_attention_segments = fake_win_segments

model = ModelConfig(
    name=f"ko{LAYERS}L", vocab_size=128256, hidden_size=4096,
    intermediate_size=14336, num_layers=LAYERS, num_heads=32, num_kv_heads=8,
    head_dim=128, rope_theta=500000.0, rope_scaling_factor=8.0,
    max_position_embeddings=131072)
cfg = EngineConfig(
    model=model,
    pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                select_block=BLOCK, fetch_par=FETCH_PAR),
    budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=32),
    runtime=RuntimeConfig(policy="pq_search", prefill_bucket=1024,
                          max_new_tokens=64, max_seq_len=CTX * 2))
budget = compute_budget(cfg.budget, CTX, 64)
policy = get_policy(cfg, budget)

if VARIANT == "nogather":
    orig_decode = policy.decode_attn
    import types
    def decode_nogather(self, state, idx, q, k_new, v_new, shared):
        # run everything but replace the tail row gather with a static slice
        b = self.budget
        n_cand = shared["n_cand"]
        H = q.shape[0]
        centroids = state.centroids[idx]
        codes = state.codes[idx]
        q_sub = q.reshape(H, self.S, self.d_sub)
        lut = pqcore.adc_lut_euc(q_sub, centroids)
        from pqcache_tpu.ops.adc_pallas import adc_scores_pallas
        lut4 = lut.reshape(self.H_kv, self.group, self.S, -1)
        scores = adc_scores_pallas(lut4, codes).reshape(H, -1)
        topk_idx, _ = pqcore.mips_topk(
            scores, n_cand, b.topk, group=self.group, head_dim=self.D,
            metric=self.metric, approx=True)
        kv_top = jax.lax.dynamic_slice(
            state.kv_tail, (idx, 0, jnp.min(topk_idx) * 0, 0),
            (1, self.H_kv, b.topk, 2 * self.D))[0]
        k_top, v_top = kv_top[..., :self.D], kv_top[..., self.D:]
        kv_local = jax.lax.dynamic_slice(
            state.kv_tail, (idx, 0, n_cand, 0),
            (1, self.H_kv, b.local, 2 * self.D))[0]
        k_local, v_local = kv_local[..., :self.D], kv_local[..., self.D:]
        dt = state.kv_tail.dtype
        k_win = jnp.concatenate([state.k_sink[idx], k_local, k_top,
                                 k_new.astype(dt)], axis=1)
        v_win = jnp.concatenate([state.v_sink[idx], v_local, v_top,
                                 v_new.astype(dt)], axis=1)
        ones = lambda n: jnp.ones((self.H_kv, n), bool)
        win_mask = jnp.concatenate(
            [ones(b.sink), ones(b.local), topk_idx < n_cand, ones(1)], axis=1)
        from pqcache_tpu.ops.attention_xla import decode_window_attention
        out = decode_window_attention(q, k_win, v_win, win_mask)
        slot = n_cand + b.local
        x_new = self._to_groups(k_new)
        cent_flat = centroids.reshape(self.H_kv * self.S, self.C, -1)
        new_codes = pqcore.pq_encode(x_new, cent_flat).reshape(
            self.H_kv, self.S, 1).astype(state.codes.dtype)
        kv_new = jnp.concatenate([k_new, v_new], -1).astype(dt)
        new = state.replace(
            kv_tail=jax.lax.dynamic_update_slice(
                state.kv_tail, kv_new[None], (idx, 0, slot, 0)),
            codes=jax.lax.dynamic_update_slice(
                state.codes, new_codes[None], (idx, 0, 0, slot)))
        return out, new
    policy.decode_attn = types.MethodType(decode_nogather, policy)

params = llama.init_params(model, jax.random.PRNGKey(0))
st = policy.init_state(jnp.bfloat16)
st = st.replace(n_cand=jnp.asarray(budget.n_cand_init, jnp.int32),
                pos=jnp.asarray(CTX, jnp.int32))
f = jax.jit(lambda p, s, t, pos: llama.decode_loop(
    model, p, policy, s, t, pos, STEPS))
t0 = time.perf_counter()
toks, st = f(params, st, jnp.asarray(3, jnp.int32), jnp.asarray(CTX, jnp.int32))
np.asarray(toks)
print(f"{VARIANT}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    toks, st = f(params, st, jnp.asarray(3, jnp.int32),
                 jnp.asarray(CTX + STEPS * (rep + 1), jnp.int32))
    np.asarray(toks)
    print(f"{VARIANT}: {(time.perf_counter()-t0)/STEPS*1e3:.2f} ms/step",
          flush=True)
