"""`sparq_f` policy — SparQ approximate attention (Graphcore), adapted.

Reference: SparQCompressor / SparQCompressorGPU (sparq.py:14-180) wrapping
the vendored AnnAttention engine (sparq_official/methods/ann_attention.py:
254-352, SparseQ score at :77-119). Per decode step:

  1. rank-r sparse-Q scores: pick the top-r |q| components (magnitudes summed
     over the GQA group), compute approximate logits using only those
     components of K, scaled by sqrt((|q_r|_1/|q|_1)·D).
  2. force local window + sink to +inf, GQA-sum, top-(k+sink) selection.
  3. gather those KV pairs + the current token, dense attention.
  4. optional mean-value reallocation: leftover probability mass goes to the
     running mean value vector (the paper's mean_v trick,
     ann_attention.py:315-330).

This implementation keeps K/V HBM-resident (the reference's GPU accuracy
variant, sparq.py:108-180); the CPU-offload variant is a PCIe-era latency
workaround superseded here by the host-offload tier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget
from pqcache_tpu.ops.attention_xla import NEG_INF
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import DenseState, make_dense_state


@struct.dataclass
class SparqState:
    dense: DenseState
    mean_v: jax.Array  # [L, H_kv, 1, D] f32 running mean of values


@register_policy("sparq_f")
class SparqPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens
        m = cfg.model
        self.H_kv, self.group, self.D = m.num_kv_heads, m.num_groups, m.head_dim
        self.r = min(cfg.runtime.sparq_topr, m.head_dim)
        self.mean_v_trick = cfg.runtime.sparq_mean_v_trick
        # sparq.py:63-64: budget_size = ctx * compress, local = budget * rec
        self.k_budget = int(budget.prefill_len * cfg.budget.compress_ratio)
        self.local_k = int(self.k_budget * cfg.budget.recent_ratio)

    def init_state(self, dtype=jnp.bfloat16) -> SparqState:
        dense = make_dense_state(self.cfg, self.max_len, dtype=dtype)
        L = self.cfg.model.num_layers
        return SparqState(
            dense=dense,
            mean_v=jnp.zeros((L, self.H_kv, 1, self.D), jnp.float32))

    def prefill_attn(self, state: SparqState, idx, q, k, v, pad_len, true_len):
        P = q.shape[1]
        out, _ = dense_prefill_attention(q, k, v, pad_len)
        d = state.dense
        dt = d.k_cache.dtype
        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None], (idx,) + (0,) * val.ndim)
        # running mean over valid values (sparq.py:61)
        kpos = jnp.arange(P, dtype=jnp.int32)
        valid = (kpos >= pad_len)[None, :, None]
        cnt = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        mean_v = (jnp.sum(jnp.where(valid, v.astype(jnp.float32), 0.0),
                          axis=1, keepdims=True) / cnt)
        dense = d.replace(
            k_cache=up(d.k_cache, k.astype(dt)),
            v_cache=up(d.v_cache, v.astype(dt)),
            length=jnp.asarray(P, jnp.int32), start=pad_len.astype(jnp.int32),
            pos=true_len.astype(jnp.int32))
        return out, state.replace(dense=dense,
                                  mean_v=up(state.mean_v, mean_v))

    def decode_attn(self, state: SparqState, idx, q, k_new, v_new, shared):
        length, start = shared["length"], shared["start"]
        d = state.dense
        dt = d.k_cache.dtype
        full_k = jax.lax.dynamic_update_slice(
            d.k_cache, k_new.astype(dt)[None], (idx, 0, length, 0))
        full_v = jax.lax.dynamic_update_slice(
            d.v_cache, v_new.astype(dt)[None], (idx, 0, length, 0))
        k_cache, v_cache = full_k[idx], full_v[idx]
        T = k_cache.shape[1]
        H = q.shape[0]
        kpos = jnp.arange(T, dtype=jnp.int32)
        valid = (kpos >= start) & (kpos <= length)

        qg = q.reshape(self.H_kv, self.group, self.D).astype(jnp.float32)

        # 1. top-r |q| components, group-summed (ann_attention.py:94-97)
        qa = jnp.sum(jnp.abs(qg), axis=1)  # [H_kv, D]
        _, ridx = jax.lax.top_k(qa, self.r)  # [H_kv, r]
        q_r = jnp.take_along_axis(qg, ridx[:, None, :], axis=-1)  # [H_kv, g, r]
        k_r = jnp.take_along_axis(
            k_cache.astype(jnp.float32),
            ridx[:, None, :], axis=-1)  # [H_kv, T, r]
        # scale = sqrt(coverage * D) (ann_attention.py:111-118)
        cov = (jnp.sum(jnp.abs(q_r), axis=-1)
               / jnp.maximum(jnp.sum(jnp.abs(qg), axis=-1), 1e-9))
        scale = jnp.sqrt(cov * self.D)[..., None]  # [H_kv, g, 1]
        approx = jnp.einsum("hgr,htr->hgt", q_r, k_r,
                            preferred_element_type=jnp.float32) / scale
        approx = jnp.where(valid[None, None], approx, NEG_INF)

        # 2. force local + sink, group-sum, top-(k+sink) (ann_attention.py:292-304)
        is_local = valid & (kpos >= length + 1 - self.local_k)
        is_sink = valid & (kpos < start + self.budget.sink)
        forced = is_local | is_sink
        sel_score = jnp.where(forced[None, None], 1e30, approx)
        g_score = jnp.sum(sel_score, axis=1)  # [H_kv, T]
        n_sel = min(self.k_budget + self.budget.sink, T)
        _, sel_idx = jax.lax.top_k(jnp.where(valid[None], g_score, -jnp.inf),
                                   n_sel)  # [H_kv, n_sel]

        # 3. gather + dense attention over the selected set (+ mask invalid)
        k_sel = jnp.take_along_axis(k_cache, sel_idx[:, :, None], axis=1)
        v_sel = jnp.take_along_axis(v_cache, sel_idx[:, :, None], axis=1)
        sel_valid = jnp.take_along_axis(
            jnp.broadcast_to(valid[None], (self.H_kv, T)), sel_idx, axis=1)
        logits = jnp.einsum("hgd,hsd->hgs", qg, k_sel.astype(jnp.float32),
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                float(self.D))
        logits = jnp.where(sel_valid[:, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hgs,hsd->hgd", w, v_sel.astype(jnp.float32),
                         preferred_element_type=jnp.float32)

        # 4. mean-value reallocation (ann_attention.py:315-330)
        n_real = (length + 1 - start).astype(jnp.float32)
        mean_v = (state.mean_v[idx] * (n_real - 1)
                  + v_new.astype(jnp.float32)) / n_real
        if self.mean_v_trick:
            norm_all = jax.nn.softmax(approx, axis=-1)  # [H_kv, g, T]
            kv_weight = jnp.sum(
                jnp.take_along_axis(norm_all, sel_idx[:, None, :], axis=-1),
                axis=-1)  # [H_kv, g]
            out = (out * kv_weight[..., None]
                   + (1.0 - kv_weight[..., None]) * mean_v)

        out = out.reshape(H, 1, self.D).astype(q.dtype)
        dense = d.replace(k_cache=full_k, v_cache=full_v)
        mean_up = jax.lax.dynamic_update_slice(
            state.mean_v, mean_v[None], (idx, 0, 0, 0))
        return out, state.replace(dense=dense, mean_v=mean_up)

    def shared_pre(self, state: SparqState):
        return {"length": state.dense.length, "start": state.dense.start}

    def shared_post(self, state: SparqState, shared):
        dense = state.dense.replace(
            length=state.dense.length + 1, pos=state.dense.pos + 1)
        return state.replace(dense=dense)
