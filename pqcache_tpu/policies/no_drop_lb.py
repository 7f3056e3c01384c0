"""`no_drop_lb` policy — the "oracle" budget baseline.

Reference: fullKVLimitBasedCompressor (baseline_compressor.py:205-294). Keeps
the FULL KV cache and, at every decode step, masks attention down to the
budget using the *exact* current-step attention scores: softmax the raw
logits, GQA-group-sum over the non-recent non-sink region
(baseline_compressor.py:269-274), keep the top `high_score_budget` positions
plus sink and the recent window, re-softmax. This is the upper bound on what
any top-k retrieval (PQ included) can achieve at the same budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget
from pqcache_tpu.ops.attention_xla import NEG_INF
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import DenseState, make_dense_state


@register_policy("no_drop_lb")
class NoDropLBPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens
        m = cfg.model
        self.H_kv, self.group, self.D = m.num_kv_heads, m.num_groups, m.head_dim
        # baseline_compressor.py:248-251 with h2o_ratio = 1 - recent_ratio
        n = budget.prefill_len - budget.sink
        total = int(n * cfg.budget.compress_ratio)
        self.high_budget = int(total * (1.0 - cfg.budget.recent_ratio))
        self.local_budget = total - self.high_budget

    def init_state(self, dtype=jnp.bfloat16) -> DenseState:
        return make_dense_state(self.cfg, self.max_len, dtype=dtype)

    def prefill_attn(self, state, idx, q, k, v, pad_len, true_len):
        P = q.shape[1]
        out, _ = dense_prefill_attention(q, k, v, pad_len)
        dt = state.k_cache.dtype
        new = state.replace(
            k_cache=jax.lax.dynamic_update_slice(
                state.k_cache, k.astype(dt)[None], (idx, 0, 0, 0)),
            v_cache=jax.lax.dynamic_update_slice(
                state.v_cache, v.astype(dt)[None], (idx, 0, 0, 0)),
            length=jnp.asarray(P, jnp.int32), start=pad_len.astype(jnp.int32),
            pos=true_len.astype(jnp.int32))
        return out, new

    def decode_attn(self, state, idx, q, k_new, v_new, shared):
        length, start = shared["length"], shared["start"]
        dt = state.k_cache.dtype
        full_k = jax.lax.dynamic_update_slice(
            state.k_cache, k_new.astype(dt)[None], (idx, 0, length, 0))
        full_v = jax.lax.dynamic_update_slice(
            state.v_cache, v_new.astype(dt)[None], (idx, 0, length, 0))
        k_cache, v_cache = full_k[idx], full_v[idx]
        T = k_cache.shape[1]
        H = q.shape[0]

        kpos = jnp.arange(T, dtype=jnp.int32)
        valid = (kpos >= start) & (kpos <= length)
        # budget regions (baseline_compressor.py:265-266): recent_index moves
        # with the growing sequence; sink is the first `sink` real tokens.
        recent_lo = length + 1 - self.local_budget
        sink_hi = start + self.budget.sink
        mid = valid & (kpos >= sink_hi) & (kpos < recent_lo)

        qg = q.reshape(self.H_kv, self.group, self.D).astype(jnp.float32)
        logits = jnp.einsum("hgd,htd->hgt", qg, k_cache.astype(jnp.float32),
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                float(self.D))
        logits = jnp.where(valid[None, None], logits, NEG_INF)
        # exact current-step importance (baseline_compressor.py:268-272)
        probs = jax.nn.softmax(logits, axis=-1)
        g_scores = jnp.sum(probs, axis=1)  # [H_kv, T]
        g_mid = jnp.where(mid[None, :], g_scores, -jnp.inf)
        _, top_idx = jax.lax.top_k(g_mid, max(self.high_budget, 1))
        keep_mid = jnp.zeros((self.H_kv, T), bool)
        keep_mid = keep_mid.at[
            jnp.arange(self.H_kv)[:, None], top_idx].set(True)
        keep_mid = keep_mid & mid[None, :]

        keep = valid[None, :] & (~mid[None, :] | keep_mid)
        masked = jnp.where(keep[:, None, :], logits, NEG_INF)
        w = jax.nn.softmax(masked, axis=-1)
        out = jnp.einsum("hgt,htd->hgd", w, v_cache.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        out = out.reshape(H, 1, self.D).astype(q.dtype)
        return out, state.replace(k_cache=full_k, v_cache=full_v)

    def shared_pre(self, state: DenseState):
        return {"length": state.length, "start": state.start}

    def shared_post(self, state: DenseState, shared):
        return state.replace(length=state.length + 1, pos=state.pos + 1)
