"""`h2o` policy — Heavy-Hitter Oracle with accumulated attention scores.

Reference: KVCacheH2OOfficial (baseline_compressor.py:90-200) + the H2O
method subtree (h2o_method/h2o_attention.py:51-162). Keeps the full KV cache
but masks attention to [sink | top heavy_budget by *accumulated* score |
recent window]; after each step the current step's (masked) attention
probabilities are added to the running per-key score and the keep-mask is
rebuilt. Prefill scores come from the score-emitting flash attention (the
reference's Triton flash_attn_with_score kernel, here
ops.attention_xla.chunked_attention(with_scores=True)).
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


@register_policy("h2o")
class H2OPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens
        m = cfg.model
        self.H_kv, self.group, self.D = m.num_kv_heads, m.num_groups, m.head_dim
        # baseline_compressor.py:121-123: budgets fixed at prefill time.
        n = budget.prefill_len - budget.sink
        r = cfg.budget.compress_ratio
        self.heavy_budget = int(r * (1.0 - cfg.budget.recent_ratio) * n)
        self.recent_budget = int(r * cfg.budget.recent_ratio * n)

    def init_state(self, dtype=jnp.bfloat16) -> DenseState:
        return make_dense_state(self.cfg, self.max_len, with_scores=True,
                                dtype=dtype)

    def _build_mask(self, scores, start, length):
        """Keep-mask over cache slots: sink + recent + top heavy by score
        (baseline_compressor.py:133-148)."""
        T = scores.shape[-1]
        kpos = jnp.arange(T, dtype=jnp.int32)
        valid = (kpos >= start) & (kpos <= length)
        sink_hi = start + self.budget.sink
        recent_lo = length + 1 - self.recent_budget
        mid = valid & (kpos >= sink_hi) & (kpos < recent_lo)
        g_mid = jnp.where(mid[None, :], scores, -jnp.inf)
        _, top_idx = jax.lax.top_k(g_mid, max(self.heavy_budget, 1))
        keep_mid = jnp.zeros((self.H_kv, T), bool).at[
            jnp.arange(self.H_kv)[:, None], top_idx].set(True)
        keep_mid = keep_mid & mid[None, :]
        return valid[None, :] & (~mid[None, :] | keep_mid)

    def prefill_attn(self, state, idx, q, k, v, pad_len, true_len):
        P = q.shape[1]
        out, F = dense_prefill_attention(
            q, k, v, pad_len, with_scores=True,
            score_mode=self.cfg.runtime.score_func)
        # GQA reduction of per-q-head column sums → per-kv-head accumulated
        # scores (baseline_compressor.py:169-171).
        scores = jnp.sum(F.reshape(self.H_kv, self.group, P), axis=1)
        T = state.k_cache.shape[2]
        scores_full = jnp.zeros((self.H_kv, T), jnp.float32).at[:, :P].set(scores)
        mask = self._build_mask(scores_full, pad_len.astype(jnp.int32),
                                jnp.asarray(P - 1, jnp.int32))
        # zero scores outside the kept set (baseline_compressor.py:146-149)
        scores_full = jnp.where(mask, scores_full, 0.0)
        dt = state.k_cache.dtype
        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None], (idx,) + (0,) * val.ndim)
        new = state.replace(
            k_cache=up(state.k_cache, k.astype(dt)),
            v_cache=up(state.v_cache, v.astype(dt)),
            scores=up(state.scores, scores_full), mask=up(state.mask, mask),
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

        # the new token is always attendable (mask length+1 in the reference)
        keep = state.mask[idx] | (kpos[None, :] == length)
        qg = q.reshape(self.H_kv, self.group, self.D).astype(jnp.float32)
        logits = jnp.einsum("hgd,htd->hgt", qg, k_cache.astype(jnp.float32),
                            preferred_element_type=jnp.float32) / jnp.sqrt(
                                float(self.D))
        logits = jnp.where(keep[:, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hgt,htd->hgd", w, v_cache.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        out = out.reshape(H, 1, self.D).astype(q.dtype)

        # accumulate scores and rebuild the mask (baseline_compressor.py:155-198)
        scores = state.scores[idx] + jnp.sum(w, axis=1)
        mask = self._build_mask(scores, start, length)
        scores = jnp.where(mask, scores, 0.0)
        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None], (idx,) + (0,) * val.ndim)
        new = state.replace(k_cache=full_k, v_cache=full_v,
                            scores=up(state.scores, scores),
                            mask=up(state.mask, mask))
        return out, new

    def shared_pre(self, state: DenseState):
        return {"length": state.length, "start": state.start}

    def shared_post(self, state: DenseState, shared):
        return state.replace(length=state.length + 1, pos=state.pos + 1)
