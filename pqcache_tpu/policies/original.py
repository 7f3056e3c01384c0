"""`original` policy: full dense attention over an uncompressed KV cache.

The reference's "original" compressor branch (mistral_patch.py:86-103) —
flash attention over the whole history. Serves as the quality ceiling and the
latency baseline that PQCache is measured against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget
from pqcache_tpu.ops.attention_xla import decode_window_attention
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import DenseState, make_dense_state


@register_policy("original")
class OriginalPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens

    def init_state(self, dtype=jnp.bfloat16) -> DenseState:
        return make_dense_state(self.cfg, self.max_len, dtype=dtype)

    def prefill_attn(self, state: DenseState, idx, q, k, v, pad_len, true_len):
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

    def decode_attn(self, state: DenseState, idx, q, k_new, v_new, shared):
        length, start = shared["length"], shared["start"]
        dt = state.k_cache.dtype
        k_cache = jax.lax.dynamic_update_slice(
            state.k_cache, k_new.astype(dt)[None], (idx, 0, length, 0))
        v_cache = jax.lax.dynamic_update_slice(
            state.v_cache, v_new.astype(dt)[None], (idx, 0, length, 0))
        T = k_cache.shape[2]
        kpos = jnp.arange(T, dtype=jnp.int32)
        valid = (kpos >= start) & (kpos <= length)
        mask = jnp.broadcast_to(valid[None, :], (k_cache.shape[1], T))
        out = decode_window_attention(q, k_cache[idx], v_cache[idx], mask)
        return out, state.replace(k_cache=k_cache, v_cache=v_cache)

    def shared_pre(self, state: DenseState):
        return {"length": state.length, "start": state.start}

    def shared_post(self, state: DenseState, shared):
        return state.replace(length=state.length + 1, pos=state.pos + 1)
