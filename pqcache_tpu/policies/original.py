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

    # -- batch-as-heads serving (see policies/pq_search.py for rationale) --

    def init_batched_state(self, B: int, dtype=jnp.bfloat16) -> DenseState:
        return make_dense_state(self.cfg, self.max_len, dtype=dtype, batch=B)

    def insert_slot(self, bstate: DenseState, state: DenseState,
                    slot: jax.Array) -> DenseState:
        H_kv = self.cfg.model.num_kv_heads
        slot = jnp.asarray(slot, jnp.int32)
        up1 = lambda b, s: jax.lax.dynamic_update_slice_in_dim(
            b, s, slot * H_kv, axis=1)
        return bstate.replace(
            k_cache=up1(bstate.k_cache, state.k_cache),
            v_cache=up1(bstate.v_cache, state.v_cache),
            length=bstate.length.at[slot].set(state.length),
            start=bstate.start.at[slot].set(state.start),
            pos=bstate.pos.at[slot].set(state.pos))

    def decode_attn_batched(self, state: DenseState, idx, q, k_new, v_new,
                            shared):
        """q [B, H, D]; k/v_new [B, H_kv, D] → ([B, H, D], state). Dense
        attention over the folded cache with per-slot validity rows."""
        B, H, D = q.shape
        H_kv = self.cfg.model.num_kv_heads
        BH_kv = B * H_kv
        length_h = jnp.repeat(shared["length"], H_kv)        # [B·H_kv]
        start_h = jnp.repeat(shared["start"], H_kv)
        heads = jnp.arange(BH_kv, dtype=jnp.int32)
        dt = state.k_cache.dtype
        k_cache = state.k_cache.at[idx, heads, length_h].set(
            k_new.reshape(BH_kv, D).astype(dt))
        v_cache = state.v_cache.at[idx, heads, length_h].set(
            v_new.reshape(BH_kv, D).astype(dt))
        T = k_cache.shape[2]
        kpos = jnp.arange(T, dtype=jnp.int32)[None, :]
        mask = (kpos >= start_h[:, None]) & (kpos <= length_h[:, None])
        out = decode_window_attention(
            q.reshape(B * H, 1, D), k_cache[idx], v_cache[idx], mask)
        return out.reshape(B, H, D), state.replace(
            k_cache=k_cache, v_cache=v_cache)

    def shared_pre_batched(self, state: DenseState):
        return {"length": state.length, "start": state.start}

    def shared_post_batched(self, state: DenseState, shared):
        return state.replace(length=state.length + 1, pos=state.pos + 1)
