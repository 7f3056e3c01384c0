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
from pqcache_tpu.ops.attention_xla import decode_window_attention_segments
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import DenseState, make_dense_state


@register_policy("original")
class OriginalPolicy:
    # Appends are deferred out of the layer scan (models/llama.py contract):
    # attention covers [cache | new-token segment] and ALL layers' appends
    # commit in one update per step. In-scan appends either scatter
    # per-(head, pos) — which makes XLA keep the multi-GB cache carry
    # heads-major and transpose-copy it every step — or chain per-slot
    # dynamic updates at a traced layer index, which XLA materializes as
    # full-cache copies per layer (measured 225 ms/step at B=4/32k/8L).
    deferred_appends = True

    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens

    def init_state(self, dtype=jnp.bfloat16) -> DenseState:
        return make_dense_state(self.cfg, self.max_len, dtype=dtype)

    def prefill_attn(self, state: DenseState, idx, q, k, v, pad_len, true_len):
        out, _ = dense_prefill_attention(q, k, v, pad_len)
        return out, self.prefill_tail(state, idx, k, v, pad_len, true_len)

    def prefill_tail(self, state: DenseState, idx, k, v, pad_len, true_len):
        """Layer-state writes given this layer's full K/V (chunked-prefill
        contract, models/llama.py prefill_chunked)."""
        P = k.shape[1]
        dt = state.k_cache.dtype
        return state.replace(
            k_cache=jax.lax.dynamic_update_slice(
                state.k_cache, k.astype(dt)[None], (idx, 0, 0, 0)),
            v_cache=jax.lax.dynamic_update_slice(
                state.v_cache, v.astype(dt)[None], (idx, 0, 0, 0)),
            length=jnp.asarray(P, jnp.int32), start=pad_len.astype(jnp.int32),
            pos=true_len.astype(jnp.int32))

    def decode_attn(self, state: DenseState, idx, q, k_new, v_new, shared):
        length, start = shared["length"], shared["start"]
        dt = state.k_cache.dtype
        T = state.k_cache.shape[2]
        kpos = jnp.arange(T, dtype=jnp.int32)
        valid = (kpos >= start) & (kpos < length)
        mask = jnp.broadcast_to(valid[None, :], (state.k_cache.shape[1], T))
        out = decode_window_attention_segments(q, [
            (state.k_cache[idx], state.v_cache[idx], mask),
            (k_new.astype(dt), v_new.astype(dt), None),
        ])
        return out, (k_new[:, 0], v_new[:, 0])

    def commit_appends(self, state: DenseState, payloads, shared):
        """One per-step append of all layers' new tokens: payloads =
        (k_new [L, H_kv, D], v_new [L, H_kv, D])."""
        k_new, v_new = payloads
        dt = state.k_cache.dtype
        length = shared["length"]
        return state.replace(
            k_cache=jax.lax.dynamic_update_slice(
                state.k_cache, k_new.astype(dt)[:, :, None],
                (0, 0, length, 0)),
            v_cache=jax.lax.dynamic_update_slice(
                state.v_cache, v_new.astype(dt)[:, :, None],
                (0, 0, length, 0)))

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
        dt = state.k_cache.dtype
        T = state.k_cache.shape[2]
        kpos = jnp.arange(T, dtype=jnp.int32)[None, :]
        mask = (kpos >= start_h[:, None]) & (kpos < length_h[:, None])
        k_new_f = k_new.reshape(BH_kv, 1, D).astype(dt)
        v_new_f = v_new.reshape(BH_kv, 1, D).astype(dt)
        out = decode_window_attention_segments(q.reshape(B * H, 1, D), [
            (state.k_cache[idx], state.v_cache[idx], mask),
            (k_new_f, v_new_f, None),
        ])
        return out.reshape(B, H, D), (k_new_f[:, 0], v_new_f[:, 0])

    def commit_appends_batched(self, state: DenseState, payloads, shared):
        """Per-step stacked append: payloads = (k_new [L, B·H_kv, D],
        v_new); per-slot write positions, committed as B unrolled
        contiguous dynamic updates OUTSIDE the layer scan (scatters flip
        the carry layout — see policies/pq_search.py
        commit_appends_batched)."""
        k_new, v_new = payloads
        dt = state.k_cache.dtype
        H_kv = self.cfg.model.num_kv_heads
        B = k_new.shape[1] // H_kv
        k_cache, v_cache = state.k_cache, state.v_cache
        for b_i in range(B):
            l_b = shared["length"][b_i]
            sl = slice(b_i * H_kv, (b_i + 1) * H_kv)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new[:, sl].astype(dt)[:, :, None],
                (0, b_i * H_kv, l_b, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new[:, sl].astype(dt)[:, :, None],
                (0, b_i * H_kv, l_b, 0))
        return state.replace(k_cache=k_cache, v_cache=v_cache)

    def shared_pre_batched(self, state: DenseState):
        return {"length": state.length, "start": state.start}

    def shared_post_batched(self, state: DenseState, shared):
        return state.replace(length=state.length + 1, pos=state.pos + 1)
