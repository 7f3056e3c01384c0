"""`infllm` policy — block-level context retrieval (InfLLM-style baseline).

Reference: the vendored InfLLM subtree (InfLLM/inf_llm/attention/
context_manager.py:196-815 — fixed-size context blocks with representative
tokens, LRU-cached GPU blocks, optional faiss top-k block retrieval;
topk/local derived from COMPRESS_RATIO/LOCAL_RATIO env per the repo's local
patch, inf_llm/attention/inf_llm.py:49-80).

TPU-native re-design: the context is split into fixed blocks; each block's
representative tokens are the ones that received the most attention mass
during prefill (score columns from the score-emitting flash attention —
InfLLM's repr selection uses block-internal attention the same way). At
decode, blocks are ranked by the GQA-summed maximum q·k_repr similarity and
the top blocks are gathered wholesale into the attention window
[init | top blocks | local | new]. Everything is HBM-resident fixed-shape
state (the reference's CPU-offload + LRU cache maps to the host tier).

Streaming block formation (InfLLM's block append for generated tokens,
context_manager.py:196-815): attention mass received by local-window tokens
is accumulated per step; whenever generation completes a context block, that
block's representative tokens are selected by accumulated mass and the block
becomes retrievable once it falls out of the local window. jit-compatible:
the repr computation runs every step and is committed with a `where` on the
block-boundary predicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import DenseState, make_dense_state

N_REPR = 4  # representative tokens per block


@struct.dataclass
class InfLLMState:
    dense: DenseState
    k_repr: jax.Array   # [L, H_kv, n_blocks, N_REPR, D]
    repr_valid: jax.Array  # [L, H_kv, n_blocks, N_REPR] bool
    gen_scores: jax.Array  # [L, H_kv, T_max] f32 — decode attention mass
                           # received per token (streaming repr selection)


@register_policy("infllm")
class InfLLMPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        self.max_len = budget.prefill_len + budget.max_new_tokens
        m = cfg.model
        self.H_kv, self.group, self.D = m.num_kv_heads, m.num_groups, m.head_dim
        self.block = cfg.cache.block_size
        # block grid covers the GENERATED region too (streaming formation)
        self.n_blocks = (self.max_len + self.block - 1) // self.block
        self.n_prefill_blocks = ((budget.prefill_len + self.block - 1)
                                 // self.block)
        # token budget → number of retrieved blocks
        self.n_sel = max(budget.topk // self.block, 1)

    def init_state(self, dtype=jnp.bfloat16) -> InfLLMState:
        L = self.cfg.model.num_layers
        return InfLLMState(
            dense=make_dense_state(self.cfg, self.max_len, dtype=dtype),
            k_repr=jnp.zeros((L, self.H_kv, self.n_blocks, N_REPR, self.D),
                             dtype),
            repr_valid=jnp.zeros((L, self.H_kv, self.n_blocks, N_REPR), bool),
            gen_scores=jnp.zeros((L, self.H_kv, self.max_len), jnp.float32))

    def prefill_attn(self, state: InfLLMState, idx, q, k, v, pad_len, true_len):
        P = q.shape[1]
        out, F = dense_prefill_attention(q, k, v, pad_len,
                                         with_scores=True)
        scores = jnp.sum(F.reshape(self.H_kv, self.group, P), axis=1)

        # per-block representative tokens = top-N_REPR by received attention
        nb = self.n_blocks
        Pb = nb * self.block
        pad_scores = jnp.full((self.H_kv, Pb - P), -jnp.inf)
        s_blocks = jnp.concatenate([scores, pad_scores], axis=1).reshape(
            self.H_kv, nb, self.block)
        kpos = jnp.arange(Pb).reshape(nb, self.block)
        tok_valid = (kpos >= pad_len) & (kpos < P)
        s_blocks = jnp.where(tok_valid[None], s_blocks, -jnp.inf)
        top_v, top_i = jax.lax.top_k(s_blocks, N_REPR)  # [H_kv, nb, N_REPR]
        abs_idx = jnp.minimum(
            top_i + (jnp.arange(nb) * self.block)[None, :, None], P - 1)
        k_pad = k  # [H_kv, P, D]
        k_repr = jnp.take_along_axis(
            k_pad[:, None, :, :],
            abs_idx[..., None].astype(jnp.int32), axis=2)  # [H_kv, nb, R, D]
        repr_valid = jnp.isfinite(top_v)

        d = state.dense
        dt = d.k_cache.dtype
        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (idx,) + (0,) * val.ndim)
        dense = d.replace(
            k_cache=up(d.k_cache, k.astype(dt)),
            v_cache=up(d.v_cache, v.astype(dt)),
            length=jnp.asarray(P, jnp.int32), start=pad_len.astype(jnp.int32),
            pos=true_len.astype(jnp.int32))
        new = state.replace(
            dense=dense, k_repr=up(state.k_repr, k_repr.astype(dt)),
            repr_valid=up(state.repr_valid, repr_valid))
        return out, new

    def decode_attn(self, state: InfLLMState, idx, q, k_new, v_new, shared):
        b = self.budget
        length, start = shared["length"], shared["start"]
        d = state.dense
        dt = d.k_cache.dtype
        full_k = jax.lax.dynamic_update_slice(
            d.k_cache, k_new.astype(dt)[None], (idx, 0, length, 0))
        full_v = jax.lax.dynamic_update_slice(
            d.v_cache, v_new.astype(dt)[None], (idx, 0, length, 0))
        H = q.shape[0]
        qg = q.reshape(self.H_kv, self.group, self.D).astype(jnp.float32)

        # block ranking: GQA-sum of max repr similarity
        # (context_manager.py's representative-score retrieval)
        k_repr = state.k_repr[idx].astype(jnp.float32)
        sims = jnp.einsum("hgd,hbrd->hgbr", qg, k_repr,
                          preferred_element_type=jnp.float32)
        sims = jnp.where(state.repr_valid[idx][:, None], sims, -jnp.inf)
        block_score = jnp.sum(
            jnp.max(sims, axis=-1), axis=1)  # [H_kv, nb]
        # exclude blocks fully inside the local window or sink — they're in
        # the window anyway
        local_lo = length + 1 - b.local
        blk_start = jnp.arange(self.n_blocks) * self.block
        retrievable = (blk_start + self.block <= local_lo)
        block_score = jnp.where(retrievable[None], block_score, -jnp.inf)
        sel_score, sel = jax.lax.top_k(block_score, self.n_sel)  # [H_kv, n_sel]
        # a selected block participates only if it got a finite score (blocks
        # that are pure padding or inside the local window carry -inf and can
        # still be "selected" when fewer than n_sel finite blocks exist)
        sel_ok = jnp.isfinite(sel_score)

        # gather whole blocks
        tok_idx = (sel[:, :, None] * self.block
                   + jnp.arange(self.block)[None, None, :]).reshape(
                       self.H_kv, -1)  # [H_kv, n_sel*block]
        heads = jnp.arange(self.H_kv)[:, None]
        k_blocks = full_k[idx, heads, tok_idx]
        v_blocks = full_v[idx, heads, tok_idx]
        # per-token validity: a block straddling `start` (left-pad boundary)
        # must not attend its pad-region rows
        blk_mask = jnp.repeat(sel_ok, self.block, axis=1) & (tok_idx >= start)

        # window = [sink | blocks | local | new]
        T = full_k.shape[2]
        kpos = jnp.arange(T, dtype=jnp.int32)
        sink_k = jax.lax.dynamic_slice(
            full_k, (idx, 0, start, 0), (1, self.H_kv, b.sink, self.D))[0]
        sink_v = jax.lax.dynamic_slice(
            full_v, (idx, 0, start, 0), (1, self.H_kv, b.sink, self.D))[0]
        loc_k = jax.lax.dynamic_slice(
            full_k, (idx, 0, jnp.maximum(local_lo, 0), 0),
            (1, self.H_kv, b.local + 1, self.D))[0]
        loc_v = jax.lax.dynamic_slice(
            full_v, (idx, 0, jnp.maximum(local_lo, 0), 0),
            (1, self.H_kv, b.local + 1, self.D))[0]
        ones = lambda n: jnp.ones((self.H_kv, n), bool)
        loc_pos = jnp.maximum(local_lo, 0) + jnp.arange(b.local + 1)
        loc_mask = jnp.broadcast_to(
            ((loc_pos >= start) & (loc_pos <= length))[None],
            (self.H_kv, b.local + 1))
        k_win = jnp.concatenate([sink_k, k_blocks, loc_k], axis=1)
        v_win = jnp.concatenate([sink_v, v_blocks, loc_v], axis=1)
        win_mask = jnp.concatenate(
            [ones(b.sink), blk_mask, loc_mask], axis=1)

        from pqcache_tpu.ops.attention_xla import decode_window_attention
        out, probs = decode_window_attention(q, k_win, v_win, win_mask,
                                             return_probs=True)

        # -- streaming block formation (context_manager.py:196-815) --------
        # accumulate attention mass received by the local-window tokens
        loc_probs = probs[:, b.sink + blk_mask.shape[1]:]  # [H_kv, local+1]
        lo = jnp.maximum(local_lo, 0)
        gen_l = state.gen_scores[idx]
        gen_l = jax.lax.dynamic_update_slice(
            gen_l,
            jax.lax.dynamic_slice(
                gen_l, (0, lo), (self.H_kv, b.local + 1)) + loc_probs,
            (0, lo))
        gen_scores = jax.lax.dynamic_update_slice(
            state.gen_scores, gen_l[None], (idx, 0, 0))

        # when this step completes a context block, select its representative
        # tokens by accumulated mass and mark the block formed (committed
        # with `where` on the boundary predicate — jit-friendly)
        n_tok = length + 1
        completed = (n_tok % self.block) == 0
        cb = jnp.maximum(n_tok // self.block - 1, 0)
        blk_lo = cb * self.block
        blk_scores = jax.lax.dynamic_slice(
            gen_l, (0, blk_lo), (self.H_kv, self.block))
        sval, sidx = jax.lax.top_k(blk_scores, N_REPR)  # [H_kv, N_REPR]
        abs_sidx = (sidx + blk_lo).astype(jnp.int32)
        k_sel = jnp.take_along_axis(
            full_k[idx], abs_sidx[..., None], axis=1)  # [H_kv, N_REPR, D]
        old_repr = jax.lax.dynamic_slice(
            state.k_repr, (idx, 0, cb, 0, 0),
            (1, self.H_kv, 1, N_REPR, self.D))
        old_valid = jax.lax.dynamic_slice(
            state.repr_valid, (idx, 0, cb, 0), (1, self.H_kv, 1, N_REPR))
        k_repr = jax.lax.dynamic_update_slice(
            state.k_repr,
            jnp.where(completed, k_sel[None, :, None], old_repr),
            (idx, 0, cb, 0, 0))
        repr_valid = jax.lax.dynamic_update_slice(
            state.repr_valid,
            jnp.where(completed, jnp.ones_like(old_valid), old_valid),
            (idx, 0, cb, 0))

        return out, state.replace(
            dense=d.replace(k_cache=full_k, v_cache=full_v),
            k_repr=k_repr, repr_valid=repr_valid, gen_scores=gen_scores)

    def shared_pre(self, state: InfLLMState):
        return {"length": state.dense.length, "start": state.dense.start}

    def shared_post(self, state: InfLLMState, shared):
        dense = state.dense.replace(
            length=state.dense.length + 1, pos=state.dense.pos + 1)
        return state.replace(dense=dense)
