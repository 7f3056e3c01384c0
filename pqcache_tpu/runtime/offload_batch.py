"""Batch-as-heads serving on the HOST-OFFLOAD tier: B concurrent
beyond-HBM sequences sharing one pinned-host store and one HBM block cache.

The single-sequence offload engine (runtime/offload_engine.py) pays its
per-layer host round trip (classify → stage → launch) for ONE stream; the
tier's economics want that cost amortized like weights are — BASELINE.md's
north star is concurrent long-context streams. This engine folds B slots
into the kv-head axis (the policies/pq_search.py batch-as-heads layout):

  * state arrays [L, B·H_kv, ...], per-slot counters [B];
  * block ids get a per-slot prefix (slot · blocks_per_slot + local_blk) so
    ONE HostKVStore holds every slot's leaves, ONE LFU/HBM cache serves
    them (hot slots naturally win more cache), and each layer-step's
    misses stage with ONE batched device_put for the whole batch;
  * per-slot growing tail blocks live in STATE ([L, B·H_kv, bs, 2D]) with
    per-slot fill cursors — appends/attention stay inside the fused layer
    program; a slot's filled tail flushes to a pinned leaf between steps.

Decode keeps the single-sequence engine's dispatch shape — attention of
layer l fused with the score/top-k of layer l+1, ONE host round trip per
layer — now serving B slots per trip. Prefill runs per slot through the
shared OffloadEngine prefill pass (slot-prefixed leaf ids) and inserts
into the batched state, exactly like runtime/batch_engine.py admissions.

Reference anchor: the reference hard-asserts batch 1 ON TOP of its offload
hierarchy (mistral_patch.py:61 + cache_manager.py:68) — concurrent
beyond-VRAM streams do not exist there at all.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core import pq
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.models.llama import _apply_rope_batched
from pqcache_tpu.ops.attention_xla import decode_window_attention_segments
from pqcache_tpu.runtime.host_offload import HostKVStore, assemble_blocks
from pqcache_tpu.runtime.offload_engine import OffloadEngine, OffloadPQState


@dataclasses.dataclass
class _OSlot:
    seq_id: Optional[int] = None
    tokens: Optional[list] = None
    done: bool = True


@dataclasses.dataclass
class _OAdmission:
    """An in-flight admission on the offload tier: the single-sequence
    prefill advanced one bounded device unit at a time
    (OffloadEngine._prefill_pass_steps) so running streams never stall
    more than one unit — the interleaved-admission discipline of
    runtime/batch_engine.py applied to the beyond-HBM tier."""
    slot: int
    seq_id: int
    gen: object                 # the prefill step generator
    rem_parts: dict             # layer → remainder leaf (or None)
    n_store: int
    true_len: int


class BatchOffloadEngine:
    """Fixed-pool batch decode over the shared host store (B slots).

    `generate_batch` serves a fixed batch (all slots prefilled up front);
    `serve` is the continuous form: requests admit into free slots one
    prefill unit per decode step, finished slots RETIRE (their block-id
    range is invalidated in the shared store/LFU so the next admission
    can reuse it) and free up for the queue."""

    def __init__(self, cfg: EngineConfig, params: dict, *, batch_size: int,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.dtype = dtype
        self.B = batch_size
        m = cfg.model
        self.H_kv = m.num_kv_heads
        self.D = m.head_dim
        self.S = cfg.pq.n_subvec_per_head
        self.C = cfg.pq.n_centroids
        self.metric = cfg.pq.metric
        self.bs = cfg.cache.block_size
        # the single-sequence engine provides the jitted PREFILL programs
        # (shared config/budget; its decode path is not used here)
        self._se = OffloadEngine(cfg, params, dtype)
        self.kv_int8 = self._se.kv_int8
        self.use_jhist = self._se.use_jhist
        self.sampler = self._se.sampler
        # one-step-stale selection (config.CacheConfig.stale_select): the
        # decode step classifies ALL layers from the previous step's
        # selections and dispatches every layer program back-to-back with
        # one blocking pull — O(1) syncs/step instead of 2·L round trips
        self.stale = cfg.cache.stale_select
        self._blk_stale: Optional[np.ndarray] = None  # [L, B·H_kv, kb]
        # set by parallel/offload_tp.py: the engine's traced bodies run
        # per-shard under shard_map with this mesh axis psum-reducing the
        # two row-parallel projections (attention out, MLP down)
        self.tp_axis: Optional[str] = None
        self.store: Optional[HostKVStore] = None
        self.timings = {}

    # -- batched state ------------------------------------------------------

    def _init_bstate(self, b) -> OffloadPQState:
        m = self.cfg.model
        L, H_kv, D, B = m.num_layers, m.num_kv_heads, m.head_dim, self.B
        BH = B * H_kv
        d_lift = self.D // self.S + (1 if self.metric == "ip" else 0)
        z = lambda *s: jnp.zeros(s, self.dtype)
        store_dt = jnp.int8 if self.kv_int8 else self.dtype
        return OffloadPQState(
            k_sink=z(L, BH, b.sink, D), v_sink=z(L, BH, b.sink, D),
            k_local=z(L, BH, b.local, D), v_local=z(L, BH, b.local, D),
            codes=jnp.zeros((L, BH, self.S, b.n_tail_max), jnp.uint8),
            centroids=jnp.zeros((L, BH, self.S, self.C, d_lift),
                                jnp.float32),
            phi=jnp.zeros((L, BH * self.S, 1, 1), jnp.float32),
            n_cand=jnp.zeros((self.B,), jnp.int32),
            ring_ptr=jnp.zeros((self.B,), jnp.int32),
            pos=jnp.zeros((self.B,), jnp.int32),
            jhist=(jnp.zeros((L, BH, b.n_tail_max // self.bs,
                              self.C * self.C), pq.jhist_dtype(self.bs))
                   if self.use_jhist else None),
            k_scale=(jnp.ones((L, BH, 1, D), jnp.float32)
                     if self.kv_int8 else None),
            v_scale=(jnp.ones((L, BH, 1, D), jnp.float32)
                     if self.kv_int8 else None),
            tail=jnp.zeros((L, BH, self.bs, 2 * D), store_dt))

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
    def _insert(self, bstate: OffloadPQState, sstate: OffloadPQState,
                slot: int, rem: jax.Array):
        """Fold a prefilled single-sequence state into slot `slot`; `rem`
        [L, H_kv, bs, 2D] carries the prefill remainder rows (zero-padded
        to a full block; rows past the true fill are garbage the per-slot
        fill cursor hides)."""
        Hk, S = self.H_kv, self.S
        up = lambda buf, s, scale=Hk: jax.lax.dynamic_update_slice(
            buf, s, (0, slot * scale) + (0,) * (s.ndim - 2))
        new = bstate.replace(
            k_sink=up(bstate.k_sink, sstate.k_sink),
            v_sink=up(bstate.v_sink, sstate.v_sink),
            k_local=up(bstate.k_local, sstate.k_local),
            v_local=up(bstate.v_local, sstate.v_local),
            codes=up(bstate.codes, sstate.codes),
            centroids=up(bstate.centroids, sstate.centroids),
            phi=up(bstate.phi, sstate.phi, Hk * S),
            n_cand=bstate.n_cand.at[slot].set(sstate.n_cand),
            ring_ptr=bstate.ring_ptr.at[slot].set(0),
            pos=bstate.pos.at[slot].set(sstate.pos),
            tail=up(bstate.tail, rem.astype(bstate.tail.dtype)))
        if self.use_jhist:
            new = new.replace(jhist=up(bstate.jhist, sstate.jhist))
        if self.kv_int8:
            new = new.replace(k_scale=up(bstate.k_scale, sstate.k_scale),
                              v_scale=up(bstate.v_scale, sstate.v_scale))
        return new

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def _extract_tail(self, tail: jax.Array, slot: int) -> jax.Array:
        return tail[:, slot * self.H_kv:(slot + 1) * self.H_kv]

    # -- decode programs (batch-as-heads) ------------------------------------

    def _score_topk_b(self, lp, state: OffloadPQState, idx, hidden, cos,
                      sin, n_sel_h):
        """Q/K/V + ADC + per-slot block top-k for layer `idx`.
        hidden [B, E]; cos/sin [B, D/2]; n_sel_h [B·H_kv]. Returns
        (q [B·H, 1, D], k_new/v_new [B·H_kv, D], blk [B·H_kv, kb] —
        slot-LOCAL block ids)."""
        m = self.cfg.model
        b = self.budget
        B = hidden.shape[0]
        H, Hk, D = m.num_heads, m.num_kv_heads, m.head_dim
        h_norm = llama.rms_norm(hidden, lp["ln1"], m.rms_norm_eps)
        q = _apply_rope_batched(
            llama._mm(h_norm, lp, "wq").reshape(B, H, D), cos, sin)
        k_new = _apply_rope_batched(
            llama._mm(h_norm, lp, "wk").reshape(B, Hk, D), cos, sin)
        v_new = llama._mm(h_norm, lp, "wv").reshape(B, Hk, D)
        qf = q.reshape(B * H, D)
        q_sub = qf.reshape(B * H, self.S, D // self.S)
        centroids = state.centroids[idx]
        if self.metric == "euc":
            lut = pq.adc_lut_euc(q_sub, centroids)
        else:
            lut = pq.adc_lut_ip(pq.lift_query(q_sub), centroids)
        if self.use_jhist:
            mass = pq.joint_block_mass(lut, state.jhist[idx], head_dim=D)
            blk = pq.topk_from_block_mass(
                mass, n_sel_h, b.topk, group=m.num_groups, block=self.bs,
                approx=self.cfg.pq.approx_topk)
        else:
            scores = pq.adc_gather_scores(lut, state.codes[idx])
            blk, _ = pq.mips_topk_blocks(
                scores, n_sel_h, b.topk, group=m.num_groups, head_dim=D,
                block=self.bs, metric=self.metric,
                approx=self.cfg.pq.approx_topk)
        return (q.reshape(B * H, 1, D), k_new.reshape(B * Hk, D),
                v_new.reshape(B * Hk, D), jnp.sort(blk, axis=-1))

    def _attn_tail_b(self, lp, state: OffloadPQState, idx, hidden, q,
                     k_new, v_new, blk_idx, slots, miss_pos, staged, cache,
                     n_sel_h, n_tail_h, fill, do_append):
        """Window assembly + attention + per-slot tail maintenance for
        layer `idx`. blk_idx [B·H_kv, kb] slot-LOCAL ids (row positions);
        slots/miss_pos index the shared cache/staged stacks (global ids
        resolved host-side). fill [B] i32 = per-slot tail cursors;
        do_append [B] bool = this step's eviction enters the store tail
        (n_cand ≥ stored — earlier evictions re-evict stored prompt rows).
        Returns (hidden [B, E], state)."""
        m = self.cfg.model
        b = self.budget
        B, Hk, D = self.B, self.H_kv, self.D
        BH = B * Hk
        bs = self.bs
        dt = state.k_local.dtype

        blocks = assemble_blocks(cache, staged, slots, miss_pos)
        kb = blocks.shape[1]
        rows = blocks.reshape(BH, kb * bs, 2 * D)
        tok = (blk_idx[:, :, None] * bs
               + jnp.arange(bs, dtype=jnp.int32)[None, None, :]
               ).reshape(BH, kb * bs)
        ok_blk = ((slots >= 0) | (miss_pos >= 0))[:, :, None]
        row_mask = (tok < n_sel_h[:, None]) & jnp.broadcast_to(
            ok_blk, (BH, kb, bs)).reshape(BH, kb * bs)
        tail_rows = state.tail[idx]                     # [BH, bs, 2D]
        if self.kv_int8:
            from pqcache_tpu.core import quant
            k_rows, v_rows = quant.dequant_kv(
                rows, state.k_scale[idx], state.v_scale[idx], dtype=dt)
            k_tl, v_tl = quant.dequant_kv(
                tail_rows, state.k_scale[idx], state.v_scale[idx], dtype=dt)
        else:
            k_rows, v_rows = rows[..., :D].astype(dt), rows[..., D:].astype(dt)
            k_tl = tail_rows[..., :D].astype(dt)
            v_tl = tail_rows[..., D:].astype(dt)
        tail_mask = (jnp.arange(bs, dtype=jnp.int32)[None, :]
                     < n_tail_h[:, None])
        out = decode_window_attention_segments(q, [
            (state.k_sink[idx], state.v_sink[idx], None),
            (state.k_local[idx], state.v_local[idx], None),
            (k_rows, v_rows, row_mask),
            (k_tl, v_tl, tail_mask),
            (k_new[:, None].astype(dt), v_new[:, None].astype(dt), None),
        ])

        attn = out.reshape(B, m.num_heads * D)
        attn_out = llama._mm(attn, lp, "wo")
        if self.tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, self.tp_axis)
        hidden = hidden + attn_out
        h2 = llama.rms_norm(hidden, lp["ln2"], m.rms_norm_eps)
        mlp_out = llama.mlp(lp, h2, chunk=m.mlp_chunk)
        if self.tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, self.tp_axis)
        hidden = hidden + mlp_out

        # ring-evict per slot: read the oldest local row, overwrite it with
        # the new token, encode the evicted key as candidate n_cand[b]
        ptr_h = jnp.repeat(state.ring_ptr, Hk)          # [BH]
        heads = jnp.arange(BH)
        k_loc, v_loc = state.k_local[idx], state.v_local[idx]
        evicted_k = k_loc[heads[:, None], ptr_h[:, None]]   # [BH, 1, D]
        evicted_v = v_loc[heads[:, None], ptr_h[:, None]]
        x_new = (evicted_k.reshape(BH, 1, self.S, D // self.S)
                 .transpose(0, 2, 1, 3)
                 .reshape(BH * self.S, 1, D // self.S))
        if self.metric == "ip":
            x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
        cent_flat = state.centroids[idx].reshape(BH * self.S, self.C, -1)
        ev_codes = pq.pq_encode(x_new, cent_flat).reshape(
            BH, self.S).astype(jnp.uint8)

        if self.kv_int8:
            from pqcache_tpu.core import quant
            kv_ev = quant.quantize_kv(evicted_k, evicted_v,
                                      state.k_scale[idx],
                                      state.v_scale[idx])[:, 0]
        else:
            kv_ev = jnp.concatenate(
                [evicted_k[:, 0], evicted_v[:, 0]], axis=-1)  # [BH, 2D]
        kv_ev = kv_ev.astype(state.tail.dtype)

        k_local, v_local = state.k_local, state.v_local
        codes, tail = state.codes, state.tail
        for b_i in range(B):
            hsl = slice(b_i * Hk, (b_i + 1) * Hk)
            ptr_b = state.ring_ptr[b_i]
            k_local = jax.lax.dynamic_update_slice(
                k_local, k_new[hsl].astype(dt)[None, :, None],
                (idx, b_i * Hk, ptr_b, 0))
            v_local = jax.lax.dynamic_update_slice(
                v_local, v_new[hsl].astype(dt)[None, :, None],
                (idx, b_i * Hk, ptr_b, 0))
            codes = jax.lax.dynamic_update_slice(
                codes, ev_codes[hsl][None, :, :, None],
                (idx, b_i * Hk, 0, state.n_cand[b_i]))
            # masked tail append: keep the current row when not appending
            cur = jax.lax.dynamic_slice(
                tail, (idx, b_i * Hk, fill[b_i], 0), (1, Hk, 1, 2 * D))
            row = jnp.where(do_append[b_i], kv_ev[hsl][None, :, None], cur)
            tail = jax.lax.dynamic_update_slice(
                tail, row, (idx, b_i * Hk, fill[b_i], 0))
        state = state.replace(k_local=k_local, v_local=v_local,
                              codes=codes, tail=tail)
        if self.use_jhist:
            pair = (ev_codes[:, 0].astype(jnp.int32) * self.C
                    + ev_codes[:, 1].astype(jnp.int32))      # [BH]
            blk_h = jnp.repeat(state.n_cand // bs, Hk)
            jix = (idx, jnp.arange(BH), blk_h, pair)
            state = state.replace(
                jhist=pq.jhist_increment(state.jhist, jix))
        return hidden, state

    def _decode_first_body(self, layers, embed, state, toks, n_sel_h):
        m = self.cfg.model
        hidden = jnp.take(embed, toks, axis=0)  # [B, E] (bf16 table)
        cos, sin = llama.rope_cos_sin(m, state.pos)
        lp = jax.tree_util.tree_map(lambda a: a[0], layers)
        q, k, v, blk = self._score_topk_b(
            lp, state, jnp.asarray(0, jnp.int32), hidden, cos, sin, n_sel_h)
        return hidden, cos, sin, q, k, v, blk

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_first_b(self, layers, embed, state, toks, n_sel_h):
        # `embed` MUST be an operand, not a closure over self.params: a
        # closed-over [V, E] table (1 GB at Llama vocab) is baked into the
        # HLO as a constant — the serialized executable was 819 MB, remote
        # compiles took ~20 min and killed the dev tunnel (broken pipe).
        return self._decode_first_body(layers, embed, state, toks, n_sel_h)

    def _decode_fused_body(self, layers, state, idx, hidden, cos, sin, q,
                           k_new, v_new, blk_idx, slots, miss_pos, staged,
                           cache, n_sel_h, n_tail_h, fill, do_append):
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        lp_next = jax.tree_util.tree_map(lambda a: a[idx + 1], layers)
        hidden, state = self._attn_tail_b(
            lp, state, idx, hidden, q, k_new, v_new, blk_idx, slots,
            miss_pos, staged, cache, n_sel_h, n_tail_h, fill, do_append)
        q2, k2, v2, blk2 = self._score_topk_b(
            lp_next, state, idx + 1, hidden, cos, sin, n_sel_h)
        return hidden, state, q2, k2, v2, blk2

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _decode_fused_b(self, layers, state, idx, hidden, cos, sin, q,
                        k_new, v_new, blk_idx, slots, miss_pos, staged,
                        cache, n_sel_h, n_tail_h, fill, do_append):
        return self._decode_fused_body(
            layers, state, idx, hidden, cos, sin, q, k_new, v_new, blk_idx,
            slots, miss_pos, staged, cache, n_sel_h, n_tail_h, fill,
            do_append)

    def _decode_last_body(self, layers, params_out, state, idx, hidden, q,
                          k_new, v_new, blk_idx, slots, miss_pos, staged,
                          cache, n_sel_h, n_tail_h, fill, do_append,
                          key=None):
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        hidden, state = self._attn_tail_b(
            lp, state, idx, hidden, q, k_new, v_new, blk_idx, slots,
            miss_pos, staged, cache, n_sel_h, n_tail_h, fill, do_append)
        m = self.cfg.model
        last = llama.rms_norm(hidden, params_out["final_norm"],
                              m.rms_norm_eps)
        logits = llama.lm_head_logits(params_out, last)
        if self.sampler is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = self.sampler(key, logits)
        state = state.replace(
            n_cand=state.n_cand + 1,
            ring_ptr=(state.ring_ptr + 1) % self.budget.local,
            pos=state.pos + 1)
        return state, nxt

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
    def _decode_last_b(self, layers, params_out, state, idx, hidden, q,
                       k_new, v_new, blk_idx, slots, miss_pos, staged,
                       cache, n_sel_h, n_tail_h, fill, do_append, key=None):
        return self._decode_last_body(
            layers, params_out, state, idx, hidden, q, k_new, v_new,
            blk_idx, slots, miss_pos, staged, cache, n_sel_h, n_tail_h,
            fill, do_append, key=key)

    # -- run setup / admission / retirement -----------------------------------

    def _setup(self, max_prompt_len: int, max_new_tokens: int) -> None:
        """Pool-wide run state: one bucketed prefill length P (and thus
        one budget) shared by every slot, the shared host store sized to
        B block-id ranges, the batched device state, and the per-slot
        host counters."""
        cfg = self.cfg
        m = cfg.model
        from pqcache_tpu.runtime.generate import (bucket_length,
                                                  chunk_plan_capped)
        P = bucket_length(max_prompt_len, cfg.runtime.prefill_bucket)
        P = min(P, cfg.runtime.max_seq_len)
        if max_prompt_len > P:
            raise ValueError(f"prompt {max_prompt_len} exceeds "
                             f"max_seq_len {P}")
        ch = self._se.prefill_chunk
        chunked = bool(ch) and P > ch
        if chunked:
            P, ch = chunk_plan_capped(P, ch, cfg.runtime.max_seq_len)
            chunked = ch > 0
        self._P, self._ch, self._chunked = P, ch, chunked
        self.budget = b = compute_budget(cfg.budget, P, max_new_tokens)
        self._se.budget = b
        self.max_new = max_new_tokens
        if b.n_tail_max % self.bs:
            raise ValueError(f"n_tail_max {b.n_tail_max} not divisible by "
                             f"cache block {self.bs}")
        self._blocks_per_slot = b.n_tail_max // self.bs
        self.timings = {"host_s": 0.0, "wait_s": 0.0, "decode_s": 0.0,
                        "steps": 0}
        self.store = HostKVStore(
            m.num_layers, m.num_kv_heads, self.B * b.n_tail_max, m.head_dim,
            block_size=self.bs,
            hbm_cache_tokens=cfg.cache.hbm_cache_tokens,
            cache_topk_blocks=cfg.cache.cache_topk_blocks,
            dtype=jnp.int8 if self.kv_int8 else self.dtype)
        self.bstate = self._init_bstate(b)
        B = self.B
        self._stored = np.zeros((B,), np.int64)   # prefill rows per slot
        self._valid = np.zeros((B,), np.int64)    # complete-block rows
        self._fill = np.zeros((B,), np.int64)     # tail cursor
        self._ncand = np.zeros((B,), np.int64)
        self._rng = (jax.random.PRNGKey(cfg.runtime.sample_seed)
                     if self.sampler is not None else None)
        self.slots: List[_OSlot] = [_OSlot() for _ in range(B)]
        self._head_slot = np.repeat(np.arange(B), self.H_kv)   # [B·H_kv]
        self._blk_stale = None

    def _admission_start(self, slot: int, seq_id: int,
                         ids: np.ndarray) -> _OAdmission:
        """Open slot `slot` for `ids`: slot-prefixed leaf ids route the
        prefill's offload into the SHARED store; the returned admission's
        generator is advanced one bounded device unit per _admission_step."""
        b = self.budget
        ids = np.asarray(ids, np.int32)
        true_len = int(ids.shape[0])
        pad = self._P - true_len
        if pad < 0:
            raise ValueError(f"prompt {true_len} > pool prefill {self._P}")
        n_store = true_len - b.sink
        base = slot * self._blocks_per_slot
        rem_parts: dict = {}

        def offload_fn(l, k_full, v_full, st):
            if self.kv_int8:
                k_full, v_full = self._se._quant_layer_kv(
                    k_full, v_full, st.k_scale[l], st.v_scale[l])
            part = self.store.offload_blocks_device(
                l, k_full, v_full, n_store, pad + b.sink, id_base=base)
            if part is not None:
                # zero-pad the remainder to a full block for the state
                # tail insert (rows past fill are cursor-hidden)
                part = jnp.pad(
                    part, ((0, 0), (0, self.bs - part.shape[1]), (0, 0)))
            rem_parts[l] = part

        sstate = self._se._init_state(b)
        gen = self._se._prefill_pass_steps(
            sstate, ids, self._P, pad, true_len, self._chunked, self._ch,
            offload_fn, self.store.sync_transfers)
        return _OAdmission(slot=slot, seq_id=seq_id, gen=gen,
                           rem_parts=rem_parts, n_store=n_store,
                           true_len=true_len)

    def _admission_step(self, adm: _OAdmission) -> bool:
        """Advance one prefill unit; True when the admission finished
        (first token sampled, state folded into the batched state, slot
        live)."""
        try:
            next(adm.gen)
            return False
        except StopIteration as e:
            logits, sstate = e.value
        if self.sampler is None:
            first = int(jnp.argmax(logits))
        else:
            self._rng, sub = jax.random.split(self._rng)
            first = int(self.sampler(sub, logits))
        L = self.cfg.model.num_layers
        if adm.rem_parts and adm.rem_parts[0] is not None:
            rem = jnp.stack([adm.rem_parts[l] for l in range(L)])
        else:
            rem = jnp.zeros((L, self.H_kv, self.bs, 2 * self.D),
                            self.bstate.tail.dtype)
        self.bstate = self._insert(self.bstate, sstate, adm.slot, rem)
        # stale selections for this slot's rows were computed from the
        # RETIRED occupant's state — force one exact re-seeding step
        self._blk_stale = None
        b = self.budget
        n_full = adm.n_store // self.bs
        self._stored[adm.slot] = adm.n_store
        self._valid[adm.slot] = n_full * self.bs
        self._fill[adm.slot] = adm.n_store - n_full * self.bs
        self._ncand[adm.slot] = max(adm.true_len - b.sink - b.local, 0)
        self.slots[adm.slot] = _OSlot(seq_id=adm.seq_id, tokens=[first],
                                      done=False)
        return True

    def _retire(self, slot: int) -> None:
        """Free a finished slot: invalidate its block-id range in the
        shared store (pinned leaves released, LFU entries erased, cache
        slots recycled) so the next admission can reuse the range without
        stale rows classifying as hits; zero the host counters so the
        decode step masks the slot out (n_sel = n_tail = 0, no append)."""
        base = slot * self._blocks_per_slot
        self.store.invalidate_blocks(
            np.arange(base, base + self._blocks_per_slot, dtype=np.int32))
        self._stored[slot] = 0
        self._valid[slot] = 0
        self._fill[slot] = 0
        self._ncand[slot] = 0
        self.slots[slot] = _OSlot()

    # -- decode step -----------------------------------------------------------

    def _decode_step(self, next_toks: np.ndarray,
                     active: np.ndarray) -> np.ndarray:
        """One batched decode step over all B slots (inactive slots are
        masked: zero selection/tail, no tail append; their sampled token
        is discarded by the caller). Returns the next tokens [B]."""
        import time
        t_step = time.perf_counter()
        B, Hk, L = self.B, self.H_kv, self.cfg.model.num_layers
        n_sel = np.minimum(self._ncand, self._valid)
        n_tail = np.maximum(self._ncand - self._valid, 0)
        do_app = (self._ncand >= self._stored) & active
        n_sel_h = jnp.asarray(np.repeat(n_sel, Hk), jnp.int32)
        n_tail_h = jnp.asarray(np.repeat(n_tail, Hk), jnp.int32)
        fill_j = jnp.asarray(self._fill, jnp.int32)
        do_app_j = jnp.asarray(do_app)
        layers = self.params["layers"]
        params_out = llama.lm_head_params(self.params)
        hidden, cos, sin, q, k_new, v_new, blk = self._decode_first_b(
            layers, self.params["embed"], self.bstate,
            jnp.asarray(next_toks, jnp.int32), n_sel_h)
        head_slot = self._head_slot
        cb_h = (self._valid // self.bs)[head_slot]        # complete blocks
        base_h = (np.arange(B) * self._blocks_per_slot)[head_slot]
        act_h = active[head_slot]

        def classify(l, blk_np):
            ok = (blk_np < cb_h[:, None]) & act_h[:, None]
            gids = np.where(ok, blk_np + base_h[:, None], 0)
            return self.store.classify_blocks(l, gids, ok=ok)

        if self.stale and self._blk_stale is not None:
            from pqcache_tpu.runtime.host_offload import _pack_sel
            new_blks = [blk]        # layer 0's selection for step t+1
            for l in range(L):
                t1 = time.perf_counter()
                # classify lazily per layer — an up-front pass held every
                # layer's staged miss stack in HBM at once and OOMed at
                # 192k (see offload_engine.stream's stale branch)
                slots_, miss_, staged, cache = classify(
                    l, self._blk_stale[l])
                self.timings["host_s"] += time.perf_counter() - t1
                li = jnp.asarray(l, jnp.int32)
                args = (jnp.asarray(self._blk_stale[l]),
                        jnp.asarray(slots_), jnp.asarray(miss_), staged,
                        cache, n_sel_h, n_tail_h, fill_j, do_app_j)
                if l < L - 1:
                    (hidden, self.bstate, q, k_new, v_new, blk
                     ) = self._decode_fused_b(
                        layers, self.bstate, li, hidden, cos, sin, q,
                        k_new, v_new, *args)
                    new_blks.append(blk)
                    if staged.shape[0] >= 256:
                        # adaptive backpressure under heavy miss staging
                        # (cache ≪ selection working set): drain this
                        # layer before staging the next
                        t0 = time.perf_counter()
                        np.asarray(k_new)
                        self.timings["wait_s"] += time.perf_counter() - t0
                else:
                    if self.sampler is not None:
                        self._rng, sub = jax.random.split(self._rng)
                        self.bstate, nxt = self._decode_last_b(
                            layers, params_out, self.bstate, li, hidden, q,
                            k_new, v_new, *args, key=sub)
                    else:
                        self.bstate, nxt = self._decode_last_b(
                            layers, params_out, self.bstate, li, hidden, q,
                            k_new, v_new, *args)
            t0 = time.perf_counter()
            flat = np.asarray(_pack_sel(L)(nxt, *new_blks))   # ONE pull
            self.timings["wait_s"] += time.perf_counter() - t0
            BH, kb = new_blks[0].shape
            self._blk_stale = flat[: L * BH * kb].reshape(L, BH, kb)
            nxt = flat[L * BH * kb:]
        else:
            rec = []
            for l in range(L):
                t0 = time.perf_counter()
                blk_np = np.asarray(blk)                      # sync
                t1 = time.perf_counter()
                self.timings["wait_s"] += t1 - t0
                rec.append(blk_np)
                slots_, miss_, staged, cache = classify(l, blk_np)
                self.timings["host_s"] += time.perf_counter() - t1
                li = jnp.asarray(l, jnp.int32)
                args = (jnp.asarray(blk_np), jnp.asarray(slots_),
                        jnp.asarray(miss_), staged, cache, n_sel_h,
                        n_tail_h, fill_j, do_app_j)
                if l < L - 1:
                    (hidden, self.bstate, q, k_new, v_new, blk
                     ) = self._decode_fused_b(
                        layers, self.bstate, li, hidden, cos, sin, q, k_new,
                        v_new, *args)
                else:
                    if self.sampler is not None:
                        self._rng, sub = jax.random.split(self._rng)
                        self.bstate, nxt = self._decode_last_b(
                            layers, params_out, self.bstate, li, hidden, q,
                            k_new, v_new, *args, key=sub)
                    else:
                        self.bstate, nxt = self._decode_last_b(
                            layers, params_out, self.bstate, li, hidden, q,
                            k_new, v_new, *args)
            self._blk_stale = np.stack(rec) if self.stale else None
            nxt = np.asarray(nxt)
        self._ncand += active.astype(np.int64)
        self._fill += do_app.astype(np.int64)
        for b_i in range(B):
            if self._fill[b_i] == self.bs:
                # flush the filled tail block to a pinned leaf
                ext = self._extract_tail(self.bstate.tail, b_i)
                leaves = [ext[l] for l in range(L)]
                hosted = (jax.device_put(leaves, self.store._s_host)
                          if self.store._s_host is not None else leaves)
                gid = (b_i * self._blocks_per_slot
                       + int(self._valid[b_i]) // self.bs)
                for l in range(L):
                    self.store.adopt_block_device(l, hosted[l],
                                                  block_id=gid)
                self._valid[b_i] += self.bs
                self._fill[b_i] = 0
        self.timings["decode_s"] += time.perf_counter() - t_step
        self.timings["steps"] += 1
        return nxt

    # -- public API ----------------------------------------------------------

    def generate_batch(self, prompts, max_new_tokens: int,
                       eos_ids=()) -> List[list]:
        """Decode B prompts concurrently on the shared offload tier (all
        slots prefilled up front). Returns a list of token lists."""
        if len(prompts) != self.B:
            raise ValueError(f"need exactly {self.B} prompts, "
                             f"got {len(prompts)}")
        prompts = [np.asarray(p, np.int32) for p in prompts]
        self._setup(max(int(p.shape[0]) for p in prompts), max_new_tokens)
        for slot, ids in enumerate(prompts):
            adm = self._admission_start(slot, slot, ids)
            while not self._admission_step(adm):
                pass
        for s in self.slots:
            if s.tokens[-1] in eos_ids or max_new_tokens <= 1:
                s.done = True
        while any(not s.done for s in self.slots):
            active = np.asarray([not s.done for s in self.slots])
            next_toks = np.asarray([s.tokens[-1] for s in self.slots],
                                   np.int32)
            nxt = self._decode_step(next_toks, active)
            for b_i, s in enumerate(self.slots):
                if s.done:
                    continue
                t = int(nxt[b_i])
                s.tokens.append(t)
                if t in eos_ids or len(s.tokens) >= max_new_tokens:
                    s.done = True
        self.store.flush()
        return [s.tokens for s in self.slots]

    def serve(self, requests: Iterable[tuple[int, np.ndarray]],
              max_new_tokens: int, eos_ids=(),
              arrivals: Optional[dict] = None,
              timing: Optional[dict] = None,
              prefill_len: Optional[int] = None) -> dict[int, list]:
        """Continuous batched serving on the offload tier: (seq_id,
        prompt_ids) requests admit FIFO into free slots, ONE prefill unit
        advances per decode step (running streams never stall more than
        one bounded device program), finished slots retire — their
        block-id range is invalidated in the shared store and reused by
        the next admission. Returns seq_id → tokens.

        arrivals / timing: same contract as BatchEngine.run — simulated
        arrival schedule, and per-sequence wall-clock events ("arrive",
        "admit", "first", "done", "token_times")."""
        import time
        queue = [(sid, np.asarray(ids, np.int32)) for sid, ids in requests]
        if not queue:
            return {}
        self._setup(prefill_len if prefill_len is not None
                    else max(int(p.shape[0]) for _, p in queue),
                    max_new_tokens)
        arrivals = arrivals or {}
        results: dict[int, list] = {}
        t0 = time.perf_counter()
        now = lambda: time.perf_counter() - t0

        def rec(sid, key, val):
            if timing is not None:
                timing.setdefault(sid, {})[key] = val

        pending: Optional[_OAdmission] = None
        while queue or pending is not None or any(
                not s.done for s in self.slots):
            if pending is None and queue and any(s.done for s in self.slots):
                # first ARRIVED request, not the FIFO head: a not-yet-
                # arrived head must not block arrived requests behind it
                t_now = now()
                q_i = next((i for i, (sid, _) in enumerate(queue)
                            if t_now >= arrivals.get(sid, 0.0)), None)
                if q_i is not None:
                    sid, ids = queue.pop(q_i)
                    slot = next(i for i, s in enumerate(self.slots)
                                if s.done)
                    rec(sid, "arrive", arrivals.get(sid, 0.0))
                    rec(sid, "admit", now())
                    pending = self._admission_start(slot, sid, ids)
            active = np.asarray([not s.done for s in self.slots])
            if active.any():
                next_toks = np.asarray(
                    [s.tokens[-1] if not s.done else 0 for s in self.slots],
                    np.int32)
                nxt = self._decode_step(next_toks, active)
                t_step = now()
                for b_i, s in enumerate(self.slots):
                    if s.done:
                        continue
                    t = int(nxt[b_i])
                    s.tokens.append(t)
                    if timing is not None:
                        timing[s.seq_id]["token_times"].append(t_step)
                    if t in eos_ids or len(s.tokens) >= max_new_tokens:
                        results[s.seq_id] = s.tokens
                        rec(s.seq_id, "done", t_step)
                        self._retire(b_i)
            if pending is not None:
                if self._admission_step(pending):
                    s = self.slots[pending.slot]
                    rec(pending.seq_id, "first", now())
                    if timing is not None:
                        timing[pending.seq_id]["token_times"] = [
                            timing[pending.seq_id]["first"]]
                    if s.tokens[-1] in eos_ids or max_new_tokens <= 1:
                        results[s.seq_id] = s.tokens
                        rec(s.seq_id, "done", now())
                        self._retire(pending.slot)
                    pending = None
            elif not active.any() and queue:
                # pool idle, nothing arrived yet: sleep to earliest arrival
                nxt_t = min(arrivals.get(sid, 0.0) for sid, _ in queue)
                time.sleep(max(0.0, nxt_t - now()))
        self.store.flush()
        return results
