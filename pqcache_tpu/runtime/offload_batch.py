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

import functools
from typing import List, Optional

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


class BatchOffloadEngine:
    """Fixed-pool batch decode over the shared host store (B slots)."""

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
            (h_norm @ lp["wq"]).reshape(B, H, D), cos, sin)
        k_new = _apply_rope_batched(
            (h_norm @ lp["wk"]).reshape(B, Hk, D), cos, sin)
        v_new = (h_norm @ lp["wv"]).reshape(B, Hk, D)
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
        hidden = hidden + attn @ lp["wo"]
        h2 = llama.rms_norm(hidden, lp["ln2"], m.rms_norm_eps)
        hidden = hidden + llama.mlp(lp, h2, chunk=m.mlp_chunk)

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

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_first_b(self, layers, state, toks, n_sel_h):
        m = self.cfg.model
        hidden = jnp.take(self.params["embed"], toks, axis=0)  # [B, E]
        cos, sin = llama.rope_cos_sin(m, state.pos)
        lp = jax.tree_util.tree_map(lambda a: a[0], layers)
        q, k, v, blk = self._score_topk_b(
            lp, state, jnp.asarray(0, jnp.int32), hidden, cos, sin, n_sel_h)
        return hidden, cos, sin, q, k, v, blk

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _decode_fused_b(self, layers, state, idx, hidden, cos, sin, q,
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

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
    def _decode_last_b(self, layers, params_out, state, idx, hidden, q,
                       k_new, v_new, blk_idx, slots, miss_pos, staged,
                       cache, n_sel_h, n_tail_h, fill, do_append, key=None):
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        hidden, state = self._attn_tail_b(
            lp, state, idx, hidden, q, k_new, v_new, blk_idx, slots,
            miss_pos, staged, cache, n_sel_h, n_tail_h, fill, do_append)
        m = self.cfg.model
        last = llama.rms_norm(hidden, params_out["final_norm"],
                              m.rms_norm_eps)
        logits = (last @ params_out["lm_head"]).astype(jnp.float32)
        if self.sampler is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            nxt = self.sampler(key, logits)
        state = state.replace(
            n_cand=state.n_cand + 1,
            ring_ptr=(state.ring_ptr + 1) % self.budget.local,
            pos=state.pos + 1)
        return state, nxt

    # -- public API ----------------------------------------------------------

    def generate_batch(self, prompts, max_new_tokens: int,
                       eos_ids=()) -> List[list]:
        """Decode B prompts concurrently on the shared offload tier.
        Returns a list of token lists (one per prompt)."""
        import time
        cfg = self.cfg
        m = cfg.model
        B = self.B
        if len(prompts) != B:
            raise ValueError(f"need exactly {B} prompts, got {len(prompts)}")
        prompts = [np.asarray(p, np.int32) for p in prompts]
        true_lens = [int(p.shape[0]) for p in prompts]
        from pqcache_tpu.runtime.generate import (bucket_length,
                                                  chunk_plan_capped)
        P = bucket_length(max(true_lens), cfg.runtime.prefill_bucket)
        P = min(P, cfg.runtime.max_seq_len)
        if max(true_lens) > P:
            raise ValueError(f"prompt {max(true_lens)} exceeds "
                             f"max_seq_len {P}")
        ch = self._se.prefill_chunk
        chunked = bool(ch) and P > ch
        if chunked:
            P, ch = chunk_plan_capped(P, ch, cfg.runtime.max_seq_len)
            chunked = ch > 0
        self.budget = b = compute_budget(cfg.budget, P, max_new_tokens)
        self._se.budget = b
        if b.n_tail_max % self.bs:
            raise ValueError(f"n_tail_max {b.n_tail_max} not divisible by "
                             f"cache block {self.bs}")
        blocks_per_slot = b.n_tail_max // self.bs
        self.store = None
        self.timings = {"host_s": 0.0, "wait_s": 0.0, "decode_s": 0.0,
                        "steps": 0}
        store = HostKVStore(
            m.num_layers, m.num_kv_heads, B * b.n_tail_max, m.head_dim,
            block_size=self.bs,
            hbm_cache_tokens=cfg.cache.hbm_cache_tokens,
            cache_topk_blocks=cfg.cache.cache_topk_blocks,
            dtype=jnp.int8 if self.kv_int8 else self.dtype)

        bstate = self._init_bstate(b)
        L = m.num_layers
        stored = np.zeros((B,), np.int64)   # prefill rows per slot (const)
        valid = np.zeros((B,), np.int64)    # complete-block rows, per slot
        fill = np.zeros((B,), np.int64)     # tail cursor, per slot
        n_cand_py = np.zeros((B,), np.int64)
        rng = (jax.random.PRNGKey(cfg.runtime.sample_seed)
               if self.sampler is not None else None)
        firsts = []
        for slot, ids in enumerate(prompts):
            true_len = true_lens[slot]
            pad = P - true_len
            n_store = true_len - b.sink
            base = slot * blocks_per_slot
            rem_parts: dict = {}

            def offload_fn(l, k_full, v_full, st, _slot=slot, _pad=pad,
                           _n=n_store, _base=base, _rem=rem_parts):
                if self.kv_int8:
                    k_full, v_full = self._se._quant_layer_kv(
                        k_full, v_full, st.k_scale[l], st.v_scale[l])
                part = store.offload_blocks_device(
                    l, k_full, v_full, _n, _pad + b.sink, id_base=_base)
                if part is not None:
                    # zero-pad the remainder to a full block for the state
                    # tail insert (rows past fill are cursor-hidden)
                    part = jnp.pad(
                        part, ((0, 0), (0, self.bs - part.shape[1]),
                               (0, 0)))
                _rem[l] = part

            sstate = self._se._init_state(b)
            logits, sstate = self._se._prefill_pass(
                sstate, ids, P, pad, true_len, chunked, ch, offload_fn,
                store.sync_transfers)
            if self.sampler is None:
                firsts.append(int(jnp.argmax(logits)))
            else:
                rng, sub = jax.random.split(rng)
                firsts.append(int(self.sampler(sub, logits)))
            n_full = n_store // self.bs
            rem_n = n_store - n_full * self.bs
            if rem_parts and rem_parts[0] is not None:
                rem = jnp.stack([rem_parts[l] for l in range(L)])
            else:
                rem = jnp.zeros((L, self.H_kv, self.bs, 2 * self.D),
                                bstate.tail.dtype)
            bstate = self._insert(bstate, sstate, slot, rem)
            del sstate
            stored[slot] = n_store
            valid[slot] = n_full * self.bs
            fill[slot] = rem_n
            n_cand_py[slot] = max(true_len - b.sink - b.local, 0)

        results = [[t] for t in firsts]
        done = [t in eos_ids for t in firsts]
        next_toks = np.asarray(firsts, np.int32)
        params_out = {"final_norm": self.params["final_norm"],
                      "lm_head": self.params["lm_head"]}
        layers = self.params["layers"]
        Hk = self.H_kv
        head_slot = np.repeat(np.arange(B), Hk)           # [B·H_kv]

        for _ in range(max_new_tokens - 1):
            if all(done):
                break
            t_step = time.perf_counter()
            n_sel = np.minimum(n_cand_py, valid)
            n_tail = np.maximum(n_cand_py - valid, 0)
            do_app = n_cand_py >= stored
            n_sel_h = jnp.asarray(np.repeat(n_sel, Hk), jnp.int32)
            n_tail_h = jnp.asarray(np.repeat(n_tail, Hk), jnp.int32)
            fill_j = jnp.asarray(fill, jnp.int32)
            do_app_j = jnp.asarray(do_app)
            hidden, cos, sin, q, k_new, v_new, blk = self._decode_first_b(
                layers, bstate, jnp.asarray(next_toks), n_sel_h)
            cb_h = (valid // self.bs)[head_slot]          # complete blocks
            base_h = (np.arange(B) * blocks_per_slot)[head_slot]
            for l in range(L):
                t0 = time.perf_counter()
                blk_np = np.asarray(blk)                  # sync
                t1 = time.perf_counter()
                self.timings["wait_s"] += t1 - t0
                ok = blk_np < cb_h[:, None]
                gids = np.where(ok, blk_np + base_h[:, None], 0)
                slots_, miss_, staged, cache = store.classify_blocks(
                    l, gids, ok=ok)
                self.timings["host_s"] += time.perf_counter() - t1
                li = jnp.asarray(l, jnp.int32)
                args = (jnp.asarray(blk_np), jnp.asarray(slots_),
                        jnp.asarray(miss_), staged, cache, n_sel_h,
                        n_tail_h, fill_j, do_app_j)
                if l < L - 1:
                    (hidden, bstate, q, k_new, v_new, blk
                     ) = self._decode_fused_b(
                        layers, bstate, li, hidden, cos, sin, q, k_new,
                        v_new, *args)
                else:
                    if self.sampler is not None:
                        rng, sub = jax.random.split(rng)
                        bstate, nxt = self._decode_last_b(
                            layers, params_out, bstate, li, hidden, q,
                            k_new, v_new, *args, key=sub)
                    else:
                        bstate, nxt = self._decode_last_b(
                            layers, params_out, bstate, li, hidden, q,
                            k_new, v_new, *args)
            next_toks = np.asarray(nxt)
            n_cand_py += 1
            fill += do_app.astype(np.int64)
            for b_i in range(B):
                if fill[b_i] == self.bs:
                    # flush the filled tail block to a pinned leaf
                    ext = self._extract_tail(bstate.tail, b_i)
                    leaves = [ext[l] for l in range(L)]
                    hosted = (jax.device_put(leaves, store._s_host)
                              if store._s_host is not None else leaves)
                    gid = b_i * blocks_per_slot + int(valid[b_i]) // self.bs
                    for l in range(L):
                        store.adopt_block_device(l, hosted[l], block_id=gid)
                    valid[b_i] += self.bs
                    fill[b_i] = 0
            for b_i in range(B):
                if done[b_i]:
                    continue
                t = int(next_toks[b_i])
                results[b_i].append(t)
                if t in eos_ids or len(results[b_i]) >= max_new_tokens:
                    done[b_i] = True
            self.timings["decode_s"] += time.perf_counter() - t_step
            self.timings["steps"] += 1
        store.flush()
        self.store = store
        return results
