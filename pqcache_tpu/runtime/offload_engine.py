"""Offload-tier PQ engine v3: block-granular pinned-host KV, decode driven
layer-at-a-time.

For contexts whose KV exceeds per-chip HBM, this engine mirrors the
reference's execution shape (pq_search.py decode path): per layer, the
device computes ADC scores over the HBM-resident PQ codes and a
BLOCK-granular top-k; the host classifies hit blocks vs the DEVICE-resident
cache, stages miss blocks with one batched pinned→device transfer
(cache_manager.py:339-362's pinned staging, at measured ~10 GB/s), and the
device assembles the attention window and runs the rest of the layer. The
local window and sink stay in HBM (a ring buffer, cache_manager.py:212-228);
the growing candidate tail block lives on device inside the store and is
always attended, so generated tokens are never unreachable while their
block completes.

Dispatch structure: attention of layer l and the Q/K/V + ADC/top-k of
layer l+1 are fused into ONE device program, so each decode layer costs a
single host round trip (the classify → stage → launch sequence); LFU
admission and block promotion run on the store's worker thread overlapped
with device compute (the reference's side-stream promotion,
cache_manager.py:364-418).

The within-HBM path (policies/pq_search.py + runtime/generate.py) is the
fast path; this tier trades per-token host round trips for unbounded
context, exactly as the reference trades PCIe traffic for GPU memory.
"""

from __future__ import annotations

import functools
import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core import pq
from pqcache_tpu.core.budget import Budget, compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.ops.attention_xla import decode_window_attention_segments
from pqcache_tpu.ops.dispatch import (dense_prefill_attention,
                                      prefill_chunk_attention)
from pqcache_tpu.runtime.host_offload import HostKVStore, assemble_blocks


from typing import Optional


@struct.dataclass
class OffloadPQState:
    k_sink: jax.Array    # [L, H_kv, sink, D]
    v_sink: jax.Array
    k_local: jax.Array   # [L, H_kv, local, D] ring buffer
    v_local: jax.Array
    codes: jax.Array     # [L, H_kv, S, N_cand_max] uint8
    centroids: jax.Array  # [L, H_kv, S, C, d_lift]
    phi: jax.Array
    n_cand: jax.Array
    ring_ptr: jax.Array
    pos: jax.Array
    jhist: Optional[jax.Array] = None  # [L, H_kv, NB, C²] (see core/pq.py)
    # int8 store (cache.kv_dtype="int8"): per-(layer, head, channel) dequant
    # scales frozen at prefill (core/quant.py). The HOST leaves, the HBM
    # block cache and the device tail all hold int8 rows — the tier's
    # marginal cost IS transfer bytes (the reference pays PCIe for fp16
    # buffers, cache_manager.py:89-100), so int8 halves exactly the costs
    # that define it: host RAM, host↔HBM DMA, cache footprint. Sink and
    # local ring stay bf16 (always-attended, full precision).
    k_scale: Optional[jax.Array] = None  # [L, H_kv, 1, D] f32
    v_scale: Optional[jax.Array] = None  # [L, H_kv, 1, D] f32
    # batch-as-heads (runtime/offload_batch.py): per-slot growing tail
    # blocks live in STATE (the single-sequence engine keeps its one tail
    # in the store) so the per-layer fused program can append/attend them
    # with per-slot fill cursors; filled slots flush to pinned leaves.
    tail: Optional[jax.Array] = None     # [L, B·H_kv, bs, 2D] store dtype


class OffloadEngine:
    """Single-sequence pq_search generation with host-offloaded KV."""

    def __init__(self, cfg: EngineConfig, params: dict, dtype=jnp.bfloat16):
        assert cfg.runtime.policy == "pq_search"
        if cfg.cache.kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"unsupported kv_dtype {cfg.cache.kv_dtype}")
        # int8 store: quantization is the ENGINE's job (scales live in the
        # state; rows are quantized before they reach the store and
        # dequantized at window assembly) — the HostKVStore just carries
        # int8 leaves, halving host RAM, DMA bytes, and cache HBM.
        self.kv_int8 = cfg.cache.kv_dtype == "int8"
        self.cfg = cfg
        self.params = params
        self.dtype = dtype
        m = cfg.model
        self.S = cfg.pq.n_subvec_per_head
        self.C = cfg.pq.n_centroids
        self.d_sub = m.head_dim // self.S
        self.metric = cfg.pq.metric
        self.bs = cfg.cache.block_size
        # chunked prefill slab (rows); 0 = single-shot full-length prefill.
        # Static on self (jit keying): set once from the frozen config.
        self.prefill_chunk = cfg.runtime.prefill_chunk
        # joint-histogram block scorer (core/pq.py): block selection as one
        # matmul instead of an O(T) ADC code sweep — same conditions as
        # policies/pq_search.py use_jhist; the offload tier's selection is
        # block-granular at the cache block size already
        self.use_jhist = (cfg.pq.scorer == "auto" and self.S == 2
                          and self.metric == "euc" and self.bs <= 256)
        # stochastic decoding (static on self — jit keys on it)
        from pqcache_tpu.core.sampling import make_sampler
        self.sampler = make_sampler(cfg.runtime.temperature,
                                    cfg.runtime.top_k, cfg.runtime.top_p)
        # one-step-stale block selection (config.CacheConfig.stale_select):
        # O(1) blocking syncs per decode step instead of one per layer
        self.stale = cfg.cache.stale_select
        # set by parallel/offload_tp.py: traced bodies run per-shard under
        # shard_map; this axis psum-reduces the row-parallel projections
        # and offsets the kmeans++ group seeds to the global head ids
        self.tp_axis: Optional[str] = None
        # diagnostics: set to [] before generate() to record each decode
        # step's per-layer block selections (exact mode only) — used by
        # synth_quality --offload-locality to measure selection overlap
        self.selection_log: Optional[list] = None

    def _budget(self, P: int, max_new: int) -> Budget:
        return compute_budget(self.cfg.budget, P, max_new)

    def _init_state(self, b: Budget) -> OffloadPQState:
        m = self.cfg.model
        L, H_kv, D = m.num_layers, m.num_kv_heads, m.head_dim
        d_lift = self.d_sub + (1 if self.metric == "ip" else 0)
        z = lambda *s: jnp.zeros(s, self.dtype)
        return OffloadPQState(
            k_sink=z(L, H_kv, b.sink, D), v_sink=z(L, H_kv, b.sink, D),
            k_local=z(L, H_kv, b.local, D), v_local=z(L, H_kv, b.local, D),
            codes=jnp.zeros((L, H_kv, self.S, b.n_tail_max), jnp.uint8),
            centroids=jnp.zeros((L, H_kv, self.S, self.C, d_lift),
                                jnp.float32),
            phi=jnp.zeros((L, H_kv * self.S, 1, 1), jnp.float32),
            n_cand=jnp.zeros((), jnp.int32),
            ring_ptr=jnp.zeros((), jnp.int32),
            pos=jnp.zeros((), jnp.int32),
            jhist=(jnp.zeros((L, H_kv, b.n_tail_max // self.bs,
                              self.C * self.C), pq.jhist_dtype(self.bs))
                   if self.use_jhist else None),
            k_scale=(jnp.ones((L, H_kv, 1, D), jnp.float32)
                     if self.kv_int8 else None),
            v_scale=(jnp.ones((L, H_kv, 1, D), jnp.float32)
                     if self.kv_int8 else None))

    # -- jitted device programs -------------------------------------------

    def _tail_update(self, state, idx, k, v, pad_len, true_len):
        """Shared prefill tail (traced): roll out the left pad, split
        sink / local ring / candidate tail, train the layer's PQ codebooks,
        write the layer state. k/v [H_kv, P, D] raw (pad rows at the
        front). Returns the state only — the host store offloads the
        candidate rows straight from k/v (offload_layer_device slices at
        pad+sink per chunk; materializing a full-length interleaved copy
        here was the ~1 GiB that OOMed 256k prefill)."""
        cfg = self.cfg.model
        b = self.budget
        P = k.shape[1]
        shift = -pad_len.astype(jnp.int32)
        k_r, v_r = jnp.roll(k, shift, axis=1), jnp.roll(v, shift, axis=1)
        k_tail, v_tail = k_r[:, b.sink:], v_r[:, b.sink:]
        n_valid_tail = (true_len - b.sink).astype(jnp.int32)

        xb = self._to_groups(k_tail)
        if self.metric == "ip":
            xb, phi = pq.ip2l2_lift(xb, n_valid_tail)
        else:
            phi = jnp.zeros_like(state.phi[0])
        # head-sharded callers seed each group by its GLOBAL id so the
        # sharded centroids reproduce the single-device ones exactly
        goff = 0
        if self.tp_axis is not None:
            goff = (jax.lax.axis_index(self.tp_axis)
                    * cfg.num_kv_heads * self.S)
        res = pq.kmeans(xb, self.C, iters=self.cfg.pq.kmeans_iters,
                        seed=self.cfg.pq.kmeans_seed, valid_len=n_valid_tail,
                        group_offset=goff)
        centroids = res.centroids.reshape(
            cfg.num_kv_heads, self.S, self.C, xb.shape[-1])
        codes_src = res.codes.reshape(
            cfg.num_kv_heads, self.S, P - b.sink).astype(jnp.uint8)

        # local ring holds the most recent `local` real tokens, in order
        start_local = n_valid_tail - b.local
        k_local = jax.lax.dynamic_slice(
            k_tail, (0, start_local, 0),
            (cfg.num_kv_heads, b.local, cfg.head_dim))
        v_local = jax.lax.dynamic_slice(
            v_tail, (0, start_local, 0),
            (cfg.num_kv_heads, b.local, cfg.head_dim))

        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None].astype(buf.dtype), (idx,) + (0,) * val.ndim)
        n_cand0 = jnp.maximum(n_valid_tail - b.local, 0)
        if self.kv_int8:
            from pqcache_tpu.core import quant
            ks, vs = quant.kv_channel_scales(k_tail, v_tail, n_valid_tail)
            state = state.replace(k_scale=up(state.k_scale, ks),
                                  v_scale=up(state.v_scale, vs))
        state = state.replace(
            k_sink=up(state.k_sink, k_r[:, :b.sink]),
            v_sink=up(state.v_sink, v_r[:, :b.sink]),
            k_local=up(state.k_local, k_local),
            v_local=up(state.v_local, v_local),
            codes=jax.lax.dynamic_update_slice(
                state.codes, codes_src[None], (idx, 0, 0, 0)),
            centroids=up(state.centroids, centroids),
            phi=up(state.phi, phi),
            n_cand=n_cand0,
            ring_ptr=jnp.zeros((), jnp.int32),
            pos=true_len.astype(jnp.int32))
        if self.use_jhist:
            N_tail = state.codes.shape[-1]
            codes_full = jnp.pad(
                codes_src.astype(jnp.int32),
                ((0, 0), (0, 0), (0, N_tail - codes_src.shape[-1])))
            J = pq.build_joint_hist(codes_full, n_cand0,
                                    n_centroids=self.C, block=self.bs)
            state = state.replace(jhist=up(state.jhist, J))
        return state

    def _prefill_layer_body(self, layers, state, idx, hidden, cos, sin,
                            pad_len, true_len):
        # layer params sliced INSIDE the program (loop-fused reads of the
        # stacked arrays) — materializing per-layer copies on the host
        # side doubled the parameter footprint (+1.75 GB at llama31-width)
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        cfg = self.cfg.model
        P = hidden.shape[0]
        h_norm = llama.rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = llama._qkv(cfg, lp, h_norm, cos, sin)
        out, _ = dense_prefill_attention(q, k, v, pad_len)

        state = self._tail_update(state, idx, k, v, pad_len, true_len)

        attn = out.transpose(1, 0, 2).reshape(P, -1)
        attn_out = llama._mm(attn, lp, "wo")
        if self.tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, self.tp_axis)
        hidden = hidden + attn_out
        h2 = llama.rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
        mlp_out = llama.mlp(lp, h2)
        if self.tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, self.tp_axis)
        hidden = hidden + mlp_out
        return hidden, state, k, v

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _prefill_layer(self, layers, state, idx, hidden, cos, sin, pad_len,
                       true_len):
        return self._prefill_layer_body(layers, state, idx, hidden, cos,
                                        sin, pad_len, true_len)

    # -- chunked (activation-bounded) prefill -------------------------------
    #
    # Full-length prefill OOMs before the KV does: at 192k the q chain
    # ([H, P, D] ≈ 2 GB), h_norm and the flash temps each cost full-length
    # activations. Chunked prefill processes each layer in three passes —
    # (A) full-length K/V via a lax.map over row chunks (K/V themselves are
    # needed whole for attention and clustering, but they are H_kv/H ≈ 1/4
    # the q chain), (B) per-chunk q → flash(q_chunk, K-prefix) → MLP with a
    # STATIC chunk offset (the packed-pair flash grid visits exactly the
    # chunk's causal triangle slab; one compiled program per chunk index,
    # shared across layers and cached persistently), (C) the shared
    # codebook/state tail. Activation transients are bounded at chunk
    # length; there is no recompute (the reference's single-GPU answer is
    # Mistral's 32k-token chunked LN/MLP, mistral_patch.py:246-279, which
    # still materializes full-length attention inputs).

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def _prefill_layer_kv(self, layers, idx, hidden, cos, sin, ch):
        """Pass A: this layer's full-length rope'd K/V, chunk-bounded
        (shared body: models/llama.py kv_full_chunked)."""
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        return llama.kv_full_chunked(self.cfg.model, lp, hidden, cos, sin,
                                     ch)

    @functools.partial(jax.jit, static_argnums=(0, 3, 10),
                       donate_argnums=(4,))
    def _prefill_attn_chunk(self, layers, idx, c0, hidden, k_full, v_full,
                            cos, sin, pad_len, ch):
        """Pass B: attention + MLP for rows [c0, c0+chunk) of layer idx.
        c0 and ch are STATIC: the causal key prefix is a static slice and
        the packed flash grid covers exactly the reachable blocks
        (shared body: models/llama.py attn_mlp_chunk)."""
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        cfg = self.cfg.model
        E = hidden.shape[1]
        H_kv, D = cfg.num_kv_heads, cfg.head_dim
        h_c = jax.lax.dynamic_slice(hidden, (c0, 0), (ch, E))
        cos_c = jax.lax.dynamic_slice(cos, (c0, 0), (ch, cos.shape[1]))
        sin_c = jax.lax.dynamic_slice(sin, (c0, 0), (ch, sin.shape[1]))
        k_pref = jax.lax.slice(k_full, (0, 0, 0), (H_kv, c0 + ch, D))
        v_pref = jax.lax.slice(v_full, (0, 0, 0), (H_kv, c0 + ch, D))
        h_c = llama.attn_mlp_chunk(cfg, lp, h_c, cos_c, sin_c, k_pref,
                                   v_pref, pad_len, c0)
        return jax.lax.dynamic_update_slice(hidden, h_c, (c0, 0))

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
    def _prefill_tail_chunked(self, state, idx, k_full, v_full, pad_len,
                              true_len):
        """Pass C: the shared codebook/state tail on the full-length K/V.
        Returns state only; the caller offloads straight from k/v."""
        return self._tail_update(state, idx, k_full, v_full, pad_len,
                                 true_len)

    def _score_and_topk(self, lp, state, idx, hidden, cos, sin, n_sel):
        """Q/K/V projection + ADC scoring + BLOCK top-k for layer `idx`
        (traced). n_sel: retrievable-candidate count (min(n_cand,
        complete-block tokens))."""
        cfg = self.cfg.model
        b = self.budget
        h_norm = llama.rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q, k_new, v_new = llama._qkv(cfg, lp, h_norm, cos, sin)
        H = q.shape[0]
        centroids = state.centroids[idx]
        codes = state.codes[idx]
        q_sub = q.reshape(H, self.S, self.d_sub)
        if self.metric == "euc":
            lut = pq.adc_lut_euc(q_sub, centroids)
        else:
            lut = pq.adc_lut_ip(pq.lift_query(q_sub), centroids)
        if self.use_jhist:
            mass = pq.joint_block_mass(lut, state.jhist[idx],
                                       head_dim=cfg.head_dim)
            blk_idx = pq.topk_from_block_mass(
                mass, n_sel, b.topk, group=cfg.num_groups, block=self.bs,
                approx=self.cfg.pq.approx_topk)
        else:
            scores = pq.adc_gather_scores(lut, codes)
            blk_idx, _ = pq.mips_topk_blocks(
                scores, n_sel, b.topk, group=cfg.num_groups,
                head_dim=cfg.head_dim, block=self.bs, metric=self.metric,
                approx=self.cfg.pq.approx_topk)
        return q, k_new, v_new, jnp.sort(blk_idx, axis=-1)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _decode_first(self, layers, state, hidden, cos, sin, n_sel):
        lp = jax.tree_util.tree_map(lambda a: a[0], layers)
        return self._score_and_topk(lp, state, jnp.asarray(0, jnp.int32),
                                    hidden, cos, sin, n_sel)

    def _attn_and_tail(self, lp, state, idx, hidden, q, k_new, v_new,
                       blk_idx, slots, miss_pos, staged, cache, tail,
                       n_sel, n_tail_att):
        """Window assembly + attention + layer tail + ring append (traced).

        Attention window = [sink | local ring | selected blocks | store
        tail | new]; the store's device tail (positions [valid, valid+bs))
        is always attended for its first n_tail_att rows — generated tokens
        are reachable the step after eviction without waiting for their
        block to complete."""
        cfg = self.cfg.model
        b = self.budget
        H_kv, D = cfg.num_kv_heads, cfg.head_dim
        dt = state.k_local.dtype
        bs = self.bs

        blocks = assemble_blocks(cache, staged, slots, miss_pos)
        kb = blocks.shape[1]
        rows = blocks.reshape(H_kv, kb * bs, 2 * D)
        tok = (blk_idx[:, :, None] * bs
               + jnp.arange(bs, dtype=jnp.int32)[None, None, :]
               ).reshape(H_kv, kb * bs)
        ok_blk = ((slots >= 0) | (miss_pos >= 0))[:, :, None]
        row_mask = (tok < n_sel) & jnp.broadcast_to(
            ok_blk, (H_kv, kb, bs)).reshape(H_kv, kb * bs)

        if self.kv_int8:
            # dequant only the FETCHED rows (+ the always-attended store
            # tail) — cost ∝ the selected blocks, which is the whole point:
            # the leaves/cache/DMA carried half the bytes to get here
            from pqcache_tpu.core import quant
            k_rows, v_rows = quant.dequant_kv(
                rows, state.k_scale[idx], state.v_scale[idx], dtype=dt)
            k_tl, v_tl = quant.dequant_kv(
                tail, state.k_scale[idx], state.v_scale[idx], dtype=dt)
        else:
            k_rows, v_rows = rows[..., :D].astype(dt), rows[..., D:].astype(dt)
            k_tl, v_tl = tail[..., :D].astype(dt), tail[..., D:].astype(dt)
        tail_mask = (jnp.arange(bs, dtype=jnp.int32)[None, :]
                     < n_tail_att) & jnp.ones((H_kv, 1), bool)
        out = decode_window_attention_segments(q, [
            (state.k_sink[idx], state.v_sink[idx], None),
            (state.k_local[idx], state.v_local[idx], None),
            (k_rows, v_rows, row_mask),
            (k_tl, v_tl, tail_mask),
            (k_new.astype(dt), v_new.astype(dt), None),
        ])

        attn = out.transpose(1, 0, 2).reshape(1, -1)
        hidden = hidden + llama._mm(attn, lp, "wo")
        h2 = llama.rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
        hidden = hidden + llama.mlp(lp, h2)

        # ring-evict the oldest local token; encode it as candidate n_cand
        ptr = state.ring_ptr
        n_cand = state.n_cand
        sz = (1, H_kv, 1, D)
        evicted_k = jax.lax.dynamic_slice(
            state.k_local, (idx, 0, ptr, 0), sz)[0]
        evicted_v = jax.lax.dynamic_slice(
            state.v_local, (idx, 0, ptr, 0), sz)[0]
        x_new = self._to_groups(evicted_k)
        if self.metric == "ip":
            x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
        cent_flat = state.centroids[idx].reshape(H_kv * self.S, self.C, -1)
        ev_codes = pq.pq_encode(x_new, cent_flat).reshape(
            H_kv, self.S, 1).astype(jnp.uint8)

        state = state.replace(
            k_local=jax.lax.dynamic_update_slice(
                state.k_local, k_new.astype(dt)[None], (idx, 0, ptr, 0)),
            v_local=jax.lax.dynamic_update_slice(
                state.v_local, v_new.astype(dt)[None], (idx, 0, ptr, 0)),
            codes=jax.lax.dynamic_update_slice(
                state.codes, ev_codes[None], (idx, 0, 0, n_cand)))
        if self.use_jhist:
            # the evicted token becomes candidate n_cand this step — count
            # its codes into its block's histogram (incremental form of
            # the scorer's tok < n_cand mask)
            ev = ev_codes[:, :, 0].astype(jnp.int32)          # [H_kv, S]
            pair = ev[:, 0] * self.C + ev[:, 1]               # [H_kv]
            jix = (idx, jnp.arange(H_kv), n_cand // self.bs, pair)
            state = state.replace(
                jhist=pq.jhist_increment(state.jhist, jix))
        if self.kv_int8:
            # the evicted row enters the (int8) store: quantize with the
            # frozen scales inside the traced program — the appended leaf
            # carries half the bytes end to end
            from pqcache_tpu.core import quant
            kv_ev = quant.quantize_kv(evicted_k, evicted_v,
                                      state.k_scale[idx],
                                      state.v_scale[idx])[:, 0]
        else:
            kv_ev = jnp.concatenate([evicted_k[:, 0], evicted_v[:, 0]],
                                    axis=-1)
        return hidden, state, kv_ev

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
    def _decode_fused(self, layers, state, idx, hidden, cos, sin, q,
                      k_new, v_new, blk_idx, slots, miss_pos, staged,
                      cache, tail, n_sel, n_tail_att):
        """Attention + tail of layer `idx` fused with the score/top-k of
        layer idx+1 — one host round trip per decode layer."""
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        lp_next = jax.tree_util.tree_map(lambda a: a[idx + 1], layers)
        hidden, state, kv_ev = self._attn_and_tail(
            lp, state, idx, hidden, q, k_new, v_new, blk_idx, slots,
            miss_pos, staged, cache, tail, n_sel, n_tail_att)
        q2, k2, v2, blk2 = self._score_and_topk(
            lp_next, state, idx + 1, hidden, cos, sin, n_sel)
        return hidden, state, kv_ev, q2, k2, v2, blk2

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
    def _decode_last(self, layers, params_out, state, idx, hidden, q, k_new,
                     v_new, blk_idx, slots, miss_pos, staged, cache, tail,
                     n_sel, n_tail_att, key=None):
        """Final layer + LM head + token selection (argmax, or the
        configured sampler drawing with `key`) in one program."""
        lp = jax.tree_util.tree_map(lambda a: a[idx], layers)
        hidden, state, kv_ev = self._attn_and_tail(
            lp, state, idx, hidden, q, k_new, v_new, blk_idx, slots,
            miss_pos, staged, cache, tail, n_sel, n_tail_att)
        cfg = self.cfg.model
        last = llama.rms_norm(hidden, params_out["final_norm"],
                              cfg.rms_norm_eps)
        logits = llama.lm_head_logits(params_out, last)[0]
        if self.sampler is None:
            nxt = jnp.argmax(logits).astype(jnp.int32)
        else:
            nxt = self.sampler(key, logits)
        state = state.replace(
            n_cand=state.n_cand + 1,
            ring_ptr=(state.ring_ptr + 1) % self.budget.local,
            pos=state.pos + 1)
        return state, kv_ev, nxt

    # -- helpers ----------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,))
    def _quant_layer_kv(self, k, v, ks, vs):
        """Quantize one layer's full-length K/V for the int8 store (the
        host leaves carry half the bytes; dequant happens at fetch)."""
        from pqcache_tpu.core import quant
        return (quant.quantize_channels(k, ks),
                quant.quantize_channels(v, vs))

    def _to_groups(self, x):
        H_kv, T, _ = x.shape
        return (x.reshape(H_kv, T, self.S, self.d_sub)
                .transpose(0, 2, 1, 3)
                .reshape(H_kv * self.S, T, self.d_sub))

    # -- public API --------------------------------------------------------

    def _prefill_pass_steps(self, state, ids, P: int, pad: int,
                            true_len: int, chunked: bool, ch: int,
                            offload_fn, sync_fn):
        """GENERATOR form of the layer-by-layer prefill: yields after each
        bounded device-program unit (pass A K/V build, each pass-B chunk
        slab, pass C tail + offload). The batched offload tier advances
        one unit per decode step so running streams never stall more than
        one slab (the interleaved-admission discipline of
        runtime/batch_engine.py, applied to the beyond-HBM tier). Final
        value (StopIteration.value) is (last-token logits, state).

        offload_fn(layer, k_full, v_full, state) persists each layer's
        K/V (single-sequence: this engine's store; batch-as-heads: the
        shared store with slot-prefixed ids, runtime/offload_batch.py);
        sync_fn(layer) bounds in-flight transfers. Requires self.budget
        set."""
        m = self.cfg.model
        tokens = np.zeros((P,), np.int32)
        tokens[pad:] = np.asarray(ids, np.int32)
        pad_j = jnp.asarray(pad, jnp.int32)
        tl_j = jnp.asarray(true_len, jnp.int32)
        layers = self.params["layers"]

        hidden = llama.embed_lookup(self.params, jnp.asarray(tokens))
        positions = jnp.maximum(jnp.arange(P, dtype=jnp.int32) - pad_j, 0)
        cos, sin = llama.rope_cos_sin(m, positions)
        for l in range(m.num_layers):
            li = jnp.asarray(l, jnp.int32)
            if chunked:
                k_full, v_full = self._prefill_layer_kv(
                    layers, li, hidden, cos, sin, ch)
                yield
                for c in range(P // ch):
                    hidden = self._prefill_attn_chunk(
                        layers, li, c * ch, hidden, k_full, v_full,
                        cos, sin, pad_j, ch)
                    yield
                state = self._prefill_tail_chunked(
                    state, li, k_full, v_full, pad_j, tl_j)
            else:
                hidden, state, k_full, v_full = self._prefill_layer(
                    layers, state, li, hidden, cos, sin, pad_j, tl_j)
            offload_fn(l, k_full, v_full, state)
            del k_full, v_full
            # bound in-flight prefill work to ~1 layer (compute AND the
            # pinned-host leaf transfers): without these barriers the
            # async dispatch allocates every layer's [H_kv, P, 2D] tail
            # while transfers lag, OOMing at 128k (0.5 GB/layer there)
            np.asarray(hidden[:1, :1])
            sync_fn(l)
            yield
        last = llama.rms_norm(hidden[P - 1:P], self.params["final_norm"],
                              m.rms_norm_eps)
        logits = llama.lm_head_logits(self.params, last)[0]
        return logits, state

    def _prefill_pass(self, state, ids, P: int, pad: int, true_len: int,
                      chunked: bool, ch: int, offload_fn, sync_fn):
        """Monolithic prefill: drains the step generator in one go.
        Returns (last-token logits, state)."""
        gen = self._prefill_pass_steps(state, ids, P, pad, true_len,
                                       chunked, ch, offload_fn, sync_fn)
        while True:
            try:
                next(gen)
            except StopIteration as e:
                return e.value

    def generate(self, prompt_ids, max_new_tokens: int, eos_ids=()):
        return list(self.stream(prompt_ids, max_new_tokens, eos_ids))

    def stream(self, prompt_ids, max_new_tokens: int, eos_ids=()):
        """Generate tokens, yielding each as soon as its decode step
        completes (the offload tier decodes one token per host-driven
        step, so streaming is per-token natively)."""
        import time
        cfg = self.cfg
        m = cfg.model
        # per-step wall decomposition: host = classify/stage/admit python
        # work; wait = blocking on device results (includes tunnel latency)
        self.store = None            # the LAST generation's HostKVStore
        self.timings = {"host_s": 0.0, "wait_s": 0.0, "decode_s": 0.0,
                        "steps": 0}
        ids = np.asarray(prompt_ids, np.int32)
        true_len = int(ids.shape[0])
        from pqcache_tpu.runtime.generate import (bucket_length,
                                                  chunk_plan_capped)
        P = bucket_length(true_len, cfg.runtime.prefill_bucket)
        P = min(P, cfg.runtime.max_seq_len)
        if true_len > P:
            raise ValueError(
                f"prompt {true_len} exceeds max_seq_len {P}")
        ch = self.prefill_chunk
        chunked = bool(ch) and P > ch
        if chunked:
            # same cap discipline as Engine.generate: chunk padding must
            # not expand the reservation past max_seq_len
            P, ch = chunk_plan_capped(P, ch, cfg.runtime.max_seq_len)
            chunked = ch > 0
        pad = P - true_len
        self.budget = self._budget(P, max_new_tokens)
        b = self.budget
        # release the PREVIOUS generation's store before allocating this
        # one: two stores' pinned leaves (~17 GiB each at 256k) plus two
        # HBM block caches cannot coexist — the compile-run + measured-run
        # pattern OOMed at 256k with the old store still referenced
        self.store = None
        state = self._init_state(b)
        store = HostKVStore(
            m.num_layers, m.num_kv_heads, b.n_tail_max, m.head_dim,
            block_size=self.bs,
            hbm_cache_tokens=cfg.cache.hbm_cache_tokens,
            cache_topk_blocks=cfg.cache.cache_topk_blocks,
            dtype=jnp.int8 if self.kv_int8 else self.dtype)

        stored = true_len - b.sink          # tail rows valid in the store

        def offload_fn(l, k_full, v_full, st):
            # candidate rows are k/v[:, pad+sink : pad+sink+stored] — the
            # store interleaves K‖V per 64-block chunk (no full-length copy)
            if self.kv_int8:
                # quantize with this layer's fresh scales (written by the
                # tail update above); the store's astype(int8) is a no-op
                k_full, v_full = self._quant_layer_kv(
                    k_full, v_full, st.k_scale[l], st.v_scale[l])
            store.offload_layer_device(l, k_full, v_full, stored,
                                       off=pad + b.sink)

        logits, state = self._prefill_pass(state, ids, P, pad, true_len,
                                           chunked, ch, offload_fn,
                                           store.sync_transfers)
        rng = (jax.random.PRNGKey(cfg.runtime.sample_seed)
               if self.sampler is not None else None)
        if self.sampler is None:
            next_tok = int(jnp.argmax(logits))
        else:
            rng, sub = jax.random.split(rng)
            next_tok = int(self.sampler(sub, logits))
        yield next_tok

        params_out = llama.lm_head_params(self.params)
        layers = self.params["layers"]
        L = m.num_layers
        pos = true_len
        n_cand_py = max(true_len - b.sink - b.local, 0)
        # one-step-stale selection (cache.stale_select): per-layer
        # selections computed by the PREVIOUS step's queries, classified up
        # front so the step dispatches every layer program back-to-back
        # with a single blocking pull at the end. The first step runs the
        # exact per-layer chain and records its selections as the seed.
        from pqcache_tpu.runtime.host_offload import _pack_sel
        blk_prev: Optional[list] = None
        for _ in range(max_new_tokens - 1):
            if next_tok in eos_ids:
                break
            t_step = time.perf_counter()
            hidden = llama.embed_lookup(
                self.params, jnp.asarray([next_tok], jnp.int32))
            cos, sin = llama.rope_cos_sin(m, jnp.asarray([pos], jnp.int32))
            # retrievable candidates: scored region ∩ complete pinned blocks
            valid = int(store.valid[0])     # identical across layers
            n_sel_py = min(n_cand_py, valid)
            n_sel = jnp.asarray(n_sel_py, jnp.int32)
            # store-tail rows that are evicted candidates (attended inline)
            n_tail_att = jnp.asarray(max(n_cand_py - valid, 0), jnp.int32)
            q, k_new, v_new, blk = self._decode_first(
                layers, state, hidden, cos, sin, n_sel)
            kv_evs = []
            if self.stale and blk_prev is not None:
                new_blks = [blk]     # layer 0's selection for step t+1
                for l in range(L):
                    t1 = time.perf_counter()
                    # classify layer l right before its dispatch (NOT all
                    # layers up front): the staged miss stacks live from
                    # device_put until the layer program consumes them —
                    # eagerly staging every layer held L stacks in HBM at
                    # once (~1 GB each at 192k small-cache) and OOMed
                    slots, miss_pos, staged, cache = store.classify_blocks(
                        l, blk_prev[l])
                    self.timings["host_s"] += time.perf_counter() - t1
                    li = jnp.asarray(l, jnp.int32)
                    args = (jnp.asarray(blk_prev[l]), jnp.asarray(slots),
                            jnp.asarray(miss_pos), staged, cache,
                            store.tail[l], n_sel, n_tail_att)
                    if l < L - 1:
                        (hidden, state, kv_ev, q, k_new, v_new, blk
                         ) = self._decode_fused(
                            layers, state, li,
                            hidden, cos, sin, q, k_new, v_new, *args)
                        new_blks.append(blk)
                    else:
                        if self.sampler is not None:
                            rng, sub = jax.random.split(rng)
                            state, kv_ev, nxt = self._decode_last(
                                layers, params_out, state, li, hidden, q,
                                k_new, v_new, *args, key=sub)
                        else:
                            state, kv_ev, nxt = self._decode_last(
                                layers, params_out, state, li, hidden, q,
                                k_new, v_new, *args)
                    kv_evs.append(kv_ev)
                    if staged.shape[0] >= 256 and l < L - 1:
                        # adaptive backpressure: a heavy miss stack
                        # (≥ ~256 MB staged) means the cache is far below
                        # the selection working set — bound in-flight HBM
                        # by draining this layer before staging the next
                        # (cost: one round trip; light layers stay async)
                        t0 = time.perf_counter()
                        np.asarray(kv_ev)
                        self.timings["wait_s"] += time.perf_counter() - t0
                t0 = time.perf_counter()
                flat = np.asarray(_pack_sel(L)(nxt, *new_blks))  # ONE pull
                self.timings["wait_s"] += time.perf_counter() - t0
                kb = new_blks[0].shape[-1]
                blk_prev = list(flat[: L * m.num_kv_heads * kb].reshape(
                    L, m.num_kv_heads, kb))
                nxt = int(flat[-1])
            else:
                rec = []
                for l in range(L):
                    t0 = time.perf_counter()
                    blk_np = np.asarray(blk)     # sync: block ids to host
                    t1 = time.perf_counter()
                    self.timings["wait_s"] += t1 - t0
                    rec.append(blk_np)
                    slots, miss_pos, staged, cache = store.classify_blocks(
                        l, blk_np)
                    self.timings["host_s"] += time.perf_counter() - t1
                    li = jnp.asarray(l, jnp.int32)
                    args = (jnp.asarray(blk_np), jnp.asarray(slots),
                            jnp.asarray(miss_pos), staged, cache,
                            store.tail[l], n_sel, n_tail_att)
                    if l < L - 1:
                        (hidden, state, kv_ev, q, k_new, v_new, blk
                         ) = self._decode_fused(
                            layers, state, li,
                            hidden, cos, sin, q, k_new, v_new, *args)
                    else:
                        if self.sampler is not None:
                            rng, sub = jax.random.split(rng)
                            state, kv_ev, nxt = self._decode_last(
                                layers, params_out, state, li, hidden, q,
                                k_new, v_new, *args, key=sub)
                        else:
                            state, kv_ev, nxt = self._decode_last(
                                layers, params_out, state, li, hidden, q,
                                k_new, v_new, *args)
                    kv_evs.append(kv_ev)
                blk_prev = rec if self.stale else None
                if self.selection_log is not None:
                    self.selection_log.append([b.copy() for b in rec])
            # evicted tokens beyond the prefilled region extend the store
            # (prefill already stored positions < true_len - sink; the
            # first `local` evictions re-evict stored prompt tokens)
            if n_cand_py >= stored:
                for l, kv_ev in enumerate(kv_evs):
                    store.append_row_device(l, kv_ev)
            n_cand_py += 1
            next_tok = int(nxt)
            pos += 1
            self.timings["decode_s"] += time.perf_counter() - t_step
            self.timings["steps"] += 1
            yield next_tok
        store.flush()
        self.store = store
