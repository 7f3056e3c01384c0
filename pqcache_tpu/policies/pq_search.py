"""`pq_search` policy — the PQCache scheme, TPU-native.

Prefill (reference: pq_search.py:214-263):
  dense flash attention over the prompt, then per-layer PQ codebook training
  over the non-sink keys. Where the reference ships keys to pinned CPU memory
  and clusters on 48 host cores asynchronously
  (multi_core_compressor_v2.py:89-199), we run batched Lloyd k-means on the
  MXU inside the same jitted prefill step — at <1% of the prefill FLOPs the
  "overlap" problem the reference solves with process pools, shared memory
  and interprocess CUDA events disappears.

Decode (reference: pq_search.py:265-360):
  ADC lookup-table scores over all candidate codes, GQA-group-softmax-sum
  reduction, top-k MIPS, gather of exactly those KV pairs, then attention
  over [sink | local | top-k | new]. All candidates are HBM-resident here —
  PQ codes are 21× smaller than the keys they index (2×6 bits vs 128×16
  bits per token-head), so the HBM cost of keeping full KV + codes on-chip is
  what the reference paid in CPU RAM + PCIe traffic.

State layout: see runtime/state.py. The local-window ring buffer + eviction
machinery of cache_manager.py:212-228 reduces to a sliding slice because
generated tokens are appended to the same ordered tail that prefill tokens
occupy; new tokens are PQ-encoded at append time (equivalent to the
reference's boundary-crossing predict_index_gpu, pq_search.py:346-354).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core import pq, quant
from pqcache_tpu.core.budget import Budget
from pqcache_tpu.ops.attention_xla import (
    decode_window_attention, decode_window_attention_segments,
    segment_partial)
from pqcache_tpu.ops.dispatch import dense_prefill_attention
from pqcache_tpu.policies.base import register_policy
from pqcache_tpu.runtime.state import PQState, make_pq_state


@register_policy("pq_search")
class PQSearchPolicy:
    def __init__(self, cfg: EngineConfig, budget: Budget):
        self.cfg = cfg
        self.budget = budget
        m = cfg.model
        self.S = cfg.pq.n_subvec_per_head
        self.C = cfg.pq.n_centroids
        self.d_sub = m.head_dim // self.S
        self.metric = cfg.pq.metric
        self.group = m.num_groups
        self.H_kv = m.num_kv_heads
        self.D = m.head_dim
        mode = cfg.runtime.kernels
        # "pallas-interpret" exercises the Pallas kernels in interpret mode
        # (CPU-mesh validation of the sharded kernel path)
        self.use_pallas = (jax.default_backend() == "tpu" if mode == "auto"
                           else mode in ("pallas", "pallas-interpret"))
        self.interpret = mode == "pallas-interpret"
        # Mosaic requires the LUT lane dimension (C·H_kv·S for the v2
        # block-diagonal kernel) to be 128-aligned; small test models fall
        # back to the XLA ADC (flagship widths: 64·8·2 = 1024 ✓).
        if self.C * self.H_kv * self.S % 128 != 0:
            self.use_pallas = False
        self.approx_topk = cfg.pq.approx_topk
        self.select_block = cfg.pq.select_block
        self.adc_mode = cfg.pq.adc_mode
        self.fetch_mode = cfg.pq.fetch_mode
        self.gather_mode = cfg.pq.gather_mode
        # pair fetch needs the tail 2·block-aligned (n_tail_max rounds to
        # 256, so select_block ≤ 128); reject unsatisfiable requests
        # rather than silently measuring the non-pair path
        if cfg.pq.fetch_pair and (not 1 < self.select_block <= 128
                                  or 256 % (2 * self.select_block) != 0):
            raise ValueError(
                f"fetch_pair requires 1 < select_block <= 128 with "
                f"2*select_block dividing the 256-aligned tail "
                f"(got select_block={self.select_block})")
        self.fetch_pair = cfg.pq.fetch_pair
        # int8 KV tail (cache.kv_dtype="int8", core/quant.py): per-channel
        # scales frozen at prefill; K scale folds into q, V scale folds out
        # of the attention partials — the fused kernel reads int8 directly.
        self.kv_int8 = cfg.cache.kv_dtype == "int8"
        self.check_recall = cfg.pq.check_recall
        # GQA=False: per-q-head top-k (no group reduction). The reference
        # parses the flag but raises "wo GQA not supported currently"
        # (pq_search.py:460-473); here it is a working quality mode — each q
        # head retrieves its own candidate set (group× the gather volume).
        self.gqa = cfg.runtime.gqa
        if not self.gqa and (self.select_block > 1
                             or self.fetch_mode != "gather"):
            raise ValueError("gqa=False supports only per-token gather fetch")
        if budget.n_tail_max % max(self.select_block, 1):
            raise ValueError("n_tail_max must be divisible by select_block")
        # block mode retrieves whole blocks; round the token budget up
        self.topk_eff = (budget.topk if self.select_block <= 1 else
                         -(-budget.topk // self.select_block)
                         * self.select_block)
        # Deferred appends: the per-layer new-token append/encode (2 scatter
        # writes + a tiny pq_encode matmul per layer) is hoisted OUT of the
        # layer scan — decode_attn returns (out, (k_new, v_new)) and the
        # model calls commit_appends once per step with all layers stacked
        # (one batched encode + 2 scatters instead of L× each). The masked
        # branch writes the tail before attention and the nogqa branch is
        # per-q-head — both keep the in-loop contract.
        self.deferred_appends = self.gqa and self.fetch_mode != "masked"
        # Joint-code-histogram block scorer (core/pq.py joint_block_mass):
        # with S=2 the softmax numerator factorizes over subvectors, so
        # per-block attention mass is ONE [g, C²]·[C², NB] matmul against a
        # precomputed histogram instead of an O(T) code sweep — identical
        # ranking to the fused Pallas sweep at ~1/10 the decode cost
        # (profiled: the batched ADC kernel was 3.5 ms/step at B=4/32k/8L,
        # ~20% of the step). Needs deferred appends: the histogram gains
        # the token joining the candidate set once per step.
        self.use_jhist = (cfg.pq.scorer == "auto" and self.S == 2
                          and self.metric == "euc"
                          and 1 < self.select_block <= 256
                          and self.gqa and self.deferred_appends)
        # Batched write-combining ring (state.ring_kv): decode chunks of up
        # to ring_k steps write every slot's new token at ONE global ring
        # column per step and flush into the per-slot tail positions in
        # bulk once per chunk — per-step per-slot tail writes either
        # scatter (heads-major layout flip of the multi-GB carry) or chain
        # B dynamic updates (aliasing breaks past B≈4); both measured.
        # Capped at budget.local: the ring-resident tokens must all still
        # be inside the local window (the lmask/candidate arithmetic in
        # decode_attn_batched assumes steps-since-flush ≤ local).
        self.ring_k = (min(cfg.pq.ring_cap, budget.local)
                       if self.deferred_appends
                       and budget.local >= 1 else 0)

    # -- helpers ----------------------------------------------------------

    def _to_groups(self, x: jax.Array) -> jax.Array:
        """[H_kv, T, D] → [H_kv*S, T, d_sub] subvector groups."""
        H_kv, T, _ = x.shape
        return (x.reshape(H_kv, T, self.S, self.d_sub)
                .transpose(0, 2, 1, 3)
                .reshape(H_kv * self.S, T, self.d_sub))

    # -- int8 tail helpers (no-ops for bf16 tails) --------------------------

    def _split_rows(self, kv_rows, state, idx):
        """Split (+ dequantize) tail rows [..., T, 2D] → (k, v).
        Scales broadcast per (folded) kv head, so callers must keep the
        head axis leading ([H_kv(·B), T, 2D]). Dequant lands in the
        ENGINE dtype (k_sink's) — an f32 engine must not round tail rows
        through bf16 on top of the int8 step."""
        if not self.kv_int8:
            return kv_rows[..., :self.D], kv_rows[..., self.D:]
        return quant.dequant_kv(kv_rows, state.k_scale[idx],
                                state.v_scale[idx],
                                dtype=state.k_sink.dtype)

    def _tail_kv(self, k, v, state, idx=None):
        """Interleave (+ quantize) K/V rows into tail storage. k, v
        [..., T, D] with the same leading axes as the scales ([H_kv(·B)]
        for per-layer idx, [L, H_kv(·B)] stacked when idx is None)."""
        if not self.kv_int8:
            return jnp.concatenate([k, v], axis=-1).astype(
                state.kv_tail.dtype)
        ks = state.k_scale if idx is None else state.k_scale[idx]
        vs = state.v_scale if idx is None else state.v_scale[idx]
        return quant.quantize_kv(k, v, ks, vs)

    def _q_for_tail(self, q_flat, state, idx):
        """Fold the per-channel K scale into q for int8 scoring over tail
        rows: q·(s⊙K_int8) = (q⊙s)·K_int8. q_flat [H(·B), D] → [·, 1, D]
        f32 when int8 (exact product before the kernel's f32 dot), else
        [·, 1, D] unchanged dtype."""
        Hq = q_flat.shape[0]
        if not self.kv_int8:
            return q_flat.reshape(Hq, 1, self.D)
        nh = state.k_scale.shape[1]          # H_kv or B·H_kv (folded)
        qs = (q_flat.astype(jnp.float32).reshape(nh, Hq // nh, self.D)
              * state.k_scale[idx])
        return qs.reshape(Hq, 1, self.D)

    def _deq_partials(self, m_p, l_p, acc_p, state, idx):
        """Fold the per-channel V scale out of fused-kernel partials:
        acc is linear in V, so acc ⊙ s_v is the exact dequant."""
        if self.kv_int8:
            acc_p = acc_p * state.v_scale[idx]
        return m_p, l_p, acc_p

    # -- prefill ----------------------------------------------------------

    def init_state(self, dtype=jnp.bfloat16) -> PQState:
        # jhist_dtype only exists for jhist-legal blocks (<= 256); a
        # select_block=512 kernel-scorer config must not crash here
        return make_pq_state(self.cfg, self.budget, dtype=dtype,
                             jhist_blocks=self._jhist_blocks(),
                             jhist_dtype=(pq.jhist_dtype(self.select_block)
                                          if self.use_jhist
                                          else jnp.bfloat16))

    def _jhist_blocks(self) -> int:
        return (self.budget.n_tail_max // self.select_block
                if self.use_jhist else 0)

    def prefill_attn(self, state: PQState, idx, q, k, v, pad_len, true_len):
        """Prefill for layer `idx`; `state` is the full stacked state, riding
        the model's layer-scan carry (writes land at [idx] in place)."""
        out, _ = dense_prefill_attention(q, k, v, pad_len,
                                         use_pallas=self.use_pallas,
                                         interpret=self.interpret)
        return out, self.prefill_tail(state, idx, k, v, pad_len, true_len)

    def prefill_tail(self, state: PQState, idx, k, v, pad_len, true_len):
        """Codebook training + layer-state writes given this layer's full
        K/V (traced). Split from prefill_attn so the chunked prefill
        (models/llama.py prefill_chunked) can run attention per row chunk
        and call the tail once on the assembled K/V."""
        b = self.budget
        P = k.shape[1]
        # Left-padded prompt → roll so real tokens start at index 0; the
        # rolled-around garbage lands after the valid region where n_cand /
        # valid_len masks already hide it.
        shift = -pad_len.astype(jnp.int32)
        k_r = jnp.roll(k, shift, axis=1)
        v_r = jnp.roll(v, shift, axis=1)
        k_sink, v_sink = k_r[:, :b.sink], v_r[:, :b.sink]
        k_tail_src, v_tail_src = k_r[:, b.sink:], v_r[:, b.sink:]  # [H_kv, P-sink, D]
        n_valid_tail = (true_len - b.sink).astype(jnp.int32)

        # Codebook training over non-sink keys (pq_search.py:240-249).
        xb = self._to_groups(k_tail_src)  # [G, P-sink, d_sub]
        if self.metric == "ip":
            xb, phi = pq.ip2l2_lift(xb, n_valid_tail)
        else:
            phi = jnp.zeros((self.H_kv * self.S, 1, 1), jnp.float32)
        # Adaptive iteration count (the reference's MAX_ITER=0 mode,
        # multi_core_compressor_v2.py:409-417, regresses CPU k-means latency
        # against remaining prefill GPU time). Fused on-MXU clustering costs
        # <1% of prefill FLOPs, so "adaptive" reduces to scaling refinement
        # with the training-set size; P is static so this is compile-time.
        if self.cfg.pq.adaptive_iters:
            iters = int(min(3 + P // 4096, 25))
        else:
            iters = self.cfg.pq.kmeans_iters
        # under shard_map TP each shard seeds with its GLOBAL group ids so
        # the sharded clustering equals the single-device one exactly
        goff = 0
        if self.cfg.runtime.shard_axis is not None:
            goff = (jax.lax.axis_index(self.cfg.runtime.shard_axis)
                    * self.H_kv * self.S)
        res = pq.kmeans(xb, self.C, iters=iters,
                        seed=self.cfg.pq.kmeans_seed, valid_len=n_valid_tail,
                        group_offset=goff)
        centroids = res.centroids.reshape(
            self.H_kv, self.S, self.C, xb.shape[-1])
        codes_src = res.codes.reshape(
            self.H_kv, self.S, P - b.sink).astype(state.codes.dtype)

        dt = state.k_sink.dtype
        up = lambda buf, val: jax.lax.dynamic_update_slice(
            buf, val[None], (idx,) + (0,) * val.ndim)
        if self.kv_int8:
            ks, vs = quant.kv_channel_scales(k_tail_src, v_tail_src,
                                             n_valid_tail)
            kv_src = quant.quantize_kv(k_tail_src, v_tail_src, ks, vs)
        else:
            kv_src = jnp.concatenate(
                [k_tail_src, v_tail_src], axis=-1).astype(dt)
        n_cand0 = jnp.maximum(n_valid_tail - b.local, 0)
        new = state.replace(
            k_sink=up(state.k_sink, k_sink.astype(dt)),
            v_sink=up(state.v_sink, v_sink.astype(dt)),
            kv_tail=up(state.kv_tail, kv_src),
            codes=up(state.codes, codes_src),
            centroids=up(state.centroids, centroids),
            phi=up(state.phi, phi),
            n_cand=n_cand0,
            pos=true_len.astype(jnp.int32))
        if self.kv_int8:
            new = new.replace(k_scale=up(state.k_scale, ks),
                              v_scale=up(state.v_scale, vs))
        if self.use_jhist:
            N_tail = state.codes.shape[-1]
            codes_full = jnp.pad(
                codes_src.astype(jnp.int32),
                ((0, 0), (0, 0), (0, N_tail - codes_src.shape[-1])))
            J = pq.build_joint_hist(codes_full, n_cand0,
                                    n_centroids=self.C,
                                    block=self.select_block)
            new = new.replace(jhist=up(state.jhist, J))
        return new

    # -- decode -----------------------------------------------------------

    def decode_attn(self, state: PQState, idx, q, k_new, v_new, shared):
        b = self.budget
        n_cand = shared["n_cand"]
        H = q.shape[0]
        heads = jnp.arange(self.H_kv)

        # Per-layer small state (centroids/LUT inputs/sinks are KBs; the big
        # tail/code buffers are only touched by gathers and slices below).
        centroids = state.centroids[idx]       # [H_kv, S, C, d_lift]
        codes = state.codes[idx]               # [H_kv, S, N_tail]
        k_sink, v_sink = state.k_sink[idx], state.v_sink[idx]

        # ADC scoring (pq_search.py:307-322 / :397-417)
        q_sub = q.reshape(H, self.S, self.d_sub)
        if self.metric == "euc":
            lut = pq.adc_lut_euc(q_sub, centroids)
        else:
            lut = pq.adc_lut_ip(pq.lift_query(q_sub), centroids)
        # Fused block scorer: ADC + softmax + block reduction in ONE kernel
        # (ops/adc_pallas.adc_block_scores_pallas) — the block-granular path
        # never materializes the [H, N] score row. The jhist matmul scorer
        # supersedes it when applicable (same output, ~1/10 the cost).
        fused_blockscore = (
            self.use_pallas and self.adc_mode != "xla" and not self.use_jhist
            and self.select_block > 1 and self.metric == "euc" and self.gqa
            and self.fetch_mode != "masked")
        if self.use_jhist:
            blk_mass = pq.joint_block_mass(lut, state.jhist[idx],
                                           head_dim=self.D)
            scores = None
        elif fused_blockscore:
            from pqcache_tpu.ops.adc_pallas import adc_block_scores_pallas
            lut4 = lut.reshape(self.H_kv, self.group, self.S, -1)
            blk_mass = adc_block_scores_pallas(
                lut4, codes, n_cand, sel_block=self.select_block,
                head_dim=self.D, interpret=self.interpret)
            scores = None
        elif self.use_pallas and self.adc_mode != "xla":
            from pqcache_tpu.ops.adc_pallas import (adc_scores_pallas,
                                                    adc_scores_pallas_v2)
            fn = (adc_scores_pallas_v2 if self.adc_mode == "v2"
                  else adc_scores_pallas)
            lut4 = lut.reshape(self.H_kv, self.group, self.S, -1)
            scores = fn(lut4, codes, interpret=self.interpret).reshape(H, -1)
        else:
            scores = pq.adc_gather_scores(lut, codes)  # [H, N_tail]
        if self.fetch_mode == "masked" and self.select_block <= 1:
            # Alternative HBM-tier path: selection as a THRESHOLDED MASK
            # over full-tail attention instead of a gather — the attended
            # set matches the reference's [sink|local|topk|new]
            # (pq_search.py:330-341) up to score ties (tokens scoring >=
            # the k-th value attend). Measured at 32k/8L it is ~15% slower
            # than the sorted-row gather (15.8 vs 13.7 ms/step) because
            # the full-tail attention reads all KV; it becomes attractive
            # when budgets grow toward the dense-read crossover.
            sel = pq.group_scores(scores, n_cand, group=self.group,
                                  head_dim=self.D, metric=self.metric)
            cand_pos = jnp.arange(sel.shape[-1], dtype=jnp.int32)[None, :]
            cand_valid = cand_pos < n_cand
            kvals, _ = jax.lax.approx_max_k(sel, b.topk)
            kth = jnp.min(kvals, axis=-1, keepdims=True)
            # attended tail positions: top-k candidates ∪ local window ∪ new
            slot = n_cand + b.local
            tail_mask = ((sel >= kth) & cand_valid) | (
                (cand_pos >= n_cand) & (cand_pos <= slot))

            # write the new token into the tail BEFORE attention so the
            # whole [local|new] span is one contiguous region.
            # int8 COST NOTE: this mode attends the FULL tail, so
            # _split_rows below dequantizes every [H_kv, N_tail, 2D] row
            # into a bf16/f32 copy each layer-step — int8 halves storage
            # but not this mode's bandwidth (the gather/fused modes read
            # only the selected rows). Acceptable for the non-default
            # masked mode; don't use it at scale with int8.
            kv_new = self._tail_kv(k_new, v_new, state, idx)
            kv_tail = jax.lax.dynamic_update_slice(
                state.kv_tail, kv_new[None], (idx, 0, slot, 0))
            k_tail_full, v_tail_full = self._split_rows(kv_tail[idx],
                                                        state, idx)
            if self.kv_int8:
                # attend the new token RAW (storage is quantized, but this
                # step's attention must not round its own k/v — parity
                # with the _finish_decode path's raw new-token segment)
                k_tail_full = jax.lax.dynamic_update_slice(
                    k_tail_full, k_new.astype(k_tail_full.dtype),
                    (0, slot, 0))
                v_tail_full = jax.lax.dynamic_update_slice(
                    v_tail_full, v_new.astype(v_tail_full.dtype),
                    (0, slot, 0))
            k_win = jnp.concatenate([k_sink, k_tail_full], axis=1)
            v_win = jnp.concatenate([v_sink, v_tail_full], axis=1)
            win_mask = jnp.concatenate(
                [jnp.ones((self.H_kv, b.sink), bool), tail_mask], axis=1)
            out = decode_window_attention(q, k_win, v_win, win_mask)

            x_new = self._to_groups(k_new)
            if self.metric == "ip":
                x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
            cent_flat = centroids.reshape(self.H_kv * self.S, self.C, -1)
            new_codes = pq.pq_encode(x_new, cent_flat).reshape(
                self.H_kv, self.S, 1).astype(state.codes.dtype)
            new = state.replace(
                kv_tail=kv_tail,
                codes=jax.lax.dynamic_update_slice(
                    state.codes, new_codes[None], (idx, 0, 0, slot)))
            return out, new

        if not self.gqa:
            return self._decode_attn_nogqa(state, idx, q, k_new, v_new,
                                           scores, n_cand, centroids,
                                           k_sink, v_sink)
        if self.select_block > 1:
            # Block-granular fast path: block×-smaller top-k, contiguous
            # block fetches (selection granularity of the reference's own
            # HBM cache, cache_manager.py:119-123); recall-oracle-checked.
            bs = self.select_block
            if self.use_jhist or fused_blockscore:
                blk_idx = pq.topk_from_block_mass(
                    blk_mass, n_cand, b.topk, group=self.group, block=bs,
                    approx=self.approx_topk)
            else:
                blk_idx, _ = pq.mips_topk_blocks(
                    scores, n_cand, b.topk, group=self.group,
                    head_dim=self.D, block=bs, metric=self.metric,
                    approx=self.approx_topk)
            blk_idx = jnp.sort(blk_idx, axis=-1)
            if self.use_pallas and self.D % 128 == 0:
                # fused retrieval kernel: DMA the selected blocks straight
                # out of the stacked tail and attend in the same pass — no
                # materialized gather (ops/block_attn_pallas.py)
                from pqcache_tpu.ops.block_attn_pallas import (
                    block_topk_attention)
                m_p, l_p, acc_p = block_topk_attention(
                    self._q_for_tail(q.reshape(H, self.D), state, idx),
                    state.kv_tail, idx, blk_idx, n_cand, block=bs,
                    n_par=self.cfg.pq.fetch_par, pair=self.fetch_pair,
                    interpret=self.interpret)
                return self._finish_decode(
                    state, idx, q, k_new, v_new, n_cand, centroids,
                    k_sink, v_sink, None, None, None,
                    partials=[self._deq_partials(m_p, l_p, acc_p,
                                                 state, idx)])
            # expand blocks to row indices and gather rows DIRECTLY from the
            # carried tail — reshaping the scan-carried buffer before a
            # traced-layer index forced XLA to materialize a copy of the
            # whole [L, H_kv, N, 2D] stack per layer (measured 82 vs 16
            # ms/step at 32k/8L)
            topk_idx = (blk_idx[:, :, None] * bs
                        + jnp.arange(bs, dtype=jnp.int32)[None, None, :]
                        ).reshape(self.H_kv, self.topk_eff)
            kv_top = state.kv_tail[idx, heads[:, None], topk_idx]
        else:
            topk_idx, _ = pq.mips_topk(
                scores, n_cand, b.topk, group=self.group, head_dim=self.D,
                metric=self.metric, approx=self.approx_topk)  # [H_kv, topk]
            # ascending row order: scattered HBM gathers are markedly faster
            # with page locality; attention is permutation-invariant over
            # the retrieved set
            topk_idx = jnp.sort(topk_idx, axis=-1)

            # Gather retrieved KV straight out of the stacked interleaved
            # tail (the reference's fetch_and_concat_kv_w_cache,
            # cache_manager.py:299-428 — ONE HBM gather fetching K and V
            # together, no hit/miss split, no PCIe staging). default = XLA
            # gather: the hand-rolled DMA gather pays ~0.5 us of issue
            # overhead per row (scalar-core loop); PQ_GATHER=pallas for
            # research.
            if self.use_pallas and self.gather_mode == "pallas":
                from pqcache_tpu.ops.gather_pallas import gather_rows
                L, _, N, _ = state.kv_tail.shape
                kv_src = state.kv_tail.reshape(L * self.H_kv, N, 2 * self.D)
                kv_top = gather_rows(kv_src, topk_idx, idx * self.H_kv)
            else:
                # [idx, head, token] advanced index reads the selected rows
                kv_top = state.kv_tail[idx, heads[:, None], topk_idx]

            if self.check_recall:
                # runtime retrieval-recall oracle (the reference's
                # CHECK_RECALL=1 mode, pq_search.py:324-328): exact top-k
                # over the candidate keys vs the PQ selection, printed per
                # layer-step. Debug only — reads the full tail.
                k_cand, _ = self._split_rows(state.kv_tail[idx], state, idx)
                exact_idx = pq.exact_topk(
                    q.reshape(-1, self.D), k_cand, n_cand, b.topk,
                    group=self.group)
                rec = pq.topk_recall(topk_idx, exact_idx, group=self.group)
                jax.debug.print("pq recall layer={i}: {r:.3f}", i=idx, r=rec)
        k_top, v_top = self._split_rows(kv_top, state, idx)
        return self._finish_decode(state, idx, q, k_new, v_new, n_cand,
                                   centroids, k_sink, v_sink, k_top, v_top,
                                   topk_idx)

    def _finish_decode(self, state, idx, q, k_new, v_new, n_cand, centroids,
                       k_sink, v_sink, k_top, v_top, topk_idx, partials=()):
        """Shared decode tail: [sink|local|topk|new] segmented attention
        (topk either as a gathered segment or as fused-kernel partials) +
        new-token append/encode."""
        b = self.budget

        # Local window = sliding slice of the tail.
        kv_local = jax.lax.dynamic_slice(
            state.kv_tail, (idx, 0, n_cand, 0),
            (1, self.H_kv, b.local, 2 * self.D))[0]
        k_local, v_local = self._split_rows(kv_local, state, idx)

        dt = k_sink.dtype
        # segmented online-softmax merge: no window concatenation
        # (concat copied the whole [sink|local|topk|new] window per layer)
        segs = [(k_sink, v_sink, None), (k_local, v_local, None)]
        if k_top is not None:
            segs.append((k_top, v_top, topk_idx < n_cand))
        segs.append((k_new.astype(dt), v_new.astype(dt), None))
        out = decode_window_attention_segments(q, segs, partials=partials)

        if self.deferred_appends:
            # append payload for commit_appends (once per step, all layers)
            return out, (k_new[:, 0], v_new[:, 0])

        # Append + encode the new token (pq_search.py:343-354, collapsed:
        # encode at append time instead of at local-window exit).
        slot = n_cand + b.local
        x_new = self._to_groups(k_new)  # [G, 1, d_sub]
        if self.metric == "ip":
            x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
        cent_flat = centroids.reshape(self.H_kv * self.S, self.C, -1)
        new_codes = pq.pq_encode(x_new, cent_flat).reshape(
            self.H_kv, self.S, 1).astype(state.codes.dtype)

        kv_new = self._tail_kv(k_new, v_new, state, idx)
        new = state.replace(
            kv_tail=jax.lax.dynamic_update_slice(
                state.kv_tail, kv_new[None], (idx, 0, slot, 0)),
            codes=jax.lax.dynamic_update_slice(
                state.codes, new_codes[None], (idx, 0, 0, slot)))
        return out, new

    def commit_appends(self, state: PQState, payloads, shared) -> PQState:
        """One per-step append of ALL layers' new tokens (deferred from the
        layer scan): payloads = (k_new [L, H_kv, D], v_new [L, H_kv, D]).
        Encode runs as one [L·H_kv·S]-deep batched matmul; the tail/code
        writes are two dynamic_update_slices (the write slot n_cand+local
        is layer-invariant)."""
        k_new, v_new = payloads
        b = self.budget
        slot = shared["n_cand"] + b.local
        L, H_kv, D = k_new.shape
        xg = self._to_groups(k_new.reshape(L * H_kv, 1, D))
        if self.metric == "ip":
            xg = pq.ip2l2_lift_with_phi(
                xg, state.phi.reshape(L * H_kv * self.S, 1, 1))
        cent = state.centroids.reshape(L * H_kv * self.S, self.C, -1)
        codes = pq.pq_encode(xg, cent).reshape(
            L, H_kv, self.S, 1).astype(state.codes.dtype)
        kv = self._tail_kv(k_new[:, :, None], v_new[:, :, None], state)
        new = state.replace(
            kv_tail=jax.lax.dynamic_update_slice(
                state.kv_tail, kv, (0, 0, slot, 0)),
            codes=jax.lax.dynamic_update_slice(
                state.codes, codes, (0, 0, 0, slot)))
        if self.use_jhist:
            # the token at position n_cand joins the candidate set this
            # step (shared_post advances the count): count its codes into
            # its block's histogram — the incremental form of the kernel's
            # tok < n_cand mask, exact to the partial boundary block
            join = jax.lax.dynamic_slice(
                state.codes, (0, 0, 0, shared["n_cand"]),
                (L, H_kv, self.S, 1))[..., 0]           # [L, H_kv, S]
            new = new.replace(jhist=pq.jhist_add_tokens(
                state.jhist, join, shared["n_cand"],
                n_centroids=self.C, block=self.select_block))
        return new

    def _decode_attn_nogqa(self, state, idx, q, k_new, v_new, scores,
                           n_cand, centroids, k_sink, v_sink):
        """Per-q-head retrieval (GQA=False): every q head ranks the
        candidates by its own ADC scores and gathers its own top-k rows from
        its kv head's tail. The attention window is assembled per q head
        (group=1 segments) — `group`× the gather volume of the GQA path, in
        exchange for per-head selection quality."""
        b = self.budget
        H = q.shape[0]
        topk_idx, _ = pq.mips_topk(
            scores, n_cand, b.topk, group=1, head_dim=self.D,
            metric=self.metric, approx=self.approx_topk)  # [H, topk]
        topk_idx = jnp.sort(topk_idx, axis=-1)
        kv_head = jnp.arange(H, dtype=jnp.int32) // self.group
        kv_top = state.kv_tail[idx, kv_head[:, None], topk_idx]  # [H,k,2D]
        rep = lambda x: jnp.repeat(x, self.group, axis=0)  # [H_kv,..]→[H,..]
        if self.kv_int8:
            k_top, v_top = quant.dequant_kv(
                kv_top, rep(state.k_scale[idx]), rep(state.v_scale[idx]),
                dtype=state.k_sink.dtype)
        else:
            k_top, v_top = kv_top[..., :self.D], kv_top[..., self.D:]

        kv_local = jax.lax.dynamic_slice(
            state.kv_tail, (idx, 0, n_cand, 0),
            (1, self.H_kv, b.local, 2 * self.D))[0]
        k_loc, v_loc = self._split_rows(kv_local, state, idx)
        k_local, v_local = rep(k_loc), rep(v_loc)

        dt = k_sink.dtype
        out = decode_window_attention_segments(q, [
            (rep(k_sink), rep(v_sink), None),
            (k_local, v_local, None),
            (k_top, v_top, topk_idx < n_cand),
            (rep(k_new.astype(dt)), rep(v_new.astype(dt)), None),
        ])

        slot = n_cand + b.local
        x_new = self._to_groups(k_new)
        if self.metric == "ip":
            x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
        cent_flat = centroids.reshape(self.H_kv * self.S, self.C, -1)
        new_codes = pq.pq_encode(x_new, cent_flat).reshape(
            self.H_kv, self.S, 1).astype(state.codes.dtype)
        kv_new = self._tail_kv(k_new, v_new, state, idx)
        new = state.replace(
            kv_tail=jax.lax.dynamic_update_slice(
                state.kv_tail, kv_new[None], (idx, 0, slot, 0)),
            codes=jax.lax.dynamic_update_slice(
                state.codes, new_codes[None], (idx, 0, 0, slot)))
        return out, new

    def shared_pre(self, state: PQState):
        return {"n_cand": state.n_cand}

    def shared_post(self, state: PQState, shared):
        # One token appended per step: the oldest local token becomes a
        # retrieval candidate (the reference's add_new_token ring advance,
        # cache_manager.py:224-226).
        return state.replace(n_cand=state.n_cand + 1, pos=state.pos + 1)

    # -- batch-as-heads serving -------------------------------------------
    #
    # B sequence slots folded into the kv-head axis: state [L, B·H_kv, ...],
    # counters [B]. The retrieval machinery (ADC, GQA top-k, gather,
    # segmented attention) is head-parallel already, so the folded arrays
    # run through the SAME kernels — per-slot candidate counts become
    # per-head validity rows (core/pq._valid_masks) and the local-window
    # slice becomes part of one combined [top-k | local] row gather. This
    # replaces vmapping the single-sequence decode (B=2 cost ≈ 2.4× B=1 —
    # the vmapped scan composition serializes; the reference cannot batch at
    # all, mistral_patch.py:61).

    def _batched_alloc(self) -> dict:
        """Allocation kwargs shared by every batched-state constructor
        (single-device and the dp×tp engines)."""
        pad = 256 if self.ring_k else 0
        return dict(
            jhist_blocks=((self.budget.n_tail_max + pad) // self.select_block
                          if self.use_jhist else 0),
            ring_k=self.ring_k, tail_pad=pad,
            jhist_dtype=(pq.jhist_dtype(self.select_block)
                         if self.use_jhist else jnp.bfloat16))

    def init_batched_state(self, B: int, dtype=jnp.bfloat16) -> PQState:
        return make_pq_state(self.cfg, self.budget, dtype=dtype, batch=B,
                             **self._batched_alloc())

    def insert_slot(self, bstate: PQState, state: PQState,
                    slot: jax.Array) -> PQState:
        """Write a prefilled single-sequence state into slot `slot`.
        Batched buffers may be WIDER than the single-sequence ones on the
        token/block axes (ring tail_pad) — general dynamic_update_slice
        writes the narrower update into the padded buffer."""
        H_kv, S = self.H_kv, self.S
        slot = jnp.asarray(slot, jnp.int32)
        up1 = lambda b, s, scale: jax.lax.dynamic_update_slice(
            b, s, (0, slot * scale) + (0,) * (s.ndim - 2))
        return bstate.replace(
            k_sink=up1(bstate.k_sink, state.k_sink, H_kv),
            v_sink=up1(bstate.v_sink, state.v_sink, H_kv),
            kv_tail=up1(bstate.kv_tail, state.kv_tail, H_kv),
            codes=up1(bstate.codes, state.codes, H_kv),
            centroids=up1(bstate.centroids, state.centroids, H_kv),
            phi=up1(bstate.phi, state.phi, H_kv * S),
            n_cand=bstate.n_cand.at[slot].set(state.n_cand),
            pos=bstate.pos.at[slot].set(state.pos),
            jhist=(up1(bstate.jhist, state.jhist, H_kv)
                   if self.use_jhist else None),
            k_scale=(up1(bstate.k_scale, state.k_scale, H_kv)
                     if self.kv_int8 else None),
            v_scale=(up1(bstate.v_scale, state.v_scale, H_kv)
                     if self.kv_int8 else None))

    def decode_attn_batched(self, state: PQState, idx, q, k_new, v_new,
                            shared):
        """q [B, H, D]; k_new/v_new [B, H_kv, D]. Returns ([B, H, D], state)."""
        b = self.budget
        B, H, _ = q.shape
        BH_kv = B * self.H_kv
        n_cand_h = jnp.repeat(shared["n_cand"], self.H_kv)   # [B·H_kv]
        heads = jnp.arange(BH_kv, dtype=jnp.int32)

        centroids = state.centroids[idx]      # [B·H_kv, S, C, d_lift]
        codes = state.codes[idx]              # [B·H_kv, S, N]
        k_sink, v_sink = state.k_sink[idx], state.v_sink[idx]

        qf = q.reshape(B * H, self.D)
        q_sub = qf.reshape(B * H, self.S, self.d_sub)
        if self.metric == "euc":
            lut = pq.adc_lut_euc(q_sub, centroids)           # [B·H, S, C]
        else:
            lut = pq.adc_lut_ip(pq.lift_query(q_sub), centroids)
        fused_blockscore = (
            self.use_pallas and self.adc_mode != "xla" and not self.use_jhist
            and self.select_block > 1 and self.metric == "euc")
        if self.use_jhist:
            if self._jhist_defer(state):
                # histogram lags by the chunk's joins; add the pending
                # tokens' exp-LUT terms EXACTLY, then normalize (the
                # per-step join scatter on a ≥0.5 GB histogram cost 3
                # whole-buffer layout copies ≈ 5.3 ms/step at B·H_kv=128)
                raw = pq.joint_block_mass(lut, state.jhist[idx],
                                          head_dim=self.D, normalize=False)
                raw = raw + self._pending_mass(state, idx, lut, shared, B)
                z = jnp.sum(raw, axis=-1, keepdims=True)
                blk_mass = raw / jnp.maximum(z, 1e-30)        # [B·H, NB]
            else:
                blk_mass = pq.joint_block_mass(
                    lut, state.jhist[idx], head_dim=self.D)   # [B·H, NB]
            scores = None
        elif fused_blockscore:
            from pqcache_tpu.ops.adc_pallas import (
                adc_block_scores_pallas_batched)
            lut5 = lut.reshape(B, self.H_kv, self.group, self.S, -1)
            codes4 = codes.reshape(B, self.H_kv, self.S, -1)
            blk_mass = adc_block_scores_pallas_batched(
                lut5, codes4, shared["n_cand"],
                sel_block=self.select_block, head_dim=self.D,
                interpret=self.interpret)                    # [B, H, NB]
            blk_mass = blk_mass.reshape(B * H, -1)
            scores = None
        elif self.use_pallas and self.adc_mode != "xla":
            import functools
            from pqcache_tpu.ops.adc_pallas import adc_scores_pallas_v2
            lut5 = lut.reshape(B, self.H_kv, self.group, self.S, -1)
            codes4 = codes.reshape(B, self.H_kv, self.S, -1)
            scores = jax.vmap(functools.partial(
                adc_scores_pallas_v2, interpret=self.interpret))(lut5, codes4)
            scores = scores.reshape(B * H, -1)
        else:
            scores = pq.adc_gather_scores(lut, codes)        # [B·H, N]

        use_ring = bool(self.ring_k) and state.ring_kv is not None
        r = state.ring_r if use_ring else None
        partials = []
        topk_idx = None
        local_fused = False
        if self.select_block > 1:
            bs = self.select_block
            if self.use_jhist or fused_blockscore:
                blk_idx = pq.topk_from_block_mass(
                    blk_mass, n_cand_h, b.topk, group=self.group, block=bs,
                    approx=self.approx_topk)                 # [B·H_kv, kb]
            else:
                blk_idx, _ = pq.mips_topk_blocks(
                    scores, n_cand_h, b.topk, group=self.group,
                    head_dim=self.D, block=bs, metric=self.metric,
                    approx=self.approx_topk)                 # [B·H_kv, kb]
            blk_idx = jnp.sort(blk_idx, axis=-1)
            if self.use_pallas and self.D % 128 == 0:
                from pqcache_tpu.ops.block_attn_pallas import (
                    block_topk_attention)
                # local windows ride the same kernel (win_len coverage):
                # the B per-slot dynamic slices below materialized (and
                # XLA remat'd) ~107 MB/layer at B=16/32k — ~1.8 ms/step
                # of pure copying (trace: dynamic-slice_bitcast_fusion.28)
                wl = (jnp.asarray(b.local, jnp.int32) - r if use_ring
                      else jnp.asarray(b.local, jnp.int32))
                m_p, l_p, acc_p = block_topk_attention(
                    self._q_for_tail(qf, state, idx), state.kv_tail, idx,
                    blk_idx, n_cand_h, block=bs,
                    n_par=self.cfg.pq.fetch_par, pair=self.fetch_pair,
                    win_len=wl, win_max=b.local,
                    interpret=self.interpret)
                partials = [self._deq_partials(m_p, l_p, acc_p, state, idx)]
                local_fused = True
            else:
                topk_idx = (blk_idx[:, :, None] * bs
                            + jnp.arange(bs, dtype=jnp.int32)[None, None, :]
                            ).reshape(BH_kv, self.topk_eff)
        else:
            topk_idx, _ = pq.mips_topk(
                scores, n_cand_h, b.topk, group=self.group,
                head_dim=self.D, metric=self.metric,
                approx=self.approx_topk)                     # [B·H_kv, k]
            topk_idx = jnp.sort(topk_idx, axis=-1)

        if not local_fused:
            # Per-slot local windows are CONTIGUOUS spans starting at
            # n_cand[b]: fetch them as B unrolled dynamic slices (B is
            # small and static). Expressing this as one row gather ran at
            # ~93 GB/s AND made XLA assign the 4+ GB kv_tail carry a
            # heads-major layout that the Pallas kernel then undid with a
            # whole-tail transpose copy EVERY step (profiled: 12.9 ms/step
            # at B=4/32k/8L); contiguous slices fuse at HBM roofline and
            # keep the carry row-major. Assembling one [B·H_kv, local, 2D]
            # buffer from B slices made XLA chain dynamic updates into a
            # ~100 MB temp and compress-remat every link (~6 ms/step at
            # B=8; profiled). The per-slot einsum reads each slice in
            # place at roofline. (On the kernel path the windows ride the
            # fetch kernel instead — local_fused above.)
            lmask = ((jnp.arange(b.local, dtype=jnp.int32) < b.local - r)
                     if use_ring else None)
            qg = qf.reshape(BH_kv, self.group, self.D)
            lp = []
            for b_i in range(B):
                kvl = jax.lax.dynamic_slice(
                    state.kv_tail,
                    (idx, b_i * self.H_kv, shared["n_cand"][b_i], 0),
                    (1, self.H_kv, b.local, 2 * self.D))[0]
                if self.kv_int8:
                    hsl = slice(b_i * self.H_kv, (b_i + 1) * self.H_kv)
                    kl, vl = quant.dequant_kv(kvl, state.k_scale[idx, hsl],
                                              state.v_scale[idx, hsl],
                                              dtype=state.k_sink.dtype)
                else:
                    kl, vl = kvl[..., :self.D], kvl[..., self.D:]
                lp.append(segment_partial(
                    qg[b_i * self.H_kv:(b_i + 1) * self.H_kv], kl, vl,
                    lmask))
            partials = partials + [tuple(
                jnp.concatenate([p[i] for p in lp], axis=0)
                for i in range(3))]
        segs = [(k_sink, v_sink, None)]
        if use_ring:
            rkv = state.ring_kv[idx]                  # [B·H_kv, K, 2D]
            rmask = jnp.broadcast_to(
                (jnp.arange(self.ring_k, dtype=jnp.int32) < r)[None],
                (BH_kv, self.ring_k))
            segs.append((rkv[..., :self.D], rkv[..., self.D:], rmask))
        if topk_idx is not None:
            kv_rows = state.kv_tail[idx, heads[:, None], topk_idx]
            k_rows, v_rows = self._split_rows(kv_rows, state, idx)
            segs.append((k_rows, v_rows, topk_idx < n_cand_h[:, None]))

        dt = k_sink.dtype
        k_new_f = k_new.reshape(BH_kv, 1, self.D).astype(dt)
        v_new_f = v_new.reshape(BH_kv, 1, self.D).astype(dt)
        out = decode_window_attention_segments(
            qf.reshape(B * H, 1, self.D),
            segs + [(k_new_f, v_new_f, None)], partials=partials)

        if self.deferred_appends:
            return (out.reshape(B, H, self.D),
                    (k_new_f[:, 0], v_new_f[:, 0]))

        # append + encode the new token per slot (scatter rows: per-slot
        # write positions n_cand[b] + local)
        x_new = self._to_groups(k_new_f[:, 0][:, None, :].reshape(
            BH_kv, 1, self.D))
        if self.metric == "ip":
            x_new = pq.ip2l2_lift_with_phi(x_new, state.phi[idx])
        cent_flat = centroids.reshape(BH_kv * self.S, self.C, -1)
        new_codes = pq.pq_encode(x_new, cent_flat).reshape(
            BH_kv, self.S).astype(state.codes.dtype)

        # per-slot appends as B unrolled dynamic updates (contiguous,
        # layout-neutral — see the local-window comment above)
        kv_new = self._tail_kv(k_new_f, v_new_f, state, idx)[:, 0]
        kv_tail, codes_up = state.kv_tail, state.codes
        Hk = self.H_kv
        for b_i in range(B):
            pos_b = shared["n_cand"][b_i] + b.local
            kv_tail = jax.lax.dynamic_update_slice(
                kv_tail, kv_new[b_i * Hk:(b_i + 1) * Hk][None, :, None, :],
                (idx, b_i * Hk, pos_b, 0))
            codes_up = jax.lax.dynamic_update_slice(
                codes_up,
                new_codes[b_i * Hk:(b_i + 1) * Hk][None, :, :, None],
                (idx, b_i * Hk, 0, pos_b))
        new = state.replace(kv_tail=kv_tail, codes=codes_up)
        return out.reshape(B, H, self.D), new

    def _jhist_defer(self, state: PQState) -> bool:
        """Defer the per-step histogram join to the chunk flush? Static at
        trace time (shapes). Requires the ring (the pending set is exactly
        the chunk's ring_r joins); 'auto' defers once the histogram is big
        enough that XLA's per-step join scatter reconciles layouts with
        whole-buffer copies (trace-measured flip between 403 MB (B=12,
        clean) and 545 MB (B=16, 3 copies = 5.3 ms/step))."""
        if not (self.use_jhist and self.ring_k
                and state.ring_kv is not None and state.jhist is not None):
            return False
        mode = self.cfg.pq.jhist_defer
        if mode != "auto":
            return mode == "on"
        return state.jhist.nbytes >= 480_000_000

    def _pending_mass(self, state: PQState, idx, lut, shared, B: int):
        """EXACT deferred-join scorer correction: the r = ring_r tokens at
        positions [n_cand − r, n_cand) per slot are candidates whose
        counts the lagging histogram misses; add their exp-LUT pair terms
        (the very terms the histogram matmul would have contributed —
        only f32 summation order differs) into the raw block mass.
        Returns [B·H, NB] f32."""
        K = self.ring_k
        Hk = self.H_kv
        g = self.group
        H = lut.shape[0]
        r = state.ring_r
        starts = shared["n_cand"] - r                      # [B]
        codes_l = state.codes[idx]                         # [BH, S, N]
        # pending spans as ONE tiny gather ([BH, S, K] cells) — a
        # B-unrolled dynamic-slice chain here cost ~2 ms/step at B=16
        t = jnp.arange(K, dtype=jnp.int32)
        pos = jnp.repeat(starts, Hk)[:, None] + t[None, :]     # [BH, K]
        cp = jnp.take_along_axis(
            codes_l, pos[:, None, :], axis=2).astype(jnp.int32)  # [BH,S,K]
        e = pq.jhist_exp_lut(lut, self.D)                  # [B·H, 2, C]
        c0 = jnp.repeat(cp[:, 0], g, axis=0)               # [B·H, K]
        c1 = jnp.repeat(cp[:, 1], g, axis=0)
        # gathers/scatter as ONE-HOT matmuls: the row-gather (e at codes)
        # and the per-column scatter-add each cost ~135 µs/layer-step on
        # the scalar core (16k elements); as einsums they are trivial
        # VPU/MXU contractions over tiny one-hots (same values, summation
        # order differs only within the correction's own fp freedom)
        oh0 = jax.nn.one_hot(c0, self.C, dtype=jnp.float32)   # [B·H, K, C]
        oh1 = jax.nn.one_hot(c1, self.C, dtype=jnp.float32)
        val = (jnp.einsum("hc,hkc->hk", e[:, 0], oh0)
               * jnp.einsum("hc,hkc->hk", e[:, 1], oh1))      # [B·H, K]
        val = jnp.where((t < r)[None, :], val, 0.0)
        starts_q = jnp.repeat(starts, Hk * g)              # [B·H]
        cols = (starts_q[:, None] + t[None, :]) // self.select_block
        NB = state.jhist.shape[2]
        ohc = jax.nn.one_hot(jnp.clip(cols, 0, NB - 1), NB,
                             dtype=jnp.float32)            # [B·H, K, NB]
        return jnp.einsum("hk,hkn->hn", val, ohc)

    def _jhist_flush_join(self, state: PQState) -> jax.Array:
        """Commit the chunk's deferred joins in ONE amortized update: a
        tiny per-(layer, head) local histogram of the pending pairs over
        the ≤W touched block columns, saturating-added into the big
        buffer via per-slot dynamic slices (once per chunk — the layout
        churn the per-step scatter paid now costs 1/ring_k as much)."""
        L, BH, NB, CC = state.jhist.shape
        Hk = self.H_kv
        B = BH // Hk
        K = self.ring_k
        bs = self.select_block
        W = (K - 1) // bs + 2     # max block columns a K-token span touches
        r = state.ring_r
        starts = state.n_cand - r                          # [B]
        t = jnp.arange(K, dtype=jnp.int32)
        starts_h = jnp.repeat(starts, Hk)                  # [BH]
        pos = starts_h[:, None] + t[None, :]               # [BH, K]
        cp = jnp.take_along_axis(
            state.codes, pos[None, :, None, :], axis=3).astype(jnp.int32)
        pair = cp[:, :, 0] * self.C + cp[:, :, 1]          # [L, BH, K]
        col0 = starts_h // bs
        rel = (starts_h[:, None] + t[None, :]) // bs - col0[:, None]
        cell = rel[None] * CC + pair                       # [L, BH, K]
        ones = jnp.broadcast_to(
            jnp.where(t < r, 1.0, 0.0)[None, None, :], cell.shape)
        hist = jax.vmap(lambda c, o: jax.ops.segment_sum(
            o, c, num_segments=W * CC))(
            cell.reshape(L * BH, K), ones.reshape(L * BH, K))
        hist = hist.reshape(L, BH, W, CC)
        J = state.jhist
        sat = jnp.issubdtype(J.dtype, jnp.integer)
        cap = jnp.iinfo(J.dtype).max if sat else None
        for b_i in range(B):
            c0b = (state.n_cand[b_i] - r) // bs
            region = jax.lax.dynamic_slice(
                J, (0, b_i * Hk, c0b, 0), (L, Hk, W, CC))
            add = hist[:, b_i * Hk:(b_i + 1) * Hk]
            if sat:
                region = jnp.minimum(
                    region.astype(jnp.int32) + add.astype(jnp.int32),
                    cap).astype(J.dtype)
            else:
                region = region + add.astype(J.dtype)
            J = jax.lax.dynamic_update_slice(J, region, (0, b_i * Hk,
                                                         c0b, 0))
        return J

    def _jhist_join_batched(self, state: PQState, shared, B: int):
        """Count each slot's joining token (position n_cand[b]) into its
        block's histogram — the incremental form of the tok < n_cand mask
        (see commit_appends). The per-slot code READS stay B unrolled
        (contiguous dynamic slices, layout-neutral) but the +1s commit as
        ONE scatter: a B-chain of scatter-adds on the multi-GB histogram
        compress-remats past ~0.5 GB (profiled 3.6 ms/step at
        B=8/block=128 where the chain writes a 1.1 GB buffer)."""
        L = state.codes.shape[0]
        Hk = self.H_kv
        joins = jnp.concatenate([
            jax.lax.dynamic_slice(
                state.codes, (0, b_i * Hk, 0, shared["n_cand"][b_i]),
                (L, Hk, self.S, 1))[..., 0]
            for b_i in range(B)], axis=1).astype(jnp.int32)   # [L, B·Hk, S]
        pair = joins[..., 0] * self.C + joins[..., 1]         # [L, B·Hk]
        blk = jnp.repeat(shared["n_cand"] // self.select_block, Hk)
        idx = (jnp.arange(L)[:, None], jnp.arange(B * Hk)[None, :],
               blk[None, :], pair)
        return pq.jhist_increment(state.jhist, idx)

    def commit_appends_batched(self, state: PQState, payloads,
                               shared) -> PQState:
        """Per-step stacked append for batch-as-heads: payloads =
        (k_new [L, B·H_kv, D], v_new [L, B·H_kv, D]).

        Ring path (default): every slot's new token lands at ONE global
        ring column — a single dynamic update for the whole batch; the
        ring flushes into per-slot tail positions once per decode chunk
        (flush_ring_batched). Per-step per-slot tail writes are ruled out
        by measurement: a per-(head, pos) scatter — flat-indexed or not —
        makes XLA store the multi-GB carry heads-major and transpose-copy
        it (12.9 ms/step at B=4; an 8 GB layout-copy temp that OOMs at
        B=8), while a B-unrolled chain of dynamic updates stops aliasing
        in place past B≈4 (compress-remat links, ~0.7 ms each)."""
        k_new, v_new = payloads
        b = self.budget
        L, BH_kv, D = k_new.shape
        B = BH_kv // self.H_kv
        if self.ring_k and state.ring_kv is not None:
            # the ring stays bf16 (recent tokens full-precision); the chunk
            # flush quantizes into the int8 tail
            kv = jnp.concatenate(
                [k_new, v_new], axis=-1).astype(state.ring_kv.dtype)
            new = state.replace(
                ring_kv=jax.lax.dynamic_update_slice(
                    state.ring_kv, kv[:, :, None, :],
                    (0, 0, state.ring_r, 0)),
                ring_r=state.ring_r + 1)
            if self.use_jhist and not self._jhist_defer(state):
                new = new.replace(
                    jhist=self._jhist_join_batched(state, shared, B))
            return new
        kv = self._tail_kv(k_new[:, :, None], v_new[:, :, None], state)[
            :, :, 0]

        # non-ring fallback (non-deferred configs): B unrolled chain
        xg = self._to_groups(k_new.reshape(L * BH_kv, 1, D))
        if self.metric == "ip":
            xg = pq.ip2l2_lift_with_phi(
                xg, state.phi.reshape(L * BH_kv * self.S, 1, 1))
        cent = state.centroids.reshape(L * BH_kv * self.S, self.C, -1)
        codes = pq.pq_encode(xg, cent).reshape(
            L, BH_kv, self.S).astype(state.codes.dtype)
        kv_tail, codes_up = state.kv_tail, state.codes
        Hk = self.H_kv
        for b_i in range(B):
            pos_b = shared["n_cand"][b_i] + b.local
            kv_tail = jax.lax.dynamic_update_slice(
                kv_tail, kv[:, b_i * Hk:(b_i + 1) * Hk, None, :],
                (0, b_i * Hk, pos_b, 0))
            codes_up = jax.lax.dynamic_update_slice(
                codes_up, codes[:, b_i * Hk:(b_i + 1) * Hk, :, None],
                (0, b_i * Hk, 0, pos_b))
        new = state.replace(kv_tail=kv_tail, codes=codes_up)
        if self.use_jhist:
            new = new.replace(
                jhist=self._jhist_join_batched(state, shared, B))
        return new

    def flush_ring_batched(self, state: PQState) -> PQState:
        """Bulk-commit the write-combining ring into the per-slot tails
        (once per decode chunk): encode all ring keys in one batched
        matmul, then one contiguous [L, H_kv, K, ·] dynamic update per
        slot at position n_cand[b] + local − ring_r. The trailing
        K − ring_r rows are garbage that the NEXT flush overwrites before
        they can become valid (the batched tail reserves tail_pad slack
        for the final chunk's overhang)."""
        if not self.ring_k or state.ring_kv is None:
            return state
        if self._jhist_defer(state):
            # commit the chunk's deferred joins BEFORE ring_r resets
            state = state.replace(jhist=self._jhist_flush_join(state))
        b = self.budget
        L, BH_kv, K, D2 = state.ring_kv.shape
        B = BH_kv // self.H_kv
        Hk = self.H_kv
        keys = state.ring_kv[..., :self.D]                 # [L, BH, K, D]
        xg = self._to_groups(keys.reshape(L * BH_kv, K, self.D))
        if self.metric == "ip":
            xg = pq.ip2l2_lift_with_phi(
                xg, state.phi.reshape(L * BH_kv * self.S, 1, 1))
        cent = state.centroids.reshape(L * BH_kv * self.S, self.C, -1)
        codes = pq.pq_encode(xg, cent).reshape(
            L, BH_kv, self.S, K).astype(state.codes.dtype)
        ring_src = (self._tail_kv(keys, state.ring_kv[..., self.D:], state)
                    if self.kv_int8 else state.ring_kv)
        kv_tail, codes_up = state.kv_tail, state.codes
        for b_i in range(B):
            p_b = state.n_cand[b_i] + b.local - state.ring_r
            kv_tail = jax.lax.dynamic_update_slice(
                kv_tail, ring_src[:, b_i * Hk:(b_i + 1) * Hk],
                (0, b_i * Hk, p_b, 0))
            codes_up = jax.lax.dynamic_update_slice(
                codes_up, codes[:, b_i * Hk:(b_i + 1) * Hk],
                (0, b_i * Hk, 0, p_b))
        return state.replace(kv_tail=kv_tail, codes=codes_up,
                             ring_r=jnp.zeros((), jnp.int32))

    def shared_pre_batched(self, state: PQState):
        return {"n_cand": state.n_cand}

    def shared_post_batched(self, state: PQState, shared):
        return state.replace(n_cand=state.n_cand + 1, pos=state.pos + 1)
