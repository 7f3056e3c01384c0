"""Attention operators, XLA-only implementations.

These are the portable reference implementations: numerically exact,
CPU-runnable, and the correctness baseline that the Pallas TPU kernels in
``ops/flash_attention.py`` are tested against. The chunked prefill here is an
online-softmax ("memory-efficient") attention — the same math as the vendored
flash-attn wheel the reference calls for all dense attention
(pq_search.py:251-256) — expressed as nested lax scans (q-blocks × k-blocks)
that XLA fuses; peak memory is O(block²) per head instead of O(T²).

Shapes: q [H, Tq, D], k/v [H_kv, Tk, D] (no batch dim; vmap for batching).
GQA expansion (the reference's repeat(), retrieval_based_compressor.py:6-10)
is done by reshaping q into [H_kv, group, ...] so no key/value copy is made.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite sentinel: keeps fully-masked rows NaN-free


def dense_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    q_offset: int | jax.Array = 0,
    valid_len: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Materialized-scores attention; O(Tq·Tk) memory. Test oracle and the
    small-window decode path. q [H, Tq, D], k/v [H_kv, Tk, D].

    q_offset: absolute position of q[0] minus that of k[0] (for causal
    masking of a decode suffix against a longer key set).
    valid_len: keys at index >= valid_len are masked out.
    valid_lo: keys at index < valid_lo are masked out (left-pad region).
    """
    H, Tq, D = q.shape
    H_kv, Tk, _ = k.shape
    group = H // H_kv
    scale = scale if scale is not None else 1.0 / (D ** 0.5)

    qg = q.reshape(H_kv, group, Tq, D).astype(jnp.float32)
    logits = jnp.einsum("hgqd,hkd->hgqk", qg, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale

    mask = jnp.ones((Tq, Tk), dtype=bool)
    if causal:
        qpos = jnp.arange(Tq)[:, None] + q_offset
        kpos = jnp.arange(Tk)[None, :]
        mask = mask & (kpos <= qpos)
    if valid_len is not None:
        mask = mask & (jnp.arange(Tk)[None, :] < valid_len)
    if valid_lo is not None:
        mask = mask & (jnp.arange(Tk)[None, :] >= valid_lo)
    logits = jnp.where(mask[None, None], logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hgqk,hkd->hgqd", probs, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.reshape(H, Tq, D).astype(q.dtype)


@partial(jax.jit, static_argnames=("causal", "block", "with_scores",
                                   "score_mode", "recent_cnt"))
def chunked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,
    *,
    causal: bool = True,
    block: int = 512,
    with_scores: bool = False,
    score_mode: str = "sum",
    recent_cnt: int = 32,
) -> tuple[jax.Array, Optional[jax.Array]]:
    """Online-softmax attention with q-block × k-block tiling.

    Memory-efficient prefill attention; optionally also emits per-key
    aggregated attention scores — the columns produced by the reference's
    Triton flash-attn-with-score kernel (flash_attn_with_score.py):
      * score_mode="sum": F[h, t] = Σ_q softmax_prob(q, t)  (:59-104)
      * score_mode="max": F[h, t] = max_q softmax_prob(q, t) over pairs with
        t <= q - recent_cnt (the non-recent column max, :106-155 with
        RECENT_CNT=32)

    q [H, T, D], k/v [H_kv, T, D] with identical T (self-attention prefill).
    Returns (out [H, T, D], scores [H, T] f32 or None).
    """
    H, T, D = q.shape
    H_kv = k.shape[0]
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)

    if valid_len is None:
        valid_len = jnp.asarray(T, jnp.int32)
    valid_len = jnp.asarray(valid_len, jnp.int32)
    valid_lo = (jnp.zeros((), jnp.int32) if valid_lo is None
                else jnp.asarray(valid_lo, jnp.int32))

    Tpad = (T + block - 1) // block * block
    if Tpad != T:
        q = jnp.pad(q, ((0, 0), (0, Tpad - T), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Tpad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tpad - T), (0, 0)))
    nb = Tpad // block

    qb = (q.reshape(H_kv, group, nb, block, D)
          .transpose(2, 0, 1, 3, 4).astype(jnp.float32) * scale)
    kb = k.reshape(H_kv, nb, block, D).transpose(1, 0, 2, 3).astype(jnp.float32)
    vb = v.reshape(H_kv, nb, block, D).transpose(1, 0, 2, 3).astype(jnp.float32)
    blk_ids = jnp.arange(nb, dtype=jnp.int32)
    offs = jnp.arange(block, dtype=jnp.int32)

    def logits_block(q_i, k_j, i, j):
        lg = jnp.einsum("hgqd,hkd->hgqk", q_i, k_j,
                        preferred_element_type=jnp.float32)
        qpos = i * block + offs
        kpos = j * block + offs
        mask = (kpos[None, :] < valid_len) & (kpos[None, :] >= valid_lo)
        if causal:
            mask = mask & (kpos[None, :] <= qpos[:, None])
        return jnp.where(mask[None, None], lg, NEG_INF)

    def q_block_pass(F_acc, q_inp):
        i, q_i = q_inp

        def kv_step(carry, k_inp):
            m, l, acc = carry
            j, k_j, v_j = k_inp
            lg = logits_block(q_i, k_j, i, j)
            m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
            p = jnp.exp(lg - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "hgqk,hkd->hgqd", p, v_j, preferred_element_type=jnp.float32)
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((H_kv, group, block), NEG_INF, jnp.float32)
        l0 = jnp.zeros((H_kv, group, block), jnp.float32)
        a0 = jnp.zeros((H_kv, group, block, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(kv_step, (m0, l0, a0), (blk_ids, kb, vb))
        out_i = acc / jnp.maximum(l, 1e-30)[..., None]

        if with_scores:
            # Second sweep with final (m, l): normalized probability columns
            # per key — the two-stage structure of the reference kernel
            # (flash_attn_with_score.py:158-262 + :59-104 / :106-155).
            qp = i * block + offs
            qvalid = (qp < valid_len) & (qp >= valid_lo)

            def score_step(F_run, k_inp):
                j, k_j = k_inp
                lg = logits_block(q_i, k_j, i, j)
                p = jnp.exp(lg - m[..., None]) / jnp.maximum(l, 1e-30)[..., None]
                if score_mode == "sum":
                    col = jnp.einsum("hgqk,q->hgk", p,
                                     qvalid.astype(jnp.float32))
                else:  # "max": non-recent column max (RECENT_CNT window)
                    kpos = j * block + offs
                    pair_ok = (qvalid[:, None]
                               & (kpos[None, :] <= qp[:, None] - recent_cnt))
                    col = jnp.max(jnp.where(pair_ok[None, None], p, 0.0),
                                  axis=2)
                prev = jax.lax.dynamic_slice(
                    F_run, (0, 0, j * block), (H_kv, group, block))
                merged = (prev + col if score_mode == "sum"
                          else jnp.maximum(prev, col))
                return jax.lax.dynamic_update_slice(
                    F_run, merged, (0, 0, j * block)), None

            F_acc, _ = jax.lax.scan(score_step, F_acc, (blk_ids, kb))
        return F_acc, out_i

    F0 = jnp.zeros((H_kv, group, Tpad), jnp.float32)
    F, outs = jax.lax.scan(q_block_pass, F0, (blk_ids, qb))
    out = (outs.transpose(1, 2, 0, 3, 4)
           .reshape(H, Tpad, D)[:, :T].astype(q.dtype))
    scores = F.reshape(H, Tpad)[:, :T] if with_scores else None
    return out, scores


@partial(jax.jit, static_argnames=("q_offset", "block"))
def chunked_attention_rect(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_len: Optional[jax.Array] = None,
    valid_lo: Optional[jax.Array] = None,
    *,
    q_offset: int = 0,
    block: int = 512,
) -> jax.Array:
    """Rectangular causal online-softmax attention: a q CHUNK against its
    full key prefix (q row 0 sits at absolute position q_offset relative to
    k row 0). XLA fallback for the chunked-prefill path — the portable
    counterpart of flash_attention(..., q_offset=) with O(block²) transients.

    q [H, Tq, D], k/v [H_kv, Tk, D] with Tq + q_offset ≤ Tk. Returns
    out [H, Tq, D] (q.dtype)."""
    H, Tq, D = q.shape
    H_kv, Tk, _ = k.shape
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)

    if valid_len is None:
        valid_len = jnp.asarray(Tk, jnp.int32)
    valid_len = jnp.asarray(valid_len, jnp.int32)
    valid_lo = (jnp.zeros((), jnp.int32) if valid_lo is None
                else jnp.asarray(valid_lo, jnp.int32))

    Tqp = (Tq + block - 1) // block * block
    Tkp = (Tk + block - 1) // block * block
    if Tqp != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, 0)))
    if Tkp != Tk:
        k = jnp.pad(k, ((0, 0), (0, Tkp - Tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tkp - Tk), (0, 0)))
    nbq, nbk = Tqp // block, Tkp // block

    qb = (q.reshape(H_kv, group, nbq, block, D)
          .transpose(2, 0, 1, 3, 4).astype(jnp.float32) * scale)
    kb = k.reshape(H_kv, nbk, block, D).transpose(1, 0, 2, 3).astype(
        jnp.float32)
    vb = v.reshape(H_kv, nbk, block, D).transpose(1, 0, 2, 3).astype(
        jnp.float32)
    offs = jnp.arange(block, dtype=jnp.int32)

    def q_block_pass(_, q_inp):
        i, q_i = q_inp
        qpos = q_offset + i * block + offs

        def kv_step(carry, k_inp):
            j, k_j, v_j = k_inp

            def do(carry):
                m, l, acc = carry
                lg = jnp.einsum("hgqd,hkd->hgqk", q_i, k_j,
                                preferred_element_type=jnp.float32)
                kpos = j * block + offs
                mask = ((kpos[None, :] < valid_len)
                        & (kpos[None, :] >= valid_lo)
                        & (kpos[None, :] <= qpos[:, None]))
                lg = jnp.where(mask[None, None], lg, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
                p = jnp.exp(lg - m_new[..., None])
                corr = jnp.exp(m - m_new)
                l_new = l * corr + jnp.sum(p, axis=-1)
                acc_new = acc * corr[..., None] + jnp.einsum(
                    "hgqk,hkd->hgqd", p, v_j,
                    preferred_element_type=jnp.float32)
                return m_new, l_new, acc_new

            # whole blocks past the causal frontier contribute nothing —
            # skip their matmuls (the scan length is static, the bound
            # isn't, so predicate instead of truncating)
            reachable = j * block <= q_offset + i * block + block - 1
            return jax.lax.cond(reachable, do, lambda c: c, carry), None

        m0 = jnp.full((H_kv, group, block), NEG_INF, jnp.float32)
        l0 = jnp.zeros((H_kv, group, block), jnp.float32)
        a0 = jnp.zeros((H_kv, group, block, D), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            kv_step, (m0, l0, a0),
            (jnp.arange(nbk, dtype=jnp.int32), kb, vb))
        return None, acc / jnp.maximum(l, 1e-30)[..., None]

    _, outs = jax.lax.scan(q_block_pass, None,
                           (jnp.arange(nbq, dtype=jnp.int32), qb))
    return (outs.transpose(1, 2, 0, 3, 4)
            .reshape(H, Tqp, D)[:, :Tq].astype(q.dtype))


def segment_partial(qg, k_seg, v_seg, mask=None):
    """Online-softmax partial (m, l, acc) of qg [H_kv, g, D] over ONE
    key/value segment [H_kv, W, D]; mask [H_kv, W] or [W] bool. Feed the
    result into decode_window_attention_segments(..., partials=[...]) —
    useful when different head groups attend different windows (per-slot
    local windows in batch-as-heads decode) and assembling one combined
    segment would materialize a large buffer."""
    H_kv, g, D = qg.shape
    scale = 1.0 / (D ** 0.5)
    logits = jnp.einsum("hgd,hwd->hgw", qg, k_seg,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        mask = mask if mask.ndim == 2 else jnp.broadcast_to(
            mask[None], (H_kv, mask.shape[-1]))
        logits = jnp.where(mask[:, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - m[..., None])
    if mask is not None:
        p = jnp.where(mask[:, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("hgw,hwd->hgd", p.astype(v_seg.dtype), v_seg,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def decode_window_attention_segments(q, segments, partials=()):
    """Single-step attention over multiple key/value segments WITHOUT
    concatenating them (each concat copies the whole window). Segments are
    processed independently and merged with the standard online-softmax
    (max/sum) combination — numerically identical to attention over the
    concatenation.

    q [H, 1, D]; segments: list of (k [H_kv, W_i, D], v, mask [H_kv, W_i]
    bool or None). `partials`: precomputed online-softmax partials
    (m [H_kv, g], l [H_kv, g], acc [H_kv, g, D]) from fused kernels
    (ops/block_attn_pallas.py), merged with the same combination."""
    H, _, D = q.shape
    H_kv = (segments[0][0] if segments else partials[0][0]).shape[0]
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)
    qg = q.reshape(H_kv, group, D)

    m = jnp.full((H_kv, group), NEG_INF, jnp.float32)
    l = jnp.zeros((H_kv, group), jnp.float32)
    acc = jnp.zeros((H_kv, group, D), jnp.float32)
    for pm, pl_, pacc in partials:
        m_new = jnp.maximum(m, pm)
        c_old = jnp.exp(m - m_new)
        c_p = jnp.exp(jnp.maximum(pm, NEG_INF) - m_new)
        l = l * c_old + pl_ * c_p
        acc = acc * c_old[..., None] + pacc * c_p[..., None]
        m = m_new
    for k_seg, v_seg, mask in segments:
        logits = jnp.einsum("hgd,hwd->hgw", qg, k_seg,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = jnp.where(mask[:, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        if mask is not None:
            p = jnp.where(mask[:, None, :], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "hgw,hwd->hgd", p.astype(v_seg.dtype), v_seg,
            preferred_element_type=jnp.float32)
        m = m_new
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(H, 1, D).astype(q.dtype)


def decode_window_attention(
    q: jax.Array,
    k_win: jax.Array,
    v_win: jax.Array,
    win_mask: Optional[jax.Array] = None,
    *,
    return_probs: bool = False,
):
    """Single-step attention over the assembled [sink|local|topk|new] window
    (pq_search.py:336-341). q [H, 1, D]; k/v_win [H_kv, W, D];
    win_mask [H_kv, W] bool (True = attend). The window is small (≈ budget),
    so materialized softmax is the right shape for the VPU/MXU.

    return_probs=True additionally returns the GQA-group-summed attention
    mass per window position [H_kv, W] f32 (streaming repr selection)."""
    H, _, D = q.shape
    H_kv, W, _ = k_win.shape
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)

    # operands stay bf16 (MXU-native); accumulation and softmax in f32
    qg = q.reshape(H_kv, group, D)
    logits = jnp.einsum("hgd,hwd->hgw", qg, k_win,
                        preferred_element_type=jnp.float32) * scale
    if win_mask is not None:
        logits = jnp.where(win_mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("hgw,hwd->hgd", probs.astype(v_win.dtype), v_win,
                     preferred_element_type=jnp.float32)
    out = out.reshape(H, 1, D).astype(q.dtype)
    if return_probs:
        return out, jnp.sum(probs, axis=1)
    return out
