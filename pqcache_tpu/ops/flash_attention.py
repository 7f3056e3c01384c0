"""Pallas TPU flash attention (prefill path).

Replaces the vendored flash-attn CUDA wheel the reference calls for dense
prefill attention (pq_search.py:251-256) and the XLA online-softmax fallback
in ops/attention_xla.py. Standard FlashAttention-2 structure: grid
(head, q_block, k_block) with the k dimension innermost; the (m, l, acc)
online-softmax carry lives in VMEM scratch across k-steps; causal blocks
above the diagonal are skipped entirely (half the FLOPs the XLA fallback
spends). GQA reads K/V blocks directly for the query head's kv group — no
repeated-KV materialization.

Left-padded prompts are handled by two prefetched scalars (valid_lo,
valid_len) that mask key positions outside the real token range.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, scale, block_q, block_k, causal,
                  q_offset=0):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)
    valid_lo = scalars_ref[0]
    valid_hi = scalars_ref[1]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: the whole block is masked when its first key position exceeds
    # the last query position
    reachable = True
    if causal:
        reachable = (j * block_k) <= (q_offset + i * block_q + block_q - 1)

    @pl.when(reachable)
    def _compute():
        # bf16 MXU operands, f32 accumulation (see _flash_kernel_tri)
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [BQ, BK]

        kpos = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = (kpos >= valid_lo) & (kpos < valid_hi)
        if causal:
            qpos = q_offset + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            mask = mask & (kpos <= qpos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]                            # [BQ, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nj - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_kernel_tri(scal_ref, q_ref, k_ref, v_ref, o_ref,
                      m_scr, l_scr, acc_scr, *, scale, block, n_pairs,
                      q_offset=0):
    """Causal kernel over a PACKED lower-triangle grid: grid step t handles
    the (i, j) = (scal[2+t], scal[2+n_pairs+t]) block pair, enumerated
    row-major with j ≤ jmax(i) — unreachable blocks never get a grid step
    or a DMA (the rectangular grid spent half its steps fetching blocks
    whose compute was @pl.when'd away; measured 26% MFU at 32k).

    q_offset (static): absolute position of q row 0 relative to k row 0 —
    the rectangular chunked-prefill case (a q chunk attending its causal
    key prefix). scal[2+2·n_pairs+t] == 1 marks the pair as its row's last
    (the diagonal block), replacing the square case's j == i.
    scal[2+3·n_pairs+t] == 1 marks pairs that straddle the causal frontier
    and need the per-element mask — for bk-aligned q_offset that is exactly
    the diagonal pair, but a misaligned q_offset (chunk not a block
    multiple) puts the frontier inside up to two trailing blocks per row."""
    t = pl.program_id(1)
    i = scal_ref[2 + t]
    j = scal_ref[2 + n_pairs + t]
    fin = scal_ref[2 + 2 * n_pairs + t]
    msk = scal_ref[2 + 3 * n_pairs + t]
    valid_lo = scal_ref[0]
    valid_hi = scal_ref[1]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # bf16 MXU operands, f32 accumulation: f32×f32 dots run the MXU at
    # 1/8 rate (profiled: the f32 kernel sat at 26% MFU)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [B, B]

    def _update(s, mask):
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    # the causal triangle only cuts into the DIAGONAL block, and validity
    # bounds only cut into blocks straddling valid_lo/valid_hi — interior
    # pairs (the vast majority) skip the iota/compare/select chain, which
    # is pure VPU work the kernel is bound on
    boundary = ((msk == 1) | (j * block < valid_lo)
                | ((j + 1) * block > valid_hi))

    @pl.when(boundary)
    def _masked():
        kpos = j * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 1)
        mask = (kpos >= valid_lo) & (kpos < valid_hi)
        qpos = q_offset + i * block + jax.lax.broadcasted_iota(
            jnp.int32, (block, block), 0)
        mask = mask & (kpos <= qpos)
        _update(jnp.where(mask, s, NEG_INF), mask)

    @pl.when(jnp.logical_not(boundary))
    def _plain():
        _update(s, None)

    @pl.when(fin == 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret",
                     "q_offset"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid_lo: jax.Array | int = 0,
    valid_len: jax.Array | None = None,
    *,
    causal: bool = True,
    q_offset: int = 0,
    block_q: int = 1024,  # swept at 32k/v5e: 1024 beats 512 (792 vs
    block_k: int = 1024,  # 557 ms/8L — per-grid-step cost dominates)
    interpret: bool = False,
) -> jax.Array:
    """q [H, Tq, D], k/v [H_kv, Tk, D] → out [H, Tq, D] (q.dtype).

    Key positions outside [valid_lo, valid_len) are masked (left-padded
    prompt support). Tq/Tk are padded internally to block multiples.

    q_offset (STATIC): absolute position of q row 0 relative to k row 0 —
    the chunked-prefill case where a q chunk attends its full causal key
    prefix (Tq + q_offset ≤ Tk). The packed grid only visits reachable
    (q-block, k-block) pairs, so a chunk costs its true triangle-slab
    FLOPs. Square self-attention is q_offset=0, Tq == Tk.
    """
    H, Tq, D = q.shape
    H_kv, Tk, _ = k.shape
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)

    bq = min(block_q, _round_up(Tq, 128))
    bk = min(block_k, _round_up(Tk, 128))
    Tqp = _round_up(Tq, bq)
    Tkp = _round_up(Tk, bk)
    if Tqp != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tqp - Tq), (0, 0)))
    if Tkp != Tk:
        pad = ((0, 0), (0, Tkp - Tk), (0, 0))
        k, v = jnp.pad(k, pad), jnp.pad(v, pad)

    if valid_len is None:
        valid_len = Tk

    if causal and bq == bk:
        # packed reachable-pair grid: one step per (q-block, k-block) pair
        # with j·bk ≤ q_offset + (i+1)·bq − 1; fin marks each row's last
        # (diagonal) pair
        import numpy as _np
        nq, nk = Tqp // bq, Tkp // bk
        jmax = _np.minimum((q_offset + (_np.arange(nq) + 1) * bq - 1) // bk,
                           nk - 1)
        qi = _np.repeat(_np.arange(nq), jmax + 1)
        kj = _np.concatenate([_np.arange(m + 1) for m in jmax])
        fin = _np.concatenate(
            [(_np.arange(m + 1) == m).astype(_np.int32) for m in jmax])
        # pairs straddling the causal frontier: the block's last key position
        # can exceed the row's FIRST query position. For bk-aligned q_offset
        # this is exactly the diagonal (== fin); misaligned offsets put the
        # frontier inside up to two trailing blocks per row.
        msk = ((kj + 1) * bk - 1 > q_offset + qi * bq).astype(_np.int32)
        n_pairs = qi.size
        scalars = jnp.concatenate([
            jnp.asarray([valid_lo, valid_len], jnp.int32),
            jnp.asarray(qi, jnp.int32), jnp.asarray(kj, jnp.int32),
            jnp.asarray(fin, jnp.int32), jnp.asarray(msk, jnp.int32)])
        kernel = functools.partial(
            _flash_kernel_tri, scale=scale, block=bq, n_pairs=n_pairs,
            q_offset=q_offset)
        out = pl.pallas_call(
            kernel,
            # the default 16 MB scoped-VMEM budget is ~0.4 MB short of the
            # 1024-block working set once the prefetched pair arrays grow
            # (128k ctx); v5e has 128 MB of VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(H, n_pairs),
                in_specs=[
                    pl.BlockSpec((1, bq, D),
                                 lambda h, t, s: (h, s[2 + t], 0)),
                    pl.BlockSpec(
                        (1, bk, D),
                        lambda h, t, s, np_=n_pairs, g=group: (
                            h // g, s[2 + np_ + t], 0)),
                    pl.BlockSpec(
                        (1, bk, D),
                        lambda h, t, s, np_=n_pairs, g=group: (
                            h // g, s[2 + np_ + t], 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, bq, D), lambda h, t, s: (h, s[2 + t], 0)),
                scratch_shapes=[
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, 128), jnp.float32),
                    pltpu.VMEM((bq, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((H, Tqp, D), q.dtype),
            interpret=interpret,
        )(scalars, q, k, v)
        return out[:, :Tq]

    scalars = jnp.asarray(
        [valid_lo, valid_len], jnp.int32)

    grid = (H, Tqp // bq, Tkp // bk)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=bq, block_k=bk, causal=causal,
        q_offset=q_offset)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # with scalar prefetch, index maps receive the scalar ref as a
            # trailing argument
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda h, i, j, s: (h, i, 0)),
                pl.BlockSpec((1, bk, D),
                             lambda h, i, j, s: (h // group, j, 0)),
                pl.BlockSpec((1, bk, D),
                             lambda h, i, j, s: (h // group, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda h, i, j, s: (h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Tqp, D), q.dtype),
        interpret=interpret,
    )(scalars, q, k, v)
    return out[:, :Tq]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Score sweep: per-key aggregated attention columns, both modes of the
# reference's flash_attn_with_score.py — "sum" (column sums, :59-104) and
# "max" (non-recent column max with a RECENT_CNT exclusion window,
# :106-155). Two-phase per q-block row: phase 0 recomputes the
# online-softmax stats (m, l) for the row, phase 1 accumulates normalized
# probability columns into F — the reference kernel's two-stage structure,
# with F blocks revisited across q rows.

def _score_kernel(scalars_ref, q_ref, k_ref, f_ref, m_scr, l_scr,
                  *, scale, block_q, block_k, n_k, score_mode="sum",
                  recent_cnt=32):
    i = pl.program_id(1)
    jj = pl.program_id(2)
    phase = jj // n_k
    j = jj % n_k
    valid_lo = scalars_ref[0]
    valid_hi = scalars_ref[1]

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    qpos = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    kpos = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    mask = ((kpos >= valid_lo) & (kpos < valid_hi) & (kpos <= qpos)
            & (qpos >= valid_lo) & (qpos < valid_hi))
    s = jnp.where(mask, s, NEG_INF)

    @pl.when(jnp.logical_and(phase == 0, j == 0))
    def _init_stats():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(phase == 0)
    def _stats():
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
            l_scr.shape)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(phase == 1)
    def _accumulate():
        m = m_scr[:, :1]
        l = jnp.maximum(l_scr[:, :1], 1e-30)
        p = jnp.where(mask, jnp.exp(s - m), 0.0) / l
        if score_mode == "sum":
            col = jnp.sum(p, axis=0, keepdims=True)  # [1, block_k]
        else:  # "max": exclude (q, k) pairs within the recent window
            pair_ok = mask & (kpos <= qpos - recent_cnt)
            col = jnp.max(jnp.where(pair_ok, p, 0.0), axis=0, keepdims=True)

        @pl.when(i == 0)
        def _first():
            f_ref[...] = col

        @pl.when(i > 0)
        def _rest():
            f_ref[...] = (f_ref[...] + col if score_mode == "sum"
                          else jnp.maximum(f_ref[...], col))


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret",
                              "score_mode", "recent_cnt"))
def flash_scores(
    q: jax.Array,
    k: jax.Array,
    valid_lo: jax.Array | int = 0,
    valid_len: jax.Array | None = None,
    *,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    score_mode: str = "sum",
    recent_cnt: int = 32,
) -> jax.Array:
    """Per-key causal aggregated attention columns.

    q [H, T, D], k [H_kv, T, D] → F [H, T] f32.
    score_mode="sum": F[h, t] = Σ_q softmax_prob(q, t) over valid causal
    pairs. score_mode="max": F[h, t] = max_q softmax_prob(q, t) over pairs
    with t <= q - recent_cnt (the reference's non-recent column max,
    flash_attn_with_score.py:106-155).
    """
    H, T, D = q.shape
    H_kv = k.shape[0]
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)
    bq = min(block_q, _round_up(T, 128))
    bk = min(block_k, _round_up(T, 128))
    Tp = _round_up(T, max(bq, bk))
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k = jnp.pad(q, pad), jnp.pad(k, pad)
    if valid_len is None:
        valid_len = T
    scalars = jnp.asarray([valid_lo, valid_len], jnp.int32)
    n_k = Tp // bk

    kernel = functools.partial(_score_kernel, scale=scale, block_q=bq,
                               block_k=bk, n_k=n_k, score_mode=score_mode,
                               recent_cnt=recent_cnt)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Tp // bq, 2 * n_k),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda h, i, jj, s: (h, i, 0)),
                pl.BlockSpec(
                    (1, bk, D),
                    lambda h, i, jj, s, nk=n_k, g=group: (h // g, jj % nk, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, bk), lambda h, i, jj, s, nk=n_k: (h, jj % nk)),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Tp), jnp.float32),
        interpret=interpret,
    )(scalars, q, k)
    return out[:, :T]
