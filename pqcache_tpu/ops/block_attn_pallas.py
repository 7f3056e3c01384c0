"""Fused block-retrieval attention kernel (Pallas TPU).

The decode hot path must fetch the top-k selected KV rows from the
HBM-resident tail and attend over them. XLA's row gather issues a
scalar-core DMA per 512 B row (~2 GB/s effective — the dominant decode
overhead at 32k), and materializes the gathered window before a separate
attention pass reads it again.

This kernel does both in one pass at BLOCK granularity: the top-k selection
runs block-granular (pq.mips_topk_blocks), and the kernel's BlockSpec
index_map reads the SELECTED blocks directly out of the stacked
[L, H_kv, N, 2D] tail via scalar-prefetched indices — Pallas double-buffers
the per-block DMA against the attention compute of the previous block, so
the HBM traffic is exactly the selected blocks at streaming bandwidth, and
no gathered copy is ever written back. Per (head, block) step it runs the
online-softmax update
    s = q_h · K_blk^T   →  (m, l, acc) scratch update  →  acc += p · V_blk
and emits per-head partials (m, l, acc) that merge with the
[sink | local | new] segments through the standard online-softmax
combination (ops/attention_xla.decode_window_attention_segments).

Reference anchor: the decode fetch+attend flow of pq_search.py:265-360 and
the block-granular residency of cache_manager.py:119-123, fused the TPU way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(scal_ref, q_ref, *rest, bs, D, nb_pad, nb_sel, n_par,
            n_heads, scale, pair=False, nb_local=0):
    kv_refs = rest[:n_par]
    m_ref, l_ref, acc_ref, m_scr, l_scr, acc_scr = rest[n_par:]
    h = pl.program_id(0)
    j = pl.program_id(1)
    n_steps = nb_pad // n_par
    n_cand = scal_ref[1 + h]                      # per-head (per-slot) count
    # local-window coverage (nb_local > 0): entries [nb_sel, nb_sel+nb_local)
    # of the index list are the aligned blocks spanning the CONTIGUOUS
    # window [n_cand, n_cand + win) — same DMA path, range mask instead of
    # the candidate mask (the two regions are disjoint, so no row is
    # attended twice)
    win = scal_ref[1 + n_heads + h] if nb_local else None
    scal_base = 1 + (2 if nb_local else 1) * n_heads

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale          # [g, D]
    # n_par selected blocks per grid step: their HBM→VMEM DMAs are issued
    # together by the pipeline (the per-block DMA is latency- not
    # bandwidth-bound at 512 B × bs rows). Lane assignment is BLOCKED
    # (lane p owns the sorted slice [p·n_steps, (p+1)·n_steps)) so that in
    # pair mode adjacent selected blocks of one 2bs-aligned pair hit the
    # same ref on consecutive steps and the second DMA is elided.
    #
    # The softmax update is COMBINED across the step's n_par blocks: a
    # per-block running (m, l, acc) update chains n_par dependent VPU
    # sequences per grid step, which is what bounds the kernel (measured
    # ~2× the DMA roofline at n_par=16). Instead: per-block s/p terms are
    # independent, one max-tree + one scratch update per grid step —
    # identical math (online softmax over the step's union segment).
    fetch = 2 * bs if pair else bs
    s_list, v_list, mask_list = [], [], []
    for p_i in range(n_par):
        jj = p_i * n_steps + j
        blk = scal_ref[scal_base + h * nb_pad + jj]
        kv = kv_refs[p_i][0, 0]                        # [fetch, 2D]
        k = kv[:, :D].astype(jnp.float32)
        v_list.append(kv[:, D:].astype(jnp.float32))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [g, fetch]
        if nb_local:
            is_loc = jj >= nb_sel
            lo = jnp.where(is_loc, n_cand, 0)
            hi = jnp.where(is_loc, n_cand + win, n_cand)
            # window entries past hi_blk were CLAMPED to the tail block by
            # the caller; without this mask the tail block appears twice in
            # the fetch list and its in-range rows double-count in l/acc
            hi_blk = (n_cand + win - 1) // bs
            not_dup = jnp.logical_or(
                ~is_loc, (n_cand // bs) + (jj - nb_sel) <= hi_blk)
            in_list = (jj < nb_sel + nb_local) & not_dup
        else:
            lo, hi, in_list = 0, n_cand, jj < nb_sel
        if pair:
            # fetched the 2bs-aligned pair containing blk; attend only the
            # selected bs-half (selection quality stays at bs granularity)
            tok = ((blk // 2) * fetch
                   + jax.lax.broadcasted_iota(jnp.int32, (1, fetch), 1))
            half = (tok >= blk * bs) & (tok < blk * bs + bs)
            mask = half & (tok >= lo) & (tok < hi) & in_list
        else:
            tok = blk * bs + jax.lax.broadcasted_iota(
                jnp.int32, (1, fetch), 1)
            mask = (tok >= lo) & (tok < hi) & in_list  # padded steps no-op
        s_list.append(jnp.where(mask, s, NEG_INF))
        mask_list.append(mask)

    m_prev = m_scr[:, :1]
    m_new = m_prev
    for s in s_list:                                   # cheap max tree
        m_new = jnp.maximum(m_new, jnp.max(s, axis=-1, keepdims=True))
    l_add = jnp.zeros_like(m_new)
    acc_add = jnp.zeros_like(acc_scr)
    for s, v, mask in zip(s_list, v_list, mask_list):  # independent terms
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_add = l_add + jnp.sum(p, axis=-1, keepdims=True)
        acc_add = acc_add + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    corr = jnp.exp(m_prev - m_new)
    l_scr[:] = jnp.broadcast_to(l_scr[:, :1] * corr + l_add, l_scr.shape)
    acc_scr[:] = acc_scr[:] * corr + acc_add
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nb_pad // n_par - 1)
    def _finalize():
        m_ref[0] = m_scr[:]
        l_ref[0] = l_scr[:]
        acc_ref[0] = acc_scr[:]


@functools.partial(jax.jit, static_argnames=("block", "n_par", "pair",
                                             "win_max", "interpret"))
@jax.named_scope("pq_fetch")
def block_topk_attention(
    q: jax.Array,
    kv_tail: jax.Array,
    layer: jax.Array,
    blk_idx: jax.Array,
    n_cand: jax.Array,
    *,
    block: int,
    n_par: int = 4,
    pair: bool = False,
    win_len=None,
    win_max: int = 0,
    interpret: bool = False,
):
    """Attention partials of q over the selected candidate blocks.

    q [H, 1, D]; kv_tail [L, H_kv, N, 2D] (N % block == 0) — H_kv may be a
    FOLDED B·H_kv (batch-as-heads); layer: i32 scalar;
    blk_idx [H_kv, nb_sel] i32 (sorted or not); n_cand: i32 scalar or
    [H_kv] per-head counts — tokens at index >= n_cand are masked.

    `n_par` selected blocks are fetched per grid step through parallel
    input refs (same tail operand, n_par index maps): the per-block DMA is
    latency-bound, so overlapping n_par of them cuts the sequential DMA
    count n_par× (measured 1.6 → ~0.5 ms/step at 32k/8L/26 blocks).

    `pair=True` keeps SELECTION at `block` granularity but DMAs the
    2·block-aligned pair containing each selected block, masking the
    unselected half: sorted adjacent selections share one DMA (the lane's
    next step maps to the same pair → the copy is elided), halving the
    latency-bound DMA count at key-locality-heavy selections while quality
    stays at the finer granularity. Requires N % (2·block) == 0.

    `win_len`/`win_max`: local-window coverage. win_max > 0 appends the
    ceil(win_max/block)+1 aligned blocks spanning the contiguous span
    [n_cand, n_cand + win_len) per head to the fetch list (win_len: i32
    scalar or [H_kv], <= win_max); rows in the span are attended with the
    same online-softmax pass. This replaces a separate materialized
    dynamic-slice of the window (at B=16/32k the 16 per-slot slices +
    XLA's remat of them cost ~1.8 ms/step) with range-masked block DMAs.

    Returns (m [H_kv, g], l [H_kv, g], acc [H_kv, g, D]) f32 online-softmax
    partials (logits scaled by 1/sqrt(D)) for segment merging.
    """
    H, _, D = q.shape
    L, H_kv, N, D2 = kv_tail.shape
    group = H // H_kv
    nb_sel = blk_idx.shape[1]
    assert N % block == 0 and D2 == 2 * D
    if pair:
        assert N % (2 * block) == 0, (N, block)
    scale = 1.0 / (D ** 0.5)

    n_cand = jnp.asarray(n_cand, jnp.int32)
    if n_cand.ndim == 0:
        n_cand = jnp.broadcast_to(n_cand, (H_kv,))

    nb_local = 0
    if win_max:
        # aligned blocks covering [n_cand, n_cand + win): the span crosses
        # at most ceil(win_max/block)+1 block boundaries; entries clamped
        # to the tail (over-span rows are range-masked anyway)
        nb_local = -(-win_max // block) + 1
        lo_blk = n_cand // block                               # [H_kv]
        ent = jnp.minimum(
            lo_blk[:, None] + jnp.arange(nb_local, dtype=jnp.int32)[None],
            N // block - 1)
        blk_idx = jnp.concatenate([blk_idx.astype(jnp.int32), ent], axis=1)
        win_len = jnp.asarray(win_len, jnp.int32)
        if win_len.ndim == 0:
            win_len = jnp.broadcast_to(win_len, (H_kv,))

    nb_tot = nb_sel + nb_local
    n_par = min(n_par, nb_tot)
    nb_pad = -(-nb_tot // n_par) * n_par
    if nb_pad != nb_tot:
        # padding lanes index block 0 (always in-bounds); the kernel's
        # in-list mask zeroes their contribution
        blk_idx = jnp.pad(blk_idx, ((0, 0), (0, nb_pad - nb_tot)))

    scalars = jnp.concatenate(
        [jnp.asarray(layer, jnp.int32).reshape(1), n_cand]
        + ([win_len] if nb_local else [])
        + [blk_idx.astype(jnp.int32).reshape(-1)])
    qg = q.reshape(H_kv, group, D)

    n_steps = nb_pad // n_par
    grid = (H_kv, n_steps)
    kernel = functools.partial(_kernel, bs=block, D=D, nb_pad=nb_pad,
                               nb_sel=nb_sel, n_par=n_par, n_heads=H_kv,
                               scale=scale, pair=pair, nb_local=nb_local)

    fetch = 2 * block if pair else block

    base = 1 + (2 if nb_local else 1) * H_kv

    def kv_spec(p_i):
        # blocked lane assignment: lane p reads scalar slot p·n_steps + j
        if pair:
            return pl.BlockSpec(
                (1, 1, fetch, D2),
                lambda h, j, s, p=p_i, nb=nb_pad, b0=base, ns=n_steps: (
                    s[0], h, s[b0 + h * nb + p * ns + j] // 2, 0))
        return pl.BlockSpec(
            (1, 1, fetch, D2),
            lambda h, j, s, p=p_i, nb=nb_pad, b0=base, ns=n_steps: (
                s[0], h, s[b0 + h * nb + p * ns + j], 0))

    m, l, acc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, group, D), lambda h, j, s: (h, 0, 0)),
            ] + [kv_spec(p_i) for p_i in range(n_par)],
            out_specs=[
                pl.BlockSpec((1, group, 128), lambda h, j, s: (h, 0, 0)),
                pl.BlockSpec((1, group, 128), lambda h, j, s: (h, 0, 0)),
                pl.BlockSpec((1, group, D), lambda h, j, s: (h, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((group, 128), jnp.float32),
                pltpu.VMEM((group, 128), jnp.float32),
                pltpu.VMEM((group, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H_kv, group, 128), jnp.float32),
            jax.ShapeDtypeStruct((H_kv, group, 128), jnp.float32),
            jax.ShapeDtypeStruct((H_kv, group, D), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, qg, *([kv_tail] * n_par))
    return m[:, :, 0], l[:, :, 0], acc


@jax.named_scope("pq_fetch")
def block_topk_attention_xla(q, kv_tail, layer, blk_idx, n_cand, *, block,
                             win_len=None, win_max: int = 0):
    """XLA reference with identical contract (tests / non-TPU)."""
    H, _, D = q.shape
    L, H_kv, N, _ = kv_tail.shape
    group = H // H_kv
    heads = jnp.arange(H_kv)
    n_cand = jnp.asarray(n_cand, jnp.int32)
    if n_cand.ndim == 0:
        n_cand = jnp.broadcast_to(n_cand, (H_kv,))
    nb_sel = blk_idx.shape[1]
    rows = (blk_idx[:, :, None] * block
            + jnp.arange(block, dtype=jnp.int32)[None, None, :]
            ).reshape(H_kv, nb_sel * block)
    mask = rows < n_cand[:, None]
    if win_max:
        nb_local = -(-win_max // block) + 1
        lo_blk = n_cand // block
        ent = jnp.minimum(
            lo_blk[:, None] + jnp.arange(nb_local, dtype=jnp.int32)[None],
            N // block - 1)
        lrows = (ent[:, :, None] * block
                 + jnp.arange(block, dtype=jnp.int32)[None, None, :]
                 ).reshape(H_kv, nb_local * block)
        win_len = jnp.asarray(win_len, jnp.int32)
        if win_len.ndim == 0:
            win_len = jnp.broadcast_to(win_len, (H_kv,))
        hi_blk = (n_cand + win_len - 1) // block
        lmask = ((lrows >= n_cand[:, None])
                 & (lrows < (n_cand + win_len)[:, None])
                 # mask entries clamped onto the tail block (duplicates)
                 & (lo_blk[:, None]
                    + jnp.arange(nb_local, dtype=jnp.int32)[None]
                    <= hi_blk[:, None])[:, :, None].repeat(block, 2)
                 .reshape(H_kv, nb_local * block))
        rows = jnp.concatenate([rows, lrows], axis=1)
        mask = jnp.concatenate([mask, lmask], axis=1)
    kv = kv_tail[layer, heads[:, None], rows]         # [H_kv, nb*bs, 2D]
    k, v = kv[..., :D].astype(jnp.float32), kv[..., D:].astype(jnp.float32)
    qg = q.reshape(H_kv, group, D).astype(jnp.float32) / (D ** 0.5)
    s = jnp.einsum("hgd,hwd->hgw", qg, k, preferred_element_type=jnp.float32)
    s = jnp.where(mask[:, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.where(mask[:, None, :], jnp.exp(s - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("hgw,hwd->hgd", p, v, preferred_element_type=jnp.float32)
    return m, l, acc
