"""Pallas TPU kernel for ADC (asymmetric distance) score computation.

The decode hot path must score every candidate token from its PQ codes:
    scores[h, g, t] = sum_s LUT[h, g, s, codes[h, s, t]]
(pq_search.py:316-317: qk_table gather + subvector sum). XLA lowers the
code-indexed gather to a scalarized gather (~250M elem/s on TPU) — at 32k
candidates × 8 layers that alone is tens of ms per token.

This kernel reformulates the gather as an MXU matmul: for each candidate
block, build the one-hot code matrix [S*C, BT] on the VPU with a single
vectorized compare against an iota, then compute
    scores_block[g, t] = LUT_flat[g, S*C] @ onehot[S*C, t].
The LUT (a few KB) stays in VMEM across the block sweep; codes stream from
HBM at 1 byte/token/subvec — the kernel is bandwidth-optimal in the code
store, which is 64× smaller than the keys it summarizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adc_kernel(lut_ref, codes_ref, out_ref, *, n_subvec):
    # lut_ref: [1, g, S*C] f32 (subvec-major flat); codes_ref: [1, S, BT]
    # int8; out_ref: [1, g, BT] f32. Mosaic can't shape-cast across lanes,
    # so the one-hot is built per-subvec and stacked along sublanes.
    SC = lut_ref.shape[-1]
    S = n_subvec
    C = SC // S
    BT = codes_ref.shape[-1]
    codes = codes_ref[0].astype(jnp.int32)              # [S, BT]
    cent_ids = jax.lax.broadcasted_iota(jnp.int32, (C, BT), 0)
    parts = [(codes[s:s + 1, :] == cent_ids).astype(jnp.float32)
             for s in range(S)]
    onehot = jnp.concatenate(parts, axis=0)             # [S*C, BT]
    out_ref[0] = jnp.dot(lut_ref[0], onehot,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
@jax.named_scope("pq_score")
def adc_scores_pallas(
    lut: jax.Array,
    codes: jax.Array,
    *,
    block_t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """lut: [H_kv, g, S, C] f32; codes: [H_kv, S, T] int8/int32.

    Returns scores [H_kv, g, T] f32. T is padded internally to a block
    multiple; padded scores are garbage and must be masked by the caller
    (the candidate-count mask already does).
    """
    H_kv, g, S, C = lut.shape
    T = codes.shape[-1]
    bt = min(block_t, _round_up(T, 128))
    Tp = _round_up(T, bt)
    if Tp != T:
        codes = jnp.pad(codes, ((0, 0), (0, 0), (0, Tp - T)))
    lut_flat = lut.astype(jnp.float32).reshape(H_kv, g, S * C)

    out = pl.pallas_call(
        functools.partial(_adc_kernel, n_subvec=S),
        grid=(H_kv, Tp // bt),
        in_specs=[
            pl.BlockSpec((1, g, S * C), lambda h, t: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, bt), lambda h, t: (h, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, bt), lambda h, t: (h, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H_kv, g, Tp), jnp.float32),
        interpret=interpret,
    )(lut_flat, codes)
    return out[:, :, :T]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@jax.named_scope("pq_score")
def adc_scores_xla(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """Reference XLA implementation (same contract)."""
    gathered = jnp.take_along_axis(
        lut, codes[:, None, :, :].astype(jnp.int32), axis=-1)
    return jnp.sum(gathered, axis=2)


# ---------------------------------------------------------------------------
# v2: all heads fused into one deep matmul per candidate block.
#
# The per-head kernel above issues a [g, S*C] @ [S*C, BT] dot per (head,
# block) — only g (=4) MXU rows busy. Packing the LUT block-diagonally over
# kv heads gives one [H, H_kv*S*C] @ [H_kv*S*C, BT] dot per block: 32 rows
# and a 1024-deep contraction, ~8× fewer grid steps, bf16 operands.

def _adc_kernel_v2(lut_ref, codes_ref, out_ref, *, n_subvec, n_cent):
    H_kv, S, BT = codes_ref.shape
    C = n_cent
    # one-hot rows ordered (c, h, s) — pltpu.repeat tiles the whole block,
    # so row r = c·(H_kv·S) + h·S + s; the wrapper orders LUT columns to
    # match. One tiled copy + one vectorized compare, no sublane concats.
    codes2 = codes_ref[...].astype(jnp.int32).reshape(H_kv * S, BT)
    rep = pltpu.repeat(codes2, C, axis=0)               # [C*H_kv*S, BT]
    cent = jax.lax.broadcasted_iota(
        jnp.int32, (C * H_kv * S, BT), 0) // (H_kv * S)
    onehot = (rep == cent).astype(jnp.bfloat16)
    out_ref[:, :] = jax.lax.dot_general(
        lut_ref[:, :], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _adc_kernel_v2_batched(lut_ref, codes_ref, out_ref, *, n_subvec, n_cent):
    # same as _adc_kernel_v2 with a leading batch block dim of 1
    _adc_kernel_v2(lut_ref.at[0], codes_ref.at[0], out_ref.at[0],
                   n_subvec=n_subvec, n_cent=n_cent)


def _adc_v2_call(lut_bd, codes, *, S, C, bt, interpret):
    """lut_bd [B, H, C*H_kv*S] bf16; codes [B, H_kv, S, Tp] → [B, H, Tp].

    One kernel with the batch in the grid — a vmapped pallas_call would
    otherwise lower to a sequential loop over the batch."""
    B, H, SC = lut_bd.shape
    _, H_kv, _, Tp = codes.shape
    return pl.pallas_call(
        functools.partial(_adc_kernel_v2_batched, n_subvec=S, n_cent=C),
        grid=(B, Tp // bt),
        in_specs=[
            pl.BlockSpec((1, H, SC), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H_kv, S, bt), lambda b, t: (b, 0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, bt), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp), jnp.float32),
        interpret=interpret,
    )(lut_bd, codes)


def _adc_v2_prep(lut, codes, block_t):
    H_kv, g, S, C = lut.shape[-4:]
    H = H_kv * g
    T = codes.shape[-1]
    bt = min(block_t, _round_up(T, 128))
    Tp = _round_up(T, bt)
    if Tp != T:
        pad = [(0, 0)] * (codes.ndim - 1) + [(0, Tp - T)]
        codes = jnp.pad(codes, pad)
    # block-diagonal LUT: row h only reads its kv head's code rows; column
    # ordering (c, o, s) matches the kernel's tiled one-hot row ordering
    eye = jnp.eye(H_kv, dtype=lut.dtype)
    lut_bd = jnp.einsum("...ko,...kgsc->...kgcos", eye, lut).reshape(
        lut.shape[:-4] + (H, C * H_kv * S)).astype(jnp.bfloat16)
    return lut_bd, codes, bt, Tp


# ---------------------------------------------------------------------------
# v3: ADC scores → online softmax → per-block attention mass, one kernel.
#
# The block-granular decode path only consumes PER-BLOCK importances
# (mips_topk_blocks): materializing the [H, T] score row, re-reading it for
# the softmax, and re-reading the probs for the block reduction is three
# kernel dispatches and ~8 MB of HBM round trips per layer-step. This kernel
# keeps the whole chain in VMEM: per candidate chunk it runs the v2
# one-hot-matmul ADC, folds the chunk into a running row max + per-block
# exp-sum scratch (the block reduction is a second MXU matmul against a
# block-indicator built from iotas — no unaligned lane stores), and emits
# the normalized per-(q-head, block) attention mass [H, NB]. The caller
# group-sums [H → H_kv] and top-ks over the ~T/block entries.

def _adc_block_call(lut_bd, codes, n_cand, *, S, C, sel_block, scale, bt,
                    NBp, interpret):
    """lut_bd [B, H, C*H_kv*S] bf16; codes [B, H_kv, S, Tp]; n_cand [B] i32
    → normalized per-block mass [B, H, NBp] f32."""
    B, H, SC = lut_bd.shape
    _, H_kv, _, Tp = codes.shape
    n_chunks = Tp // bt
    grid = (B, n_chunks)

    def k2(scal_ref, lut_ref, codes_ref, out_ref, m_scr, u_scr):
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, -1e30)
            u_scr[:] = jnp.zeros_like(u_scr)

        BT = codes_ref.shape[-1]
        codes2 = codes_ref[0].astype(jnp.int32).reshape(H_kv * S, BT)
        rep = pltpu.repeat(codes2, C, axis=0)
        cent = jax.lax.broadcasted_iota(
            jnp.int32, (C * H_kv * S, BT), 0) // (H_kv * S)
        onehot = (rep == cent).astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            lut_ref[0], onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        tok = j * BT + jax.lax.broadcasted_iota(jnp.int32, (1, BT), 1)
        mask = tok < scal_ref[b]
        s = jnp.where(mask, s, -1e30)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        u_scr[:] = u_scr[:] * jnp.exp(m_prev - m_new)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        nb_chunk = BT // sel_block
        t_blk = jax.lax.broadcasted_iota(
            jnp.int32, (BT, NBp), 0) // sel_block + j * nb_chunk
        b_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, NBp), 1)
        ind = (t_blk == b_ids).astype(jnp.bfloat16)
        u_scr[:] = u_scr[:] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), ind, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(j == n_chunks - 1)
        def _finalize():
            z = jnp.sum(u_scr[:], axis=-1, keepdims=True)
            out_ref[0] = u_scr[:] / jnp.maximum(z, 1e-30)

    return pl.pallas_call(
        k2,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, SC), lambda b, j, s: (b, 0, 0)),
                pl.BlockSpec((1, H_kv, S, bt), lambda b, j, s: (b, 0, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, H, NBp), lambda b, j, s: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, NBp), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, NBp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(n_cand, jnp.int32).reshape(B), lut_bd, codes)


@functools.partial(jax.jit,
                   static_argnames=("sel_block", "head_dim", "block_t",
                                    "interpret"))
@jax.named_scope("pq_score")
def adc_block_scores_pallas(
    lut: jax.Array,
    codes: jax.Array,
    n_cand: jax.Array,
    *,
    sel_block: int,
    head_dim: int,
    block_t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Fused ADC → softmax → per-block attention mass (euc metric).

    lut [H_kv, g, S, C] f32; codes [H_kv, S, T] int8/int32 (T % sel_block
    == 0); n_cand i32 scalar — tokens at index >= n_cand carry no mass.

    Returns per-q-head normalized block mass [H, T // sel_block] f32
    (rows sum to 1 over valid blocks). Group-sum + top-k stay with the
    caller (tiny [H, ~T/block] ops). Equivalent XLA chain:
    softmax(adc_scores/√D) masked → reshape-sum over sel_block.
    """
    H_kv, g, S, C = lut.shape
    T = codes.shape[-1]
    assert T % sel_block == 0
    NB = T // sel_block
    lut_bd, codes_p, bt, Tp = _adc_v2_prep(lut, codes, block_t)
    if Tp % bt or bt % sel_block:
        raise ValueError((Tp, bt, sel_block))
    # scratch/output lane width padded to 128; grid stays Tp//bt chunks —
    # indicator columns beyond Tp//sel_block are simply never matched
    NBp = _round_up(Tp // sel_block, 128)
    out = _adc_block_call(
        lut_bd[None], codes_p[None],
        jnp.asarray(n_cand, jnp.int32).reshape(1),
        S=S, C=C, sel_block=sel_block, scale=1.0 / (head_dim ** 0.5),
        bt=bt, NBp=NBp, interpret=interpret)[0]
    return out[:, :NB]


@functools.partial(jax.jit,
                   static_argnames=("sel_block", "head_dim", "block_t",
                                    "interpret"))
@jax.named_scope("pq_score")
def adc_block_scores_pallas_batched(
    lut: jax.Array,
    codes: jax.Array,
    n_cand: jax.Array,
    *,
    sel_block: int,
    head_dim: int,
    block_t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Batch-as-heads variant: lut [B, H_kv, g, S, C]; codes [B, H_kv, S, T];
    n_cand [B] i32 per-slot counts → [B, H, T // sel_block] f32. One kernel,
    batch in the grid (a vmapped call would serialize)."""
    B, H_kv, g, S, C = lut.shape
    T = codes.shape[-1]
    assert T % sel_block == 0
    NB = T // sel_block
    lut_bd, codes_p, bt, Tp = _adc_v2_prep(lut, codes, block_t)
    if Tp % bt or bt % sel_block:
        raise ValueError((Tp, bt, sel_block))
    NBp = _round_up(Tp // sel_block, 128)
    out = _adc_block_call(
        lut_bd, codes_p, jnp.asarray(n_cand, jnp.int32).reshape(B),
        S=S, C=C, sel_block=sel_block, scale=1.0 / (head_dim ** 0.5),
        bt=bt, NBp=NBp, interpret=interpret)
    return out[:, :, :NB]


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
@jax.named_scope("pq_score")
def adc_scores_pallas_v2(
    lut: jax.Array,
    codes: jax.Array,
    *,
    block_t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as adc_scores_pallas: lut [H_kv, g, S, C],
    codes [H_kv, S, T] → scores [H_kv, g, T] f32. vmap-batched calls run as
    ONE kernel with the batch folded into the grid (custom_vmap)."""
    H_kv, g, S, C = lut.shape
    T = codes.shape[-1]

    @jax.custom_batching.custom_vmap
    def call(lut_, codes_):
        lut_bd, codes_p, bt, Tp = _adc_v2_prep(lut_, codes_, block_t)
        out = _adc_v2_call(lut_bd[None], codes_p[None], S=S, C=C, bt=bt,
                           interpret=interpret)[0]
        return out[:, :T].reshape(H_kv, g, T)

    @call.def_vmap
    def _rule(axis_size, in_batched, lut_, codes_):
        lut_b = lut_ if in_batched[0] else jnp.broadcast_to(
            lut_[None], (axis_size,) + lut_.shape)
        codes_b = codes_ if in_batched[1] else jnp.broadcast_to(
            codes_[None], (axis_size,) + codes_.shape)
        lut_bd, codes_p, bt, Tp = _adc_v2_prep(lut_b, codes_b, block_t)
        out = _adc_v2_call(lut_bd, codes_p, S=S, C=C, bt=bt,
                           interpret=interpret)
        return out[:, :, :T].reshape(axis_size, H_kv, g, T), True

    return call(lut, codes)
