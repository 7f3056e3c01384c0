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


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
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
