"""Pallas TPU kernel: batched row gather with deep DMA pipelining.

The decode path gathers ~topk (≈0.1·T) scattered KV rows per head per layer
(the reference's fetch path, cache_manager.py:299-428 — there a PCIe
problem, here an HBM-latency problem): XLA's gather issues the row reads
with little overlap, so the cost is latency × rows. This kernel prefetches
the row indices as scalars (the PrefetchScalarGridSpec pattern SURVEY.md
§7.3 anticipated) and keeps a whole block of DMAs in flight before the
first wait, hiding HBM latency behind parallelism.

Mosaic DMAs must be tile-aligned along the sublane dimension, so each
requested row is fetched as its surrounding aligned row-tile (8/16/32 rows
for f32/bf16/int8) and the exact row is then selected in VMEM with one
vectorized compare-sum — trading ≤32× DMA bytes (still ≪ a dense KV read)
for alignment.

gather_rows(src [H, T, D], idx [H, K], head_offset) -> [H, K, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane_tile(dtype) -> int:
    return max(32 // jnp.dtype(dtype).itemsize, 8)


def _gather_kernel(idx_ref, sub_ref, src_ref, out_ref, scratch, sem,
                   *, rows, K, tile):
    h = pl.program_id(0)
    b = pl.program_id(1)
    # idx_ref (scalar prefetch) layout: [head_offset, tile_start...]
    off = idx_ref[0]
    base = 1 + h * K + b * rows

    def dma(r):
        t0 = pl.multiple_of(idx_ref[base + r], tile)
        return pltpu.make_async_copy(
            src_ref.at[off + h, pl.ds(t0, tile)], scratch.at[r], sem)

    def start(r, _):
        dma(r).start()
        return _

    jax.lax.fori_loop(0, rows, start, 0)

    def wait(r, _):
        dma(r).wait()
        return _

    jax.lax.fori_loop(0, rows, wait, 0)

    # vectorized in-tile row select: out[r] = scratch[r, sub[r]]
    # (sub arrives as a VMEM sublane vector; SMEM only allows scalar loads;
    # all mask ops stay 32-bit — Mosaic can't insert minor dims on bf16)
    sub = sub_ref[0]                                   # [rows, 1] i32
    tids3 = jax.lax.broadcasted_iota(jnp.int32, (rows, tile, 1), 1)
    mask3 = tids3 == sub[:, :, None]                   # [rows, tile, 1]
    sel = jnp.where(mask3, scratch[...], jnp.zeros_like(scratch))
    out_ref[0] = jnp.sum(sel, axis=1)


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
@jax.named_scope("pq_fetch")
def gather_rows(
    src: jax.Array,
    idx: jax.Array,
    head_offset: jax.Array | int = 0,
    *,
    rows_per_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """src [H_total, T, D]; idx [H, K] int32 (values < T, and T must be a
    multiple of the dtype sublane tile) → out [H, K, D], with
    out[h, j] = src[head_offset + h, idx[h, j]].

    `head_offset` (traced ok) selects a contiguous head range of a stacked
    buffer (e.g. one layer of [L*H_kv, T, D]) without slicing it out.
    """
    H_total, T, D = src.shape
    H, K = idx.shape
    tile = _sublane_tile(src.dtype)
    if T % tile:
        raise ValueError(f"src token dim {T} must be a multiple of {tile}")
    rb = min(rows_per_block, K)
    Kp = (K + rb - 1) // rb * rb
    if Kp != K:
        idx = jnp.pad(idx, ((0, 0), (0, Kp - K)))
    idx = idx.astype(jnp.int32)
    tile_start = (idx // tile) * tile
    sub = (idx - tile_start)[..., None]               # [H, Kp, 1]
    scalars = jnp.concatenate([
        jnp.asarray(head_offset, jnp.int32).reshape(1),
        tile_start.reshape(-1)])

    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows=rb, K=Kp, tile=tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Kp // rb),
            in_specs=[
                pl.BlockSpec((1, rb, 1), lambda h, b, s: (h, b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, rb, D), lambda h, b, s: (h, b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rb, tile, D), src.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Kp, D), src.dtype),
        interpret=interpret,
    )(scalars, sub, src)
    return out[:, :K]


@jax.named_scope("pq_fetch")
def gather_rows_xla(src: jax.Array, idx: jax.Array) -> jax.Array:
    """Reference implementation."""
    H = src.shape[0]
    heads = jnp.arange(H)[:, None]
    return src[heads, idx]
