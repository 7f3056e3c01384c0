"""Pallas TPU kernel: batched row gather with deep DMA pipelining.

The decode path gathers ~topk (≈0.1·T) scattered 256-byte KV rows per head
per layer (the reference's fetch path, cache_manager.py:299-428 — there a
PCIe problem, here an HBM-latency problem): XLA's gather issues the row
reads with little overlap, so the cost is latency × rows. This kernel
prefetches the row indices as scalars (the PrefetchScalarGridSpec pattern
SURVEY.md §7.3 anticipated) and keeps a whole block of row DMAs in flight
before waiting, hiding HBM latency behind parallelism.

gather_rows(src [H, T, D], idx [H, K]) -> [H, K, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, src_ref, out_ref, sem, *, rows, K):
    h = pl.program_id(0)
    b = pl.program_id(1)
    # idx_ref layout: [head_offset, row_idx...] — the offset lets callers
    # gather from one layer of a stacked [L*H, T, D] buffer in place.
    off = idx_ref[0]
    base = 1 + h * K + b * rows

    def dma(r):
        row = idx_ref[base + r]
        return pltpu.make_async_copy(
            src_ref.at[off + h, row], out_ref.at[0, r], sem)

    def start(r, _):
        dma(r).start()
        return _

    jax.lax.fori_loop(0, rows, start, 0)

    def wait(r, _):
        # wait() consumes this copy's completion from the shared semaphore;
        # all `rows` copies were already in flight when the first wait runs
        dma(r).wait()
        return _

    jax.lax.fori_loop(0, rows, wait, 0)


@functools.partial(jax.jit, static_argnames=("n_heads", "rows_per_block",
                                             "interpret"))
def gather_rows(
    src: jax.Array,
    idx: jax.Array,
    head_offset: jax.Array | int = 0,
    *,
    n_heads: int | None = None,
    rows_per_block: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """src [H_total, T, D]; idx [H, K] int32 (values < T) →
    out [H, K, D], where out[h, j] = src[head_offset + h, idx[h, j]].

    `head_offset` (traced ok) selects a contiguous head range of a stacked
    buffer (e.g. one layer of [L*H_kv, T, D]) without slicing it out.
    """
    H_total, T, D = src.shape
    H, K = idx.shape
    rb = min(rows_per_block, K)
    Kp = (K + rb - 1) // rb * rb
    if Kp != K:
        idx = jnp.pad(idx, ((0, 0), (0, Kp - K)))
    scalars = jnp.concatenate([
        jnp.asarray(head_offset, jnp.int32).reshape(1),
        idx.reshape(-1).astype(jnp.int32)])

    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows=rb, K=Kp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H, Kp // rb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, rb, D), lambda h, b, s: (h, b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((H, Kp, D), src.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(scalars, src)
    return out[:, :K]


def gather_rows_xla(src: jax.Array, idx: jax.Array) -> jax.Array:
    """Reference implementation."""
    H = src.shape[0]
    heads = jnp.arange(H)[:, None]
    return src[heads, idx]
