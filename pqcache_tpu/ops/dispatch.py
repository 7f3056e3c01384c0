"""Kernel dispatch: Pallas TPU kernels on TPU, XLA fallbacks elsewhere.

The XLA implementations are the correctness references (CPU-runnable and
used by the test suite); the Pallas kernels are the production TPU path.
"""

from __future__ import annotations

from typing import Optional

import jax

from pqcache_tpu.ops.attention_xla import (chunked_attention,
                                           chunked_attention_rect)
from pqcache_tpu.ops.flash_attention import flash_attention, flash_scores


def use_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


def dense_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_len,
    *,
    with_scores: bool = False,
    score_mode: str = "sum",
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """Causal self-attention over a left-padded prompt.

    Returns (out [H, T, D], scores [H, T] | None). Both score modes ("sum"
    column sums and "max" non-recent column max) have Pallas sweeps.
    interpret=True runs the Pallas kernels in interpret mode (CPU-mesh
    validation of the sharded kernel path).
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    D = q.shape[-1]
    if not use_pallas or D % 128 != 0:
        return chunked_attention(q, k, v, valid_lo=pad_len, causal=True,
                                 with_scores=with_scores,
                                 score_mode=score_mode)
    out = flash_attention(q, k, v, valid_lo=pad_len, causal=True,
                          interpret=interpret)
    scores = (flash_scores(q, k, valid_lo=pad_len, score_mode=score_mode,
                           interpret=interpret)
              if with_scores else None)
    return out, scores


def prefill_chunk_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_len,
    *,
    q_offset: int,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Causal attention of one prefill q CHUNK against its key prefix
    (chunked prefill: activations bounded at chunk length). q [H, Tq, D],
    k/v [H_kv, Tk, D], q row 0 at absolute position q_offset (STATIC).
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    D = q.shape[-1]
    if not use_pallas or D % 128 != 0:
        return chunked_attention_rect(q, k, v, valid_lo=pad_len,
                                      q_offset=q_offset)
    return flash_attention(q, k, v, valid_lo=pad_len, causal=True,
                           q_offset=q_offset, interpret=interpret)
