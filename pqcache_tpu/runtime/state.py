"""Sequence-state pytrees: the TPU-native replacement for the reference's KV
memory hierarchy (cache_manager.py) and PQ bookkeeping (pq_search.py fields).

Layout rationale
----------------
The reference scatters one sequence's state across: per-layer pinned CPU
key/value buffers (cache_manager.py:89-100), a GPU block cache (:119-120), a
GPU compute buffer (:174-177), python-side codebook/code tensors
(pq_search.py:163-164), and ring-buffer counters (:179-180). Here the same
information is ONE pytree of fixed-shape arrays, stacked over layers so the
whole decoder step is a single `lax.scan`:

  * ``k_sink/v_sink``: the first `sink` prompt tokens, kept verbatim.
  * ``kv_tail``: every non-sink token in sequence order (K and V
    interleaved per row so retrieval is one gather) — prefill
    tokens first, generated tokens appended. Because generated tokens are
    appended in order, the reference's local-window ring buffer + eviction
    copy (cache_manager.py:212-228) degenerates to a *sliding slice*:
    retrieval candidates are ``tail[:n_cand]`` and the local window is
    ``tail[n_cand : n_cand + local]``. Eviction = incrementing ``n_cand``.
  * ``codes``: PQ codes aligned with ``kv_tail`` (the reference's reserved
    shared code buffer, multi_core_compressor_v2.py:47-51). New tokens are
    encoded at append time instead of at window-exit time
    (pq_search.py:346-354) — same codes, simpler control flow.
  * ``n_cand``: ONE scalar for all layers (the reference likewise advances
    its counters only on layer 0, cache_manager.py:224-226).

All shapes are static; prompts are left-padded to a bucket length and tail
arrays are rolled so padding lands *after* the valid region, where the
existing ``n_cand`` masks hide it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget


@struct.dataclass
class PQState:
    """Stacked-over-layers PQ retrieval state for one sequence."""

    k_sink: jax.Array     # [L, H_kv, sink, D]
    v_sink: jax.Array     # [L, H_kv, sink, D]
    kv_tail: jax.Array    # [L, H_kv, N_tail, 2*D] — K and V interleaved per
                          # row so one top-k gather fetches both (row = 512B
                          # instead of 2×256B; XLA gather cost ∝ row count)
    codes: jax.Array      # [L, H_kv, S, N_tail] uint8 (C <= 256 centroids;
                          # int8 would wrap codes 128..255 for n_subbits=8)
    centroids: jax.Array  # [L, H_kv, S, C, d_lift] f32 (d_lift = d_sub (+1 for ip))
    phi: jax.Array        # [L, H_kv * S, 1, 1] f32 — ip2l2 lift constant (euc: zeros)
    n_cand: jax.Array     # i32 scalar: valid retrieval candidates in tail
    pos: jax.Array        # i32 scalar: absolute position of the next token
    # Tokens present in the tail are always n_cand + budget.local (candidates
    # + local window); no separate counter is kept.
    jhist: Optional[jax.Array] = None
    # [L, H_kv(·B), N_tail // select_block, C²] bf16 — per-block joint code
    # histogram for the S=2 matmul block scorer (core/pq.py
    # build_joint_hist; C² minor = lane-aligned, no tile padding); None
    # when the scorer is not applicable.
    ring_kv: Optional[jax.Array] = None
    # [L, B·H_kv, K, 2*D] write-combining ring for BATCHED decode: step r
    # of a decode chunk writes every slot's new token at ring column r —
    # ONE dynamic_update_slice for the whole batch (per-slot tail writes
    # each step either scatter — which flips the multi-GB carry layout —
    # or chain B dynamic updates, which stops aliasing past B≈4; both
    # measured). The ring flushes into the tail in bulk once per chunk
    # (policies/pq_search.py flush_ring_batched).
    ring_r: Optional[jax.Array] = None   # i32 scalar: filled ring columns
    # int8 tail (cache.kv_dtype="int8"): per-(layer, head, channel)
    # dequant scales, frozen at prefill (core/quant.py). None for bf16.
    k_scale: Optional[jax.Array] = None  # [L, H_kv(·B), 1, D] f32
    v_scale: Optional[jax.Array] = None  # [L, H_kv(·B), 1, D] f32


@struct.dataclass
class DenseState:
    """Plain KV cache for the `original` policy (and the score-based
    policies, which keep full KV and mask — baseline_compressor.py:205-294)."""

    k_cache: jax.Array    # [L, H_kv, T_max, D]
    v_cache: jax.Array    # [L, H_kv, T_max, D]
    length: jax.Array     # i32 scalar: tokens written (== next write slot)
    start: jax.Array      # i32 scalar: first valid slot (left-pad offset)
    pos: jax.Array        # i32 scalar: absolute position of the next token
    scores: Optional[jax.Array] = None  # [L, H_kv, T_max] accumulated (h2o)
    mask: Optional[jax.Array] = None    # [L, H_kv, T_max] bool keep-mask (h2o)


def make_pq_state(cfg: EngineConfig, budget: Budget, dtype=jnp.bfloat16,
                  *, batch: int = 0, jhist_blocks: int = 0,
                  ring_k: int = 0, tail_pad: int = 0,
                  jhist_dtype=jnp.bfloat16) -> PQState:
    """batch=0: single-sequence state (scalar counters). batch=B>0:
    batch-as-heads serving state — B slots folded into the kv-head axis
    ([L, B·H_kv, ...]) with per-slot counters [B]. jhist_blocks>0 adds the
    joint-code-histogram buffer for the S=2 matmul block scorer; ring_k>0
    adds the batched write-combining ring (K columns)."""
    m = cfg.model
    S = cfg.pq.n_subvec_per_head
    C = cfg.pq.n_centroids
    d_sub = m.head_dim // S
    d_lift = d_sub + (1 if cfg.pq.metric == "ip" else 0)
    L, H_kv, D = m.num_layers, m.num_kv_heads, m.head_dim
    # tail_pad: ring-equipped batched states reserve one extra block so the
    # chunk flush (which always writes ring_k static rows, the trailing
    # ones garbage until the next flush overwrites them) never clamps at
    # the buffer end
    N_tail = budget.n_tail_max + tail_pad
    Hf = max(batch, 1) * H_kv
    cshape = (batch,) if batch else ()
    kv_int8 = cfg.cache.kv_dtype == "int8"
    z = lambda *s: jnp.zeros(s, dtype)
    return PQState(
        k_sink=z(L, Hf, budget.sink, D),
        v_sink=z(L, Hf, budget.sink, D),
        kv_tail=jnp.zeros((L, Hf, N_tail, 2 * D),
                          jnp.int8 if kv_int8 else dtype),
        codes=jnp.zeros((L, Hf, S, N_tail), jnp.uint8),
        centroids=jnp.zeros((L, Hf, S, C, d_lift), jnp.float32),
        phi=jnp.zeros((L, Hf * S, 1, 1), jnp.float32),
        n_cand=jnp.zeros(cshape, jnp.int32),
        pos=jnp.zeros(cshape, jnp.int32),
        jhist=(jnp.zeros((L, Hf, jhist_blocks, C * C), jhist_dtype)
               if jhist_blocks else None),
        ring_kv=(jnp.zeros((L, Hf, ring_k, 2 * D), dtype)
                 if ring_k else None),
        ring_r=jnp.zeros((), jnp.int32) if ring_k else None,
        k_scale=jnp.ones((L, Hf, 1, D), jnp.float32) if kv_int8 else None,
        v_scale=jnp.ones((L, Hf, 1, D), jnp.float32) if kv_int8 else None,
    )


def make_dense_state(cfg: EngineConfig, max_len: int, *, with_scores: bool = False,
                     dtype=jnp.bfloat16, batch: int = 0) -> DenseState:
    m = cfg.model
    L, H_kv, D = m.num_layers, m.num_kv_heads, m.head_dim
    # Round the token dim to 256 (same rationale as Budget.n_tail_max): a
    # cache length that is not a multiple of the 8-sublane tile makes the
    # per-step dynamic_update_slice append un-alias-able on tiled memory —
    # XLA then compress/uncompress-remats the WHOLE cache every decode step
    # (measured: 40.5 vs 13.3 ms/step at B=4/32k/8L for T=32802 vs 32832).
    max_len = (max_len + 255) // 256 * 256
    Hf = max(batch, 1) * H_kv
    cshape = (batch,) if batch else ()
    return DenseState(
        k_cache=jnp.zeros((L, Hf, max_len, D), dtype),
        v_cache=jnp.zeros((L, Hf, max_len, D), dtype),
        length=jnp.zeros(cshape, jnp.int32),
        start=jnp.zeros(cshape, jnp.int32),
        pos=jnp.zeros(cshape, jnp.int32),
        scores=jnp.zeros((L, Hf, max_len), jnp.float32) if with_scores else None,
        mask=jnp.ones((L, Hf, max_len), bool) if with_scores else None,
    )
