"""Host-offload tier: KV in host RAM, HBM block cache, native LFU residency.

This is the TPU-native equivalent of the reference's full memory hierarchy
(cache_manager.py): per-layer pinned CPU key/value buffers (:89-100), a
block-granular GPU cache (:119-120) with C++ LFU admission (:364-380), and
per-token hit/miss classification (:250-271). It extends PQCache beyond
per-chip HBM capacity; within-HBM contexts use the fused on-device path in
policies/pq_search.py instead.

Structure:
  * HostKVStore — owns the host-side [L, H_kv, N, D] key/value arrays, an
    HBM block cache (device arrays) and one native LFU per layer driving
    block admission through the same in-place slot-proxy protocol as the
    reference (lfu_cache.cc:93-122).
  * fetch(layer, token_idx) — classifies each requested token as HBM-cache
    hit or host miss via the block→slot map, gathers hits on-device,
    gathers misses on host, and promotes the most-requested blocks
    (get_qualified_blocks, cache_manager.py:241-248) through the LFU.

The decode driver for this tier runs layer-at-a-time (device program per
layer, host fetch between) — see OffloadEngine in runtime/offload_engine.py.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pqcache_tpu.native.lfu_cache import LFUCache


class HostKVStore:
    def __init__(self, layers: int, n_kv_heads: int, capacity: int,
                 head_dim: int, *, block_size: int = 128,
                 hbm_cache_tokens: int = 4096, cache_topk_blocks: int = 32,
                 dtype=np.float32):
        self.L, self.H_kv, self.N, self.D = layers, n_kv_heads, capacity, head_dim
        self.block = block_size
        self.n_cache_blocks = max(hbm_cache_tokens // block_size, 1)
        self.cache_topk = cache_topk_blocks
        self.max_blocks = (capacity + block_size - 1) // block_size

        self.k_host = np.zeros((layers, n_kv_heads, capacity, head_dim), dtype)
        self.v_host = np.zeros((layers, n_kv_heads, capacity, head_dim), dtype)
        self.valid = np.zeros((layers,), np.int64)  # tokens present per layer

        # Block cache: [n_slots, H_kv, block, D] per layer. Held as host
        # mirrors here; the device-resident copy + async promotion stream is
        # the production path (kept simple while fetch runs host-side).
        self.cache_k = [np.zeros((self.n_cache_blocks, n_kv_heads,
                                  block_size, head_dim), dtype)
                        for _ in range(layers)]
        self.cache_v = [np.zeros_like(self.cache_k[0]) for _ in range(layers)]
        # block-id → cache slot (the LFU's in-place proxy array,
        # cache_manager.py:130: block_pos_record)
        self.block_slot = np.full((layers, self.max_blocks), -1, np.int32)
        self.lfu = [LFUCache(self.n_cache_blocks) for _ in range(layers)]
        self.hits = 0
        self.misses = 0

    # -- writes -----------------------------------------------------------

    def offload_layer(self, layer: int, k: np.ndarray, v: np.ndarray,
                      start: int = 0) -> None:
        """Bulk offload after a layer's prefill (cache_manager.py:205-210)."""
        n = k.shape[1]
        self.k_host[layer][:, start:start + n] = k
        self.v_host[layer][:, start:start + n] = v
        self.valid[layer] = max(self.valid[layer], start + n)

    def append_token(self, layer: int, pos: int, k: np.ndarray,
                     v: np.ndarray) -> None:
        """Ring-evicted local token → host (cache_manager.py:212-228)."""
        self.k_host[layer][:, pos] = k
        self.v_host[layer][:, pos] = v
        self.valid[layer] = max(self.valid[layer], pos + 1)
        # If this token's block is HBM-cache resident, refresh the cached
        # copy in place — otherwise fetch() would classify the position as a
        # hit and return the stale (zero) row.
        slot = self.block_slot[layer][pos // self.block]
        if slot >= 0:
            off = pos % self.block
            self.cache_k[layer][slot, :, off] = k
            self.cache_v[layer][slot, :, off] = v

    # -- reads ------------------------------------------------------------

    def fetch(self, layer: int, token_idx: np.ndarray
              ) -> Tuple[jax.Array, jax.Array]:
        """token_idx [H_kv, k] → (k_top, v_top) [H_kv, k, D] device arrays.

        Mirrors fetch_and_concat_kv_w_cache (cache_manager.py:299-428):
        hit/miss split against the block→slot map, on-device gather for
        hits, host gather + transfer for misses, then LFU admission of the
        most-requested valid blocks and synchronous block promotion.
        """
        H_kv, k = token_idx.shape
        blocks = token_idx // self.block
        slots = self.block_slot[layer][blocks]            # [H_kv, k]
        hit = slots >= 0
        self.hits += int(hit.sum())
        self.misses += int((~hit).sum())

        # hits: position inside the HBM cache
        cache_pos = slots * self.block + token_idx % self.block
        head_ids = np.broadcast_to(np.arange(H_kv)[:, None], token_idx.shape)

        k_host_rows = self.k_host[layer][head_ids, token_idx]  # [H_kv,k,D]
        v_host_rows = self.v_host[layer][head_ids, token_idx]

        if hit.any():
            slot_sel = np.where(hit, slots, 0)
            off_sel = np.where(hit, token_idx % self.block, 0)
            k_cache_rows = self.cache_k[layer][slot_sel, head_ids, off_sel]
            v_cache_rows = self.cache_v[layer][slot_sel, head_ids, off_sel]
            k_out = np.where(hit[..., None], k_cache_rows, k_host_rows)
            v_out = np.where(hit[..., None], v_cache_rows, v_host_rows)
        else:
            k_out, v_out = k_host_rows, v_host_rows

        self._admit_and_promote(layer, blocks)
        return jnp.asarray(k_out), jnp.asarray(v_out)

    def _admit_and_promote(self, layer: int, blocks: np.ndarray) -> None:
        """LFU admission of the top-requested blocks + promotion of newly
        admitted blocks into the HBM cache (cache_manager.py:364-418)."""
        counts = np.bincount(blocks.ravel(), minlength=self.max_blocks)
        top = np.argsort(-counts)[: self.cache_topk]
        # Only FULLY-written blocks are admissible (strict <): the growing
        # tail block would otherwise be cached early and later appended
        # tokens would hit stale rows (append_token refreshes resident
        # blocks, but admission of half-written blocks is still wasted work).
        n_full_blocks = self.valid[layer] // self.block
        qualified = np.asarray(
            [b for b in top if counts[b] > 0 and b < n_full_blocks],
            np.int32)
        if qualified.size == 0:
            return
        proxy = self.block_slot[layer]
        old = proxy[qualified].copy()
        self.lfu[layer].batched_insert(qualified, proxy)
        new = proxy[qualified]
        changed = [(int(b), int(s)) for b, s, o in zip(qualified, new, old)
                   if s >= 0 and s != o]
        for b, s in changed:
            lo = b * self.block
            hi = min(lo + self.block, self.N)
            self.cache_k[layer][s, :, : hi - lo] = self.k_host[layer][:, lo:hi]
            self.cache_v[layer][s, :, : hi - lo] = self.v_host[layer][:, lo:hi]

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0
