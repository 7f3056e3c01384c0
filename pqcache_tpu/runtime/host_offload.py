"""Host-offload tier: bf16 KV in host RAM, DEVICE-resident HBM block cache,
native-LFU residency with asynchronous promotion.

This is the TPU-native equivalent of the reference's full memory hierarchy
(cache_manager.py): per-layer pinned CPU key/value buffers (:89-100), a
block-granular GPU-resident cache (:119-120) with C++ LFU admission
(:364-380), per-token hit/miss classification (:250-271), and async
promotion on a side stream overlapped with compute (:364-418). It extends
PQCache beyond per-chip HBM capacity; within-HBM contexts use the fused
on-device path in policies/pq_search.py instead.

Design (vs the round-1 correctness-grade tier):
  * the block cache lives in DEVICE memory (`cache_kv[l]`,
    [n_slots, H_kv, block, 2D]): a cache hit costs an on-device gather and
    NO host traffic (round 1 mirrored the cache in host numpy, so hits
    saved nothing);
  * the host store is bf16 (`kv_host`, K‖V interleaved per row) — half the
    memory and transfer volume of the old f32 buffers;
  * host-side gather work is proportional to MISSES only: miss rows are
    compacted into a power-of-2-bucketed staging buffer and scattered into
    the window on device (`mode="drop"` for the padding lanes);
  * LFU admission runs through the native library's ASYNC API on a
    promotion worker thread; block copies host→device overlap with the
    decode compute of subsequent layers (the reference's side-stream
    promotion, cache_manager.py:382-418), becoming visible by the next
    fetch of that layer.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import ml_dtypes

from pqcache_tpu.native.lfu_cache import LFUCache

BF16 = ml_dtypes.bfloat16


def _bucket(n: int, lo: int = 64) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def assemble_rows(cache: jax.Array, token_idx: jax.Array, slots: jax.Array,
                  staged: jax.Array, miss_meta: jax.Array, *, block: int
                  ) -> Tuple[jax.Array, jax.Array]:
    """ON-DEVICE row assembly: hits gathered from the device block cache,
    misses scattered in from the bucketed staging buffer (jit-traceable).

    cache [n_slots, H_kv, block, 2D]; token_idx/slots [H_kv, k];
    staged [M, 2D]; miss_meta [2, M] = (head, col) rows, packed into ONE
    transfer (out-of-bounds-padded → mode="drop").
    Returns (k_top, v_top) [H_kv, k, D].
    """
    H_kv = token_idx.shape[0]
    D = cache.shape[-1] // 2
    heads = jnp.arange(H_kv)[:, None]
    cache_rows = cache[jnp.clip(slots, 0), heads, token_idx % block]
    rows = jnp.where((slots >= 0)[..., None], cache_rows, 0)
    rows = rows.at[miss_meta[0], miss_meta[1]].set(
        staged.astype(rows.dtype), mode="drop")
    return rows[..., :D], rows[..., D:]


class HostKVStore:
    def __init__(self, layers: int, n_kv_heads: int, capacity: int,
                 head_dim: int, *, block_size: int = 128,
                 hbm_cache_tokens: int = 4096, cache_topk_blocks: int = 32,
                 dtype=BF16):
        self.L, self.H_kv, self.N, self.D = layers, n_kv_heads, capacity, head_dim
        self.block = block_size
        self.n_cache_blocks = max(hbm_cache_tokens // block_size, 1)
        self.cache_topk = cache_topk_blocks
        self.max_blocks = (capacity + block_size - 1) // block_size
        self.dtype = dtype

        # host store: K and V interleaved per row → one gather fetches both
        self.kv_host = np.zeros(
            (layers, n_kv_heads, capacity, 2 * head_dim), dtype)
        self.valid = np.zeros((layers,), np.int64)  # tokens present per layer

        # DEVICE-resident block cache + device copy of the slot map
        jdt = jnp.bfloat16 if dtype == BF16 else jnp.dtype(dtype)
        self.cache_kv: List[jax.Array] = [
            jnp.zeros((self.n_cache_blocks, n_kv_heads, block_size,
                       2 * head_dim), jdt)
            for _ in range(layers)]
        # block-id → cache slot; HOST array is authoritative (it is the
        # LFU's in-place proxy, lfu_cache.cc:93-122 / block_pos_record)
        self.block_slot = np.full((layers, self.max_blocks), -1, np.int32)

        self.lfu = [LFUCache(self.n_cache_blocks) for _ in range(layers)]
        self._locks = [threading.Lock() for _ in range(layers)]
        self._promo = ThreadPoolExecutor(max_workers=1)
        self._pending: list = []
        self.hits = 0
        self.misses = 0

    # -- writes -----------------------------------------------------------

    def offload_layer(self, layer: int, k: np.ndarray, v: np.ndarray,
                      start: int = 0) -> None:
        """Bulk offload after a layer's prefill (cache_manager.py:205-210)."""
        n = k.shape[1]
        self.kv_host[layer][:, start:start + n, :self.D] = k
        self.kv_host[layer][:, start:start + n, self.D:] = v
        self.valid[layer] = max(self.valid[layer], start + n)

    def append_token(self, layer: int, pos: int, k: np.ndarray,
                     v: np.ndarray) -> None:
        """Ring-evicted local token → host (cache_manager.py:212-228)."""
        self.kv_host[layer][:, pos, :self.D] = k
        self.kv_host[layer][:, pos, self.D:] = v
        self.valid[layer] = max(self.valid[layer], pos + 1)
        # appends land in the growing tail block, which strict-< admission
        # keeps out of the cache; refresh defensively if it is resident
        with self._locks[layer]:
            slot = int(self.block_slot[layer][pos // self.block])
            if slot >= 0:
                row = np.concatenate([k, v], axis=-1).astype(self.dtype)
                self.cache_kv[layer] = self.cache_kv[layer].at[
                    slot, :, pos % self.block].set(jnp.asarray(row))

    # -- fetch path -------------------------------------------------------

    def classify(self, layer: int, token_idx: np.ndarray):
        """Hit/miss split vs the block→slot map (gpu_diff equivalent,
        cache_manager.py:250-271). Returns (slots [H_kv,k], hit [H_kv,k])."""
        self.flush()
        with self._locks[layer]:
            slots = self.block_slot[layer][token_idx // self.block].copy()
        hit = slots >= 0
        self.hits += int(hit.sum())
        self.misses += int((~hit).sum())
        return slots, hit

    def stage_misses(self, layer: int, token_idx: np.ndarray,
                     hit: np.ndarray):
        """Compact miss rows into a bucketed staging buffer.

        Host gather cost and H2D volume are proportional to the miss count
        (the reference's pinned staging path, cache_manager.py:339-362).
        Returns (staged [M, 2D] device, miss_meta [2, M] device = (head,
        col) rows packed into one transfer); padding lanes carry a LARGE
        positive sentinel — scatter drops out-of-bounds rows (negative
        padding would WRAP to the last row under NumPy index semantics and
        clobber real data).
        """
        mh, mc = np.nonzero(~hit)
        m = len(mh)
        M = _bucket(max(m, 1))
        staged = np.zeros((M, 2 * self.D), self.dtype)
        if m:
            staged[:m] = self.kv_host[layer][mh, token_idx[mh, mc]]
        meta = np.full((2, M), np.int32(2 ** 30), np.int32)
        meta[0, :m], meta[1, :m] = mh, mc
        return jnp.asarray(staged), jnp.asarray(meta)

    def assemble(self, layer: int, token_idx: jax.Array, slots: jax.Array,
                 staged: jax.Array, miss_meta: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
        """ON-DEVICE row assembly for the eager fetch() path; the engine
        calls the pure `assemble_rows` inside its jitted layer step."""
        return assemble_rows(self.cache_kv[layer], token_idx, slots, staged,
                             miss_meta, block=self.block)

    def fetch(self, layer: int, token_idx: np.ndarray
              ) -> Tuple[jax.Array, jax.Array]:
        """token_idx [H_kv, k] → (k_top, v_top) [H_kv, k, D] device arrays.

        One-call convenience mirroring fetch_and_concat_kv_w_cache
        (cache_manager.py:299-428); the engine uses the split
        classify/stage_misses/assemble pieces inside its jitted layer step.
        """
        token_idx = np.asarray(token_idx)
        slots, hit = self.classify(layer, token_idx)
        staged, meta = self.stage_misses(layer, token_idx, hit)
        self.admit_async(layer, token_idx // self.block)
        return self.assemble(layer, jnp.asarray(token_idx),
                             jnp.asarray(slots), staged, meta)

    # -- LFU admission + async promotion ----------------------------------

    def admit_async(self, layer: int, blocks: np.ndarray) -> None:
        """Admit the most-requested fully-valid blocks and promote newly
        admitted blocks host→device asynchronously (cache_manager.py:364-418
        side-stream promotion; get_qualified_blocks :241-248)."""
        counts = np.bincount(blocks.ravel(), minlength=self.max_blocks)
        top = np.argsort(-counts)[: self.cache_topk]
        n_full = self.valid[layer] // self.block
        qualified = np.asarray(
            [b for b in top if counts[b] > 0 and b < n_full], np.int32)
        if qualified.size == 0:
            return
        self._pending.append(
            self._promo.submit(self._promote, layer, qualified))

    def _promote(self, layer: int, qualified: np.ndarray) -> None:
        with self._locks[layer]:
            proxy = self.block_slot[layer]
            old = proxy[qualified].copy()
            lfu = self.lfu[layer]
            lfu.batched_insert_async(qualified, proxy)
            lfu.synchronize()
            new = proxy[qualified]
            changed = [(int(b), int(s)) for b, s, o in
                       zip(qualified, new, old) if s >= 0 and s != o]
            if not changed:
                return
            cache = self.cache_kv[layer]
            slots = jnp.asarray([s for _, s in changed], jnp.int32)
            rows = np.stack([self.kv_host[layer][:, b * self.block:
                                                 (b + 1) * self.block]
                             for b, _ in changed])  # [m, H_kv, bs, 2D]
            self.cache_kv[layer] = cache.at[slots].set(
                jnp.asarray(rows).astype(cache.dtype))

    def flush(self) -> None:
        """Wait for outstanding promotions (step boundary / tests)."""
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0
