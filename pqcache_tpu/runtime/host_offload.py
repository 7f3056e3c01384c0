"""Host-offload tier v3: block-granular pinned-host KV store, DEVICE-resident
HBM block cache, native-LFU residency with asynchronous promotion.

TPU-native equivalent of the reference's full memory hierarchy
(cache_manager.py): per-layer pinned CPU key/value buffers (:89-100), a
block-granular GPU-resident cache (:119-120) with C++ LFU admission
(:364-380), per-block hit/miss classification (:250-271), and async
promotion on a side stream overlapped with compute (:364-418). It extends
PQCache beyond per-chip HBM capacity; within-HBM contexts use the fused
on-device path in policies/pq_search.py instead.

Measured constraints that shape this design (tools_pinned_probe{,7,8}.py;
ROUND_NOTES "pinned_host probe results"):
  * whole-array `jax.device_put` between pinned_host and device runs at
    ~10 GB/s (real DMA — the TPU analog of the reference's cudaMemcpyAsync
    pinned staging, cache_manager.py:339-362);
  * host-SPACE compute (gather/slice on a host-resident array, with or
    without compute_on) is 2-3 orders of magnitude slower than DMA and
    partially crashes the compiler — so the store NEVER computes on host
    data. Every fetchable unit is its own pinned leaf.

Consequences:
  * storage is per-(layer, block) pinned leaves [H_kv, block, 2D] — K and V
    interleaved per row so one transfer fetches both;
  * the fetch unit is a BLOCK for the union of heads (selection is already
    block-granular on the TPU fast path; per-head row gathers would need
    host-space compute);
  * misses of one fetch are staged with ONE `jax.device_put(list_of_leaves)`
    call and stacked on device;
  * the growing tail block lives ON DEVICE (`tail`) until it fills, then
    moves to pinned host as a complete leaf — appends never touch host;
  * overwrites of stored blocks (rare; arbitrary-position append_token)
    round-trip the single affected leaf through the device.
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import SingleDeviceSharding

from pqcache_tpu.native.lfu_cache import LFUCache


def host_sharding(device=None) -> Optional[SingleDeviceSharding]:
    """pinned_host placement for `device`, or None if the backend has no
    host memory kind (the store then keeps leaves in default memory — on
    CPU that is host RAM anyway)."""
    dev = device if device is not None else jax.devices()[0]
    try:
        kinds = [m.kind for m in dev.addressable_memories()]
    except Exception:  # pragma: no cover - exotic backends
        return None
    if "pinned_host" not in kinds:
        return None
    return SingleDeviceSharding(dev, memory_kind="pinned_host")


def _bucket(n: int) -> int:
    """Next bucket ≥ n — every variable-cardinality device program
    (miss-stack, admission scatter, and the engine's fused layer program
    that consumes the staged stack) is compiled per BUCKET, not per exact
    count. Powers of FOUR up to 256 (1/4/16/64/256: 5 variants; with
    synchronous admission the steady state of zero misses always uses the
    smallest), then powers of TWO: above 256 blocks a staged stack is
    hundreds of MB, where ×4 rounding wasted up to 3× the bytes of real
    misses (a 540-block miss set padded to 1024 allocated ~0.5 GB of
    dead staging per layer)."""
    b = 1
    while b < n and b < 256:
        b *= 4
    while b < n:
        b *= 2
    return b


@functools.lru_cache(maxsize=None)
def _stack_n(n: int):
    return jax.jit(lambda *xs: jnp.stack(xs))


@functools.lru_cache(maxsize=None)
def _pack_sel(n: int):
    """Pack n per-layer selection arrays + the sampled token(s) into ONE
    flat i32 array, so a stale-selection decode step pulls everything it
    needs for step t+1 with a single host transfer (each np.asarray is a
    full round trip through the dev tunnel)."""
    return jax.jit(lambda nxt, *blks: jnp.concatenate(
        [jnp.stack(blks).astype(jnp.int32).ravel(),
         nxt.astype(jnp.int32).ravel()]))


@jax.jit
def _scatter_admit(cache: jax.Array, staged: jax.Array, slots: jax.Array,
                   pos: jax.Array) -> jax.Array:
    """Admit staged miss blocks into the device cache: cache[slots] =
    staged[pos]. Functional update — the caller keeps the pre-admission
    array as the assembly snapshot for the in-flight fetch. Padding rows
    carry slot = n_slots (out of bounds) and are dropped."""
    return cache.at[slots].set(staged[pos].astype(cache.dtype), mode="drop")


@functools.partial(jax.jit, static_argnames=("n", "bs", "dtype"))
def _split_blocks_kv(k: jax.Array, v: jax.Array, off: jax.Array,
                     *, n: int, bs: int, dtype):
    """k/v [H_kv, P, D] rows [off, off + n·bs) → n interleaved leaves
    [H_kv, bs, 2D]. The K‖V interleave happens at CHUNK granularity here
    (a ~n·bs-row transient) instead of materializing the full-length
    interleaved tail on device before offload — at 256k that full-length
    copy was the ~1 GiB that pushed prefill past a 16 GB chip."""
    ks = jax.lax.dynamic_slice_in_dim(k, off, n * bs, axis=1)
    vs = jax.lax.dynamic_slice_in_dim(v, off, n * bs, axis=1)
    kv = jnp.concatenate([ks, vs], axis=-1).astype(dtype)
    return tuple(jax.lax.dynamic_slice_in_dim(kv, i * bs, bs, axis=1)
                 for i in range(n))


def assemble_blocks(cache: jax.Array, staged: jax.Array, slots: jax.Array,
                    miss_pos: jax.Array) -> jax.Array:
    """ON-DEVICE block assembly (jit-traceable): hits gathered from the
    device block cache, misses from the staged pinned transfers.

    cache [n_slots, H_kv, bs, 2D]; staged [M, H_kv, bs, 2D];
    slots/miss_pos [Hr, kb] (slot < 0 → use staged[miss_pos]). Hr is
    H_kv, or B·H_kv for batch-as-heads callers — leaf head rows are
    addressed modulo H_kv (every slot's leaves carry H_kv rows).
    Returns [Hr, kb, bs, 2D].
    """
    Hr = slots.shape[0]
    H_kv = cache.shape[1]
    heads = (jnp.arange(Hr) % H_kv)[:, None]
    from_cache = cache[jnp.clip(slots, 0), heads]          # [Hr, kb, bs, 2D]
    from_stage = staged[jnp.clip(miss_pos, 0), heads]
    return jnp.where((slots >= 0)[..., None, None], from_cache, from_stage)


class HostKVStore:
    def __init__(self, layers: int, n_kv_heads: int, capacity: int,
                 head_dim: int, *, block_size: int = 128,
                 hbm_cache_tokens: int = 4096, cache_topk_blocks: int = 32,
                 dtype=jnp.bfloat16):
        self.L, self.H_kv, self.N, self.D = (layers, n_kv_heads, capacity,
                                             head_dim)
        self.block = block_size
        self.n_cache_blocks = max(hbm_cache_tokens // block_size, 1)
        self.cache_topk = cache_topk_blocks
        self.max_blocks = (capacity + block_size - 1) // block_size
        self.dtype = jnp.dtype(dtype)

        self._s_host = host_sharding()
        dev = jax.devices()[0]
        self._s_dev = (SingleDeviceSharding(dev, memory_kind="device")
                       if self._s_host is not None else None)
        # per-(layer, block) pinned leaves
        self.kv_blocks: List[Dict[int, jax.Array]] = [
            {} for _ in range(layers)]
        self.valid = np.zeros((layers,), np.int64)  # complete-block tokens
        # growing tail block, DEVICE-resident
        self.tail: List[jax.Array] = [
            jnp.zeros((n_kv_heads, block_size, 2 * head_dim), self.dtype)
            for _ in range(layers)]
        self.tail_fill = np.zeros((layers,), np.int64)

        # DEVICE-resident block cache + the LFU's slot-proxy map
        self.cache_kv: List[jax.Array] = [
            jnp.zeros((self.n_cache_blocks, n_kv_heads, block_size,
                       2 * head_dim), self.dtype)
            for _ in range(layers)]
        # block-id → cache slot; HOST array is authoritative (the LFU's
        # in-place proxy, native/lfu/lfu.cc block_pos_record contract)
        self.block_slot = np.full((layers, self.max_blocks), -1, np.int32)

        self.lfu = [LFUCache(self.n_cache_blocks) for _ in range(layers)]
        self._locks = [threading.Lock() for _ in range(layers)]
        self.hits = 0
        self.misses = 0

    # -- placement helpers -------------------------------------------------

    def _to_host(self, x: jax.Array) -> jax.Array:
        return (jax.device_put(x, self._s_host) if self._s_host is not None
                else x)

    # -- writes -----------------------------------------------------------

    def offload_blocks_device(self, layer: int, k: jax.Array, v: jax.Array,
                              n_tokens: int, off, *, id_base: int = 0
                              ) -> Optional[jax.Array]:
        """Complete-block offload from device K/V: rows [off, off+n_tokens)
        become pinned interleaved leaves at block ids id_base + i (one
        batched transfer per chunk of 64; interleaving happens per chunk so
        no full-length [H_kv, T, 2D] copy is ever materialized). Returns
        the REMAINDER rows [H_kv, rem, 2D] as a device array (None when
        n_tokens is block-aligned) — the caller owns tail handling
        (single-sequence: this store's device tail; batch-as-heads: the
        engine's per-slot state tails, runtime/offload_batch.py)."""
        bs = self.block
        n_full = n_tokens // bs
        off = jnp.asarray(off, jnp.int32)
        CH = 64  # blocks per split program / batched device_put
        for ci, c0 in enumerate(range(0, n_full, CH)):
            n = min(CH, n_full - c0)
            leaves = _split_blocks_kv(k, v, off + c0 * bs, n=n, bs=bs,
                                      dtype=self.dtype)
            hosted = (jax.device_put(list(leaves), self._s_host)
                      if self._s_host is not None else list(leaves))
            for i, leaf in enumerate(hosted):
                self.kv_blocks[layer][id_base + c0 + i] = leaf
            if ci % 4 == 3:
                # bound in-flight split+transfer chunks (~128 MB): at 128k+
                # the queued chunk programs' device temporaries otherwise
                # accumulate faster than the pinned transfers drain. Pull
                # the WHOLE newest leaf — slicing a host-space array
                # crashes the remote compiler (ROUND_NOTES)
                np.asarray(hosted[-1])
        rem = n_tokens - n_full * bs
        if not rem:
            return None
        (part,) = _split_blocks_kv(k, v, off + n_full * bs, n=1, bs=rem,
                                   dtype=self.dtype)
        return part

    def offload_layer_device(self, layer: int, k: jax.Array, v: jax.Array,
                             n_tokens: int, off: int = 0) -> None:
        """Bulk offload of a layer's prefill KV from DEVICE arrays
        (cache_manager.py:205-210): complete blocks become pinned
        interleaved leaves, the remainder seeds the device tail. k/v
        [H_kv, P, D]; rows [off, off + n_tokens) are the valid candidate
        rows (off = pad + sink for a left-padded prompt — the pre-off rows
        are pad and sink, the post rows garbage)."""
        start = self.valid[layer] // self.block
        part = self.offload_blocks_device(layer, k, v, n_tokens, off,
                                          id_base=start)
        n_full = n_tokens // self.block
        self.valid[layer] = (start + n_full) * self.block
        if part is not None:
            rem = part.shape[1]
            self.tail[layer] = jax.lax.dynamic_update_slice_in_dim(
                self.tail[layer] * 0, part, 0, axis=1)
            self.tail_fill[layer] = rem

    def offload_layer(self, layer: int, k: np.ndarray, v: np.ndarray,
                      start: int = 0) -> None:
        """NumPy convenience wrapper (tests / non-device producers)."""
        assert start == self.valid[layer] + self.tail_fill[layer] or start == 0
        kj = jnp.asarray(np.asarray(k, np.float32), self.dtype)
        vj = jnp.asarray(np.asarray(v, np.float32), self.dtype)
        if start == 0:
            self.valid[layer] = 0
            self.tail_fill[layer] = 0
            self.kv_blocks[layer].clear()
        self.offload_layer_device(layer, kj, vj, kj.shape[1])

    def _flush_tail(self, layer: int) -> None:
        b = self.valid[layer] // self.block
        self.kv_blocks[layer][b] = self._to_host(self.tail[layer])
        self.valid[layer] += self.block
        self.tail_fill[layer] = 0
        self.tail[layer] = jnp.zeros_like(self.tail[layer])

    def append_row_device(self, layer: int, row: jax.Array) -> None:
        """Sequential append of one token row [H_kv, 2D] (device array) —
        the engine's ring-evict path (cache_manager.py:212-228). Lands in
        the device tail; a filled tail moves to pinned host as one leaf."""
        fill = int(self.tail_fill[layer])
        self.tail[layer] = jax.lax.dynamic_update_slice_in_dim(
            self.tail[layer], row.astype(self.dtype)[:, None], fill, axis=1)
        self.tail_fill[layer] = fill + 1
        if self.tail_fill[layer] == self.block:
            self._flush_tail(layer)

    def adopt_block_device(self, layer: int, kv_block: jax.Array,
                           block_id: Optional[int] = None) -> None:
        """Adopt a COMPLETE block [H_kv, bs, 2D] built on device by the
        engine (its traced tail buffer) as the next pinned leaf. With an
        explicit block_id (batch-as-heads: slot-prefixed global id) the
        store's own valid counter is NOT advanced — the caller tracks
        per-slot extents."""
        if block_id is None:
            assert self.tail_fill[layer] == 0
            block_id = self.valid[layer] // self.block
            self.valid[layer] += self.block
        self.kv_blocks[layer][block_id] = self._to_host(
            kv_block.astype(self.dtype))

    def append_token(self, layer: int, pos: int, k: np.ndarray,
                     v: np.ndarray) -> None:
        """Positioned single-row write. Sequential appends extend the tail;
        writes into already-stored regions round-trip the affected leaf
        through the device (rare) and refresh any cache-resident copy."""
        row = jnp.asarray(
            np.concatenate([np.asarray(k, np.float32),
                            np.asarray(v, np.float32)], axis=-1)[:, None],
            self.dtype)                                     # [H_kv, 1, 2D]
        total = self.valid[layer] + self.tail_fill[layer]
        if pos == total:
            self.append_row_device(layer, row[:, 0])
            return
        if pos > total:
            raise ValueError(f"append at {pos} beyond tail {total}")
        bs = self.block
        if pos >= self.valid[layer]:                        # inside tail
            self.tail[layer] = jax.lax.dynamic_update_slice_in_dim(
                self.tail[layer], row, pos - int(self.valid[layer]), axis=1)
            return
        b, off = pos // bs, pos % bs
        leaf = self.kv_blocks[layer][b]
        dev = jax.device_put(leaf, self._s_dev)             # host → device
        dev = jax.lax.dynamic_update_slice_in_dim(dev, row, off, axis=1)
        self.kv_blocks[layer][b] = self._to_host(dev)
        with self._locks[layer]:
            slot = int(self.block_slot[layer][b])
            if slot >= 0:                                   # refresh cache
                self.cache_kv[layer] = self.cache_kv[layer].at[
                    slot, :, off].set(row[:, 0])

    def invalidate_blocks(self, block_ids) -> None:
        """Drop block ids from every layer: pinned leaves are released,
        LFU entries erased (their cache slots recycle to later
        admissions), proxy entries reset to -1. Used by the batched
        offload tier to retire a serving slot before its block-id range
        is reused by the next admitted sequence — stale cache rows must
        not classify as hits for the newcomer's ids."""
        ids = np.ascontiguousarray(np.asarray(block_ids, np.int32).ravel())
        for layer in range(self.L):
            with self._locks[layer]:
                lfu = self.lfu[layer]
                lfu.synchronize()   # no in-flight async insert on the proxy
                lfu.batched_erase(ids, self.block_slot[layer])
                blocks = self.kv_blocks[layer]
                for b in ids.tolist():
                    blocks.pop(int(b), None)

    # -- fetch path -------------------------------------------------------

    def classify_blocks(self, layer: int, blk_idx: np.ndarray,
                        ok: Optional[np.ndarray] = None,
                        ) -> Tuple[np.ndarray, np.ndarray, jax.Array,
                                   jax.Array]:
        """Hit/miss split + miss staging for a per-head block selection.

        blk_idx [H_kv, kb] int — block ids (entries >= the complete-block
        count are treated as invalid: slot -1 / miss_pos -1; the caller
        masks them). Batch-as-heads callers pass GLOBAL (slot-prefixed)
        ids with blk_idx [B·H_kv, kb] and an explicit `ok` validity mask
        (the store's own valid counter doesn't know per-slot extents).
        Returns (slots [H_kv, kb], miss_pos [H_kv, kb],
        staged [Mb, H_kv, bs, 2D] device, cache snapshot) where slot >= 0
        means the block is cache-resident at that slot in the SNAPSHOT,
        otherwise staged[miss_pos] holds it. Misses are fetched with ONE
        batched device_put of pinned leaves (the reference's pinned
        staging, cache_manager.py:339-362) and then admitted into the
        device cache SYNCHRONOUSLY — the data is already on device, so
        promotion is a zero-transfer scatter (vs the reference's separate
        side-stream host→device promotion copies, cache_manager.py:364-418,
        which the TPU data path makes redundant). The LFU's bookkeeping
        runs on its native worker thread overlapped with the DMA
        (lfu.cc batched_insert_async). Staged stacks and admission
        scatters are padded to power-of-FOUR cardinality (1/4/16/64/256)
        so the compiled program set is bounded.
        """
        blk_idx = np.asarray(blk_idx)
        if ok is None:
            n_complete = int(self.valid[layer]) // self.block
            ok = blk_idx < n_complete
        else:
            ok = np.asarray(ok, bool)
        with self._locks[layer]:
            proxy = self.block_slot[layer]
            slots = np.where(ok, proxy[
                np.clip(blk_idx, 0, self.max_blocks - 1)], -1)
            hit = slots >= 0
            self.hits += int(hit.sum())
            self.misses += int((ok & ~hit).sum())
            miss_blocks = np.unique(blk_idx[ok & ~hit])
            # LFU bookkeeping (hit-frequency bumps + miss admissions)
            # overlapped with the pinned→device DMA below; admission
            # pressure capped at the cache_topk most-requested blocks of
            # this step (the reference's get_qualified_blocks,
            # cache_manager.py:241-248)
            touched = np.unique(blk_idx[ok]).astype(np.int32)
            if touched.size > self.cache_topk:
                counts = np.bincount(blk_idx[ok].ravel(),
                                     minlength=self.max_blocks)
                touched = touched[
                    np.argsort(-counts[touched])[: self.cache_topk]]
            # ORDER MATTERS: hits (freq bumps) must precede new-block
            # admissions within one LFU batch. A new block's admission can
            # evict a block appearing LATER in the array; that block then
            # re-inserts as "new" and is assigned a FRESH slot — but a hit
            # was never staged this step, so nothing writes its data to
            # the new slot and the cache serves stale rows (surfaced by
            # multi-slot churn in the batched tier; latent for any caller).
            # With hits first, every post-batch proxy entry is either the
            # old slot (hit kept), -1 (evicted → refetched next step), or
            # a fresh slot whose staged data the admission scatter writes.
            t_hit = proxy[touched] >= 0
            touched = np.ascontiguousarray(
                np.concatenate([touched[t_hit], touched[~t_hit]]), np.int32)
            lfu = self.lfu[layer]
            if touched.size:
                lfu.batched_insert_async(touched, proxy)
            cache_prev = self.cache_kv[layer]
            if miss_blocks.size:
                leaves = [self.kv_blocks[layer][int(b)] for b in miss_blocks]
                dev = jax.device_put(leaves, self._s_dev)   # one batched H2D
                Mb = _bucket(miss_blocks.size)
                padded = list(dev) + [dev[0]] * (Mb - miss_blocks.size)
                staged = _stack_n(Mb)(*padded)
                lut = np.full((self.max_blocks,), -1, np.int64)
                lut[miss_blocks] = np.arange(miss_blocks.size)
                miss_pos = np.where(
                    ok & ~hit,
                    lut[np.clip(blk_idx, 0, self.max_blocks - 1)], -1)
                lfu.synchronize()
                new = proxy[miss_blocks]
                admitted = new >= 0
                A = int(admitted.sum())
                if A:
                    Ab = _bucket(A)
                    sl = np.full((Ab,), self.n_cache_blocks, np.int32)
                    ps = np.zeros((Ab,), np.int32)
                    sl[:A] = new[admitted]
                    ps[:A] = np.nonzero(admitted)[0]
                    self.cache_kv[layer] = _scatter_admit(
                        cache_prev, staged, jnp.asarray(sl), jnp.asarray(ps))
            else:
                staged = jnp.zeros((1, self.H_kv, self.block, 2 * self.D),
                                   self.dtype)
                miss_pos = np.full_like(slots, -1)
                lfu.synchronize()
        return (slots.astype(np.int32), miss_pos.astype(np.int32), staged,
                cache_prev)

    def fetch(self, layer: int, token_idx: np.ndarray
              ) -> Tuple[jax.Array, jax.Array]:
        """token_idx [H_kv, k] → (k_top, v_top) [H_kv, k, D] device arrays.

        Row-granular convenience (tests / debugging) mirroring
        fetch_and_concat_kv_w_cache (cache_manager.py:299-428): classify
        the covering blocks, assemble them on device, pick the requested
        rows; tokens past the complete region come from the device tail.
        """
        token_idx = np.asarray(token_idx)
        bs = self.block
        blk = token_idx // bs
        slots, miss_pos, staged, cache = self.classify_blocks(layer, blk)
        blocks = assemble_blocks(cache, staged,
                                 jnp.asarray(slots), jnp.asarray(miss_pos))
        heads = jnp.arange(self.H_kv)[:, None]
        j = jnp.arange(token_idx.shape[1])[None, :]
        rows = blocks[heads, j, jnp.asarray(token_idx % bs)]  # [H_kv,k,2D]
        # tail region overrides (complete-region mask covers the rest)
        off = jnp.asarray(token_idx - int(self.valid[layer]))
        tail_rows = self.tail[layer][heads, jnp.clip(off, 0, bs - 1)]
        in_tail = jnp.asarray(token_idx >= int(self.valid[layer]))
        rows = jnp.where(in_tail[..., None], tail_rows, rows)
        return rows[..., :self.D], rows[..., self.D:]

    def flush(self) -> None:
        """Drain the LFUs' native worker threads (step boundary / tests)."""
        for lfu in self.lfu:
            lfu.synchronize()

    def sync_transfers(self, layer: int) -> None:
        """Block until this layer's pinned leaves are materialized.
        `jax.block_until_ready` does not block through the dev tunnel
        (ROUND_NOTES), so pull one leaf's bytes; transfers are ordered, so
        the newest leaf completing bounds in-flight offload traffic to
        ~one layer — without this, a 128k prefill queues every layer's
        0.5 GB of leaf transfers ahead of the copies and OOMs HBM."""
        blocks = self.kv_blocks[layer]
        if blocks:
            np.asarray(blocks[max(blocks)])

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0
