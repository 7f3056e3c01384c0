"""HostKVStore: hit/miss classification, LFU promotion, fetch correctness."""

import numpy as np

from pqcache_tpu.runtime.host_offload import HostKVStore


def _store(**kw):
    defaults = dict(layers=1, n_kv_heads=2, capacity=512, head_dim=8,
                    block_size=32, hbm_cache_tokens=128, cache_topk_blocks=4)
    defaults.update(kw)
    return HostKVStore(**defaults)


def test_fetch_returns_host_rows():
    s = _store()
    rng = np.random.default_rng(0)
    k = rng.normal(size=(2, 512, 8)).astype(np.float32)
    v = rng.normal(size=(2, 512, 8)).astype(np.float32)
    s.offload_layer(0, k, v)
    idx = np.array([[3, 100, 511], [0, 64, 200]])
    k_top, v_top = s.fetch(0, idx)
    for h in range(2):
        for j, t in enumerate(idx[h]):
            np.testing.assert_allclose(np.asarray(k_top)[h, j], k[h, t],
                                       rtol=2e-2, atol=1e-3)
            np.testing.assert_allclose(np.asarray(v_top)[h, j], v[h, t],
                                       rtol=2e-2, atol=1e-3)


def test_repeated_fetch_hits_cache():
    s = _store()
    rng = np.random.default_rng(1)
    k = rng.normal(size=(2, 512, 8)).astype(np.float32)
    s.offload_layer(0, k, k.copy())
    idx = np.array([[0, 1, 2, 33, 34], [0, 1, 2, 33, 34]])
    s.fetch(0, idx)          # cold: misses, blocks 0 and 1 promoted
    h0, m0 = s.hits, s.misses
    k_top, _ = s.fetch(0, idx)  # warm: should hit
    assert s.hits > h0
    assert s.misses == m0
    for h in range(2):
        for j, t in enumerate(idx[h]):
            np.testing.assert_allclose(np.asarray(k_top)[h, j], k[h, t],
                                       rtol=2e-2, atol=1e-3)


def test_cache_correct_after_eviction_churn():
    s = _store(hbm_cache_tokens=64)  # 2-block cache
    rng = np.random.default_rng(2)
    k = rng.normal(size=(2, 512, 8)).astype(np.float32)
    s.offload_layer(0, k, k.copy())
    for start in (0, 64, 128, 192, 0, 256, 64):
        idx = np.tile(np.arange(start, start + 8)[None], (2, 1))
        k_top, _ = s.fetch(0, idx)
        for h in range(2):
            for j, t in enumerate(idx[h]):
                np.testing.assert_allclose(np.asarray(k_top)[h, j], k[h, t],
                                           rtol=2e-2, atol=1e-3, err_msg=f"start={start}")
    # proxy map stays consistent: at most n_cache_blocks valid slots
    assert (s.block_slot[0] >= 0).sum() <= s.n_cache_blocks


def test_append_token_visible():
    s = _store()
    k = np.zeros((2, 512, 8), np.float32)
    s.offload_layer(0, k[:, :100], k[:, :100])
    new = np.full((2, 8), 7.0, np.float32)
    s.append_token(0, 100, new, new * 2)
    k_top, v_top = s.fetch(0, np.array([[100], [100]]))
    np.testing.assert_allclose(np.asarray(k_top)[:, 0], new)
    np.testing.assert_allclose(np.asarray(v_top)[:, 0], new * 2)


def test_append_refreshes_resident_block():
    # ADVICE r01 (high): after a block is admitted to the HBM cache, tokens
    # appended into that block must be served fresh, not stale cached zeros.
    s = _store()
    rng = np.random.default_rng(7)
    k = rng.normal(size=(2, 512, 8)).astype(np.float32)
    s.offload_layer(0, k[:, :96], k[:, :96])  # blocks 0..2 fully valid
    idx = np.tile(np.arange(64, 72)[None], (2, 1))
    for _ in range(3):
        s.fetch(0, idx)  # admit block 2 (tokens 64..95)
    assert s.block_slot[0][2] >= 0
    new = np.full((2, 8), 9.0, np.float32)
    s.append_token(0, 80, new, new * 3)  # inside resident block 2
    k_top, v_top = s.fetch(0, np.array([[80], [80]]))
    np.testing.assert_allclose(np.asarray(k_top)[:, 0], new)
    np.testing.assert_allclose(np.asarray(v_top)[:, 0], new * 3)


def test_partial_tail_block_not_admitted():
    # the growing tail block (partially written) must not enter the cache
    s = _store()
    k = np.ones((2, 512, 8), np.float32)
    s.offload_layer(0, k[:, :40], k[:, :40])  # block 1 only 8/32 valid
    idx = np.tile(np.arange(32, 40)[None], (2, 1))
    for _ in range(3):
        s.fetch(0, idx)
    assert s.block_slot[0][1] < 0  # block 1 not resident


def test_hit_evicted_and_readmitted_in_one_batch_serves_fresh_data():
    """Regression (round 4): within ONE classify batch, a new block's
    admission can evict a block that is a HIT in the same step; if the LFU
    processes the hit AFTER the eviction it re-admits it at a FRESH slot
    that nothing staged — the cache then serves stale rows. classify now
    orders hits before admissions. This drives mixed hit+miss batches
    under heavy churn and verifies every fetched row against the leaves."""
    import jax.numpy as jnp
    from pqcache_tpu.runtime.host_offload import assemble_blocks
    s = _store(hbm_cache_tokens=96)   # 3-block cache, block 32
    rng = np.random.default_rng(7)
    k = rng.normal(size=(2, 512, 8)).astype(np.float32)   # 16 blocks
    s.offload_layer(0, k, k.copy())
    # access pattern: one persistent hot block + rotating cold blocks —
    # every step is a mixed batch where cold admissions evict around the
    # hot block (ids interleave so the hot id often follows a cold one)
    for step in range(24):
        cold = 1 + (step % 4) * 3
        blk = np.asarray([[0, cold, cold + 1],
                          [cold + 1, 0, cold]], np.int32)
        slots, miss, staged, cache = s.classify_blocks(0, blk)
        got = np.asarray(assemble_blocks(
            cache, staged, jnp.asarray(slots), jnp.asarray(miss)))
        for h in range(2):
            for j in range(blk.shape[1]):
                leaf = np.asarray(s.kv_blocks[0][int(blk[h, j])])
                np.testing.assert_array_equal(
                    got[h, j], leaf[h],
                    err_msg=f"step={step} h={h} blk={blk[h, j]} "
                            f"slot={slots[h, j]}")


def test_invalidate_blocks_recycles_range():
    """Slot retirement: invalidated block ids drop their leaves, LFU
    entries, and cache residency; re-offloading NEW data at the SAME ids
    must serve the new rows (no stale cache hit)."""
    s = _store(hbm_cache_tokens=128)
    rng = np.random.default_rng(5)
    k1 = rng.normal(size=(2, 256, 8)).astype(np.float32)
    s.offload_layer(0, k1, k1.copy())
    idx = np.tile(np.arange(0, 64)[None], (2, 1))
    s.fetch(0, idx)                       # promote blocks 0-1 into cache
    s.fetch(0, idx)
    assert (s.block_slot[0][:2] >= 0).all()
    s.invalidate_blocks(np.arange(8))
    assert (s.block_slot[0][:8] == -1).all()
    assert not s.kv_blocks[0]
    # same ids, new occupant
    k2 = rng.normal(size=(2, 256, 8)).astype(np.float32)
    s.valid[0] = 0
    s.tail_fill[0] = 0
    s.offload_layer(0, k2, k2.copy())
    k_top, _ = s.fetch(0, idx)
    for h in range(2):
        for j, t in enumerate(idx[h]):
            np.testing.assert_allclose(np.asarray(k_top)[h, j], k2[h, t],
                                       rtol=2e-2, atol=1e-3)
