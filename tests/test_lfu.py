"""Native LFU residency manager: policy behavior + proxy protocol.

Covers what the reference only smoke-tested by hand (lfu/test_file.py:13-37):
slot assignment, LFU eviction order, frequency bumping, proxy -1 reset, and
the async variant.
"""

import numpy as np
import pytest

from pqcache_tpu.native.lfu_cache import LFUCache


def _force_python(c: LFUCache) -> LFUCache:
    """Drop to the pure-python path WITHOUT leaking the native handle
    __init__ may already have created (fallback state is always
    initialized by __init__)."""
    if c._lib is not None and c._h:
        c._lib.lfu_destroy(c._h)
    c._lib = None
    c._h = None
    return c


@pytest.fixture(params=["native", "python"])
def make_cache(request):
    def _make(capacity):
        c = LFUCache(capacity)
        if request.param == "native" and not c.native:
            pytest.skip("native liblfu.so unavailable")
        if request.param == "python":
            _force_python(c)
        return c
    return _make


def test_slots_assigned_sequentially(make_cache):
    c = make_cache(4)
    proxy = np.full(16, -1, np.int32)
    c.batched_insert(np.array([3, 5, 7], np.int32), proxy)
    assert proxy[3] == 0 and proxy[5] == 1 and proxy[7] == 2
    assert len(c) == 3


def test_eviction_reuses_slot_and_resets_proxy(make_cache):
    c = make_cache(2)
    proxy = np.full(16, -1, np.int32)
    c.batched_insert(np.array([1, 2], np.int32), proxy)
    # bump 1 so 2 is the LFU victim
    c.batched_insert(np.array([1], np.int32), proxy)
    c.batched_insert(np.array([9], np.int32), proxy)
    assert proxy[2] == -1          # evicted
    assert proxy[9] == 1           # reused slot of 2
    assert proxy[1] == 0
    assert c.contains(1) and c.contains(9) and not c.contains(2)


def test_frequency_protects_hot_blocks(make_cache):
    c = make_cache(3)
    proxy = np.full(32, -1, np.int32)
    c.batched_insert(np.array([0, 1, 2], np.int32), proxy)
    for _ in range(5):
        c.batched_insert(np.array([0, 1], np.int32), proxy)
    c.batched_insert(np.array([10, 11], np.int32), proxy)
    # 2 evicted first (freq 1), then 10 (freq 1, older than 11)
    assert proxy[2] == -1 and proxy[10] == -1
    assert proxy[0] >= 0 and proxy[1] >= 0 and proxy[11] >= 0


def test_out_of_range_ids_ignored(make_cache):
    c = make_cache(4)
    proxy = np.full(8, -1, np.int32)
    c.batched_insert(np.array([-1, 100, 3], np.int32), proxy)
    assert len(c) == 1 and proxy[3] == 0


def test_async_insert_then_synchronize():
    c = LFUCache(8)
    if not c.native:
        pytest.skip("native liblfu.so unavailable")
    proxy = np.full(64, -1, np.int32)
    for rounds in range(4):
        ids = np.arange(rounds * 8, rounds * 8 + 8, dtype=np.int32) % 16
        c.batched_insert_async(ids, proxy)
        c.synchronize()
    assert len(c) == 8


def test_erase_recycles_slots(make_cache):
    c = make_cache(4)
    proxy = np.full(16, -1, np.int32)
    c.batched_insert(np.array([1, 2, 3], np.int32), proxy)
    s2 = proxy[2]
    c.batched_erase(np.array([2, 9], np.int32), proxy)  # 9 absent: no-op
    assert proxy[2] == -1 and not c.contains(2) and len(c) == 2
    # the freed slot recycles before any new slot is minted
    c.batched_insert(np.array([7], np.int32), proxy)
    assert proxy[7] == s2
    # eviction still works after erase emptied a frequency bucket
    c.batched_insert(np.array([1, 3], np.int32), proxy)   # bump 1, 3
    c.batched_insert(np.array([8, 9], np.int32), proxy)   # fill to capacity
    c.batched_insert(np.array([10], np.int32), proxy)     # must evict freq-1
    assert proxy[1] >= 0 and proxy[3] >= 0 and proxy[10] >= 0


def test_erase_matches_python_model():
    """Randomized insert+erase trace: native == pure-python model."""
    a, b = LFUCache(8), LFUCache(8)
    if not a.native:
        pytest.skip("native liblfu.so unavailable")
    _force_python(b)
    rng = np.random.default_rng(3)
    pa = np.full(32, -1, np.int32)
    pb = np.full(32, -1, np.int32)
    for step in range(60):
        ids = rng.integers(0, 32, size=5).astype(np.int32)
        if step % 3 == 2:
            a.batched_erase(ids, pa)
            b.batched_erase(ids, pb)
        else:
            a.batched_insert(ids, pa)
            b.batched_insert(ids, pb)
    np.testing.assert_array_equal(pa, pb)
    assert len(a) == len(b)


def test_matches_reference_trace(make_cache):
    """Randomized trace: native result == pure-python model result."""
    rng = np.random.default_rng(0)
    cap, n_blocks = 8, 32
    a, b = make_cache(cap), LFUCache(cap)
    _force_python(b)
    pa = np.full(n_blocks, -1, np.int32)
    pb = np.full(n_blocks, -1, np.int32)
    for _ in range(50):
        ids = rng.integers(0, n_blocks, size=6).astype(np.int32)
        a.batched_insert(ids, pa)
        b.batched_insert(ids, pb)
    np.testing.assert_array_equal(pa, pb)
