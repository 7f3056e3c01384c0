"""Native LFU residency manager: policy behavior + proxy protocol.

Covers what the reference only smoke-tested by hand (lfu/test_file.py:13-37):
slot assignment, LFU eviction order, frequency bumping, proxy -1 reset, and
the async variant.
"""

import numpy as np
import pytest

from pqcache_tpu.native.lfu_cache import LFUCache


@pytest.fixture(params=["native", "python"])
def make_cache(request):
    def _make(capacity):
        c = LFUCache(capacity)
        if request.param == "native" and not c.native:
            pytest.skip("native liblfu.so unavailable")
        if request.param == "python":
            # force the pure-python path
            c = LFUCache.__new__(LFUCache)
            c.capacity = capacity
            c._lib = None
            c._h = None
            c._freq, c._tick, c._slots = {}, {}, {}
            c._next_slot, c._t = 0, 0
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


def test_matches_reference_trace(make_cache):
    """Randomized trace: native result == pure-python model result."""
    rng = np.random.default_rng(0)
    cap, n_blocks = 8, 32
    a, b = make_cache(cap), LFUCache.__new__(LFUCache)
    b.capacity = cap
    b._lib = None; b._h = None
    b._freq, b._tick, b._slots = {}, {}, {}
    b._next_slot, b._t = 0, 0
    pa = np.full(n_blocks, -1, np.int32)
    pb = np.full(n_blocks, -1, np.int32)
    for _ in range(50):
        ids = rng.integers(0, n_blocks, size=6).astype(np.int32)
        a.batched_insert(ids, pa)
        b.batched_insert(ids, pb)
    np.testing.assert_array_equal(pa, pb)
