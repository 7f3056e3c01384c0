"""ctypes binding for the native LFU residency manager (native/lfu/lfu.cc).

Same contract as the reference's pybind module (lfu/src/python_api.cc:7-25):
``batched_insert(block_ids, proxy)`` mutates the caller-owned proxy array
in place — admitted block-ids get a cache slot, the evicted block's proxy
entry becomes -1. Builds the shared library on first use (g++ is in the
image); a pure-Python fallback keeps tests runnable without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "lfu")
_SO = os.path.join(_DIR, "liblfu.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    lib.lfu_create.restype = ctypes.c_void_p
    lib.lfu_create.argtypes = [ctypes.c_int64]
    lib.lfu_destroy.argtypes = [ctypes.c_void_p]
    lib.lfu_size.restype = ctypes.c_int64
    lib.lfu_size.argtypes = [ctypes.c_void_p]
    lib.lfu_contains.restype = ctypes.c_int
    lib.lfu_contains.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.lfu_touch.restype = ctypes.c_int
    lib.lfu_touch.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    for name in ("lfu_batched_insert", "lfu_batched_insert_async",
                 "lfu_batched_erase"):
        fn = getattr(lib, name)
        fn.argtypes = [ctypes.c_void_p,
                       np.ctypeslib.ndpointer(np.int32, flags="C"),
                       ctypes.c_int64,
                       np.ctypeslib.ndpointer(np.int32, flags="C"),
                       ctypes.c_int64]
    lib.lfu_synchronize.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class LFUCache:
    """Block-id → cache-slot LFU with the in-place proxy protocol."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._lib = _load()
        self._h = (self._lib.lfu_create(capacity)
                   if self._lib is not None else None)
        # pure-Python fallback state (no g++, or tests forcing _h = None)
        self._freq: dict[int, int] = {}
        self._tick: dict[int, int] = {}
        self._slots: dict[int, int] = {}
        self._free_slots: list[int] = []
        self._next_slot = 0
        self._t = 0

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.lfu_destroy(self._h)
            self._h = None

    def __len__(self) -> int:
        if self._h is not None:
            return int(self._lib.lfu_size(self._h))
        return len(self._freq)

    def contains(self, key: int) -> bool:
        if self._h is not None:
            return bool(self._lib.lfu_contains(self._h, key))
        return key in self._freq

    def batched_insert(self, block_ids: np.ndarray, proxy: np.ndarray) -> None:
        block_ids = np.ascontiguousarray(block_ids, np.int32)
        assert proxy.dtype == np.int32 and proxy.flags.c_contiguous
        if self._h is not None:
            self._lib.lfu_batched_insert(
                self._h, block_ids, len(block_ids), proxy, len(proxy))
            return
        for key in block_ids.tolist():
            if key < 0 or key >= len(proxy):
                continue
            self._t += 1
            if key in self._freq:
                self._freq[key] += 1
                self._tick[key] = self._t
                continue
            if len(self._freq) >= self.capacity:
                victim = min(self._freq,
                             key=lambda k: (self._freq[k], self._tick[k]))
                slot = proxy[victim]
                proxy[victim] = -1
                del self._freq[victim], self._tick[victim], self._slots[victim]
            elif self._free_slots:
                slot = self._free_slots.pop()
            else:
                slot = self._next_slot
                self._next_slot += 1
            self._freq[key] = 1
            self._tick[key] = self._t
            self._slots[key] = int(slot)
            proxy[key] = slot

    def batched_erase(self, block_ids: np.ndarray, proxy: np.ndarray) -> None:
        """Drop block ids from the policy (slot-retirement invalidation);
        their cache slots recycle to later insertions, their proxy entries
        become -1. Callers must synchronize() first — erase runs on the
        calling thread against the same proxy array the async worker
        mutates."""
        block_ids = np.ascontiguousarray(block_ids, np.int32)
        assert proxy.dtype == np.int32 and proxy.flags.c_contiguous
        if self._h is not None:
            self._lib.lfu_batched_erase(
                self._h, block_ids, len(block_ids), proxy, len(proxy))
            return
        for key in block_ids.tolist():
            if key < 0 or key >= len(proxy) or key not in self._freq:
                continue
            if proxy[key] >= 0:
                self._free_slots.append(int(proxy[key]))
            proxy[key] = -1
            del self._freq[key], self._tick[key], self._slots[key]

    def batched_insert_async(self, block_ids: np.ndarray,
                             proxy: np.ndarray) -> None:
        block_ids = np.ascontiguousarray(block_ids, np.int32)
        if self._h is not None:
            self._keepalive = (block_ids, proxy)
            self._lib.lfu_batched_insert_async(
                self._h, block_ids, len(block_ids), proxy, len(proxy))
        else:
            self.batched_insert(block_ids, proxy)

    def synchronize(self) -> None:
        if self._h is not None:
            self._lib.lfu_synchronize(self._h)

    @property
    def native(self) -> bool:
        return self._h is not None
