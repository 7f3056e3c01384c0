"""Probe 8: host-space gather cost vs row GRANULARITY, plus device→pinned
write bandwidth (prefill offload path).

Probe 7 showed the XLA host gather costs ~27 µs per 512 B row (353 ms for
13k rows) — per-row overhead, not bandwidth. Block-granular selection lets
us fetch 64 KB contiguous slabs instead; if the per-row overhead is flat,
bigger rows amortize it to DMA speed.
"""
import json
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.sharding import SingleDeviceSharding
from jax.experimental.compute_on import compute_on


def timed(fn, *args, iters=5):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    s_host = SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = SingleDeviceSharding(dev, memory_kind="device")

    total = 13 * (1 << 20)  # ~13MB fetched per call
    store = 2 * (1 << 30)   # 2GB store
    for row_bytes in (4096, 65536, 524288):
        R = row_bytes // 2  # bf16 lanes
        N = store // row_bytes
        k = max(total // row_bytes, 1)
        kv = jax.device_put(jnp.zeros((N, R), jnp.bfloat16), s_host)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, N, k), jnp.int32)

        @jax.jit
        def fetch(kv, i):
            ih = jax.device_put(i, s_host)

            @compute_on('device_host')
            @jax.jit
            def hg(h, ii):
                return h.at[ii].get(mode="promise_in_bounds")
            rows = hg(kv, ih)
            return jax.device_put(rows, s_dev).sum()

        try:
            ms = timed(fetch, kv, idx)
            print(json.dumps({"row_KB": row_bytes // 1024, "k": int(k),
                              "ms": round(ms, 2),
                              "GBps": round(total / 1e9 / (ms / 1e3), 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"row_KB": row_bytes // 1024,
                              "err": repr(e)[:200]}), flush=True)
        del kv

    # device → pinned host write bandwidth (prefill offload)
    xd = jnp.ones((64, 1 << 20), jnp.float32)  # 256MB on device

    # round trip d2h+h2d (sync-safe); h2d alone measured 25.8ms
    @jax.jit
    def rt(x):
        h = jax.device_put(x, s_host)
        return jax.device_put(h, s_dev).sum()
    try:
        np.asarray(rt(xd))
        t0 = time.perf_counter()
        for _ in range(5):
            r = rt(xd)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({"roundtrip_256MB_ms": round(dt * 1e3, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"roundtrip_err": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
