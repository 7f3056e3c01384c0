"""Probe 7: where does pinned_host actually live under the axon tunnel?

Times (with correct np.asarray sync — block_until_ready does not block
through the tunnel):
  1. pinned→device 256MB copy (server-side: ~30ms PCIe; client-side: ~6s)
  2. single-layer host gather (13k rows) in isolation
  3. the same gather when only a reduced scalar returns to device
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
    r = fn(*args)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    dev = jax.devices()[0]
    s_host = SingleDeviceSharding(dev, memory_kind="pinned_host")
    s_dev = SingleDeviceSharding(dev, memory_kind="device")

    big = jax.device_put(jnp.ones((64, 1 << 20), jnp.float32), s_host)  # 256MB

    @jax.jit
    def h2d_sum(h):
        d = jax.device_put(h, s_dev)
        return d.sum()

    ms = timed(h2d_sum, big)
    print(json.dumps({"h2d_256MB_ms": round(ms, 1),
                      "GBps": round(0.25 / (ms / 1e3), 2)}), flush=True)

    # single gather: 13312 rows x 512B = 6.8MB out of 2.1GB
    N, R, K = 4 * (1 << 20), 256, 13312
    kv = jax.device_put(jnp.zeros((N, R), jnp.bfloat16), s_host)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, K), jnp.int32)

    @compute_on('device_host')
    @jax.jit
    def hgather(h, i):
        return h.at[i].get(mode="promise_in_bounds")

    @jax.jit
    def fetch_rows(kv, i):
        ih = jax.device_put(i, s_host)
        rows = hgather(kv, ih)
        return jax.device_put(rows, s_dev).sum()

    @jax.jit
    def fetch_scalar(kv, i):
        ih = jax.device_put(i, s_host)

        @compute_on('device_host')
        @jax.jit
        def gsum(h, ii):
            return h.at[ii].get(mode="promise_in_bounds") \
                    .astype(jnp.float32).sum()
        return jax.device_put(gsum(kv, ih), s_dev)

    for name, fn in (("gather_rows_to_device", fetch_rows),
                     ("gather_sum_on_host", fetch_scalar)):
        try:
            ms = timed(fn, kv, idx)
            print(json.dumps({"variant": name, "rows": K,
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "err": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
