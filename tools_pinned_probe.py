"""Probe host-memory-kind support on the current backend.

The host-offload tier keeps the full KV store in host RAM (numpy) and
stages misses through device transfers. If the backend supports the
`pinned_host` memory kind (jax memories API), the store can instead live
in pinned host memory addressable by the device DMA engines —
cache_manager.py:339-362's pinned staging path, the TPU way.

Prints one JSON line per probe stage; safe to run anywhere (catches and
reports unsupported paths).
"""
import json
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    out = {"platform": dev.platform, "device": str(dev)}
    try:
        mems = [m.kind for m in dev.addressable_memories()]
        out["memories"] = mems
    except Exception as e:  # noqa: BLE001
        out["memories_error"] = repr(e)
        mems = []
    print(json.dumps(out), flush=True)

    if "pinned_host" not in mems:
        print(json.dumps({"pinned_host": "unsupported"}), flush=True)
        return

    from jax.sharding import SingleDeviceSharding
    x = np.random.default_rng(0).standard_normal((4096, 256)).astype(
        np.float32)
    try:
        s_host = SingleDeviceSharding(dev, memory_kind="pinned_host")
        s_dev = SingleDeviceSharding(dev, memory_kind="device")
        xh = jax.device_put(x, s_host)
        xh.block_until_ready()
        print(json.dumps({"place_pinned": "ok",
                          "kind": xh.sharding.memory_kind}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"place_pinned_error": repr(e)}), flush=True)
        return

    # device gather FROM pinned host inside jit (the offload fetch pattern)
    try:
        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, 4096, 512), jnp.int32)

        @jax.jit
        def gather(h, i):
            d = jax.device_put(h, s_dev)
            return jnp.take(d, i, axis=0)

        r = gather(xh, idx)
        np.asarray(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = gather(xh, idx)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 10
        print(json.dumps({"jit_gather_from_pinned": "ok",
                          "ms": round(dt * 1e3, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"jit_gather_error": repr(e)}), flush=True)

    # H2D bandwidth: pinned vs numpy source
    try:
        big = np.zeros((64, 1 << 20), np.float32)   # 256 MB
        bh = jax.device_put(big, s_host)
        bh.block_until_ready()
        t0 = time.perf_counter()
        bd = jax.device_put(bh, s_dev)
        bd.block_until_ready()
        t_pin = time.perf_counter() - t0
        t0 = time.perf_counter()
        bd2 = jax.device_put(big, s_dev)
        bd2.block_until_ready()
        t_np = time.perf_counter() - t0
        print(json.dumps({"h2d_256MB_pinned_s": round(t_pin, 3),
                          "h2d_256MB_numpy_s": round(t_np, 3)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"h2d_error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
