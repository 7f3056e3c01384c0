"""Isolated repro of the B=16 jhist layout churn (BENCH_r3 superlinear
decode cost): a 16-step scan whose carry holds the joint-histogram buffer,
each step reading per-layer slices for the scorer einsum and scattering the
per-(layer, head) join +1. At B·H_kv = 128 / 4D [L, BH, NB, C²] the real
decode program pays THREE full-buffer layout copies per step (trace:
copy.1206/copy.1338/reshape.602, 5.3 ms/step). Probe whether the FLAT
3D layout [L, BH, NB·C²] keeps one layout.

Usage: BATCH=16 python tools_jhist_layout_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pqcache_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

B = int(os.environ.get("BATCH", "16"))
L, H_kv, g = 8, 8, 4
NB, C = 130, 64
BH = B * H_kv
STEPS = 16
key = jax.random.PRNGKey(0)


def run(mode: str):
    # mode: "4d" [L, BH, NB, C²]; "flat" [L, BH, NB·C²];
    #       "tr" [L, NB, BH, C²] (transposed to the layout the 4D carry
    #       was observed to want, {3,1,2,0})
    shape = {"4d": (L, BH, NB, C * C), "flat": (L, BH, NB * C * C),
             "tr": (L, NB, BH, C * C)}[mode]
    J0 = jnp.zeros(shape, jnp.uint8)
    lut0 = jax.random.normal(key, (BH * g, 2, C), jnp.float32)

    def step(carry, _):
        J, n = carry

        def layer(acc, idx):
            Jl = J[idx]
            if mode == "flat":
                Jl = Jl.reshape(BH, NB, C * C)
            m = jnp.max(lut0, axis=-1, keepdims=True)
            e = jnp.exp(lut0 - m)
            pair = (e[:, 0, :, None] * e[:, 1, None, :]).reshape(
                BH, g, C * C)
            eq = "hgp,nhp->hgn" if mode == "tr" else "hgp,hnp->hgn"
            mass = jnp.einsum(eq, pair, Jl.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
            return acc + jnp.sum(mass), None

        acc, _ = jax.lax.scan(layer, jnp.float32(0.0),
                              jnp.arange(L, dtype=jnp.int32))
        # join scatter: one cell per (layer, head)
        pairj = (n + jnp.arange(L * BH, dtype=jnp.int32)) % (C * C)
        pairj = pairj.reshape(L, BH)
        blk = jnp.broadcast_to((n // 256) % NB, (L, BH))
        lidx = (jnp.arange(L)[:, None], jnp.arange(BH)[None, :])
        if mode == "flat":
            idx = lidx + (blk * (C * C) + pairj,)
        elif mode == "tr":
            idx = (lidx[0], blk, lidx[1], pairj)
        else:
            idx = lidx + (blk, pairj)
        cur = J[idx].astype(jnp.int32)
        J = J.at[idx].set(jnp.minimum(cur + 1, 255).astype(jnp.uint8))
        return (J, n + 1), acc

    f = jax.jit(lambda J: jax.lax.scan(step, (J, jnp.int32(0)), None,
                                       length=STEPS), donate_argnums=(0,))
    (J, _), accs = f(J0)
    np.asarray(accs)
    tdir = os.environ.get("TRACE_DIR")
    if tdir:
        with jax.profiler.trace(tdir):
            (J, _), accs = f(J)
            np.asarray(accs)
    t0 = time.perf_counter()
    (J, _), accs = f(J)
    np.asarray(accs)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"mode={mode}: {dt:.2f} ms/step", flush=True)
    return dt


if __name__ == "__main__":
    for mode in os.environ.get("MODES", "4d,tr").split(","):
        run(mode)
