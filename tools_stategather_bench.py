"""In-program gather formulations over the STACKED [L, ...] state (live TPU).

Replicates the decode-loop structure (lax.scan over layers with a traced
layer index) that made block-granular gathers pathological (82 ms/step at
32k/8L) while an isolated single-layer gather costs 3.7 ms: the suspect is
the traced-layer indexing + reshape combination.

Run: python tools_stategather_bench.py [N] [L]
"""
import sys
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H_kv, TWO_D = 8, 256
K_TOK = int(0.1 * N)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / L)
    print(f"{name:36s} {best*1e3:8.3f} ms/layer")


def layers_scan(body):
    def fn(tail, idxs):
        def step(acc, l):
            return acc + body(tail, l, idxs), None
        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(L))
        return acc
    return fn


def main():
    rng = np.random.default_rng(0)
    tail = jnp.asarray(rng.normal(size=(L, H_kv, N, TWO_D)) * 0.1,
                       jnp.bfloat16)
    heads = jnp.arange(H_kv)
    rows = jnp.asarray(np.sort(rng.choice(
        N, size=(H_kv, K_TOK), replace=False), axis=1), jnp.int32)

    timeit("rows: tail[l, heads, rows]", layers_scan(
        lambda t, l, r: jnp.sum(
            t[l, heads[:, None], r].astype(jnp.float32)) * 1e-6), tail, rows)

    for bs in (64, 128):
        NB = N // bs
        kb = K_TOK // bs
        blk = jnp.asarray(np.sort(rng.choice(
            NB, size=(H_kv, kb), replace=False), axis=1), jnp.int32)

        timeit(f"blk bs={bs}: reshape-then-[l,h,b]", layers_scan(
            lambda t, l, b, nb=NB, w=bs * TWO_D: jnp.sum(
                t.reshape(L, H_kv, nb, w)[l, heads[:, None], b]
                .astype(jnp.float32)) * 1e-6), tail, blk)

        timeit(f"blk bs={bs}: [l]-then-reshape", layers_scan(
            lambda t, l, b, nb=NB, w=bs * TWO_D: jnp.sum(
                t[l].reshape(H_kv, nb, w)[heads[:, None], b]
                .astype(jnp.float32)) * 1e-6), tail, blk)

        timeit(f"blk bs={bs}: [l]-then-taa", layers_scan(
            lambda t, l, b, nb=NB, w=bs * TWO_D: jnp.sum(
                jnp.take_along_axis(
                    t[l].reshape(H_kv, nb, w), b[:, :, None], axis=1)
                .astype(jnp.float32)) * 1e-6), tail, blk)

        # expand blocks to row indices; plain row gather
        timeit(f"blk bs={bs}: expand-rows", layers_scan(
            lambda t, l, b, n=bs: jnp.sum(
                t[l, heads[:, None],
                  (b[:, :, None] * n + jnp.arange(n)[None, None, :])
                  .reshape(H_kv, -1)].astype(jnp.float32)) * 1e-6),
            tail, blk)


if __name__ == "__main__":
    main()
