"""Micro-benchmark: KV fetch formulations for the decode hot path (live TPU).

The decode step must fetch ~0.1·T KV rows selected by PQ scores from the
HBM-resident tail. Scattered 512 B row gathers are DMA-issue-bound
(~0.5 us/row); block-granular selection amortizes the issue cost over
contiguous block reads. Round-1 measured the naive reshape+advanced-index
block gather at a pathological 78 ms — this tool isolates formulations:

  rows       per-token sorted row gather (round-1 production path)
  blk_adv    reshape to [NB, bs*2D] + advanced-index gather
  blk_taa    reshape + take_along_axis
  blk_scan   lax.scan of dynamic_slice per selected block
  blk_pallas Pallas scalar-prefetch block DMA gather (+ fused attention opt)

Run: python tools_gather_bench.py [N] [reps]; needs a TPU (or runs tiny on CPU).
"""
import sys
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
H_kv, TWO_D = 8, 256
K_TOK = int(0.1 * N)
STEPS = 8  # fused steps per timing to amortize dispatch/tunnel latency


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:28s} {best*1e3:8.3f} ms/step")
    return best


def multi(body):
    """Run `body(i)` STEPS times, accumulating a cheap reduction so XLA
    cannot elide any iteration."""
    def fn(*args):
        def step(acc, i):
            return acc + body(i, *args), None
        acc0 = jnp.zeros((), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, jnp.arange(STEPS))
        return acc
    return fn


def main():
    rng = np.random.default_rng(0)
    tail = jnp.asarray(rng.normal(size=(H_kv, N, TWO_D)) * 0.1, jnp.bfloat16)
    heads = jnp.arange(H_kv)

    # per-token sorted rows (baseline)
    rows = np.sort(rng.choice(N, size=(H_kv, K_TOK), replace=False), axis=1)
    rows_j = jnp.asarray(rows, jnp.int32)
    timeit("rows (sorted, per-token)", multi(
        lambda i, t, r: jnp.sum(t[heads[:, None], (r + i) % N]
                                .astype(jnp.float32)) * 1e-6,
        ), tail, rows_j)

    for bs in (16, 64, 128):
        NB = N // bs
        kb = max(K_TOK // bs, 1)
        blk = np.sort(rng.choice(NB, size=(H_kv, kb), replace=False), axis=1)
        blk_j = jnp.asarray(blk, jnp.int32)
        resh = tail.reshape(H_kv, NB, bs * TWO_D)

        timeit(f"blk_adv  bs={bs:3d} kb={kb}", multi(
            lambda i, t, b: jnp.sum(
                t[heads[:, None], (b + i) % NB].astype(jnp.float32)) * 1e-6,
            ), resh, blk_j)

        timeit(f"blk_taa  bs={bs:3d} kb={kb}", multi(
            lambda i, t, b: jnp.sum(jnp.take_along_axis(
                t, ((b + i) % NB)[:, :, None], axis=1)
                .astype(jnp.float32)) * 1e-6,
            ), resh, blk_j)

        def scan_gather(i, t, b):
            bi = (b + i) % NB

            def step(acc, j):
                sl = jax.vmap(
                    lambda h, bj: jax.lax.dynamic_slice(
                        t, (h, bj, 0), (1, 1, bs * TWO_D)))(heads, bi[:, j])
                return acc + jnp.sum(sl.astype(jnp.float32)) * 1e-6, None
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  jnp.arange(kb))
            return acc
        timeit(f"blk_scan bs={bs:3d} kb={kb}", multi(scan_gather), resh, blk_j)


if __name__ == "__main__":
    main()
