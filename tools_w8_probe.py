"""Probe: does XLA:TPU serve x @ convert(int8 W) at int8 HBM bytes?

Decode is weight-streaming-bound (B=16 @ 32k: ~6.5 ms of the 16.33 ms
step is reading 5.2 GiB of bf16 params). Weight-only int8 halves those
bytes IF the convert fuses into the matmul's operand read; if XLA instead
materializes a bf16 copy of W per step, the bytes (and a copy) come back
and a Pallas dequant-matmul kernel is needed.

Times, per matmul shape of the llama31-width decode step:
  a) bf16 W            : x @ W
  b) int8 W, convert   : x @ W8.astype(bf16) * scale
  c) int8 W, pre-scale-x variant (scale folded after the dot)
Prints one JSON line with ms per variant and the implied GB/s.
"""
import json
import time

import numpy as np

from pqcache_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

B = 16
E, I, HD = 4096, 14336, 4096
L = 8   # fold L layers into one timed loop for measurable duration


def bench(fn, *args, iters=20):
    fn(*args)  # compile
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = jax.random.PRNGKey(0)
    # one big fused loop over L "layers" of gate+up+down style matmuls
    Wg = jax.random.normal(rng, (L, E, I), jnp.bfloat16) * 0.02
    Wd = jax.random.normal(rng, (L, I, E), jnp.bfloat16) * 0.02
    x0 = jax.random.normal(rng, (B, E), jnp.bfloat16)

    sg = jnp.max(jnp.abs(Wg.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    sd = jnp.max(jnp.abs(Wd.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    Wg8 = jnp.clip(jnp.round(Wg.astype(jnp.float32) / sg), -127, 127
                   ).astype(jnp.int8)
    Wd8 = jnp.clip(jnp.round(Wd.astype(jnp.float32) / sd), -127, 127
                   ).astype(jnp.int8)
    sg16 = sg.astype(jnp.bfloat16)
    sd16 = sd.astype(jnp.bfloat16)

    @jax.jit
    def f_bf16(x, wg, wd):
        def body(h, lw):
            g, d = lw
            return (h @ g) @ d, None
        h, _ = jax.lax.scan(body, x, (wg, wd))
        return h

    @jax.jit
    def f_int8(x, wg8, wd8, sg, sd):
        def body(h, lw):
            g8, d8, s1, s2 = lw
            t = (h @ g8.astype(jnp.bfloat16)) * s1
            return (t @ d8.astype(jnp.bfloat16)) * s2, None
        h, _ = jax.lax.scan(body, x, (wg8, wd8, sg, sd))
        return h

    ms_bf = bench(f_bf16, x0, Wg, Wd) * 1e3
    ms_i8 = bench(f_int8, x0, Wg8, Wd8, sg16, sd16) * 1e3
    bytes_bf = 2 * (Wg.size + Wd.size)
    bytes_i8 = Wg8.size + Wd8.size
    print(json.dumps({
        "metric": "weight-streaming matmul probe (B=16, 8x[gate+down])",
        "bf16_ms": round(ms_bf, 3),
        "int8_convert_ms": round(ms_i8, 3),
        "bf16_GBps": round(bytes_bf / ms_bf / 1e6, 1),
        "int8_GBps_effective": round(bytes_i8 / ms_i8 / 1e6, 1),
        "speedup": round(ms_bf / ms_i8, 3),
        "verdict": ("convert FUSES (int8 bytes win)" if ms_i8 < ms_bf * 0.7
                    else "convert MATERIALIZES (need pallas dequant matmul)"),
    }))


if __name__ == "__main__":
    main()
