"""Per-channel int8 quantization for the HBM KV tail.

The KV tail ([L, H_kv, N, 2D] — runtime/state.py) is the dominant state
buffer; int8 halves it, which is what lets a 16 GB v5e chip hold a
16-slot 32k serving pool. The scheme is chosen so the DECODE hot path
needs no per-row scale arithmetic at all:

  * scales are per (layer, head, CHANNEL) — k_scale/v_scale [L, H_kv, 1, D]
    f32 — computed once from the prefill keys/values (absmax/127 over the
    valid tokens) and FROZEN; generated tokens quantize with the same
    scales and clip (per-channel magnitudes are stable across positions,
    and RoPE'd K channels are bounded by the max norm of their rotation
    pair).
  * K dequant folds into the QUERY: q·(s_k ⊙ K_int8) = (q ⊙ s_k)·K_int8,
    so the fused block-retrieval kernel (ops/block_attn_pallas.py) reads
    int8 rows and converts — zero scale plumbing in the kernel.
  * V dequant folds out of the ATTENTION PARTIALS: the online-softmax
    accumulator is linear in V, so acc ⊙ s_v after the kernel (and after
    any XLA segment partial) is exact.

Per-channel K scaling is also the quality-right choice: K outliers
concentrate in channels (KIVI, arXiv 2402.02750), which per-token scales
cannot absorb. The reference keeps fp16 KV everywhere and pays PCIe for
it (cache_manager.py:89-100); int8 is a TPU-side capability beyond it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kv_channel_scales(k: jax.Array, v: jax.Array,
                      valid_len: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel absmax/127 scales over the first `valid_len` tokens.

    k, v: [H_kv, T, D] (any float dtype); valid_len: i32 scalar (tokens at
    index >= valid_len are garbage — rolled padding — and must not poison
    the absmax). Returns (k_scale, v_scale) each [H_kv, 1, D] f32, floored
    at a tiny epsilon so all-zero channels stay finite.
    """
    T = k.shape[1]
    valid = (jnp.arange(T, dtype=jnp.int32) < valid_len)[None, :, None]
    amax = lambda x: jnp.max(
        jnp.where(valid, jnp.abs(x.astype(jnp.float32)), 0.0),
        axis=1, keepdims=True)
    eps = jnp.float32(1e-8)
    return (jnp.maximum(amax(k) / 127.0, eps),
            jnp.maximum(amax(v) / 127.0, eps))


def quantize_channels(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric per-channel int8 quantization of one tensor.
    x [..., T, D]; scale broadcastable [..., 1, D] f32 → [..., T, D] int8."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def quantize_kv(k: jax.Array, v: jax.Array, k_scale: jax.Array,
                v_scale: jax.Array) -> jax.Array:
    """Quantize K/V rows into one interleaved int8 row buffer.

    k, v: [..., T, D]; scales broadcastable [..., 1, D] f32.
    Returns [..., T, 2D] int8 (K in [:D], V in [D:] — the tail layout)."""
    return jnp.concatenate([quantize_channels(k, k_scale),
                            quantize_channels(v, v_scale)], axis=-1)


def clip_fraction(k: jax.Array, v: jax.Array, k_scale: jax.Array,
                  v_scale: jax.Array) -> jax.Array:
    """Fraction of elements that SATURATE when quantized with (frozen)
    scales — the drift observable for generated tokens: prefill-frozen
    scales clip silently when later K/V magnitudes exceed the prefill
    absmax. Cheap enough for harness-side spot checks; not wired into
    the decode hot path. Returns a f32 scalar in [0, 1]."""
    f = lambda x, s: jnp.mean(
        (jnp.abs(x.astype(jnp.float32) / s) > 127.0).astype(jnp.float32))
    return (f(k, k_scale) + f(v, v_scale)) / 2.0


def dequant_kv(kv: jax.Array, k_scale: jax.Array, v_scale: jax.Array,
               dtype=jnp.bfloat16) -> tuple[jax.Array, jax.Array]:
    """Split + dequantize interleaved int8 rows.

    kv: [..., T, 2D] int8; scales broadcastable against [..., T, D].
    Returns (k, v) in `dtype`."""
    D = kv.shape[-1] // 2
    k = kv[..., :D].astype(jnp.float32) * k_scale
    v = kv[..., D:].astype(jnp.float32) * v_scale
    return k.astype(dtype), v.astype(dtype)


# -- weight-only int8 (W8A16) -------------------------------------------------
#
# Decode is weight-streaming-bound (B=16 @ 32k: the MLP/projection/lm_head
# reads are ~6 ms of the 14 ms step); per-OUT-COLUMN int8 weights halve
# those HBM bytes. The scale factors out of the matmul exactly —
#     x @ (W8 ⊙ s_col) = (x @ W8) ⊙ s_col
# — so the compute path converts W8 to bf16 inside the dot (XLA keeps the
# int8 operand in HBM; measured 1.38× on the 8×[gate+down] probe,
# tools_w8_probe.py) and applies the [1, out] scale to the small output.
# The reference has no weight quantization at all.

_W_KEYS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def quantize_weight_mat(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., in, out] float → (int8 weights, per-out-column scales
    [..., 1, out] of the input dtype)."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s.astype(w.dtype)


def quantize_weight_tree(params: dict, *, embed: bool = True) -> dict:
    """int8-quantize the stacked layer matrices (+ lm_head, and the
    embedding with per-ROW scales when `embed`). Returns a NEW params
    pytree with the same keys plus '<name>_s' scale siblings; the model
    stack (models/llama.py _mm / embed_lookup / lm_head_logits) consumes
    either layout transparently."""
    out = dict(params)
    layers = dict(params["layers"])
    for k in _W_KEYS:
        layers[k], layers[k + "_s"] = quantize_weight_mat(layers[k])
    out["layers"] = layers
    lm, lm_s = quantize_weight_mat(params["lm_head"])
    out["lm_head"], out["lm_head_s"] = lm, lm_s
    if embed:
        e = params["embed"].astype(jnp.float32)          # [V, E]
        s = jnp.maximum(jnp.max(jnp.abs(e), axis=1, keepdims=True) / 127.0,
                        1e-12)
        out["embed"] = jnp.clip(jnp.round(e / s), -127, 127
                                ).astype(jnp.int8)
        out["embed_s"] = s.astype(params["embed"].dtype)
    return out
