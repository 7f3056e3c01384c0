"""From-scratch llama-family decoder (covers Llama-2 / Llama-3.1 / Mistral).

The reference integrates by monkey-patching HuggingFace transformers
(mistral_patch.py / llama31_patch.py / llama_patch.py — one ~570-line patch
file per model family). Here the decoder is ~200 lines of pure JAX, written
once: all three families share the computation graph (RMSNorm → GQA
attention with RoPE → SwiGLU MLP) and differ only in ModelConfig numbers
(rope theta/scaling, head counts, vocab).

TPU-first choices:
  * parameters are stacked over layers ([L, ...]) and the decoder is a
    single lax.scan — one compiled layer body instead of L inlined layers.
  * attention policies (policies/) plug in at the attention site; their
    per-layer state rides the same scan.
  * the MLP runs in token chunks to bound activation memory — the
    reference's 32 000-token chunked LN/MLP (mistral_patch.py:246-279) — and
    the LM head is applied to the last position only (mistral_patch.py:546).
  * matmuls stay in bf16 for the MXU; normalization and softmax in f32.

Weight layout matches HF safetensors transposed to [in, out] so x @ W runs
without per-call transposes. RoPE uses HF's rotate-half convention so HF
checkpoints load unmodified.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from pqcache_tpu.config import ModelConfig


# ---------------------------------------------------------------------------
# Parameter construction

def init_params(cfg: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random parameters with the exact pytree layout the loader produces."""
    k = iter(jax.random.split(key, 16))
    E, H, Hkv, D, I, L, V = (cfg.hidden_size, cfg.num_heads, cfg.num_kv_heads,
                             cfg.head_dim, cfg.intermediate_size,
                             cfg.num_layers, cfg.vocab_size)
    s = 0.02
    n = lambda kk, *shape: (jax.random.normal(kk, shape, jnp.float32) * s).astype(dtype)
    params = {
        "embed": n(next(k), V, E),
        "final_norm": jnp.ones((E,), dtype),
        "layers": {
            "ln1": jnp.ones((L, E), dtype),
            "ln2": jnp.ones((L, E), dtype),
            "wq": n(next(k), L, E, H * D),
            "wk": n(next(k), L, E, Hkv * D),
            "wv": n(next(k), L, E, Hkv * D),
            "wo": n(next(k), L, H * D, E),
            "gate": n(next(k), L, E, I),
            "up": n(next(k), L, E, I),
            "down": n(next(k), L, I, E),
        },
    }
    params["lm_head"] = (params["embed"].T if cfg.tie_word_embeddings
                         else n(next(k), E, V))
    return params


# ---------------------------------------------------------------------------
# Primitive blocks

def _mm(x: jax.Array, lp: dict, name: str) -> jax.Array:
    """x @ lp[name], transparently handling weight-only int8
    (core/quant.quantize_weight_tree): the int8 operand streams from HBM
    at half the bytes, converts inside the dot, and the per-out-column
    scale applies to the SMALL output — x @ (W8 ⊙ s) == (x @ W8) ⊙ s."""
    w = lp[name]
    if w.dtype == jnp.int8:
        return (x @ w.astype(x.dtype)) * lp[name + "_s"].astype(x.dtype)
    return x @ w


def embed_lookup(params: dict, tokens: jax.Array) -> jax.Array:
    """Embedding rows for `tokens` (int8 tables carry per-row scales)."""
    e = params["embed"]
    h = jnp.take(e, tokens, axis=0)
    if e.dtype == jnp.int8:
        s = jnp.take(params["embed_s"], tokens, axis=0)
        h = h.astype(s.dtype) * s
    return h


def lm_head_logits(params: dict, last: jax.Array) -> jax.Array:
    """last [., E] @ lm_head → f32 logits (int8 head post-scales)."""
    w = params["lm_head"]
    if w.dtype == jnp.int8:
        return ((last @ w.astype(last.dtype)).astype(jnp.float32)
                * params["lm_head_s"].astype(jnp.float32))
    return (last @ w).astype(jnp.float32)


def lm_head_params(params: dict) -> dict:
    """The final-norm + lm-head subset an engine passes to its last-layer
    program (includes the int8 head's scale row when present)."""
    out = {"final_norm": params["final_norm"], "lm_head": params["lm_head"]}
    if "lm_head_s" in params:
        out["lm_head_s"] = params["lm_head_s"]
    return out


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_inv_freq(cfg: ModelConfig) -> jax.Array:
    """Base inverse frequencies, with Llama-3.1 rope scaling when configured
    (HF modeling_rope_utils _compute_llama3_parameters)."""
    D = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    if cfg.rope_scaling_factor is not None:
        factor = cfg.rope_scaling_factor
        lo = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        hi = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wavelen = 2.0 * jnp.pi / inv
        smooth = (cfg.rope_original_max_position / wavelen
                  - cfg.rope_low_freq_factor) / (
                      cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        scaled = (1.0 - smooth) * inv / factor + smooth * inv
        inv = jnp.where(wavelen > lo, inv / factor,
                        jnp.where(wavelen < hi, inv, scaled))
    return inv


def rope_cos_sin(cfg: ModelConfig, positions: jax.Array):
    """positions [T] i32 → (cos, sin) [T, D/2] f32."""
    inv = rope_inv_freq(cfg)
    ang = positions.astype(jnp.float32)[:, None] * inv[None, :]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF rotate-half convention. x [Hx, T, D]; cos/sin [T, D/2]."""
    D = x.shape[-1]
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


def mlp(lp: dict, x: jax.Array, chunk: int = 16384) -> jax.Array:
    """SwiGLU MLP, token-chunked to bound the [T, I] activations — the
    reference's chunked-MLP memory bound (mistral_patch.py:246-279).
    chunk=16384 bounds the transient at [16384, I] (≈470 MB bf16 at
    llama31 width) while keeping each chunk MXU-saturating (the 4096
    chunking serialized 8 sub-matmuls per layer at ~46% MFU, profiled)."""
    T = x.shape[0]

    def one(xc):
        g = jax.nn.silu(_mm(xc, lp, "gate"))
        return _mm(g * _mm(xc, lp, "up"), lp, "down")

    if chunk <= 0 or T <= chunk or T % chunk != 0:
        return one(x)
    xc = x.reshape(T // chunk, chunk, -1)
    return jax.lax.map(one, xc).reshape(T, -1)


# ---------------------------------------------------------------------------
# Decoder steps (scan over layers; policy plugs in at the attention site)
#
# The whole policy state (arrays stacked over layers) rides the layer scan
# CARRY; each layer body reads the slices it needs (gathers / dynamic
# slices indexed by the layer id from xs) and writes back with
# dynamic_update_slice. Carry-threading lets XLA keep the big KV/code
# buffers in place — passing per-layer state through scan xs/ys instead
# would copy every buffer once per token.

def _q_proj(cfg: ModelConfig, lp: dict, h_norm: jax.Array, cos, sin):
    T = h_norm.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    q = _mm(h_norm, lp, "wq").reshape(T, H, D).transpose(1, 0, 2)
    return apply_rope(q, cos, sin)


def _kv_proj(cfg: ModelConfig, lp: dict, h_norm: jax.Array, cos, sin):
    T = h_norm.shape[0]
    Hkv, D = cfg.num_kv_heads, cfg.head_dim
    k = _mm(h_norm, lp, "wk").reshape(T, Hkv, D).transpose(1, 0, 2)
    v = _mm(h_norm, lp, "wv").reshape(T, Hkv, D).transpose(1, 0, 2)
    return apply_rope(k, cos, sin), v


def _qkv(cfg: ModelConfig, lp: dict, h_norm: jax.Array, cos, sin):
    k, v = _kv_proj(cfg, lp, h_norm, cos, sin)
    return _q_proj(cfg, lp, h_norm, cos, sin), k, v


def _finish_layer(cfg: ModelConfig, lp: dict, hidden: jax.Array,
                  att: jax.Array, axis_name=None) -> jax.Array:
    """Post-attention half of one decoder layer — THE single source of
    truth for the residual/norm/MLP tail (every prefill variant and both
    decode steps call this; a dropped residual add here once produced
    plausible-but-wrong tokens, see ROUND_NOTES). att: [T, H·D] flattened
    head outputs. With `axis_name` set (explicit tensor parallelism under
    shard_map), lp holds this shard's column/row slices and the two
    row-parallel projections (attention output, MLP down) are psum-reduced
    — the Megatron pattern, expressed manually so Pallas kernels upstream
    run per-shard."""
    attn_out = _mm(att, lp, "wo")
    if axis_name is not None:
        attn_out = jax.lax.psum(attn_out, axis_name)
    hidden = hidden + attn_out
    h_norm2 = rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
    mlp_out = mlp(lp, h_norm2, chunk=cfg.mlp_chunk)
    if axis_name is not None:
        mlp_out = jax.lax.psum(mlp_out, axis_name)
    return hidden + mlp_out


def _layer_fwd(cfg: ModelConfig, lp: dict, hidden, attn_fn, cos, sin,
               axis_name=None):
    """One decoder layer; attn_fn(q, k, v) -> (attn_out, layer_state_out)."""
    T = hidden.shape[0]
    h_norm = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
    q, k, v = _qkv(cfg, lp, h_norm, cos, sin)
    attn, ls_out = attn_fn(q, k, v)
    hidden = _finish_layer(cfg, lp, hidden,
                           attn.transpose(1, 0, 2).reshape(T, -1), axis_name)
    return hidden, ls_out


def prefill(cfg: ModelConfig, params: dict, policy, state: Any,
            tokens: jax.Array, pad_len: jax.Array, true_len: jax.Array,
            axis_name=None) -> Tuple[jax.Array, Any]:
    """Process a LEFT-padded prompt. tokens [P] i32; positions [0, pad_len)
    are padding. Returns (last-token logits [V], updated state)."""
    P = tokens.shape[0]
    L = cfg.num_layers
    pad_len = jnp.asarray(pad_len, jnp.int32)
    true_len = jnp.asarray(true_len, jnp.int32)

    hidden = embed_lookup(params, tokens)
    positions = jnp.maximum(jnp.arange(P, dtype=jnp.int32) - pad_len, 0)
    cos, sin = rope_cos_sin(cfg, positions)

    def body(carry, xs):
        hidden, state = carry
        lp, idx = xs
        attn_fn = lambda q, k, v: policy.prefill_attn(
            state, idx, q, k, v, pad_len, true_len)
        hidden, state = _layer_fwd(cfg, lp, hidden, attn_fn, cos, sin,
                                   axis_name)
        return (hidden, state), None

    (hidden, new_state), _ = jax.lax.scan(
        body, (hidden, state),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))

    last = rms_norm(hidden[P - 1:P], params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)[0]
    return logits, new_state


def kv_full_chunked(cfg: ModelConfig, lp: dict, hidden: jax.Array,
                    cos: jax.Array, sin: jax.Array, chunk: int):
    """Pass A of chunked prefill: one layer's full-length rope'd K/V,
    computed in `chunk`-row pieces so the h_norm transient stays bounded.
    Shared by prefill_chunked and OffloadEngine._prefill_layer_kv."""
    P, E = hidden.shape
    nc = P // chunk
    H_kv, D = cfg.num_kv_heads, cfg.head_dim

    def kv_chunk(args):
        h_c, cos_c, sin_c = args
        h_norm = rms_norm(h_c, lp["ln1"], cfg.rms_norm_eps)
        return _kv_proj(cfg, lp, h_norm, cos_c, sin_c)

    ks, vs = jax.lax.map(kv_chunk, (
        hidden.reshape(nc, chunk, E),
        cos.reshape(nc, chunk, -1), sin.reshape(nc, chunk, -1)))
    return (ks.transpose(1, 0, 2, 3).reshape(H_kv, P, D),
            vs.transpose(1, 0, 2, 3).reshape(H_kv, P, D))


def attn_mlp_chunk(cfg: ModelConfig, lp: dict, h_c: jax.Array,
                   cos_c: jax.Array, sin_c: jax.Array, k_pref: jax.Array,
                   v_pref: jax.Array, pad_len, c0: int, *,
                   use_pallas=None, interpret: bool = False,
                   axis_name=None) -> jax.Array:
    """Pass B body of chunked prefill: attention of the chunk's rows
    (absolute offset c0, STATIC — the packed flash grid covers exactly the
    chunk's reachable blocks) against the causal K prefix, then the MLP.
    Returns the chunk's updated hidden rows. Shared by prefill_chunked and
    OffloadEngine._prefill_attn_chunk."""
    from pqcache_tpu.ops.dispatch import prefill_chunk_attention
    ch = h_c.shape[0]
    h_norm = rms_norm(h_c, lp["ln1"], cfg.rms_norm_eps)
    q = _q_proj(cfg, lp, h_norm, cos_c, sin_c)
    att = prefill_chunk_attention(q, k_pref, v_pref, pad_len, q_offset=c0,
                                  use_pallas=use_pallas,
                                  interpret=interpret)
    return _finish_layer(cfg, lp, h_c,
                         att.transpose(1, 0, 2).reshape(ch, -1), axis_name)


def prefill_chunked(cfg: ModelConfig, params: dict, policy, state: Any,
                    tokens: jax.Array, pad_len: jax.Array,
                    true_len: jax.Array, *, chunk: int,
                    axis_name=None) -> Tuple[jax.Array, Any]:
    """Activation-bounded prefill: identical math to `prefill`, transients
    bounded at `chunk` rows. Full-length q/h_norm/attention chains (~2 GB
    each at 192k llama31-width) are what OOM single-chip prefill before the
    KV does; per layer this runs (A) full-length K/V assembled from row
    chunks (K/V are H_kv/H the size of the q chain and are needed whole for
    attention + codebook training), (B) per-chunk q → flash attention
    against the causal K prefix (ops/flash_attention q_offset packed grid —
    each chunk costs exactly its triangle-slab FLOPs) → MLP, (C) the
    policy's prefill_tail (codebooks + state writes) once on the full K/V.
    The reference's single-GPU answer is a 32k-token chunked LN/MLP
    (mistral_patch.py:246-279) that still materializes full-length
    attention inputs. Requires P % chunk == 0 and policy.prefill_tail."""
    P = tokens.shape[0]
    L = cfg.num_layers
    E = cfg.hidden_size
    H, H_kv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if P % chunk:
        raise ValueError(f"prefill length {P} not a multiple of "
                         f"chunk {chunk}")
    nc = P // chunk
    pad_len = jnp.asarray(pad_len, jnp.int32)
    true_len = jnp.asarray(true_len, jnp.int32)
    use_pallas = getattr(policy, "use_pallas", None)
    interpret = getattr(policy, "interpret", False)

    hidden = embed_lookup(params, tokens)
    positions = jnp.maximum(jnp.arange(P, dtype=jnp.int32) - pad_len, 0)
    cos, sin = rope_cos_sin(cfg, positions)

    def body(carry, xs):
        hidden, state = carry
        lp, idx = xs

        # pass A: this layer's full-length rope'd K/V in row chunks
        k, v = kv_full_chunked(cfg, lp, hidden, cos, sin, chunk)

        # pass B: per-chunk attention + MLP (static chunk offsets — the
        # packed flash grid covers exactly each chunk's reachable blocks).
        # Each chunk's output overwrites ITS OWN rows in place
        # (dynamic_update_slice chain XLA can alias): chunk c+1 reads only
        # rows [c0+chunk, ...) which no earlier update touched, and pass A
        # already materialized k/v, so the original hidden rows are dead
        # once their chunk is computed. The previous outs-list +
        # concatenate held input hidden, nc chunk outputs, AND the concat
        # result live at once — 3×[P, E] ≈ 3.2 GB of transient at 128k,
        # the measured RESOURCE_EXHAUSTED in the 128k bench arm.
        for c in range(nc):
            c0 = c * chunk
            h_c = jax.lax.slice(hidden, (c0, 0), (c0 + chunk, E))
            cos_c = jax.lax.slice(cos, (c0, 0), (c0 + chunk, cos.shape[1]))
            sin_c = jax.lax.slice(sin, (c0, 0), (c0 + chunk, sin.shape[1]))
            k_pref = jax.lax.slice(k, (0, 0, 0), (H_kv, c0 + chunk, D))
            v_pref = jax.lax.slice(v, (0, 0, 0), (H_kv, c0 + chunk, D))
            out_c = attn_mlp_chunk(
                cfg, lp, h_c, cos_c, sin_c, k_pref, v_pref, pad_len, c0,
                use_pallas=use_pallas, interpret=interpret,
                axis_name=axis_name)
            hidden = jax.lax.dynamic_update_slice(hidden, out_c, (c0, 0))

        # pass C: the policy's codebook/state tail on the full K/V
        state = policy.prefill_tail(state, idx, k, v, pad_len, true_len)
        return (hidden, state), None

    (hidden, new_state), _ = jax.lax.scan(
        body, (hidden, state),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))

    last = rms_norm(hidden[P - 1:P], params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)[0]
    return logits, new_state


def prefill_chunk_step(cfg: ModelConfig, params: dict, kbuf: jax.Array,
                       vbuf: jax.Array, hidden_c: jax.Array,
                       pad_len: jax.Array, c0: int, *,
                       use_pallas=None, interpret: bool = False,
                       axis_name=None
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """CHUNK-MAJOR prefill slab: process prompt rows [c0, c0+ch) through
    ALL layers, appending each layer's rope'd K/V into the admission
    buffers. The cross-slab dependency is only the per-layer K prefix, so
    a serving engine can run decode chunks BETWEEN slabs — admission never
    stalls running streams for more than one slab (the monolithic
    admission prefill was the measured tbt_p95 = 16× p50 tail,
    harness/serving.py). Same math as prefill_chunked's pass A+B: each
    slab costs exactly its causal triangle slab.

    kbuf/vbuf [L, H_kv, P, D] (donate); hidden_c [ch, E] = the slab's
    embedded tokens; c0 STATIC (the packed flash grid covers exactly the
    reachable blocks; one compiled program per slab index). Returns
    (kbuf, vbuf, h_out [ch, E])."""
    ch, E = hidden_c.shape
    L = cfg.num_layers
    H_kv, D = cfg.num_kv_heads, cfg.head_dim
    positions = jnp.maximum(
        c0 + jnp.arange(ch, dtype=jnp.int32) - pad_len, 0)
    cos, sin = rope_cos_sin(cfg, positions)

    def body(carry, xs):
        hidden, kbuf, vbuf = carry
        lp, idx = xs
        h_norm = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q, k_c, v_c = _qkv(cfg, lp, h_norm, cos, sin)
        kbuf = jax.lax.dynamic_update_slice(kbuf, k_c[None],
                                            (idx, 0, c0, 0))
        vbuf = jax.lax.dynamic_update_slice(vbuf, v_c[None],
                                            (idx, 0, c0, 0))
        k_pref = jax.lax.dynamic_slice(
            kbuf, (idx, 0, 0, 0), (1, H_kv, c0 + ch, D))[0]
        v_pref = jax.lax.dynamic_slice(
            vbuf, (idx, 0, 0, 0), (1, H_kv, c0 + ch, D))[0]
        from pqcache_tpu.ops.dispatch import prefill_chunk_attention
        att = prefill_chunk_attention(q, k_pref, v_pref, pad_len,
                                      q_offset=c0, use_pallas=use_pallas,
                                      interpret=interpret)
        hidden = _finish_layer(cfg, lp, hidden,
                               att.transpose(1, 0, 2).reshape(ch, -1),
                               axis_name)
        return (hidden, kbuf, vbuf), None

    (hidden, kbuf, vbuf), _ = jax.lax.scan(
        body, (hidden_c, kbuf, vbuf),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))
    return kbuf, vbuf, hidden


def prefill_finish_tail(cfg: ModelConfig, params: dict, policy, state: Any,
                        kbuf: jax.Array, vbuf: jax.Array,
                        h_last: jax.Array, pad_len: jax.Array,
                        true_len: jax.Array) -> Tuple[jax.Array, Any]:
    """Finish a chunk-major prefill: the policy tail (codebooks + state
    writes) over the assembled per-layer K/V, plus the last-token logits
    from the final slab's hidden rows (left-padded prompts end at the
    last row). Together with prefill_chunk_step this computes exactly
    what prefill_chunked computes, sliced so a scheduler can interleave."""
    L = cfg.num_layers

    def body(st, xs):
        k, v, idx = xs
        return policy.prefill_tail(st, idx, k, v, pad_len, true_len), None

    state, _ = jax.lax.scan(
        body, state, (kbuf, vbuf, jnp.arange(L, dtype=jnp.int32)))
    last = rms_norm(h_last[-1:], params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)[0]
    return logits, state


def prefill_capture_kv(cfg: ModelConfig, params: dict, tokens: jax.Array,
                       *, use_pallas=None, interpret: bool = False,
                       axis_name=None) -> Tuple[jax.Array, jax.Array]:
    """Prefix-cache snapshot: per-layer rope'd K/V of an UNPADDED prefix
    prompt. tokens [T_pre] i32 → (k, v) [L, H_kv, T_pre, D].

    Policy-independent (the snapshot is raw KV; the retrieval policy's
    codebooks/state are trained later over [prefix | suffix] in
    prefill_with_prefix) — one snapshot serves every policy and every
    suffix. The serving win: a shared system prompt's prefill runs once
    (at 32k that is the ~1.4 s TTFT term) and each request pays only its
    suffix's triangle slab."""
    from pqcache_tpu.ops.dispatch import dense_prefill_attention

    P = tokens.shape[0]
    L = cfg.num_layers
    hidden = embed_lookup(params, tokens)
    cos, sin = rope_cos_sin(cfg, jnp.arange(P, dtype=jnp.int32))

    def body(hidden, lp):
        h_norm = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, h_norm, cos, sin)
        att, _ = dense_prefill_attention(q, k, v, 0, use_pallas=use_pallas,
                                         interpret=interpret)
        hidden = _finish_layer(cfg, lp, hidden,
                               att.transpose(1, 0, 2).reshape(P, -1),
                               axis_name)
        return hidden, (k, v)

    _, (ks, vs) = jax.lax.scan(body, hidden, params["layers"])
    return ks, vs


def prefill_with_prefix(cfg: ModelConfig, params: dict, policy, state: Any,
                        pre_k: jax.Array, pre_v: jax.Array,
                        tokens: jax.Array, true_suf: jax.Array,
                        axis_name=None) -> Tuple[jax.Array, Any]:
    """Prefill continuing from a cached prefix snapshot (prefill_capture_kv).

    pre_k/pre_v [L, H_kv, T_pre, D]; tokens [P_suf] i32 is the suffix,
    RIGHT-padded to its bucket (rows ≥ true_suf are padding — masked by
    valid_len everywhere, and the returned logits come from the last REAL
    row). The suffix is attention-wise one chunk at q_offset = T_pre, so
    this reuses the chunked-prefill pass-B body; the policy tail then
    trains codebooks/state over the COMBINED [prefix | suffix] K/V with
    pad_len=0, true_len=T_pre+true_suf — bit-identical inputs to a
    one-shot prefill of the concatenated prompt."""
    P_suf = tokens.shape[0]
    T_pre = pre_k.shape[2]
    L = cfg.num_layers
    H_kv, D = cfg.num_kv_heads, cfg.head_dim
    true_suf = jnp.asarray(true_suf, jnp.int32)
    true_total = T_pre + true_suf
    use_pallas = getattr(policy, "use_pallas", None)
    interpret = getattr(policy, "interpret", False)

    hidden = embed_lookup(params, tokens)
    positions = T_pre + jnp.arange(P_suf, dtype=jnp.int32)
    cos, sin = rope_cos_sin(cfg, positions)

    def body(carry, xs):
        hidden, state = carry
        lp, idx, pk, pv = xs
        h_norm = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        k_suf, v_suf = _kv_proj(cfg, lp, h_norm, cos, sin)
        k_full = jnp.concatenate([pk, k_suf], axis=1)
        v_full = jnp.concatenate([pv, v_suf], axis=1)
        hidden = attn_mlp_chunk(
            cfg, lp, hidden, cos, sin, k_full, v_full,
            jnp.asarray(0, jnp.int32), T_pre, use_pallas=use_pallas,
            interpret=interpret, axis_name=axis_name)
        state = policy.prefill_tail(state, idx, k_full, v_full,
                                    jnp.asarray(0, jnp.int32), true_total)
        return (hidden, state), None

    (hidden, new_state), _ = jax.lax.scan(
        body, (hidden, state),
        (params["layers"], jnp.arange(L, dtype=jnp.int32), pre_k, pre_v))

    last_row = jax.lax.dynamic_slice(
        hidden, (true_suf - 1, jnp.asarray(0, jnp.int32)),
        (1, cfg.hidden_size))
    last = rms_norm(last_row, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)[0]
    return logits, new_state


def decode_step(cfg: ModelConfig, params: dict, policy, state: Any,
                token: jax.Array, pos: jax.Array,
                axis_name=None) -> Tuple[jax.Array, Any]:
    """One greedy-decode step. token i32 scalar; pos = absolute position.
    Returns (logits [V], updated state)."""
    L = cfg.num_layers
    hidden = embed_lookup(params, token[None])  # [1, E]
    cos, sin = rope_cos_sin(cfg, pos[None].astype(jnp.int32))

    shared = policy.shared_pre(state)
    # deferred-append contract: decode_attn returns (out, payload) and the
    # state stays read-only through the layer scan; all layers' appends
    # commit in ONE stacked update after the scan (policies/pq_search.py
    # commit_appends) — L× fewer tiny scatter/encode ops per step.
    deferred = getattr(policy, "deferred_appends", False)

    def body(carry, xs):
        hidden, state = carry
        lp, idx = xs
        attn_fn = lambda q, k, v: policy.decode_attn(
            state, idx, q, k, v, shared)
        hidden, ls_out = _layer_fwd(cfg, lp, hidden, attn_fn, cos, sin,
                                    axis_name)
        if deferred:
            return (hidden, state), ls_out
        return (hidden, ls_out), None

    (hidden, new_state), payloads = jax.lax.scan(
        body, (hidden, state),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))
    if deferred:
        new_state = policy.commit_appends(new_state, payloads, shared)
    new_state = policy.shared_post(new_state, shared)

    last = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)[0]
    return logits, new_state


# ---------------------------------------------------------------------------
# Batch-as-heads decode: B sequence slots folded into the head axis.
#
# vmapping the single-sequence decode loop over slots scales pathologically
# (B=2 ≈ 2.4× B=1 — the vmapped scan/carry composition serializes); instead
# the batch is folded into the KV-HEAD axis, where everything retrieval-side
# is already parallel: state arrays [L, H_kv, ...] become [L, B·H_kv, ...],
# per-slot scalars become [B], and the ADC/top-k/gather/attention machinery
# runs unchanged on the folded arrays (slot-major fold keeps the GQA
# "kv head = q head // group" mapping intact: (b·H + h)//group =
# b·H_kv + h//group). The MLP/embedding/LM-head side is ordinary [B, E]
# batched matmuls — exactly what the MXU wants.

def _apply_rope_batched(x: jax.Array, cos: jax.Array, sin: jax.Array):
    """x [B, Hx, D]; cos/sin [B, D/2] (per-slot positions)."""
    D = x.shape[-1]
    x1, x2 = x[..., : D // 2], x[..., D // 2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    c, s = cos[:, None, :], sin[:, None, :]
    return jnp.concatenate(
        [xf1 * c - xf2 * s, xf2 * c + xf1 * s], axis=-1).astype(x.dtype)


def decode_step_batched(cfg: ModelConfig, params: dict, policy, state: Any,
                        tokens: jax.Array, pos: jax.Array,
                        axis_name=None) -> Tuple[jax.Array, Any]:
    """One greedy-decode step for B slots. tokens/pos [B] i32.
    Returns (logits [B, V], updated state)."""
    L = cfg.num_layers
    B = tokens.shape[0]
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hidden = embed_lookup(params, tokens)        # [B, E]
    cos, sin = rope_cos_sin(cfg, pos.astype(jnp.int32))       # [B, D/2]

    shared = policy.shared_pre_batched(state)
    deferred = getattr(policy, "deferred_appends", False)

    def body(carry, xs):
        hidden, state = carry
        lp, idx = xs
        h_norm = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q = _apply_rope_batched(
            _mm(h_norm, lp, "wq").reshape(B, H, D), cos, sin)
        k = _apply_rope_batched(
            _mm(h_norm, lp, "wk").reshape(B, Hkv, D), cos, sin)
        v = _mm(h_norm, lp, "wv").reshape(B, Hkv, D)
        attn, ls_out = policy.decode_attn_batched(state, idx, q, k, v,
                                                  shared)
        hidden = _finish_layer(cfg, lp, hidden, attn.reshape(B, H * D),
                               axis_name)
        if deferred:
            return (hidden, state), ls_out
        return (hidden, ls_out), None

    (hidden, new_state), payloads = jax.lax.scan(
        body, (hidden, state),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)))
    if deferred:
        new_state = policy.commit_appends_batched(new_state, payloads,
                                                  shared)
    new_state = policy.shared_post_batched(new_state, shared)

    last = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head_logits(params, last)
    return logits, new_state


def decode_loop_batched(cfg: ModelConfig, params: dict, policy, state: Any,
                        tokens: jax.Array, pos: jax.Array, n_steps: int,
                        axis_name=None, sample=None,
                        rng: jax.Array | None = None) -> Tuple[jax.Array, Any]:
    """Decode n_steps tokens for B slots in ONE device program.
    tokens/pos [B]. Returns (tokens [n_steps, B] i32, state). Greedy by
    default; `sample` + `rng` as in decode_loop (one key per step draws
    all B slots — categorical vectorizes over the leading batch dim).

    A policy with a write-combining ring (PQState.ring_kv) accumulates
    the chunk's new tokens there and bulk-commits them into the per-slot
    tails ONCE at the end of the program (flush_ring_batched) — the
    decode chunk length is therefore capped at the ring capacity."""
    ring_k = getattr(policy, "ring_k", 0)
    if ring_k and getattr(state, "ring_kv", None) is not None:
        if n_steps > ring_k:
            raise ValueError(
                f"decode chunk {n_steps} exceeds ring capacity {ring_k}")

    def body(carry, _):
        tok, p, key, st = carry
        logits, st = decode_step_batched(cfg, params, policy, st, tok, p,
                                         axis_name)
        if sample is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            nxt = sample(sub, logits)
        return (nxt, p + 1, key, st), nxt

    key0 = rng if rng is not None else jax.random.PRNGKey(0)
    (_, _, _, state), toks = jax.lax.scan(
        body, (tokens.astype(jnp.int32), pos.astype(jnp.int32), key0, state),
        None, length=n_steps)
    if ring_k and getattr(state, "ring_kv", None) is not None:
        state = policy.flush_ring_batched(state)
    return toks, state


def decode_loop(cfg: ModelConfig, params: dict, policy, state: Any,
                token: jax.Array, pos: jax.Array, n_steps: int,
                axis_name=None, sample=None,
                rng: jax.Array | None = None) -> Tuple[jax.Array, Any]:
    """Decode n_steps tokens in ONE device program (scan over steps,
    each step scanning over layers). This replaces the reference's
    one-token-per-host-roundtrip HF generate loop — on TPU the whole
    generation runs on-device and only the final token ids come back.

    Greedy by default; pass `sample` (core/sampling.make_sampler) + `rng`
    for stochastic decoding — the key rides the scan carry and is split
    once per step, so the same (rng, state) reproduces the same tokens.

    Returns (tokens [n_steps] i32 — token fed at step 0 is `token`, output
    starts with its successor... precisely: tokens[i] is the model's output
    after consuming the (i-1)-th output, with tokens[-1] unconsumed).
    """
    if sample is None:
        def body(carry, _):
            tok, p, st = carry
            logits, st = decode_step(cfg, params, policy, st, tok, p,
                                     axis_name)
            nxt = jnp.argmax(logits).astype(jnp.int32)
            return (nxt, p + 1, st), nxt

        (_, _, state), toks = jax.lax.scan(
            body, (token.astype(jnp.int32), pos.astype(jnp.int32), state),
            None, length=n_steps)
        return toks, state

    def body(carry, _):
        tok, p, key, st = carry
        logits, st = decode_step(cfg, params, policy, st, tok, p, axis_name)
        key, sub = jax.random.split(key)
        nxt = sample(sub, logits)
        return (nxt, p + 1, key, st), nxt

    (_, _, _, state), toks = jax.lax.scan(
        body, (token.astype(jnp.int32), pos.astype(jnp.int32), rng, state),
        None, length=n_steps)
    return toks, state
