"""Sequence-parallel (ring) prefill: prompts beyond one chip's HBM.

The reference scales long-context prefill on a single device only — 32k-
token chunked layernorm/MLP and CPU offload (mistral_patch.py:246-279;
SURVEY §5 long-context row). On TPU the idiomatic mechanism is SEQUENCE
sharding over the ICI mesh: each device holds a contiguous P/sp-token slice
of the prompt (activations, KV, and PQ codes all ∝ P/sp per device), and
causal attention runs as RING ATTENTION — K/V slices rotate around the
mesh axis via ppermute while every device accumulates online-softmax
attention of its Q slice against each visiting K/V slice, tiled internally
to bound VMEM. Layernorm/MLP are elementwise over tokens and need no
communication.

Codebook training runs DISTRIBUTED Lloyd (core/pq.py kmeans
axis_name=...): per-iteration cluster sums/counts psum over the sequence
axis, so every shard holds identical replicated centroids while PQ codes
stay sequence-sharded next to their KV rows.

After a ring prefill the serving handoff is ONE all-to-all that reshards
the KV slices from sequence-major to head-major (`gather_state_tp`): each
device sends its token slice of kv-head block j to device j and receives
the full sequence for its own head block. The decode-side PQ state is then
built per shard by the standard `prefill_tail` (policies/pq_search.py) —
the same code path the TP engines prefill through, so decode tokens after
a ring prefill match the chunked-prefill engine EXACTLY (kmeans re-runs
head-locally at <1% of prefill FLOPs; the distributed-Lloyd codes remain
the output for standalone sp_prefill consumers, where no shard ever holds
a full tail). TPEngine.generate_ring drives the whole pipeline. This
retires the reference's single-device long-prompt workaround
(mistral_patch.py:246-279) end to end: prefill beyond one chip's HBM, then
decode from the resharded state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig, ModelConfig
from pqcache_tpu.core import pq
from pqcache_tpu.models import llama

NEG_INF = -1e30


def _block_attn_accum(q, k, v, qpos, kpos, kvalid, m, l, acc, *,
                      inner: int = 512):
    """Accumulate online-softmax attention of q against one K/V block.

    q [H, Cq, D]; k/v [H_kv, Ck, D]; qpos [Cq], kpos [Ck] global positions;
    kvalid [Ck] bool. Carries m/l [H_kv, g, Cq], acc [H_kv, g, Cq, D].
    The block is tiled over `inner`-sized key chunks to bound the
    materialized [g, Cq, inner] logits.
    """
    H, Cq, D = q.shape
    H_kv, Ck, _ = k.shape
    group = H // H_kv
    scale = 1.0 / (D ** 0.5)
    qg = q.reshape(H_kv, group, Cq, D).astype(jnp.float32) * scale

    inner = min(inner, Ck)
    pad = (-Ck) % inner
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        kpos = jnp.pad(kpos, (0, pad))
        kvalid = jnp.pad(kvalid, (0, pad))
    nc = (Ck + pad) // inner
    kc = k.reshape(H_kv, nc, inner, D).transpose(1, 0, 2, 3).astype(jnp.float32)
    vc = v.reshape(H_kv, nc, inner, D).transpose(1, 0, 2, 3).astype(jnp.float32)
    kpc = kpos.reshape(nc, inner)
    kvc = kvalid.reshape(nc, inner)

    def step(carry, inp):
        m, l, acc = carry
        k_i, v_i, kp_i, kv_i = inp
        lg = jnp.einsum("hgqd,hkd->hgqk", qg, k_i,
                        preferred_element_type=jnp.float32)
        mask = kv_i[None, :] & (kp_i[None, :] <= qpos[:, None])
        lg = jnp.where(mask[None, None], lg, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(lg, axis=-1))
        p = jnp.exp(lg - m_new[..., None])
        p = jnp.where(mask[None, None], p, 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "hgqk,hkd->hgqd", p, v_i, preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    (m, l, acc), _ = jax.lax.scan(step, (m, l, acc), (kc, vc, kpc, kvc))
    return m, l, acc


def ring_attention(q, k, v, qpos, kpos, kvalid, axis_name: str, *,
                   inner: int = 512):
    """Causal ring attention over a sequence-sharded prompt.

    Every shard holds q/k/v for its token slice; K/V (+ positions/validity)
    rotate `sp` times around `axis_name` via ppermute, with the
    online-softmax carry staying local. Returns out [H, Cq, D] (q.dtype).
    """
    H, Cq, D = q.shape
    H_kv = k.shape[0]
    group = H // H_kv
    sp = jax.lax.psum(1, axis_name)
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    m0 = jnp.full((H_kv, group, Cq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H_kv, group, Cq), jnp.float32)
    a0 = jnp.zeros((H_kv, group, Cq, D), jnp.float32)

    def step(carry, _):
        (m, l, acc), (kc, vc, kp, kv_ok) = carry
        m, l, acc = _block_attn_accum(q, kc, vc, qpos, kp, kv_ok, m, l, acc,
                                      inner=inner)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        kp = jax.lax.ppermute(kp, axis_name, perm)
        kv_ok = jax.lax.ppermute(kv_ok, axis_name, perm)
        return ((m, l, acc), (kc, vc, kp, kv_ok)), None

    ((m, l, acc), _), _ = jax.lax.scan(
        step, ((m0, l0, a0), (k, v, kpos, kvalid)), None, length=sp)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(H, Cq, D).astype(q.dtype)


def ring_forward(model_cfg, params: dict, tokens_local: jax.Array,
                 pad_len: jax.Array, true_len: jax.Array, axis_name: str,
                 *, inner: int = 512) -> Tuple[jax.Array, jax.Array]:
    """Sequence-sharded full-decoder forward (ring attention per layer).

    tokens_local [C]: this shard's contiguous slice of the LEFT-padded
    P-token prompt (global slice [r·C, (r+1)·C)). Returns
      logits   [V]              — last real token's logits, replicated;
      kv_local [L, H_kv, C, 2D] — this shard's K‖V rows (sequence shard).

    Weights are REPLICATED across the axis (context-parallel standard:
    every shard computes all heads for its token slice)."""
    m = model_cfg
    L = m.num_layers
    C = tokens_local.shape[0]
    r = jax.lax.axis_index(axis_name)
    g0 = r * C  # global index of this shard's first token

    hidden = llama.embed_lookup(params, tokens_local)
    gpos = g0 + jnp.arange(C, dtype=jnp.int32)
    rpos = jnp.maximum(gpos - pad_len, 0)     # rope positions
    cos, sin = llama.rope_cos_sin(m, rpos)
    valid = (gpos >= pad_len) & (gpos < pad_len + true_len)

    def body(carry, lp):
        hidden = carry
        h_norm = llama.rms_norm(hidden, lp["ln1"], m.rms_norm_eps)
        q, k, v = llama._qkv(m, lp, h_norm, cos, sin)
        out = ring_attention(q, k, v, gpos, gpos, valid, axis_name,
                             inner=inner)
        attn = out.transpose(1, 0, 2).reshape(C, -1)
        hidden = hidden + llama._mm(attn, lp, "wo")
        h2 = llama.rms_norm(hidden, lp["ln2"], m.rms_norm_eps)
        hidden = hidden + llama.mlp(lp, h2)
        kv = jnp.concatenate([k, v], axis=-1)  # [H_kv, C, 2D]
        return hidden, kv

    hidden, kv_layers = jax.lax.scan(body, hidden, params["layers"])

    # last real token lives at global index pad_len + true_len - 1; the
    # owning shard contributes its logits, psum replicates them
    last_g = pad_len + true_len - 1
    local_ix = jnp.clip(last_g - g0, 0, C - 1)
    own = (last_g >= g0) & (last_g < g0 + C)
    h_last = jax.lax.dynamic_slice(hidden, (local_ix, 0),
                                   (1, hidden.shape[1]))
    h_last = jnp.where(own, h_last, 0.0)
    h_last = jax.lax.psum(h_last, axis_name)
    last = llama.rms_norm(h_last, params["final_norm"], m.rms_norm_eps)
    logits = llama.lm_head_logits(params, last)[0]
    return logits, kv_layers


def sp_prefill(cfg: EngineConfig, params: dict, tokens_local: jax.Array,
               pad_len: jax.Array, true_len: jax.Array, axis_name: str,
               *, inner: int = 512
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array,
                          jax.Array]:
    """Sequence-sharded full-decoder prefill + distributed PQ build.

    Returns (logits [V] replicated, kv_local [L, H_kv, C, 2D],
    codes_local [L, H_kv, S, C] — codes for sink/pad rows are garbage,
    mask by position —, centroids [L, H_kv, S, C_cent, d_lift] replicated,
    phi [L, H_kv·S, 1, 1] replicated — the ip2l2 lift constant, zeros for
    metric "euc"). The ip metric's phi is the GLOBAL per-group max ‖x‖²,
    one pmax over the sequence axis."""
    m = cfg.model
    S = cfg.pq.n_subvec_per_head
    C_cent = 2 ** cfg.pq.n_subbits
    d_sub = m.head_dim // S
    sink = cfg.budget.sink_size
    C = tokens_local.shape[0]
    r = jax.lax.axis_index(axis_name)
    g0 = r * C

    logits, kv_layers = ring_forward(m, params, tokens_local, pad_len,
                                     true_len, axis_name, inner=inner)

    gpos = g0 + jnp.arange(C, dtype=jnp.int32)
    valid = (gpos >= pad_len) & (gpos < pad_len + true_len)
    # retrieval candidates: real tokens after the sink
    is_tail = valid & (gpos >= pad_len + sink)

    # distributed codebook training per layer over this shard's tail keys
    def train(kv):
        k = kv[..., :m.head_dim]
        xb = (k.reshape(m.num_kv_heads, C, S, d_sub)
              .transpose(0, 2, 1, 3)
              .reshape(m.num_kv_heads * S, C, d_sub))
        G = m.num_kv_heads * S
        if cfg.pq.metric == "ip":
            # ip2l2 lift with the GLOBAL phi: per-group max ‖x‖² over all
            # shards' tail rows (pmax), then the local lift columns
            norms = jnp.sum(xb.astype(jnp.float32) ** 2, axis=-1,
                            keepdims=True)                    # [G, C, 1]
            phi_loc = jnp.max(
                jnp.where(is_tail[None, :, None], norms, 0.0),
                axis=-2, keepdims=True)                       # [G, 1, 1]
            phi = jax.lax.pmax(phi_loc, axis_name)
            xb = jnp.concatenate(
                [xb.astype(jnp.float32),
                 jnp.sqrt(jnp.maximum(phi - norms, 0.0))], axis=-1)
        else:
            phi = jnp.zeros((G, 1, 1), jnp.float32)
        res = pq.kmeans(xb, C_cent, iters=cfg.pq.kmeans_iters,
                        seed=cfg.pq.kmeans_seed, axis_name=axis_name,
                        valid_mask=is_tail[None, :])
        cents = res.centroids.reshape(m.num_kv_heads, S, C_cent,
                                      xb.shape[-1])
        codes = res.codes.reshape(m.num_kv_heads, S, C).astype(jnp.uint8)
        return cents, codes, phi

    centroids, codes, phi = jax.lax.map(train, kv_layers)
    return logits, kv_layers, codes, centroids, phi


def gather_state_tp(policy, kv_layers: jax.Array, pad_len: jax.Array,
                    true_len: jax.Array, axis_name: str,
                    dtype=jnp.bfloat16):
    """Ring-prefill → decode handoff: reshard sequence-major KV slices to
    head-major and build the decode engines' PQState.

    kv_layers [L, H_kv, C, 2D] — this shard's token slice, ALL kv heads
    (ring_forward's output). One all_to_all sends token-slice j of head
    block i to shard i (requires H_kv % sp == 0 — true for the flagship
    models on an 8-device axis: H_kv = 8), yielding [L, H_kv/sp, P, 2D]:
    the full sequence for this shard's heads. The PQ state (sink split,
    tail layout, codebooks, codes, jhist, int8 scales) is then built by
    the policy's standard `prefill_tail` — the exact code path the TP
    engines prefill through (policy must carry shard_axis so k-means
    seeds with GLOBAL group ids), so decode from a ring prefill matches
    the chunked-prefill engine token for token. Re-running k-means
    head-locally costs <1% of the ring attention FLOPs; the distributed
    Lloyd output (sp_prefill) is for consumers that never materialize a
    full tail on any shard.

    `policy` is the LOCAL policy (head counts divided by the shard count).
    Returns the local PQState shard (pq_state_specs layout)."""
    D = policy.D
    L = kv_layers.shape[0]
    # seq-major [L, H_kv, C, 2D] → head-major [L, H_kv/sp, sp·C, 2D];
    # tiled concat along the token axis is in rank order = global order
    kv_h = jax.lax.all_to_all(kv_layers, axis_name, split_axis=1,
                              concat_axis=2, tiled=True)
    state = policy.init_state(dtype)

    def body(carry, xs):
        st = carry
        kv, idx = xs
        st = policy.prefill_tail(st, idx, kv[..., :D], kv[..., D:],
                                 pad_len, true_len)
        return st, None

    state, _ = jax.lax.scan(
        body, state, (kv_h, jnp.arange(L, dtype=jnp.int32)))
    return state
