"""Sequence-parallel ring prefill vs single-device prefill (8-dev CPU mesh).

Validates SURVEY §2.4's sequence-parallel target: per-device KV shards,
ring-attention causal prefill, distributed Lloyd codebooks — logits and
PQ codes must match the single-device program.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.parallel.ring_prefill import sp_prefill
from pqcache_tpu.policies.base import get_policy


def _setup(P_len, pad):
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=6,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=8192,
                              kernels="xla"))
    rng = np.random.default_rng(11)
    tokens = np.zeros(P_len, np.int32)
    tokens[pad:] = rng.integers(0, cfg_m.vocab_size, size=P_len - pad)
    return cfg_m, ecfg, params, tokens


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("P_len,pad", [(512, 0), (512, 100)])
def test_ring_prefill_matches_single(P_len, pad):
    sp = 8
    cfg_m, ecfg, params, tokens = _setup(P_len, pad)
    true_len = P_len - pad
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8,), ("sp",))

    ring = jax.jit(shard_map(
        lambda p, t: sp_prefill(ecfg, p, t, jnp.asarray(pad, jnp.int32),
                                jnp.asarray(true_len, jnp.int32), "sp",
                                inner=128),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  P("sp")),
        out_specs=(P(), P(None, None, "sp", None), P(None, None, None, "sp"),
                   P(), P()),
        check_rep=False))
    logits, kv_shards, codes_sh, cents, _phi = ring(params,
                                                    jnp.asarray(tokens))

    # single-device oracle: plain prefill through the pq_search policy
    budget = compute_budget(ecfg.budget, P_len, 8)
    policy = get_policy(ecfg, budget)
    state = policy.init_state(jnp.float32)
    ref_logits, ref_state = jax.jit(
        lambda p, s, t: llama.prefill(cfg_m, p, policy, s, t,
                                      jnp.asarray(pad, jnp.int32),
                                      jnp.asarray(true_len, jnp.int32)))(
        params, state, jnp.asarray(tokens))

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)

    # K rows: ring keeps padded order; single-device state rolls pad away.
    # Compare the real token rows of layer 0.
    k_ring = np.asarray(kv_shards)[0, :, :, :cfg_m.head_dim]  # [H_kv, P, D]
    st = ref_state
    k_tail_ref = np.asarray(st.kv_tail)[0, :, :, :cfg_m.head_dim]
    sink = budget.sink
    # ring rows at global idx pad+sink.. correspond to ref tail rows 0..
    n_tail = true_len - sink
    np.testing.assert_allclose(k_ring[:, pad + sink: pad + sink + n_tail],
                               k_tail_ref[:, :n_tail], rtol=1e-4, atol=1e-5)

    # Distributed Lloyd must cluster as WELL as the single-device build.
    # Code labels aren't comparable across layouts (different init draws →
    # different-but-equivalent clusterings), so compare quantization
    # distortion: mean ||x − centroid[code]||² over the tail keys.
    S = ecfg.pq.n_subvec_per_head
    d_sub = cfg_m.head_dim // S

    def distortion(keys, codes, cents):
        # keys [H_kv, n, D]; codes [H_kv, S, n]; cents [H_kv, S, C, d_sub]
        x = keys.reshape(keys.shape[0], keys.shape[1], S, d_sub)
        rec = np.stack([
            np.stack([cents[h, s, codes[h, s]] for s in range(S)], axis=1)
            for h in range(keys.shape[0])])       # [H_kv, n, S, d_sub]
        return float(((x - rec) ** 2).sum(-1).mean())

    keys_tail = k_tail_ref[:, :n_tail]
    codes_ring = np.asarray(codes_sh)[0][:, :, pad + sink: pad + sink + n_tail]
    codes_ref = np.asarray(st.codes)[0][:, :, :n_tail].astype(np.int64)
    d_ring = distortion(keys_tail, codes_ring.astype(np.int64),
                        np.asarray(cents)[0])
    d_ref = distortion(keys_tail, codes_ref, np.asarray(st.centroids)[0])
    assert d_ring <= 1.25 * d_ref + 1e-6, (d_ring, d_ref)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_ring_prefill_long_context_smoke():
    # beyond-HBM shape check at larger P (each shard holds P/8 tokens)
    P_len = 4096
    cfg_m, ecfg, params, tokens = _setup(P_len, 0)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8,), ("sp",))
    ring = jax.jit(shard_map(
        lambda p, t: sp_prefill(ecfg, p, t, jnp.asarray(0, jnp.int32),
                                jnp.asarray(P_len, jnp.int32), "sp",
                                inner=256),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params),
                  P("sp")),
        out_specs=(P(), P(None, None, "sp", None), P(None, None, None, "sp"),
                   P(), P()),
        check_rep=False))
    logits, kv_shards, codes_sh, cents, _phi = ring(params,
                                                    jnp.asarray(tokens))
    assert np.isfinite(np.asarray(logits)).all()
    assert kv_shards.shape == (2, 2, P_len, 2 * cfg_m.head_dim)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_ring_prefill_ip_phi_matches_single_device():
    """metric='ip': the distributed lift constant phi (one pmax over the
    sequence axis) equals the single-device ip2l2_lift phi exactly."""
    from pqcache_tpu.core import pq as pqm
    P_len, pad = 512, 64
    cfg_m, ecfg, params, tokens = _setup(P_len, pad)
    import dataclasses
    ecfg = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, metric="ip"))
    true_len = P_len - pad
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8,), ("sp",))
    ring = jax.jit(shard_map(
        lambda p, t: sp_prefill(ecfg, p, t, jnp.asarray(pad, jnp.int32),
                                jnp.asarray(true_len, jnp.int32), "sp",
                                inner=128),
        mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), params), P("sp")),
        out_specs=(P(), P(None, None, "sp", None),
                   P(None, None, None, "sp"), P(), P()),
        check_rep=False))
    logits, kv_sh, codes_sh, cents, phi = ring(params, jnp.asarray(tokens))
    # centroids carry the lifted column (d_sub + 1)
    S = ecfg.pq.n_subvec_per_head
    d_sub = cfg_m.head_dim // S
    assert cents.shape[-1] == d_sub + 1

    # single-device phi over the same tail keys
    budget = compute_budget(ecfg.budget, P_len, 8)
    policy = get_policy(ecfg, budget)
    state = policy.init_state(jnp.float32)
    _, ref_state = jax.jit(
        lambda p, s, t: llama.prefill(cfg_m, p, policy, s, t,
                                      jnp.asarray(pad, jnp.int32),
                                      jnp.asarray(true_len, jnp.int32)))(
        params, state, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(phi[0]),
                               np.asarray(ref_state.phi[0]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_ring_handoff_decode_matches_chunked_prefill_engine(kv_dtype):
    """THE handoff gate (VERDICT r3 item 3): ring-prefill a prompt across 8
    sequence shards (each holds P/8 tokens — more than a 'single shard
    capacity' of P/8), reshard head-major via gather_state_tp, decode 16
    tokens with the TP engine — tokens must match the single-device
    CHUNKED-PREFILL engine exactly."""
    import dataclasses
    from jax.sharding import Mesh
    from pqcache_tpu.parallel.tp_decode import TPEngine
    from pqcache_tpu.runtime.generate import Engine
    from pqcache_tpu.config import CacheConfig

    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=8,
                              max_position_embeddings=4096)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(3),
                               dtype=jnp.float32)
    P_len, gen = 512, 16
    rng = np.random.default_rng(17)
    ids = rng.integers(0, cfg_m.vocab_size, size=P_len).astype(np.int32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=6,
                    approx_topk=False, select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        cache=CacheConfig(block_size=16, kv_dtype=kv_dtype),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=P_len,
                              max_new_tokens=gen + 2, max_seq_len=2048,
                              kernels="xla", prefill_chunk=128))

    # single-device oracle: CHUNKED prefill (P=512 > chunk=128) + decode
    eng = Engine(ecfg, params, dtype=jnp.float32)
    ref = eng.generate(ids, max_new_tokens=gen).tokens

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8,), ("tp",))
    tpe = TPEngine(ecfg, params, mesh, prefill_len=P_len,
                   max_new_tokens=gen + 2, dtype=jnp.float32)
    got = tpe.generate_ring(ids, max_new_tokens=gen)
    assert got == ref, (got, ref)

    # and a left-padded (short) prompt through the same programs
    ids_short = ids[: P_len - 100]
    ref2 = eng.generate(ids_short, max_new_tokens=gen).tokens
    got2 = tpe.generate_ring(ids_short, max_new_tokens=gen)
    assert got2 == ref2, (got2, ref2)
