"""Batched write-combining ring (PQState.ring_kv): commit/flush roundtrip
and attention equivalence against a tail-resident state."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.policies.base import get_policy


def _policy():
    cfg_m = tiny_model_config(num_layers=2)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=4,
                    approx_topk=False, select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=512),
    )
    budget = compute_budget(ecfg.budget, 256, 16)
    return get_policy(ecfg, budget), budget, cfg_m


def test_ring_commit_flush_roundtrip():
    policy, budget, m = _policy()
    assert policy.ring_k > 0
    B, Hk, D = 2, m.num_kv_heads, m.head_dim
    L = m.num_layers
    rng = np.random.default_rng(0)
    st = policy.init_batched_state(B, jnp.float32)
    # give the two slots DIFFERENT candidate counts and seed centroids so
    # encode is well-defined
    n0 = np.array([40, 37], np.int32)
    st = st.replace(
        n_cand=jnp.asarray(n0),
        centroids=jnp.asarray(rng.normal(size=st.centroids.shape),
                              jnp.float32))
    payloads = []
    n_cand = n0.copy()
    for i in range(5):
        k_new = jnp.asarray(
            rng.normal(size=(L, B * Hk, D)), jnp.float32)
        v_new = k_new * 2.0 + 1.0
        payloads.append((np.asarray(k_new), np.asarray(v_new)))
        st = policy.commit_appends_batched(
            st, (k_new, v_new), {"n_cand": jnp.asarray(n_cand)})
        st = policy.shared_post_batched(st, None)
        n_cand += 1
    assert int(st.ring_r) == 5
    st = policy.flush_ring_batched(st)
    assert int(st.ring_r) == 0
    tail = np.asarray(st.kv_tail)
    for b_i in range(B):
        for i, (k_new, v_new) in enumerate(payloads):
            pos = n0[b_i] + budget.local + i
            got = tail[:, b_i * Hk:(b_i + 1) * Hk, pos]
            np.testing.assert_allclose(
                got[..., :D], k_new[:, b_i * Hk:(b_i + 1) * Hk],
                rtol=1e-6, err_msg=f"slot {b_i} token {i} K")
            np.testing.assert_allclose(
                got[..., D:], v_new[:, b_i * Hk:(b_i + 1) * Hk],
                rtol=1e-6, err_msg=f"slot {b_i} token {i} V")
    # flushed codes must equal direct encodes of the flushed keys
    from pqcache_tpu.core import pq
    codes = np.asarray(st.codes)
    for b_i in range(B):
        k0 = payloads[0][0][:, b_i * Hk:(b_i + 1) * Hk]      # [L, Hk, D]
        pos = n0[b_i] + budget.local
        S = policy.S
        for l in range(L):
            xg = policy._to_groups(k0[l][:, None, :].reshape(Hk, 1, D))
            cent = np.asarray(st.centroids)[l, b_i * Hk:(b_i + 1) * Hk]
            cflat = jnp.asarray(cent.reshape(Hk * S, policy.C, -1))
            want = np.asarray(pq.pq_encode(jnp.asarray(xg), cflat)).reshape(
                Hk, S)
            np.testing.assert_array_equal(
                codes[l, b_i * Hk:(b_i + 1) * Hk, :, pos], want)


def test_ring_attention_matches_tail_resident():
    """decode_attn_batched with r tokens in the ring must attend the same
    set as an equivalent state with those tokens already flushed."""
    policy, budget, m = _policy()
    B, Hk, D = 2, m.num_kv_heads, m.head_dim
    L, H = m.num_layers, m.num_heads
    rng = np.random.default_rng(1)
    n0 = np.array([40, 44], np.int32)

    def seeded_state():
        st = policy.init_batched_state(B, jnp.float32)
        return st.replace(
            n_cand=jnp.asarray(n0),
            kv_tail=jnp.asarray(
                rng.normal(size=st.kv_tail.shape), jnp.float32),
            k_sink=jnp.asarray(rng.normal(size=st.k_sink.shape),
                               jnp.float32),
            v_sink=jnp.asarray(rng.normal(size=st.v_sink.shape),
                               jnp.float32),
            centroids=jnp.asarray(rng.normal(size=st.centroids.shape),
                                  jnp.float32))

    st = seeded_state()
    rng2 = np.random.default_rng(2)
    q = jnp.asarray(rng2.normal(size=(B, H, D)), jnp.float32)
    k_new = jnp.asarray(rng2.normal(size=(B, Hk, D)), jnp.float32)
    v_new = jnp.asarray(rng2.normal(size=(B, Hk, D)), jnp.float32)

    # advance 3 tokens through the ring
    shared = {"n_cand": st.n_cand}
    n_cand = n0.copy()
    ring_tokens = []
    for i in range(3):
        kn = jnp.asarray(rng2.normal(size=(L, B * Hk, D)), jnp.float32)
        vn = kn * 0.5 - 1.0
        ring_tokens.append((kn, vn))
        st = policy.commit_appends_batched(
            st, (kn, vn), {"n_cand": jnp.asarray(n_cand)})
        n_cand += 1
    st = st.replace(n_cand=jnp.asarray(n_cand))

    out_ring, _ = policy.decode_attn_batched(
        st, jnp.asarray(0), q, k_new, v_new, {"n_cand": st.n_cand})

    # equivalent state: same tokens already in the tail, empty ring
    st2 = st.replace(ring_r=jnp.zeros((), jnp.int32))
    tail = st.kv_tail
    for i, (kn, vn) in enumerate(ring_tokens):
        kv = jnp.concatenate([kn, vn], axis=-1)
        for b_i in range(B):
            pos = int(n0[b_i] + budget.local + i)
            tail = tail.at[:, b_i * Hk:(b_i + 1) * Hk, pos].set(
                kv[:, b_i * Hk:(b_i + 1) * Hk])
    st2 = st2.replace(kv_tail=tail)
    out_tail, _ = policy.decode_attn_batched(
        st2, jnp.asarray(0), q, k_new, v_new, {"n_cand": st2.n_cand})
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_tail),
                               rtol=2e-5, atol=2e-6)


def test_ring_cap_config():
    """PQConfig.ring_cap bounds the write-combining ring, and generation
    is insensitive to the cap (different chunk/flush boundaries reorder
    only fp summation in the deferred-join correction)."""
    import dataclasses
    from pqcache_tpu.runtime.generate import Engine
    from pqcache_tpu.models import llama

    cfg_m = tiny_model_config(num_layers=2)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=4,
                    approx_topk=False, select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=512),
    )
    budget = compute_budget(ecfg.budget, 256, 16)
    pol32 = get_policy(ecfg, budget)
    ecfg8 = dataclasses.replace(ecfg, pq=dataclasses.replace(
        ecfg.pq, ring_cap=8))
    pol8 = get_policy(ecfg8, budget)
    assert pol8.ring_k == min(8, budget.local)
    assert pol32.ring_k == min(32, budget.local)

    params = llama.init_params(cfg_m, jax.random.PRNGKey(3),
                               dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg_m.vocab_size, size=200).astype(np.int32)
    a = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=12).tokens
    b = Engine(ecfg8, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=12).tokens
    agree = sum(x == y for x, y in zip(a, b))
    assert agree >= 11, (a, b)
