"""Explicit shard_map tensor-parallel decode vs the single-device engine.

Same weights, same prompt → identical greedy tokens (f32 so psum reduction
order cannot flip an argmax)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.parallel.tp_decode import TPEngine
from pqcache_tpu.runtime.generate import Engine


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >= 2 devices")
def test_tp2_matches_single_device():
    cfg_m = tiny_model_config(num_layers=2)  # H=4, H_kv=2 → tp=2
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)

    ref = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=8)

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2,), ("tp",))
    P_len = 256
    eng = TPEngine(ecfg, params, mesh, prefill_len=P_len, max_new_tokens=8,
                   dtype=jnp.float32)
    out = eng.generate(ids, max_new_tokens=8)
    # psum splits the wo/down contractions into per-shard partials, so f32
    # summation order differs from the single-device einsum — ulp-level
    # differences can flip a late argmax; require a long exact prefix.
    agree = sum(a == b for a, b in zip(ref.tokens, out))
    assert out[:5] == ref.tokens[:5], (ref.tokens, out)
    assert agree >= 6, (ref.tokens, out)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >= 2 devices")
def test_tp2_int8_tail_matches_single_device():
    """Sharded int8: per-channel scale leaves ride the tp head shard; the
    TP engine's tokens track the single-device int8 engine."""
    from pqcache_tpu.config import CacheConfig
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        cache=CacheConfig(kv_dtype="int8"),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)
    ref = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=8)
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2,), ("tp",))
    eng = TPEngine(ecfg, params, mesh, prefill_len=256, max_new_tokens=8,
                   dtype=jnp.float32)
    out = eng.generate(ids, max_new_tokens=8)
    agree = sum(a == b for a, b in zip(ref.tokens, out))
    assert out[:5] == ref.tokens[:5], (ref.tokens, out)
    assert agree >= 6, (ref.tokens, out)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_batch_tp_engine_dp2_tp4():
    # dp×tp batched serving: 4 slots over a (dp=2, tp=4) mesh, batch-as-
    # heads decode per device; per-slot tokens must track the single-device
    # engine (long exact prefix; psum ulp effects as above)
    from pqcache_tpu.parallel.batch_tp import BatchTPEngine
    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256).astype(np.int32)
               for _ in range(4)]
    refs = [Engine(ecfg, params, dtype=jnp.float32).generate(
        p, max_new_tokens=8).tokens for p in prompts]

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    eng = BatchTPEngine(ecfg, params, mesh, prefill_len=256,
                        max_new_tokens=8, dtype=jnp.float32)
    outs = eng.generate_batch(prompts, max_new_tokens=8)
    for ref, out in zip(refs, outs):
        agree = sum(a == b for a, b in zip(ref, out))
        assert out[:5] == ref[:5], (ref, out)
        assert agree >= 6, (ref, out)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >= 2 devices")
def test_tp2_jhist_block_scorer_matches_single_device():
    """TPEngine with the joint-histogram block scorer active
    (select_block>1): the state must carry a jhist buffer matching the
    shard_map specs, and tokens must track the single-device engine."""
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False, select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)

    ref = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=8)

    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2,), ("tp",))
    eng = TPEngine(ecfg, params, mesh, prefill_len=256, max_new_tokens=8,
                   dtype=jnp.float32)
    assert eng.policy.use_jhist, "test must exercise the jhist path"
    out = eng.generate(ids, max_new_tokens=8)
    agree = sum(a == b for a, b in zip(ref.tokens, out))
    assert out[:5] == ref.tokens[:5], (ref.tokens, out)
    assert agree >= 6, (ref.tokens, out)
