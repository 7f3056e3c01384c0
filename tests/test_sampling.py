"""Stochastic decoding (core/sampling.py + engine wiring): greedy
equivalence, truncation semantics, and seeded reproducibility."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core.sampling import make_sampler
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


class TestSamplerUnit:
    def test_greedy_returns_none(self):
        assert make_sampler(0.0) is None
        assert make_sampler(0.0, top_k=5, top_p=0.5) is None

    def test_top_k_one_is_argmax(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
        s = make_sampler(temperature=1.0, top_k=1)
        out = s(jax.random.PRNGKey(0), logits)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(jnp.argmax(logits, -1)))

    def test_nucleus_keeps_at_least_argmax(self):
        # top_p smaller than the max probability → nucleus is exactly the
        # argmax, so sampling is deterministic
        logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]], jnp.float32)
        s = make_sampler(temperature=1.0, top_p=0.01)
        for seed in range(5):
            assert int(s(jax.random.PRNGKey(seed), logits)[0]) == 1

    def test_top_k_restricts_support(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
        topk_set = set(np.asarray(jax.lax.top_k(logits, 4)[1]).tolist())
        s = make_sampler(temperature=2.0, top_k=4)
        draws = {int(s(jax.random.PRNGKey(i), logits)) for i in range(64)}
        assert draws <= topk_set and len(draws) > 1

    def test_top_p_restricts_support(self):
        probs = np.asarray([0.5, 0.3, 0.15, 0.05], np.float32)
        logits = jnp.asarray(np.log(probs))
        # nucleus at p=0.6: ranks with preceding mass < 0.6 → {0, 1}
        s = make_sampler(temperature=1.0, top_p=0.6)
        draws = {int(s(jax.random.PRNGKey(i), logits)) for i in range(128)}
        assert draws <= {0, 1} and len(draws) == 2

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
        s = make_sampler(temperature=1.0)
        out = s(jax.random.PRNGKey(3), logits)
        assert out.shape == (3,) and out.dtype == jnp.int32


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    return cfg_m, params


def _ecfg(cfg_m, **rt):
    return EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=12, max_seq_len=512, **rt),
    )


class TestEngineSampling:
    def test_seeded_reproducible_and_seed_sensitive(self, setup):
        cfg_m, params = setup
        rng = np.random.default_rng(3)
        ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)
        eng = Engine(_ecfg(cfg_m, temperature=1.0, sample_seed=5), params,
                     dtype=jnp.float32)
        a = eng.generate(ids, max_new_tokens=10).tokens
        b = eng.generate(ids, max_new_tokens=10).tokens
        assert a == b                       # same seed → same tokens
        eng2 = Engine(_ecfg(cfg_m, temperature=1.0, sample_seed=6), params,
                      dtype=jnp.float32)
        c = eng2.generate(ids, max_new_tokens=10).tokens
        assert a != c                       # different seed → different draw

    def test_temperature_zero_matches_greedy_default(self, setup):
        cfg_m, params = setup
        rng = np.random.default_rng(4)
        ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)
        ref = Engine(_ecfg(cfg_m), params, dtype=jnp.float32).generate(
            ids, max_new_tokens=8).tokens
        out = Engine(_ecfg(cfg_m, temperature=0.0, top_k=3), params,
                     dtype=jnp.float32).generate(ids, max_new_tokens=8).tokens
        assert out == ref

    def test_batch_engine_sampling_reproducible(self, setup):
        from pqcache_tpu.runtime.batch_engine import BatchEngine
        cfg_m, params = setup
        rng = np.random.default_rng(5)
        prompts = [rng.integers(0, cfg_m.vocab_size, size=256)
                   .astype(np.int32) for _ in range(2)]
        ecfg = _ecfg(cfg_m, temperature=0.8, top_p=0.9, sample_seed=11)
        be = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                         max_new_tokens=6, dtype=jnp.float32)
        a = be.run([(i, p) for i, p in enumerate(prompts)], chunk=3)
        be2 = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                          max_new_tokens=6, dtype=jnp.float32)
        b = be2.run([(i, p) for i, p in enumerate(prompts)], chunk=3)
        assert a == b
        assert all(len(v) == 6 for v in a.values())


class TestStreaming:
    def test_generate_stream_matches_generate(self, setup):
        cfg_m, params = setup
        rng = np.random.default_rng(6)
        ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)
        eng = Engine(_ecfg(cfg_m), params, dtype=jnp.float32)
        ref = eng.generate(ids, max_new_tokens=10).tokens
        streamed = list(eng.generate_stream(ids, max_new_tokens=10,
                                            chunk=3))
        assert streamed == ref

    def test_generate_stream_incremental_and_abandonable(self, setup):
        cfg_m, params = setup
        rng = np.random.default_rng(7)
        ids = rng.integers(0, cfg_m.vocab_size, size=250).astype(np.int32)
        eng = Engine(_ecfg(cfg_m), params, dtype=jnp.float32)
        it = eng.generate_stream(ids, max_new_tokens=10, chunk=3)
        first_three = [next(it) for _ in range(3)]
        it.close()                      # abandon mid-stream
        # the engine stays reusable and deterministic afterwards
        ref = eng.generate(ids, max_new_tokens=10).tokens
        assert first_three == ref[:3]

    def test_offload_stream_matches_generate(self, setup):
        import dataclasses
        from pqcache_tpu.config import CacheConfig
        from pqcache_tpu.runtime.offload_engine import OffloadEngine
        cfg_m, params = setup
        rng = np.random.default_rng(8)
        ids = rng.integers(0, cfg_m.vocab_size, size=260).astype(np.int32)
        ecfg = dataclasses.replace(
            _ecfg(cfg_m), pq=dataclasses.replace(
                _ecfg(cfg_m).pq, select_block=32),
            cache=CacheConfig(block_size=32, hbm_cache_tokens=128,
                              cache_topk_blocks=4))
        eng = OffloadEngine(ecfg, params, dtype=jnp.float32)
        ref = eng.generate(ids, max_new_tokens=6)
        eng2 = OffloadEngine(ecfg, params, dtype=jnp.float32)
        assert list(eng2.stream(ids, max_new_tokens=6)) == ref


class TestPrefixCache:
    def test_prefix_generate_matches_concatenated(self, setup):
        """generate(prefix=...) over [prefix | suffix] must agree with a
        one-shot generate of the concatenated prompt: same bucketed P,
        same budgets, same k-means draws — only the attention summation
        order differs (suffix runs as a q_offset chunk), so require
        near-total token agreement plus structural checks."""
        cfg_m, params = setup
        rng = np.random.default_rng(10)
        pre = rng.integers(0, cfg_m.vocab_size, size=192).astype(np.int32)
        suf = rng.integers(0, cfg_m.vocab_size, size=64).astype(np.int32)
        both = np.concatenate([pre, suf])

        eng = Engine(_ecfg(cfg_m), params, dtype=jnp.float32)
        ref = eng.generate(both, max_new_tokens=10).tokens

        pc = eng.prefill_prefix(pre)
        assert pc.n == 192 and pc.k.shape == (
            cfg_m.num_layers, cfg_m.num_kv_heads, 192, cfg_m.head_dim)
        out = eng.generate(suf, max_new_tokens=10, prefix=pc).tokens
        agree = sum(a == b for a, b in zip(ref, out))
        assert agree >= 8, (ref, out)

        # the snapshot is reusable: a second suffix runs without error and
        # the same suffix reproduces the same tokens
        out2 = eng.generate(suf, max_new_tokens=10, prefix=pc).tokens
        assert out2 == out

    def test_prefix_snapshot_matches_oneshot_kv(self, setup):
        # the captured prefix K/V must equal the K/V a one-shot prefill
        # computes for those rows (causality: prefix rows see only prefix)
        cfg_m, params = setup
        rng = np.random.default_rng(11)
        pre = rng.integers(0, cfg_m.vocab_size, size=128).astype(np.int32)
        both = np.concatenate(
            [pre, rng.integers(0, cfg_m.vocab_size, size=64)
             .astype(np.int32)])
        k_pre, _ = llama.prefill_capture_kv(
            cfg_m, params, jnp.asarray(pre))
        k_both, _ = llama.prefill_capture_kv(
            cfg_m, params, jnp.asarray(both))
        np.testing.assert_allclose(np.asarray(k_pre),
                                   np.asarray(k_both[:, :, :128]),
                                   rtol=1e-5, atol=1e-5)

    def test_prefix_respects_reservation(self, setup):
        cfg_m, params = setup
        rng = np.random.default_rng(12)
        eng = Engine(_ecfg(cfg_m), params, dtype=jnp.float32)
        pc = eng.prefill_prefix(
            rng.integers(0, cfg_m.vocab_size, size=448).astype(np.int32))
        suf = rng.integers(0, cfg_m.vocab_size, size=64).astype(np.int32)
        with pytest.raises(ValueError, match="max_seq_len"):
            # 448 + 64 + 12 > 512
            list(eng.generate_stream(suf, max_new_tokens=12, prefix=pc))
