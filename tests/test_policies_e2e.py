"""End-to-end generation through the Engine for every policy.

Mirrors the reference's verification style (SURVEY.md §4): the accuracy twin
("same math, no hierarchy") is `original`; compressed policies should agree
with it for most greedy tokens on a model with real structure, and the PQ
retrieval recall is checked directly by the recall-oracle test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    # structured prompt: repeated motif + noise so attention has real signal
    motif = rng.integers(0, cfg.vocab_size, size=16)
    ids = np.concatenate([motif, rng.integers(0, cfg.vocab_size, size=200),
                          motif, rng.integers(0, cfg.vocab_size, size=40)])
    return cfg, params, ids.astype(np.int32)


def _with_block(ecfg, block):
    import dataclasses
    return dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=block))


def _engine(cfg, params, policy, **bud):
    defaults = dict(compress_ratio=0.3, recent_ratio=0.5, sink_size=4)
    defaults.update(bud)
    ecfg = EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8),
        budget=BudgetConfig(**defaults),
        cache=CacheConfig(block_size=16),  # fine blocks for tiny prompts
        runtime=RuntimeConfig(policy=policy, prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024),
    )
    return Engine(ecfg, params, dtype=jnp.float32)


class TestEndToEnd:
    def test_original_generates(self, setup):
        cfg, params, ids = setup
        res = _engine(cfg, params, "original").generate(ids, max_new_tokens=8)
        assert len(res.tokens) == 8
        assert res.policy_name == "original"

    # minimum greedy-token agreement with `original` out of 12: compressed
    # attention on a tiny random model diverges eventually (one different
    # argmax cascades); sparq truncates hardest and is checked mainly for
    # its prefix.
    @pytest.mark.parametrize("policy,min_agree", [
        ("pq_search", 6), ("h2o", 6), ("no_drop_lb", 6), ("sparq_f", 3),
        ("infllm", 3)])
    def test_policy_matches_original_mostly(self, setup, policy, min_agree):
        cfg, params, ids = setup
        ref = _engine(cfg, params, "original").generate(ids, max_new_tokens=12)
        out = _engine(cfg, params, policy).generate(ids, max_new_tokens=12)
        assert out.policy_name == policy
        agree = sum(a == b for a, b in zip(ref.tokens, out.tokens))
        assert out.tokens[0] == ref.tokens[0], (ref.tokens, out.tokens)
        assert agree >= min_agree, (ref.tokens, out.tokens)

    def test_pq_short_prompt_falls_back_to_dense(self, setup):
        cfg, params, _ = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=20).astype(np.int32)
        eng = _engine(cfg, params, "pq_search")
        res = eng.generate(ids, max_new_tokens=4)
        assert res.policy_name == "original"
        assert len(res.tokens) == 4

    def test_pq_block_selection_mode(self, setup):
        cfg, params, ids = setup
        ref = _engine(cfg, params, "original").generate(ids, max_new_tokens=12)
        eng = _engine(cfg, params, "pq_search")
        eng.cfg = _with_block(eng.cfg, 4)
        out = eng.generate(ids, max_new_tokens=12)
        assert out.policy_name == "pq_search"
        agree = sum(a == b for a, b in zip(ref.tokens, out.tokens))
        assert agree >= 5, (ref.tokens, out.tokens)

    def test_pq_ip_metric_e2e(self, setup):
        cfg, params, ids = setup
        import dataclasses
        ref = _engine(cfg, params, "original").generate(ids, max_new_tokens=12)
        eng = _engine(cfg, params, "pq_search")
        eng.cfg = dataclasses.replace(
            eng.cfg, pq=dataclasses.replace(eng.cfg.pq, metric="ip"))
        out = eng.generate(ids, max_new_tokens=12)
        assert out.policy_name == "pq_search"
        agree = sum(a == b for a, b in zip(ref.tokens, out.tokens))
        assert out.tokens[0] == ref.tokens[0]
        assert agree >= 5, (ref.tokens, out.tokens)

    def test_pq_decode_deterministic(self, setup):
        cfg, params, ids = setup
        eng = _engine(cfg, params, "pq_search")
        a = eng.generate(ids, max_new_tokens=6)
        b = eng.generate(ids, max_new_tokens=6)
        assert a.tokens == b.tokens
