"""harness/trace.py: in-program pq/fetch/transfer/model decomposition.

The reference's global_timer (global_timer.py:33-54) is a runtime CUDA-event
apparatus; the TPU equivalent joins a jax.profiler device trace against the
compiled HLO's op_name metadata. These tests pin (a) the HLO scope-map
parser, (b) the bucket classifier, and (c) the full pipeline on a tiny
pq_search decode loop on CPU — pq-scoped device time must be found.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pqcache_tpu.harness import trace as tr


def test_hlo_scope_map_parses_metadata():
    @jax.named_scope("pq_score")
    def g(x):
        return x * 2 + 1

    c = jax.jit(lambda x: g(x).sum()).lower(jnp.ones((32, 32))).compile()
    smap = tr.hlo_scope_map(c.as_text())
    assert smap, "no instructions parsed"
    assert any("pq_score" in s for s in smap.values())


def test_classify_buckets():
    assert tr.classify("fusion.1", "jit(f)/pq_score/mul") == "pq"
    assert tr.classify("dot.2", "jit(f)/pq_select/top_k") == "pq"
    assert tr.classify("fusion.9", "jit(f)/pq_fetch/gather") == "fetch"
    assert tr.classify("copy.3", "jit(f)/pq_score/x") == "transfer"
    assert tr.classify("all-gather.1", "") == "transfer"
    assert tr.classify("fusion.7", "jit(f)/mlp/dot_general") == "model"


def test_decompose_ops_per_step():
    smap = {"a.1": "jit(f)/pq_score/dot", "b.2": "jit(f)/mlp/dot"}
    ops = [("a.1", 4000.0), ("b.2", 8000.0), ("copy.9", 2000.0)]
    r = tr.decompose_ops(ops, smap, steps=2)
    assert r["pq_ms"] == pytest.approx(2.0)
    assert r["model_ms"] == pytest.approx(4.0)
    assert r["transfer_ms"] == pytest.approx(1.0)
    assert r["total_ms"] == pytest.approx(7.0)
    assert r["non_pq_ms"] == r["model_ms"]
    assert r["unmapped_ms"] == pytest.approx(1.0)  # copy.9 not in smap


def test_decompose_jitted_tiny_decode(tmp_path):
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.models import llama
    from pqcache_tpu.policies.base import get_policy

    model = ModelConfig(
        name="t", vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        rope_theta=10000.0, max_position_embeddings=4096)
    ctx, steps = 512, 4
    cfg = EngineConfig(
        model=model,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=2),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                            sink_size=8),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=128,
                              max_new_tokens=16, max_seq_len=ctx * 2))
    budget = compute_budget(cfg.budget, ctx, 16)
    policy = get_policy(cfg, budget)
    params = llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    st = policy.init_state(jnp.bfloat16)
    st = st.replace(
        n_cand=jnp.asarray(budget.n_cand_init, jnp.int32),
        pos=jnp.asarray(ctx, jnp.int32),
        codes=jnp.asarray(rng.integers(0, 16, size=st.codes.shape),
                          st.codes.dtype),
        centroids=jnp.asarray(rng.normal(size=st.centroids.shape),
                              jnp.float32),
        kv_tail=jnp.asarray(rng.normal(size=st.kv_tail.shape) * 0.1,
                            jnp.bfloat16))

    res = tr.decompose_jitted(
        lambda p, s, t, pos: llama.decode_loop(model, p, policy, s, t, pos,
                                               steps),
        (params, st, jnp.asarray(3, jnp.int32), jnp.asarray(ctx, jnp.int32)),
        steps=steps, trace_dir=str(tmp_path))
    assert res["total_ms"] > 0
    # the ADC/top-k retrieval chain must be attributed to pq, not model
    assert res["pq_ms"] > 0, res
    assert res["model_ms"] > 0, res
    assert res["total_ms"] >= res["pq_ms"] + res["model_ms"] - 1e-6
