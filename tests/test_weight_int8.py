"""Weight-only int8 (core/quant.quantize_weight_tree + models/llama._mm):
per-out-column scales factor exactly out of every matmul, so on a tiny
f32 model the quantization noise is far below decision boundaries and
generation must match bf16 weights token for token."""

import numpy as np
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core import quant
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


def test_weight_int8_generation_matches_float():
    cfg = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    p8 = quant.quantize_weight_tree(params)
    assert p8["layers"]["wq"].dtype == jnp.int8
    assert p8["embed"].dtype == jnp.int8
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=200).astype(np.int32)
    ecfg = EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=6),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024))
    a = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=12)
    b = Engine(ecfg, p8, dtype=jnp.float32).generate(ids, max_new_tokens=12)
    agree = sum(x == y for x, y in zip(a.tokens, b.tokens))
    assert agree >= 11, (a.tokens, b.tokens)


def test_weight_int8_scale_factorization_exact():
    """(x @ W8) ⊙ s must equal x @ (W8 ⊙ s) bit-for-bit in f32."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.1)
    q, s = quant.quantize_weight_mat(w)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    lhs = (x @ q.astype(jnp.float32)) * s
    rhs = x @ (q.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-6, atol=1e-6)
    # dequantized weight is within one scale step of the original
    np.testing.assert_allclose(np.asarray(q.astype(jnp.float32) * s),
                               np.asarray(w), atol=float(s.max()) + 1e-7)


def test_weight_int8_offload_engine_matches_float():
    """W8 through the OFFLOAD tier (the pool16_w8 serving arm caught a
    direct embed take that produced int8 hidden states)."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    from pqcache_tpu.runtime.offload_engine import OffloadEngine
    cfg = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    p8 = quant.quantize_weight_tree(params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=200).astype(np.int32)
    ecfg = EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=6,
                    select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        cache=CacheConfig(offload=True, block_size=16, hbm_cache_tokens=96,
                          cache_topk_blocks=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=12, max_seq_len=1024))
    # same QUANTIZED weights through both tiers — the accuracy-twin
    # comparison isolates the W8 plumbing from quantization noise (which
    # on a random model flips near-tie argmaxes)
    import dataclasses as _dc
    ecfg_blk = _dc.replace(
        ecfg, pq=_dc.replace(ecfg.pq, select_block=16))
    a = Engine(ecfg_blk, p8, dtype=jnp.float32).generate(
        ids, max_new_tokens=10)
    b = OffloadEngine(ecfg_blk, p8, dtype=jnp.float32).generate(
        ids, max_new_tokens=10)
    agree = sum(x == y for x, y in zip(a.tokens, b))
    assert agree >= 8, (a.tokens, b)
