"""dp×tp sharded offload tier (parallel/offload_tp.py) vs the
single-device batched offload engine: per-device compute is the same
batch-as-heads math on the local (B/dp)·(H_kv/tp) fold, kmeans++ seeds are
keyed by global head ids, and the host-store shards serve the same rows —
tokens must match EXACTLY."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.parallel.offload_tp import ShardedOffloadEngine
from pqcache_tpu.runtime.offload_batch import BatchOffloadEngine


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=n).astype(np.int32)
               for n in (260, 230, 250, 240)]
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False, select_block=16),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        cache=CacheConfig(offload=True, block_size=16, hbm_cache_tokens=96,
                          cache_topk_blocks=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=40, max_seq_len=1024),
    )
    return ecfg, params, prompts


def _mesh(dp, tp):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("dp", "tp"))


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 2), (1, 2)])
def test_sharded_offload_matches_single_device(setup, dp, tp):
    ecfg, params, prompts = setup
    B = max(dp, 2) if dp > 1 else 2
    B = dp * max(4 // dp, 1)
    prompts_b = (prompts * 2)[:B]
    ref = BatchOffloadEngine(ecfg, params, batch_size=B).generate_batch(
        prompts_b, max_new_tokens=8)
    eng = ShardedOffloadEngine(ecfg, params, _mesh(dp, tp), batch_size=B,
                               dtype=jnp.float32)
    outs = eng.generate_batch(prompts_b, max_new_tokens=8)
    assert outs == ref
    assert eng.hit_rate > 0.0


def test_sharded_offload_int8(setup):
    ecfg, params, prompts = setup
    ecfg8 = dataclasses.replace(
        ecfg, cache=dataclasses.replace(ecfg.cache, kv_dtype="int8"))
    ref = BatchOffloadEngine(ecfg8, params, batch_size=2).generate_batch(
        prompts[:2], max_new_tokens=8)
    eng = ShardedOffloadEngine(ecfg8, params, _mesh(2, 2), batch_size=2,
                               dtype=jnp.float32)
    outs = eng.generate_batch(prompts[:2], max_new_tokens=8)
    assert outs == ref


def test_sharded_offload_long_run_tail_flush(setup):
    """Enough decode steps that generated tokens fill and flush tail
    blocks into the shard leaves (the ring-evict → leaf adoption path) —
    and continue to classify as hits/misses correctly."""
    ecfg, params, prompts = setup
    # small local window → evictions reach the stored region (do_append)
    # within the run, then fill and flush a 16-row tail block
    ecfg = dataclasses.replace(
        ecfg, budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.2,
                                  sink_size=4))
    ref = BatchOffloadEngine(ecfg, params, batch_size=2).generate_batch(
        prompts[:2], max_new_tokens=40)
    eng = ShardedOffloadEngine(ecfg, params, _mesh(2, 2), batch_size=2,
                               dtype=jnp.float32)
    valid0 = [(len(p) - 4) // 16 * 16 for p in prompts[:2]]
    outs = eng.generate_batch(prompts[:2], max_new_tokens=40)
    assert outs == ref
    # generated tokens must have flushed at least one tail block
    assert any(eng._valid[i] > valid0[i] for i in range(2)), \
        (list(eng._valid), valid0)


def test_generate_ring_matches_single_device_offload(setup):
    """Ring-prefill → sharded-offload handoff: sequence-sharded prefill +
    all_to_all reshard + per-shard _tail_update must decode the same
    tokens as the single-device OffloadEngine prefilled from tokens
    (same kmeans seeds via global group ids; ring attention at f32)."""
    from pqcache_tpu.runtime.offload_engine import OffloadEngine
    ecfg, params, prompts = setup
    devs = np.array(jax.devices()[:2]).reshape(1, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    eng = ShardedOffloadEngine(ecfg, params, mesh, batch_size=1,
                               dtype=jnp.float32)
    ring_toks = eng.generate_ring(prompts[0], max_new_tokens=10)
    ref = OffloadEngine(ecfg, params, dtype=jnp.float32).generate(
        prompts[0], max_new_tokens=10)
    agree = sum(a == b for a, b in zip(ring_toks, ref))
    assert agree >= 9, (ring_toks, ref)
    assert eng.hit_rate > 0.0
