"""Sharding specs must track the state/param pytree structures, and the
GSPMD path must place real shardings on an 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.parallel import sharding as sh
from pqcache_tpu.policies.base import get_policy


def _cfg(tp_heads=2):
    m = tiny_model_config(num_kv_heads=tp_heads, num_heads=2 * tp_heads)
    return EngineConfig(
        model=m, pq=PQConfig(n_subvec_per_head=2, n_subbits=3),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512))


def test_pq_state_specs_match_structure():
    cfg = _cfg()
    budget = compute_budget(cfg.budget, 128, 8)
    policy = get_policy(cfg, budget)
    state = policy.init_state(jnp.float32)
    specs = sh.pq_state_specs()
    # tree_map raises if the structures diverge (field renames/additions)
    jax.tree_util.tree_map(lambda a, s: None, state, specs,
                           is_leaf=lambda x: x is None)


def test_param_specs_match_structure():
    cfg = _cfg()
    params = llama.init_params(cfg.model, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    specs = sh.param_specs(cfg.model)
    jax.tree_util.tree_map(lambda a, s: None, params, specs)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_shard_params_places_shards():
    mesh = sh.make_mesh(2, 4)
    cfg = _cfg(tp_heads=4)
    params = llama.init_params(cfg.model, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    sharded = sh.shard_params(mesh, cfg.model, params)
    wq = sharded["layers"]["wq"]
    assert len(wq.sharding.device_set) == 8
    # column-sharded over tp: local shard is 1/4 of the out dim
    shard_shape = wq.sharding.shard_shape(wq.shape)
    assert shard_shape[-1] == wq.shape[-1] // 4
