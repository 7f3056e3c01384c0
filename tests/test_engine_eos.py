"""Engine EOS/chunking semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine, bucket_length


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=1)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(3), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m, pq=PQConfig(n_subvec_per_head=2, n_subbits=3),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="original", prefill_bucket=32,
                              max_new_tokens=64, max_seq_len=256))
    return ecfg, params


def test_bucket_length():
    assert bucket_length(1, 64) == 128      # minimum
    assert bucket_length(129, 64) == 192
    assert bucket_length(128, 64) == 128


def test_eos_stops_generation(setup):
    ecfg, params = setup
    eng = Engine(ecfg, params, dtype=jnp.float32)
    ids = np.arange(2, 40, dtype=np.int32)
    free = eng.generate(ids, max_new_tokens=24)
    assert len(free.tokens) == 24
    # force EOS at the first generated token: everything stops immediately
    res = eng.generate(ids, max_new_tokens=24, eos_ids=(free.tokens[0],))
    assert len(res.tokens) == 1
    # EOS mid-stream: output ends at (and includes) the EOS token
    if len(set(free.tokens)) > 2:
        mid = free.tokens[5]
        res2 = eng.generate(ids, max_new_tokens=24, eos_ids=(mid,))
        assert res2.tokens[-1] == mid
        assert len(res2.tokens) <= 24


def test_max_new_respected_with_eos_chunks(setup):
    ecfg, params = setup
    eng = Engine(ecfg, params, dtype=jnp.float32)
    ids = np.arange(2, 40, dtype=np.int32)
    res = eng.generate(ids, max_new_tokens=7, eos_ids=(999999,))
    assert len(res.tokens) == 7
