"""Multi-host plumbing (parallel/dcn.py) on the single-process CPU mesh.

A real DCN run needs multiple processes; what IS testable here is that
every multihost-safe code path — serving_mesh construction, global-array
assembly from per-process rows, addressable-shard readback, the
allgathered termination, and the DistributedBatchTPEngine serving loop —
executes and produces the same tokens as the plain BatchTPEngine (under a
single process, local == global by definition).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.parallel import dcn


needs8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@needs8
def test_serving_mesh_axes():
    mesh = dcn.serving_mesh(2, 4)
    assert mesh.shape["dp"] == 2 and mesh.shape["tp"] == 4
    assert mesh.axis_names == ("dp", "tp")


@needs8
def test_host_local_roundtrip():
    mesh = dcn.serving_mesh(2, 4)
    rows = np.arange(2 * 6, dtype=np.int32).reshape(2, 6)
    arr = dcn.host_local_rows(mesh, P("dp", None), (2, 6), rows, np.int32)
    assert arr.shape == (2, 6)
    back, start = dcn.read_local_rows(arr, 2)
    assert start == 0
    np.testing.assert_array_equal(back, rows)
    # 1-D counters
    c = np.asarray([7, 9], np.int32)
    arr1 = dcn.host_local_rows(mesh, P("dp"), (2,), c, np.int32)
    back1, _ = dcn.read_local_rows(arr1, 2)
    np.testing.assert_array_equal(back1, c)


def test_all_hosts_done_single_process():
    assert dcn.all_hosts_done(True) is True
    assert dcn.all_hosts_done(False) is False


@needs8
def test_distributed_engine_matches_plain_batch_tp():
    from pqcache_tpu.parallel.batch_tp import BatchTPEngine
    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256).astype(np.int32)
               for _ in range(4)]

    mesh = dcn.serving_mesh(2, 4)
    ref_eng = BatchTPEngine(ecfg, params, mesh, prefill_len=256,
                            max_new_tokens=8, dtype=jnp.float32)
    refs = ref_eng.generate_batch(prompts, max_new_tokens=8)

    eng = dcn.DistributedBatchTPEngine(ecfg, params, mesh, prefill_len=256,
                                       max_new_tokens=8, dtype=jnp.float32)
    outs = eng.generate_batch_local(prompts, max_new_tokens=8)
    assert outs == refs


@needs8
def test_continuous_serving_matches_static_batches():
    """serve_local (cross-host continuous batching: admit/retire at chunk
    boundaries, predicated prefill waves) must produce the same tokens as
    static generate_batch runs over the same request pairs — under one
    process the collective plumbing is exercised with local == global."""
    from pqcache_tpu.parallel.batch_tp import BatchTPEngine
    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256).astype(np.int32)
               for _ in range(6)]

    mesh = dcn.serving_mesh(2, 4)
    ref_eng = BatchTPEngine(ecfg, params, mesh, prefill_len=256,
                            max_new_tokens=8, dtype=jnp.float32)
    refs = {}
    # queue drain order with 2 groups × 1 slot: pairs (0,1), (2,3), (4,5)
    for i in range(0, 6, 2):
        for sid, toks in zip((i, i + 1), ref_eng.generate_batch(
                prompts[i:i + 2], max_new_tokens=8)):
            refs[sid] = toks

    eng = dcn.DistributedBatchTPEngine(ecfg, params, mesh, prefill_len=256,
                                       max_new_tokens=8, dtype=jnp.float32)
    outs = eng.serve_local(list(enumerate(prompts)), max_new_tokens=8)
    assert set(outs) == set(range(6))
    assert outs == refs


@needs8
def test_continuous_serving_ragged_queue():
    """Fewer requests than dp groups (1 into a 2-group pool) and an odd
    queue (3 requests → ragged final wave): no-admit groups ride the
    predicated prefill waves without corrupting live slots, and tokens are
    slot-placement-independent (match a duplicate-prompt static batch)."""
    from pqcache_tpu.parallel.batch_tp import BatchTPEngine
    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256).astype(np.int32)
               for _ in range(3)]

    mesh = dcn.serving_mesh(2, 4)
    ref_eng = BatchTPEngine(ecfg, params, mesh, prefill_len=256,
                            max_new_tokens=8, dtype=jnp.float32)
    refs = {}
    for sid, toks in enumerate(
            ref_eng.generate_batch(prompts[:2], max_new_tokens=8)):
        refs[sid] = toks
    # duplicate-prompt pair: slot placement must not change the tokens
    refs[2] = ref_eng.generate_batch([prompts[2], prompts[2]],
                                     max_new_tokens=8)[0]

    eng = dcn.DistributedBatchTPEngine(ecfg, params, mesh, prefill_len=256,
                                       max_new_tokens=8, dtype=jnp.float32)
    solo = eng.serve_local([(0, prompts[0])], max_new_tokens=8)
    assert solo == {0: refs[0]}

    outs = eng.serve_local(list(enumerate(prompts)), max_new_tokens=8)
    assert outs == refs


@needs8
def test_continuous_serving_interleaved_matches_monolithic():
    """SLAB-WISE collective admission (interleave, chunked prefill): one
    chunk-major slab program advances per decode chunk instead of a
    monolithic prefill wave — running streams on every host stall at most
    one slab. Token streams must match the monolithic waves exactly."""
    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=8, max_seq_len=512,
                              kernels="xla", prefill_chunk=64),
    )
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256 - 9 * i)
               .astype(np.int32) for i in range(5)]

    mesh = dcn.serving_mesh(2, 4)
    eng_m = dcn.DistributedBatchTPEngine(
        ecfg, params, mesh, prefill_len=256, max_new_tokens=8,
        dtype=jnp.float32, interleave="off")
    assert not eng_m.interleave
    outs_m = eng_m.serve_local(list(enumerate(prompts)), max_new_tokens=8)

    eng_i = dcn.DistributedBatchTPEngine(
        ecfg, params, mesh, prefill_len=256, max_new_tokens=8,
        dtype=jnp.float32)
    assert eng_i.interleave          # auto: chunked prefill turns it on
    outs_i = eng_i.serve_local(list(enumerate(prompts)), max_new_tokens=8)

    assert set(outs_i) == set(range(5))
    assert outs_i == outs_m
