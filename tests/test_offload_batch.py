"""Batched offload serving (runtime/offload_batch.py): B slots sharing one
pinned-host store + HBM block cache must reproduce B independent
single-sequence OffloadEngine runs token for token (same math, folded
heads, slot-prefixed block ids)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.offload_batch import BatchOffloadEngine
from pqcache_tpu.runtime.offload_engine import OffloadEngine


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=n).astype(np.int32)
               for n in (260, 230)]
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


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_batched_offload_matches_single_runs(setup, kv_dtype):
    ecfg, params, prompts = setup
    ecfg = dataclasses.replace(
        ecfg, cache=dataclasses.replace(ecfg.cache, kv_dtype=kv_dtype))
    n = 10
    # single-sequence references — each prompt padded to the POOL bucket
    # (the batched engine buckets on the longest prompt)
    P = 320  # bucket_length(260, 64)
    refs = []
    for ids in prompts:
        se = OffloadEngine(ecfg, params, dtype=jnp.float32)
        # force the same pool P: left-pad is internal, bucket by length —
        # pad the prompt ourselves to P-true via the engine's own bucket
        refs.append(se.generate(ids, max_new_tokens=n))

    be = BatchOffloadEngine(ecfg, params, batch_size=2, dtype=jnp.float32)
    out = be.generate_batch(prompts, max_new_tokens=n)
    # slot 0's prompt (len 260) buckets identically (320) in both engines;
    # slot 1 (len 230) buckets to 256 single vs 320 pooled → budgets
    # differ, so only slot 0 is an exact-parity check
    assert out[0] == refs[0], (out[0], refs[0])
    assert len(out[1]) == n
    # the shared cache served both slots
    assert be.store.hits > 0


def test_batched_offload_same_prompt_slots_agree(setup):
    ecfg, params, prompts = setup
    be = BatchOffloadEngine(ecfg, params, batch_size=2, dtype=jnp.float32)
    out = be.generate_batch([prompts[0], prompts[0]], max_new_tokens=8)
    assert out[0] == out[1], out


def test_serve_continuous_matches_single_runs(setup):
    """Continuous serving (BatchOffloadEngine.serve): 4 requests through a
    2-slot pool. Requests 3/4 admit into RETIRED slots — their block-id
    ranges are recycled, so any stale LFU/cache row from the previous
    occupant that classified as a hit would silently corrupt attention.
    Every stream must match its single-sequence OffloadEngine run."""
    ecfg, params, _ = setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=320)
               .astype(np.int32) for _ in range(4)]
    n = 12
    refs = [OffloadEngine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=n) for ids in prompts]
    be = BatchOffloadEngine(ecfg, params, batch_size=2, dtype=jnp.float32)
    timing: dict = {}
    out = be.serve([(i, p) for i, p in enumerate(prompts)],
                   max_new_tokens=n, timing=timing)
    assert set(out) == {0, 1, 2, 3}
    for i in range(4):
        assert out[i] == refs[i], (i, out[i], refs[i])
    # every slot retired at the end: all leaves invalidated
    assert all(not blocks for blocks in be.store.kv_blocks)
    # timing events recorded for every stream
    for i in range(4):
        ev = timing[i]
        assert ev["admit"] <= ev["first"] <= ev["done"]
        assert len(ev["token_times"]) == n


def test_serve_arrivals_and_eos(setup):
    """Arrival schedule delays admission; EOS retires a slot early and
    the freed slot serves the next request."""
    ecfg, params, _ = setup
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=320)
               .astype(np.int32) for _ in range(3)]
    ref = OffloadEngine(ecfg, params, dtype=jnp.float32).generate(
        prompts[0], max_new_tokens=6)
    eos = (int(ref[2]),)        # stop stream 0 after 3 tokens
    be = BatchOffloadEngine(ecfg, params, batch_size=1, dtype=jnp.float32)
    timing: dict = {}
    out = be.serve([(i, p) for i, p in enumerate(prompts)],
                   max_new_tokens=6, eos_ids=eos,
                   arrivals={0: 0.0, 1: 0.0, 2: 0.5}, timing=timing)
    assert out[0] == ref[:3]
    assert len(out[1]) <= 6 and len(out[2]) <= 6
    assert timing[2]["admit"] >= 0.5


def test_batched_offload_parity_at_equal_bucket(setup):
    """Both slots at the pool bucket length → BOTH must match their
    single runs exactly (block flush + shared-cache path crossed: gen 24
    exceeds a 16-token block)."""
    ecfg, params, _ = setup
    rng = np.random.default_rng(9)
    a = rng.integers(0, ecfg.model.vocab_size, size=320).astype(np.int32)
    b = rng.integers(0, ecfg.model.vocab_size, size=320).astype(np.int32)
    n = 24
    refs = [OffloadEngine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=n) for ids in (a, b)]
    be = BatchOffloadEngine(ecfg, params, batch_size=2, dtype=jnp.float32)
    out = be.generate_batch([a, b], max_new_tokens=n)
    assert out[0] == refs[0], (out[0], refs[0])
    assert out[1] == refs[1], (out[1], refs[1])


def test_decode_programs_capture_no_weight_constants(setup):
    """No decode-step program may close over a weight array: a captured
    [V, E] embedding table is baked into the HLO as a literal constant —
    at Llama vocab that made the serialized _decode_first_b executable
    819 MB (~20-min remote compiles). Weights must enter as operands."""
    ecfg, params, prompts = setup
    be = BatchOffloadEngine(ecfg, params, batch_size=2, dtype=jnp.float32)
    be._setup(max(int(p.shape[0]) for p in prompts), 8)
    toks = jnp.zeros((be.B,), jnp.int32)
    n_sel_h = jnp.zeros((be.B * be.H_kv,), jnp.int32)
    closed = jax.make_jaxpr(
        lambda *a: be._decode_first_b(*a))(
        params["layers"], params["embed"], be.bstate, toks, n_sel_h)
    big = [(np.shape(c), np.asarray(c).nbytes) for c in closed.consts
           if hasattr(c, "nbytes") and np.asarray(c).nbytes > 65536]
    assert not big, f"large closure constants traced into decode: {big}"


def test_batched_stale_select_equals_exact_when_covered(setup):
    """Batched stale selection: with top-k covering every valid block the
    selected sets are query-independent, so stale generate_batch must
    reproduce exact generate_batch token for token (O(1) syncs/step)."""
    ecfg, params, prompts = setup
    cov = dataclasses.replace(
        ecfg, budget=BudgetConfig(compress_ratio=1.5, recent_ratio=0.2,
                                  sink_size=4))
    exact = BatchOffloadEngine(cov, params, batch_size=2).generate_batch(
        prompts, max_new_tokens=10)
    st = dataclasses.replace(
        cov, cache=dataclasses.replace(cov.cache, stale_select=True))
    eng = BatchOffloadEngine(st, params, batch_size=2)
    stale = eng.generate_batch(prompts, max_new_tokens=10)
    assert stale == exact


def test_serve_stale_reseeds_on_admission(setup):
    """Continuous serving in stale mode: an admission invalidates the
    stale selections (they were computed from the retired occupant's
    state), forcing one exact re-seeding step — with covered top-k the
    results must still match exact serving exactly across retirement and
    block-id recycling."""
    ecfg, params, prompts = setup
    cov = dataclasses.replace(
        ecfg, budget=BudgetConfig(compress_ratio=1.5, recent_ratio=0.2,
                                  sink_size=4))
    reqs = [(i, prompts[i % 2]) for i in range(4)]
    exact = BatchOffloadEngine(cov, params, batch_size=2).serve(
        reqs, max_new_tokens=8)
    st = dataclasses.replace(
        cov, cache=dataclasses.replace(cov.cache, stale_select=True))
    eng = BatchOffloadEngine(st, params, batch_size=2)
    stale = eng.serve(reqs, max_new_tokens=8)
    assert stale == exact
