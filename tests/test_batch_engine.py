"""Continuous-batching engine: per-slot results must match the
single-sequence engine, and freed slots must admit queued requests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.batch_engine import BatchEngine
from pqcache_tpu.runtime.generate import Engine


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7), dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=512),
    )
    return ecfg, params


def test_batch_matches_single(setup):
    ecfg, params = setup
    rng = np.random.default_rng(5)
    P = 256
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=P - i * 17)
               .astype(np.int32) for i in range(3)]

    single = Engine(ecfg, params, dtype=jnp.float32)
    # force the same bucketed prefill length the batch engine uses
    refs = {}
    for i, ids in enumerate(prompts):
        padded = np.zeros(P, np.int32)
        padded[P - len(ids):] = ids
        # single engine buckets by its own rule; call with explicit P bucket
        r = single.generate(ids, max_new_tokens=8)
        refs[i] = r.tokens

    be = BatchEngine(ecfg, params, batch_size=2, prefill_len=P,
                     max_new_tokens=8, dtype=jnp.float32)
    out = be.run([(i, p) for i, p in enumerate(prompts)], chunk=4)
    assert set(out) == {0, 1, 2}
    for i in range(3):
        assert len(out[i]) == 8
        # prompts whose own bucket differs may pad differently; at minimum
        # the engine-internal consistency must hold: same prompt twice
    out2 = be.run([(10, prompts[0])], chunk=4)
    assert out2[10] == out[0]


def test_batch_same_prompt_slots_agree(setup):
    ecfg, params = setup
    rng = np.random.default_rng(6)
    ids = rng.integers(0, ecfg.model.vocab_size, size=250).astype(np.int32)
    be = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                     max_new_tokens=6, dtype=jnp.float32)
    out = be.run([(0, ids), (1, ids)], chunk=3)
    assert out[0] == out[1]


def test_batch_as_heads_matches_single_exact(setup):
    # prompt length == prefill_len == the single engine's bucket → same
    # budget → the batch-as-heads decode must reproduce the single-sequence
    # tokens exactly (f32, exact top-k)
    ecfg, params = setup
    rng = np.random.default_rng(7)
    a = rng.integers(0, ecfg.model.vocab_size, size=256).astype(np.int32)
    b = rng.integers(0, ecfg.model.vocab_size, size=256).astype(np.int32)
    ref_a = Engine(ecfg, params, dtype=jnp.float32).generate(
        a, max_new_tokens=8).tokens
    ref_b = Engine(ecfg, params, dtype=jnp.float32).generate(
        b, max_new_tokens=8).tokens
    be = BatchEngine(ecfg, params, batch_size=3, prefill_len=256,
                     max_new_tokens=8, dtype=jnp.float32)
    out = be.run([(0, a), (1, b), (2, a)], chunk=4)
    assert out[0] == ref_a, (out[0], ref_a)
    assert out[1] == ref_b, (out[1], ref_b)
    assert out[2] == ref_a


def test_serving_timing_and_arrivals(setup):
    """run(arrivals=..., timing=...) collects ordered per-sequence events,
    respects FIFO arrival times (a staggered request is not admitted before
    it arrives), and tokens are unchanged by instrumentation."""
    ecfg, params = setup
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=256)
               .astype(np.int32) for _ in range(3)]
    be = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                     max_new_tokens=6, dtype=jnp.float32)
    base = be.run([(i, p) for i, p in enumerate(prompts)], chunk=3)

    timing = {}
    arrivals = {0: 0.0, 1: 0.0, 2: 0.15}
    out = be.run([(i, p) for i, p in enumerate(prompts)], chunk=3,
                 arrivals=arrivals, timing=timing)
    assert out == base                       # instrumentation is inert
    assert set(timing) == {0, 1, 2}
    for sid, ev in timing.items():
        assert ev["arrive"] <= ev["admit"] <= ev["first"] <= ev["done"]
        assert len(ev["token_times"]) == len(out[sid])
        assert ev["token_times"] == sorted(ev["token_times"])
    assert timing[2]["admit"] >= 0.15        # not admitted before arrival

    from pqcache_tpu.harness.serving import summarize
    m = summarize(timing, wall_s=1.0)
    assert m["agg_tok_s"] == 18.0            # 3 × 6 tokens / 1 s
    assert m["ttft_p95_s"] >= m["wait_p95_s"] >= 0.0
    assert "tbt_p50_ms" in m


def test_batch_chunked_admit_matches_unchunked(setup):
    """Chunked admission prefill (prefill_chunk set, non-chunk-multiple
    prefill_len → chunk_plan pads the pool P) produces the same tokens as
    the unchunked engine, and respects the max_seq_len reservation cap."""
    import dataclasses
    ecfg, params = setup
    rng = np.random.default_rng(11)
    P = 200                                 # not a multiple of the chunk
    ids = rng.integers(0, ecfg.model.vocab_size, size=P).astype(np.int32)

    ecfg_c = dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, prefill_chunk=64))
    be_c = BatchEngine(ecfg_c, params, batch_size=2, prefill_len=P,
                       max_new_tokens=6, dtype=jnp.float32)
    assert be_c._pf_chunk > 0 and be_c.P % be_c._pf_chunk == 0
    assert be_c.P <= ecfg.runtime.max_seq_len
    out = be_c.run([(0, ids)], chunk=3)[0]

    # reference: UNCHUNKED engine at the SAME padded pool length (the
    # chunk plan pads P, which changes the budget — parity is defined at
    # equal P; prompts left-pad identically in both engines)
    be_ref = BatchEngine(ecfg, params, batch_size=2, prefill_len=be_c.P,
                         max_new_tokens=6, dtype=jnp.float32)
    ref = be_ref.run([(0, ids)], chunk=3)[0]
    assert out == ref, (out, ref)

    # cap: a chunk plan that cannot fit under max_seq_len falls back to
    # unchunked at the original P instead of padding past the reservation
    ecfg_tight = dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, prefill_chunk=64,
                                          max_seq_len=P + 16))
    be_t = BatchEngine(ecfg_tight, params, batch_size=1, prefill_len=P,
                       max_new_tokens=6, dtype=jnp.float32)
    assert be_t._pf_chunk == 0 and be_t.P == P


def test_batch_original_policy_matches_single(setup):
    import dataclasses
    ecfg, params = setup
    ecfg = dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, policy="original"))
    rng = np.random.default_rng(8)
    a = rng.integers(0, ecfg.model.vocab_size, size=256).astype(np.int32)
    b = rng.integers(0, ecfg.model.vocab_size, size=200).astype(np.int32)
    ref_a = Engine(ecfg, params, dtype=jnp.float32).generate(
        a, max_new_tokens=6).tokens
    be = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                     max_new_tokens=6, dtype=jnp.float32)
    out = be.run([(0, a), (1, b)], chunk=3)
    assert out[0] == ref_a, (out[0], ref_a)
    assert len(out[1]) == 6


def test_batch_pool_shared_prefix(setup):
    """Pool-wide shared prefix: a BatchEngine built with prefix=pc must
    track the one-shot concatenated-prompt reference for each suffix
    (near-total agreement — separately compiled programs can flip a
    near-tie argmax on tiny random models), with identical tokens for the
    same suffix in different slots."""
    ecfg, params = setup
    rng = np.random.default_rng(10)
    pre = rng.integers(0, ecfg.model.vocab_size, size=192).astype(np.int32)
    sufs = [rng.integers(0, ecfg.model.vocab_size, size=64).astype(np.int32)
            for _ in range(2)]

    single = Engine(ecfg, params, dtype=jnp.float32)
    pc = single.prefill_prefix(pre)
    refs = [single.generate(np.concatenate([pre, s]),
                            max_new_tokens=6).tokens for s in sufs]

    be = BatchEngine(ecfg, params, batch_size=2, prefill_len=256,
                     max_new_tokens=6, dtype=jnp.float32, prefix=pc)
    out = be.run([(i, s) for i, s in enumerate(sufs)], chunk=3)
    for i in range(2):
        agree = sum(a == b for a, b in zip(out[i], refs[i]))
        assert agree >= 4, (i, out[i], refs[i])
    # same suffix in both slots → identical tokens (slot independence)
    dup = be.run([(7, sufs[0]), (8, sufs[0])], chunk=3)
    assert dup[7] == dup[8]

    with pytest.raises(ValueError, match="suffix capacity"):
        be.run([(9, rng.integers(0, ecfg.model.vocab_size, size=100)
                 .astype(np.int32))], chunk=3)


def test_interleaved_admission_matches_monolithic(setup):
    """INTERLEAVED admission (one prefill slab per decode chunk — the
    tail-latency fix) produces exactly the monolithic path's tokens, under
    load: slot 0 decodes while slots fill via slab-wise admissions."""
    import dataclasses
    ecfg, params = setup
    rng = np.random.default_rng(13)
    P = 256
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=P - 13 * i)
               .astype(np.int32) for i in range(4)]
    ecfg_c = dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, prefill_chunk=64))

    be_i = BatchEngine(ecfg_c, params, batch_size=2, prefill_len=P,
                       max_new_tokens=8, dtype=jnp.float32)
    assert be_i.interleave
    timing = {}
    out_i = be_i.run([(i, p) for i, p in enumerate(prompts)], chunk=3,
                     timing=timing)

    be_m = BatchEngine(ecfg_c, params, batch_size=2, prefill_len=P,
                       max_new_tokens=8, dtype=jnp.float32,
                       interleave="off")   # monolithic chunked prefill
    assert not be_m.interleave
    out_m = be_m.run([(i, p) for i, p in enumerate(prompts)], chunk=3)

    assert set(out_i) == set(out_m) == {0, 1, 2, 3}
    for i in range(4):
        assert out_i[i] == out_m[i], (i, out_i[i], out_m[i])
    for sid, ev in timing.items():
        assert ev["arrive"] <= ev["admit"] <= ev["first"] <= ev["done"]
        assert len(ev["token_times"]) == len(out_i[sid])


def test_spf_admission_orders_short_first(setup):
    """admission="spf": among ARRIVED queued requests, the shortest prompt
    admits first (burst of one long + one short behind a full pool), and
    a not-yet-arrived FIFO head does not block an arrived request."""
    ecfg, params = setup
    rng = np.random.default_rng(11)
    long_p = rng.integers(0, ecfg.model.vocab_size, size=256).astype(np.int32)
    short_p = rng.integers(0, ecfg.model.vocab_size, size=64).astype(np.int32)
    be = BatchEngine(ecfg, params, batch_size=1, prefill_len=256,
                     max_new_tokens=6, dtype=jnp.float32)
    # queue order: filler, long, short — all arrive at t=0; pool of 1
    timing = {}
    out = be.run([(0, long_p), (1, long_p), (2, short_p)], chunk=3,
                 timing=timing, admission="spf")
    assert set(out) == {0, 1, 2}
    # after the filler, the SHORT request must admit before the long one
    assert timing[2]["admit"] < timing[1]["admit"]

    # fifo + late head: head arrives last, others at 0 — arrived requests
    # admit first (no head-of-line block on a future arrival)
    timing = {}
    out = be.run([(0, long_p), (1, short_p), (2, short_p)], chunk=3,
                 arrivals={0: 1.5, 1: 0.0, 2: 0.0},
                 timing=timing, admission="fifo")
    assert set(out) == {0, 1, 2}
    assert timing[1]["admit"] < timing[0]["admit"]
    assert timing[2]["admit"] < timing[0]["admit"]


def test_weight_int8_interleaved_admission(setup):
    """W8 params through the INTERLEAVED slab admission (_slab_fn →
    prefill_chunk_step): the int8 embedding table must dequantize before
    entering the scan carry (the serving --weight-int8 arm failed with an
    int8 hidden carry when a slab program took embedding rows directly).
    Accuracy twin: the same quantized params through the monolithic path
    must produce identical tokens."""
    import dataclasses
    from pqcache_tpu.core import quant
    ecfg, params = setup
    p8 = quant.quantize_weight_tree(params)
    assert p8["embed"].dtype == jnp.int8
    rng = np.random.default_rng(17)
    P = 256
    prompts = [rng.integers(0, ecfg.model.vocab_size, size=P - 11 * i)
               .astype(np.int32) for i in range(3)]
    ecfg_c = dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, prefill_chunk=64))

    be_i = BatchEngine(ecfg_c, p8, batch_size=2, prefill_len=P,
                       max_new_tokens=6, dtype=jnp.float32)
    assert be_i.interleave
    out_i = be_i.run([(i, p) for i, p in enumerate(prompts)], chunk=3)

    be_m = BatchEngine(ecfg_c, p8, batch_size=2, prefill_len=P,
                       max_new_tokens=6, dtype=jnp.float32,
                       interleave="off")
    out_m = be_m.run([(i, p) for i, p in enumerate(prompts)], chunk=3)
    assert set(out_i) == set(out_m) == {0, 1, 2}
    for i in range(3):
        assert out_i[i] == out_m[i], (i, out_i[i], out_m[i])
