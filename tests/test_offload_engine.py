"""Offload-tier engine vs the HBM-resident pq_search engine.

Same algorithm, different memory hierarchy ("same math, no hierarchy" —
the reference's accuracy-twin methodology, cache_manager.py:279-297): both
engines must select the same tokens and generate (near-)identical text.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine
from pqcache_tpu.runtime.offload_engine import OffloadEngine


@pytest.fixture(scope="module")
def setup():
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg_m.vocab_size, size=260).astype(np.int32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024),
    )
    return ecfg, params, ids


def test_offload_matches_hbm_engine(setup):
    # v3 fetches at BLOCK granularity (pinned leaves); the accuracy twin is
    # the HBM engine with the SAME select_block — identical block ranking
    # (pq.mips_topk_blocks), different memory hierarchy.
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 32
    ecfg_blk = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(block_size=bs, hbm_cache_tokens=128,
                          cache_topk_blocks=4))
    hbm = Engine(ecfg_blk, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=10)
    off_eng = OffloadEngine(ecfg_blk, params, dtype=jnp.float32)
    off = off_eng.generate(ids, max_new_tokens=10)
    agree = sum(a == b for a, b in zip(hbm.tokens, off))
    assert agree >= 8, (hbm.tokens, off)
    # the LFU block cache must have absorbed repeat traffic
    assert off_eng.store.hits > 0


def test_engine_offload_flag_routes_to_tier(setup):
    # CacheConfig.offload=True must be reachable through the standard
    # Engine (and thus the longbench CLI --offload flag)
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    ecfg_off = dataclasses.replace(
        ecfg, cache=CacheConfig(offload=True, block_size=32,
                                hbm_cache_tokens=128, cache_topk_blocks=4))
    hbm = Engine(ecfg, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=8)
    off = Engine(ecfg_off, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=8)
    assert off.policy_name == "pq_search_offload"
    agree = sum(a == b for a, b in zip(hbm.tokens, off.tokens))
    assert agree >= 6, (hbm.tokens, off.tokens)


def test_chunked_prefill_matches_full(setup):
    """Chunked (activation-bounded) prefill must reproduce the single-shot
    prefill: same codebooks/state (the tail pass is shared code), same
    attention math (flash q_offset chunks vs the square kernel). Token
    agreement with the full-prefill engine over 10 greedy steps."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 32
    base = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(block_size=bs, hbm_cache_tokens=128,
                          cache_topk_blocks=4))
    full = OffloadEngine(base, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=10)
    chunked_cfg = dataclasses.replace(
        base, runtime=dataclasses.replace(base.runtime, prefill_chunk=64))
    eng = OffloadEngine(chunked_cfg, params, dtype=jnp.float32)
    chunked = eng.generate(ids, max_new_tokens=10)
    assert chunked[0] == full[0], (chunked, full)
    agree = sum(a == b for a, b in zip(full, chunked))
    assert agree >= 8, (full, chunked)


def test_offload_sampling_reproducible(setup):
    """Stochastic decoding through the offload tier: same seed → same
    tokens; greedy (temperature 0) is unchanged by the sampler wiring."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 32
    base = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(block_size=bs, hbm_cache_tokens=128,
                          cache_topk_blocks=4))
    greedy_ref = OffloadEngine(base, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=6)

    samp = dataclasses.replace(base, runtime=dataclasses.replace(
        base.runtime, temperature=1.0, sample_seed=3))
    a = OffloadEngine(samp, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=6)
    b = OffloadEngine(samp, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=6)
    assert a == b and len(a) == 6
    g2 = OffloadEngine(base, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=6)
    assert g2 == greedy_ref


def test_offload_respects_max_seq_len(setup):
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    cfg = dataclasses.replace(
        ecfg,
        pq=dataclasses.replace(ecfg.pq, select_block=32),
        cache=CacheConfig(block_size=32, hbm_cache_tokens=128,
                          cache_topk_blocks=4),
        runtime=dataclasses.replace(ecfg.runtime, max_seq_len=128))
    with pytest.raises(ValueError, match="max_seq_len"):
        OffloadEngine(cfg, params, dtype=jnp.float32).generate(
            ids, max_new_tokens=4)   # 260-token prompt > 128 cap


def test_offload_int8_store_matches_bf16_tier(setup):
    """int8 offload tier (VERDICT r4 item 4): host leaves / HBM cache /
    device tail all carry int8 rows; teacher-forced decode agrees with the
    bf16 tier and the store's buffers actually hold int8."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 32
    base = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(block_size=bs, hbm_cache_tokens=128,
                          cache_topk_blocks=4))
    e8 = dataclasses.replace(
        base, cache=dataclasses.replace(base.cache, kv_dtype="int8"))

    ref = OffloadEngine(base, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=12)
    eng8 = OffloadEngine(e8, params, dtype=jnp.float32)
    got = eng8.generate(ids, max_new_tokens=12)
    agree = sum(a == b for a, b in zip(ref, got))
    assert agree >= 10, (ref, got)

    st = eng8.store
    assert st.dtype == jnp.int8
    leaf = next(iter(st.kv_blocks[0].values()))
    assert leaf.dtype == jnp.int8
    assert st.cache_kv[0].dtype == jnp.int8
    assert st.tail[0].dtype == jnp.int8
    # halved bytes per leaf vs the bf16 tier's
    assert leaf.nbytes == leaf.size


def test_offload_int8_jhist_and_long_run(setup):
    """int8 + jhist scorer through enough decode steps to cross a block
    boundary (tail flush → pinned int8 leaf → re-fetch)."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 16
    e8 = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(block_size=bs, hbm_cache_tokens=64,
                          cache_topk_blocks=4, kv_dtype="int8"),
        runtime=dataclasses.replace(ecfg.runtime, max_new_tokens=40))
    eng = OffloadEngine(e8, params, dtype=jnp.float32)
    assert eng.use_jhist
    out = eng.generate(ids, max_new_tokens=36)
    assert len(out) == 36
    # generated tokens crossed at least one block boundary into the store
    assert eng.store.valid[0] > 0


def test_stale_select_equals_exact_when_topk_covers_all(setup):
    """One-step-stale selection (cache.stale_select): when the block top-k
    covers EVERY valid candidate block, the selected set is query-
    independent, so stale and exact modes must generate identical tokens
    (the mechanics differ: one blocking sync per step vs 2 per layer)."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 16
    # compress 1.5 => kb blocks always exceed the valid candidate blocks
    ecfg_cov = dataclasses.replace(
        ecfg,
        pq=dataclasses.replace(ecfg.pq, select_block=bs),
        budget=BudgetConfig(compress_ratio=1.5, recent_ratio=0.2,
                            sink_size=4),
        cache=CacheConfig(offload=True, block_size=bs, hbm_cache_tokens=64,
                          cache_topk_blocks=4))
    exact = OffloadEngine(ecfg_cov, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=12)
    cfg_stale = dataclasses.replace(
        ecfg_cov, cache=dataclasses.replace(ecfg_cov.cache,
                                            stale_select=True))
    eng = OffloadEngine(cfg_stale, params, dtype=jnp.float32)
    stale = eng.generate(ids, max_new_tokens=12)
    assert stale == exact, (stale, exact)


def test_stale_select_smoke_normal_budget(setup):
    """Stale mode at a normal budget: tokens may diverge from exact after
    the seeded first step, but the run must complete, agree early, and
    keep the cache accounting live."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    ecfg, params, ids = setup
    bs = 16
    base = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bs),
        cache=CacheConfig(offload=True, block_size=bs, hbm_cache_tokens=96,
                          cache_topk_blocks=4))
    exact = OffloadEngine(base, params, dtype=jnp.float32).generate(
        ids, max_new_tokens=10)
    eng = OffloadEngine(
        dataclasses.replace(base, cache=dataclasses.replace(
            base.cache, stale_select=True)), params, dtype=jnp.float32)
    stale = eng.generate(ids, max_new_tokens=10)
    assert len(stale) == len(exact)
    # step 0 is exact-seeded; step 1 attends step-0 selections — the first
    # two tokens cannot diverge (token 0 comes from prefill logits)
    assert stale[:2] == exact[:2]
    assert eng.store.hits + eng.store.misses > 0
