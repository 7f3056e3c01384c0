"""Retrieval-quality oracle: PQ top-k recall vs exact attention top-k.

The reference gates quality on this continuously via CHECK_RECALL
(pq_search.py:324-328, retrieval_based_compressor.py:19-52). Here it runs as
a real test: train codebooks on realistic key distributions, score with the
full ADC pipeline, and require recall comparable to the paper's operating
point (SUBVEC=2, 64 centroids, 1/5 budget → recall high enough to preserve
LongBench quality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.core import pq


def _make_keys(rng, H_kv, T, D, n_modes=32):
    """Keys drawn from a mixture (attention keys are clustered in practice)."""
    modes = rng.normal(size=(H_kv, n_modes, D)).astype(np.float32) * 2.0
    which = rng.integers(0, n_modes, size=(H_kv, T))
    noise = rng.normal(size=(H_kv, T, D)).astype(np.float32) * 0.7
    return np.take_along_axis(modes, which[..., None], axis=1) + noise


@pytest.mark.parametrize("metric", ["euc", "ip"])
def test_pq_recall_at_paper_operating_point(metric):
    rng = np.random.default_rng(0)
    H_kv, group, T, D, S, C = 2, 2, 2048, 128, 2, 64
    H = H_kv * group
    d_sub = D // S
    keys = _make_keys(rng, H_kv, T, D)
    queries = rng.normal(size=(H, D)).astype(np.float32)

    xb = (keys.reshape(H_kv, T, S, d_sub).transpose(0, 2, 1, 3)
          .reshape(H_kv * S, T, d_sub))
    xb_j = jnp.asarray(xb)
    if metric == "ip":
        xb_lift, phi = pq.ip2l2_lift(xb_j)
        res = pq.kmeans(xb_lift, C, iters=12, seed=0)
    else:
        res = pq.kmeans(xb_j, C, iters=12, seed=0)
    centroids = res.centroids.reshape(H_kv, S, C, -1)
    codes = res.codes.reshape(H_kv, S, T)

    k = T // 5  # the paper's 1/5 budget
    q_sub = jnp.asarray(queries.reshape(H, S, d_sub))
    if metric == "euc":
        lut = pq.adc_lut_euc(q_sub, centroids)
    else:
        lut = pq.adc_lut_ip(pq.lift_query(q_sub), centroids)
    scores = pq.adc_gather_scores(lut, codes)
    idx, _ = pq.mips_topk(scores, jnp.asarray(T), k, group=group,
                          head_dim=D, metric=metric)
    exact = pq.exact_topk(jnp.asarray(queries), jnp.asarray(keys),
                          jnp.asarray(T), k, group=group)
    r = float(pq.topk_recall(idx, exact, group=group))

    # The per-q-head oracle is not reachable by ANY shared per-kv-head
    # selection: GQA group reduction caps recall. Compare against that
    # ceiling (exact scores through the same reduction).
    ex_scores = jnp.asarray(
        np.einsum("hd,htd->ht", queries, np.repeat(keys, group, axis=0)))
    ceil_metric = "euc"  # exact logits always rank by inner product
    ceil_idx, _ = pq.mips_topk(ex_scores, jnp.asarray(T), k, group=group,
                               head_dim=D, metric=ceil_metric)
    ceiling = float(pq.topk_recall(ceil_idx, exact, group=group))
    assert r > 0.8 * ceiling, f"{metric}: recall {r} vs ceiling {ceiling}"
    assert r > 0.4, f"{metric} absolute recall {r}"


def test_block_selection_recall_at_scale():
    """Block-granular selection (select_block=16) at realistic proportions.

    Block selection relies on temporal locality of key importance (adjacent
    tokens score similarly — the property Quest/InfLLM exploit and the
    reference's own block cache assumes, cache_manager.py:119-123). On
    locality-FREE random keys it roughly halves recall; this test models
    the realistic regime with block-correlated keys and requires block
    recall within 85% of token-granular recall there.
    """
    rng = np.random.default_rng(2)
    H_kv, group, T, D, S, C = 2, 2, 4096, 128, 2, 64
    H = H_kv * group
    d_sub = D // S
    # block-correlated mixture: the mode changes every 16 tokens
    n_modes = 32
    modes = rng.normal(size=(H_kv, n_modes, D)).astype(np.float32) * 2.0
    which_blocks = rng.integers(0, n_modes, size=(H_kv, T // 16))
    which = np.repeat(which_blocks, 16, axis=1)
    noise = rng.normal(size=(H_kv, T, D)).astype(np.float32) * 0.7
    keys = np.take_along_axis(modes, which[..., None], axis=1) + noise
    queries = rng.normal(size=(H, D)).astype(np.float32)
    xb = (keys.reshape(H_kv, T, S, d_sub).transpose(0, 2, 1, 3)
          .reshape(H_kv * S, T, d_sub))
    res = pq.kmeans(jnp.asarray(xb), C, iters=12, seed=0)
    cent = res.centroids.reshape(H_kv, S, C, -1)
    codes = res.codes.reshape(H_kv, S, T)
    lut = pq.adc_lut_euc(jnp.asarray(queries.reshape(H, S, d_sub)), cent)
    scores = pq.adc_gather_scores(lut, codes)

    k = T // 5
    tok_idx, _ = pq.mips_topk(scores, jnp.asarray(T), k, group=group,
                              head_dim=D, metric="euc")
    blk_idx, _ = pq.mips_topk_blocks(scores, jnp.asarray(T), k, group=group,
                                     head_dim=D, block=16, metric="euc",
                                     approx=False)
    blk_tokens = (np.asarray(blk_idx)[:, :, None] * 16
                  + np.arange(16)[None, None, :]).reshape(H_kv, -1)
    exact = pq.exact_topk(jnp.asarray(queries), jnp.asarray(keys),
                          jnp.asarray(T), k, group=group)
    r_tok = float(pq.topk_recall(tok_idx, exact, group=group))
    r_blk = float(pq.topk_recall(jnp.asarray(blk_tokens[:, :k]), exact,
                                 group=group))
    assert r_blk > 0.85 * r_tok, (r_tok, r_blk)


def test_recall_improves_with_subvectors():
    """More subvectors → finer quantization → better recall (sanity that the
    ADC pipeline responds to its key knob)."""
    rng = np.random.default_rng(1)
    H_kv, group, T, D, C = 1, 1, 1024, 128, 16
    keys = _make_keys(rng, H_kv, T, D)
    queries = rng.normal(size=(1, D)).astype(np.float32)
    k = T // 5

    def recall_for(S):
        d_sub = D // S
        xb = (keys.reshape(H_kv, T, S, d_sub).transpose(0, 2, 1, 3)
              .reshape(H_kv * S, T, d_sub))
        res = pq.kmeans(jnp.asarray(xb), C, iters=10, seed=0)
        cent = res.centroids.reshape(H_kv, S, C, -1)
        codes = res.codes.reshape(H_kv, S, T)
        lut = pq.adc_lut_euc(jnp.asarray(queries.reshape(1, S, d_sub)), cent)
        scores = pq.adc_gather_scores(lut, codes)
        idx, _ = pq.mips_topk(scores, jnp.asarray(T), k, group=1,
                              head_dim=D, metric="euc")
        exact = pq.exact_topk(jnp.asarray(queries), jnp.asarray(keys),
                              jnp.asarray(T), k, group=1)
        return float(pq.topk_recall(idx, exact, group=1))

    r2, r8 = recall_for(2), recall_for(8)
    assert r8 > r2 - 0.05, (r2, r8)
    assert r8 > 0.5


def test_recall_at_32k_scale_and_iters_choice():
    """Recall at the paper's REAL operating scale (T=32k candidates) and
    validation of the adaptive-iters heuristic (policies/pq_search.py:
    iters = 3 + P//4096 capped at 25 → 11 at 32k): the chosen iteration
    count must recover ≥97% of a 3×-longer run's recall (VERDICT r01 #6)."""
    rng = np.random.default_rng(7)
    H_kv, group, T, D, S, C = 1, 4, 32768, 128, 2, 64
    H = H_kv * group
    d_sub = D // S
    keys = _make_keys(rng, H_kv, T, D, n_modes=128)
    queries = rng.normal(size=(H, D)).astype(np.float32)
    xb = (keys.reshape(H_kv, T, S, d_sub).transpose(0, 2, 1, 3)
          .reshape(H_kv * S, T, d_sub))
    xb_j = jnp.asarray(xb)
    k = T // 5
    exact = pq.exact_topk(jnp.asarray(queries), jnp.asarray(keys),
                          jnp.asarray(T), k, group=group)
    ex_scores = jnp.asarray(
        np.einsum("hd,htd->ht", queries, np.repeat(keys, group, axis=0)))
    ceil_idx, _ = pq.mips_topk(ex_scores, jnp.asarray(T), k, group=group,
                               head_dim=D, metric="euc")
    ceiling = float(pq.topk_recall(ceil_idx, exact, group=group))

    def recall_for(iters):
        res = pq.kmeans(xb_j, C, iters=iters, seed=0)
        cent = res.centroids.reshape(H_kv, S, C, -1)
        codes = res.codes.reshape(H_kv, S, T)
        lut = pq.adc_lut_euc(jnp.asarray(queries.reshape(H, S, d_sub)), cent)
        scores = pq.adc_gather_scores(lut, codes)
        idx, _ = pq.mips_topk(scores, jnp.asarray(T), k, group=group,
                              head_dim=D, metric="euc")
        return float(pq.topk_recall(idx, exact, group=group))

    r_adaptive = recall_for(11)   # the heuristic's pick at P=32k
    r_long = recall_for(33)       # 3× budget
    assert r_adaptive > 0.75 * ceiling, (r_adaptive, ceiling)
    assert r_adaptive >= 0.97 * r_long, (r_adaptive, r_long)


@pytest.mark.parametrize("locality", [128, 256])
def test_block_granularity_128_vs_256_at_32k(locality):
    """Retrieval-granularity/recall tradeoff at the bench operating point
    (T=32k, 1/10 topk budget), pinning the docs' claim about
    BENCH_PQ_BLOCK: select_block=256 is the fastest measured DMA
    granularity (PARITY round-2 table) but selecting 256-token blocks
    against a token-denominated budget halves the number of selected
    regions — when key-importance locality is FINER than the block
    (mode changes every 128 tokens), 256 measurably loses recall
    (measured 0.18 vs 0.31), so 128 stays the quality-safe default
    (cache_manager.py:119-123's granularity); when locality is ≥ the
    block (mode changes every 256), the two are equivalent."""
    rng = np.random.default_rng(11)
    H_kv, group, T, D, S, C = 1, 4, 32768, 128, 2, 64
    H = H_kv * group
    d_sub = D // S
    n_modes = 128
    modes = rng.normal(size=(H_kv, n_modes, D)).astype(np.float32) * 2.0
    which_blocks = rng.integers(0, n_modes, size=(H_kv, T // locality))
    which = np.repeat(which_blocks, locality, axis=1)
    noise = rng.normal(size=(H_kv, T, D)).astype(np.float32) * 0.7
    keys = np.take_along_axis(modes, which[..., None], axis=1) + noise
    queries = rng.normal(size=(H, D)).astype(np.float32)
    xb = (keys.reshape(H_kv, T, S, d_sub).transpose(0, 2, 1, 3)
          .reshape(H_kv * S, T, d_sub))
    res = pq.kmeans(jnp.asarray(xb), C, iters=11, seed=0)
    cent = res.centroids.reshape(H_kv, S, C, -1)
    codes = res.codes.reshape(H_kv, S, T)
    lut = pq.adc_lut_euc(jnp.asarray(queries.reshape(H, S, d_sub)), cent)
    scores = pq.adc_gather_scores(lut, codes)
    k = T // 10
    exact = pq.exact_topk(jnp.asarray(queries), jnp.asarray(keys),
                          jnp.asarray(T), k, group=group)

    def block_recall(bs):
        blk_idx, _ = pq.mips_topk_blocks(
            scores, jnp.asarray(T), k, group=group, head_dim=D, block=bs,
            metric="euc", approx=True)
        toks = (np.asarray(blk_idx)[:, :, None] * bs
                + np.arange(bs)[None, None, :]).reshape(H_kv, -1)
        return float(pq.topk_recall(jnp.asarray(toks[:, :k]), exact,
                                    group=group))

    r128, r256 = block_recall(128), block_recall(256)
    if locality >= 256:
        assert r256 > 0.9 * r128, (r128, r256)
    else:
        assert r128 > 1.2 * r256, (r128, r256)  # finer block wins clearly
    assert r128 > 0.25, r128
