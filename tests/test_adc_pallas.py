"""Pallas ADC kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.ops.adc_pallas import (adc_scores_pallas,
                                        adc_scores_pallas_v2, adc_scores_xla)


@pytest.mark.parametrize("T,block_t", [(256, 128), (300, 128), (1024, 512)])
def test_matches_xla(T, block_t):
    rng = np.random.default_rng(0)
    H_kv, g, S, C = 2, 4, 2, 64
    lut = jnp.asarray(rng.normal(size=(H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(H_kv, S, T)), jnp.int8)
    ref = adc_scores_xla(lut, codes)
    out = adc_scores_pallas(lut, codes, block_t=block_t, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("T,block_t", [(256, 128), (300, 128), (1024, 512)])
def test_v2_matches_xla(T, block_t):
    rng = np.random.default_rng(3)
    H_kv, g, S, C = 2, 4, 2, 64
    lut = jnp.asarray(rng.normal(size=(H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(H_kv, S, T)), jnp.int8)
    ref = adc_scores_xla(lut, codes)
    out = adc_scores_pallas_v2(lut, codes, block_t=block_t, interpret=True)
    # v2 uses bf16 LUT/onehot operands on the MXU: ~2-3 decimal digits
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.02, atol=0.02)


def test_v2_vmap_batches_in_grid():
    rng = np.random.default_rng(9)
    B, H_kv, g, S, C, T = 3, 2, 2, 2, 16, 256
    lut = jnp.asarray(rng.normal(size=(B, H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(B, H_kv, S, T)), jnp.int8)
    out = jax.vmap(lambda l, c: adc_scores_pallas_v2(l, c, interpret=True))(
        lut, codes)
    for b in range(B):
        ref = adc_scores_xla(lut[b], codes[b])
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=0.02, atol=0.02)


def test_single_subvec():
    rng = np.random.default_rng(1)
    H_kv, g, S, C, T = 1, 2, 1, 16, 128
    lut = jnp.asarray(rng.normal(size=(H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(H_kv, S, T)), jnp.int8)
    ref = adc_scores_xla(lut, codes)
    out = adc_scores_pallas(lut, codes, block_t=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def _block_mass_xla(lut, codes, n_cand, sel_block, head_dim):
    """Reference chain: ADC scores → masked softmax → per-block sums."""
    H_kv, g, S, C = lut.shape
    T = codes.shape[-1]
    scores = adc_scores_xla(lut, codes).reshape(H_kv * g, T)
    tok = jnp.arange(T, dtype=jnp.int32)[None, :]
    masked = jnp.where(tok < n_cand, scores / jnp.sqrt(float(head_dim)),
                       -jnp.inf)
    probs = jax.nn.softmax(masked, axis=-1)
    probs = jnp.where(tok < n_cand, probs, 0.0)
    return jnp.sum(probs.reshape(H_kv * g, T // sel_block, sel_block),
                   axis=-1)


@pytest.mark.parametrize("T,n_cand,sel_block", [(2048, 2048, 128),
                                                (2048, 1500, 128),
                                                (4096, 3000, 256),
                                                (2048, 100, 128)])
def test_fused_block_scores(T, n_cand, sel_block):
    from pqcache_tpu.ops.adc_pallas import adc_block_scores_pallas
    rng = np.random.default_rng(11)
    H_kv, g, S, C, D = 2, 4, 2, 64, 128
    lut = jnp.asarray(rng.normal(size=(H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(H_kv, S, T)), jnp.int8)
    ref = _block_mass_xla(lut, codes, n_cand, sel_block, D)
    out = adc_block_scores_pallas(
        lut, codes, jnp.asarray(n_cand), sel_block=sel_block, head_dim=D,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=5e-4)


def test_fused_block_scores_batched_per_slot_counts():
    from pqcache_tpu.ops.adc_pallas import adc_block_scores_pallas_batched
    rng = np.random.default_rng(12)
    B, H_kv, g, S, C, T, D = 3, 2, 2, 2, 64, 2048, 128
    lut = jnp.asarray(rng.normal(size=(B, H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(B, H_kv, S, T)), jnp.int8)
    n_cand = jnp.asarray([2048, 700, 1], jnp.int32)
    out = adc_block_scores_pallas_batched(
        lut, codes, n_cand, sel_block=128, head_dim=D, interpret=True)
    for b in range(B):
        ref = _block_mass_xla(lut[b], codes[b], int(n_cand[b]), 128, D)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=0.05, atol=5e-4)


def test_topk_from_block_mass_matches_mips_topk_blocks():
    from pqcache_tpu.core import pq as pqcore
    rng = np.random.default_rng(13)
    H_kv, g, S, C, T, D = 2, 4, 2, 64, 2048, 128
    H = H_kv * g
    lut = jnp.asarray(rng.normal(size=(H_kv, g, S, C)), jnp.float32)
    codes = jnp.asarray(rng.integers(0, C, size=(H_kv, S, T)), jnp.int8)
    n_cand = 1800
    scores = adc_scores_xla(lut, codes).reshape(H, T)
    blk_ref, _ = pqcore.mips_topk_blocks(
        scores, jnp.asarray(n_cand), 512, group=g, head_dim=D, block=128,
        approx=False)
    mass = _block_mass_xla(lut, codes, n_cand, 128, D)
    blk_new = pqcore.topk_from_block_mass(
        mass, jnp.asarray(n_cand), 512, group=g, block=128, approx=False)
    assert np.array_equal(np.sort(np.asarray(blk_ref), -1),
                          np.sort(np.asarray(blk_new), -1))
