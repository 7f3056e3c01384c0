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
