"""DMA gather kernel vs XLA reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.ops.gather_pallas import gather_rows, gather_rows_xla


@pytest.mark.parametrize("H,T,K,rb", [(2, 512, 64, 32), (4, 304, 50, 16),
                                      (1, 128, 128, 128)])
def test_matches_xla(H, T, K, rb):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(H, T, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(H, K)).astype(np.int32))
    ref = gather_rows_xla(src, idx)
    out = gather_rows(src, idx, rows_per_block=rb, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_head_offset_selects_layer():
    rng = np.random.default_rng(2)
    LH, T, D = 6, 128, 128   # e.g. 3 layers x 2 heads stacked
    src = jnp.asarray(rng.normal(size=(LH, T, D)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, size=(2, 24)).astype(np.int32))
    out = gather_rows(src, idx, jnp.asarray(4, jnp.int32),
                      rows_per_block=8, interpret=True)
    ref = gather_rows_xla(src[4:6], idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bf16():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 256, size=(2, 40)).astype(np.int32))
    out = gather_rows(src, idx, rows_per_block=8, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(gather_rows_xla(src, idx), np.float32))
