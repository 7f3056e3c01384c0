"""Unit tests for the pure PQ math (core/pq.py) and budget arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.config import BudgetConfig
from pqcache_tpu.core.budget import compute_budget, pq_is_applicable
from pqcache_tpu.core import pq


class TestBudget:
    def test_reference_arithmetic(self):
        # pq_search.py:235-237 with the reference mistral defaults
        cfg = BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=32)
        b = compute_budget(cfg, prefill_len=4096, max_new_tokens=64)
        n = 4096 - 32
        assert b.local == int(n * 0.2 * 0.5)
        assert b.topk == int(n * 0.2 * 0.5)
        assert b.attn_window == b.sink + b.local + b.topk + 1
        assert b.n_cand_init == 4096 - 32 - b.local
        assert pq_is_applicable(b, 64)

    def test_tiny_prompt_not_applicable(self):
        cfg = BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=32)
        b = compute_budget(cfg, prefill_len=64, max_new_tokens=4)
        assert not pq_is_applicable(b, 64)


class TestKMeans:
    def test_recovers_separated_clusters(self):
        rng = np.random.default_rng(0)
        G, C, d, per = 4, 8, 16, 64
        centers = rng.normal(size=(G, C, d)) * 10.0
        pts = (centers[:, :, None, :]
               + rng.normal(size=(G, C, per, d))).reshape(G, C * per, d)
        order = rng.permutation(C * per)
        pts = pts[:, order]
        res = pq.kmeans(jnp.asarray(pts, jnp.float32), C, iters=20, seed=0)
        # every point should sit within ~d of its centroid (clusters sep ~10)
        assigned = np.take_along_axis(
            np.asarray(res.centroids), np.asarray(res.codes)[..., None], axis=1)
        err = np.linalg.norm(np.asarray(pts) - assigned, axis=-1)
        assert float(err.mean()) < 2.0 * np.sqrt(d)

    def test_valid_len_masks_padding(self):
        rng = np.random.default_rng(1)
        G, C, d, n = 2, 4, 8, 256
        x = rng.normal(size=(G, n, d)).astype(np.float32)
        x_pad = np.concatenate([x, np.full((G, 128, d), 1e6, np.float32)], axis=1)
        res = pq.kmeans(jnp.asarray(x_pad), C, iters=10, seed=0,
                        valid_len=jnp.asarray(n))
        # no centroid should be dragged to the 1e6 padding region
        assert float(np.abs(np.asarray(res.centroids)).max()) < 100.0

    def test_encode_matches_nearest(self):
        rng = np.random.default_rng(2)
        G, C, d, m = 3, 16, 8, 32
        cent = jnp.asarray(rng.normal(size=(G, C, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(G, m, d)), jnp.float32)
        codes = pq.pq_encode(x, cent)
        dist = np.linalg.norm(
            np.asarray(x)[:, :, None] - np.asarray(cent)[:, None], axis=-1)
        np.testing.assert_array_equal(np.asarray(codes), dist.argmin(-1))


class TestADC:
    def _setup(self, seed=3, H=8, H_kv=2, S=2, d_sub=8, T=128, C=16):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(H, S, d_sub)).astype(np.float32)
        cent = rng.normal(size=(H_kv, S, C, d_sub)).astype(np.float32)
        codes = rng.integers(0, C, size=(H_kv, S, T)).astype(np.int32)
        return q, cent, codes

    def test_gather_scores_match_naive(self):
        q, cent, codes = self._setup()
        H, S, _ = q.shape
        H_kv, _, C, _ = cent.shape
        T = codes.shape[-1]
        group = H // H_kv
        lut = pq.adc_lut_euc(jnp.asarray(q), jnp.asarray(cent))
        scores = pq.adc_gather_scores(lut, jnp.asarray(codes))
        ref = np.zeros((H, T))
        for h in range(H):
            for t in range(T):
                for s in range(S):
                    ref[h, t] += q[h, s] @ cent[h // group, s, codes[h // group, s, t]]
        np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-5)

    def test_adc_approximates_exact_ip(self):
        # When keys are exactly their centroids the ADC euc score equals q·k.
        rng = np.random.default_rng(4)
        H, H_kv, S, d_sub, C, T = 4, 2, 2, 8, 8, 64
        cent = rng.normal(size=(H_kv, S, C, d_sub)).astype(np.float32)
        codes = rng.integers(0, C, size=(H_kv, S, T)).astype(np.int32)
        keys = np.concatenate(
            [np.take_along_axis(cent[:, s], codes[:, s, :, None], axis=1)
             for s in range(S)], axis=-1)  # [H_kv, T, S*d_sub]
        q = rng.normal(size=(H, S, d_sub)).astype(np.float32)
        lut = pq.adc_lut_euc(jnp.asarray(q), jnp.asarray(cent))
        scores = pq.adc_gather_scores(lut, jnp.asarray(codes))
        q_flat = q.reshape(H, S * d_sub)
        group = H // H_kv
        exact = np.einsum("hd,htd->ht", q_flat, np.repeat(keys, group, axis=0))
        np.testing.assert_allclose(np.asarray(scores), exact, rtol=1e-4)

    def test_ip_metric_ranks_by_inner_product(self):
        # ip2l2 lift: smallest lifted L2 distance == largest inner product.
        rng = np.random.default_rng(5)
        G, n, d = 2, 64, 8
        xb = jnp.asarray(rng.normal(size=(G, n, d)), jnp.float32)
        lifted, phi = pq.ip2l2_lift(xb)
        q = jnp.asarray(rng.normal(size=(G, d)), jnp.float32)
        q_l = pq.lift_query(q)
        dist = jnp.sum((q_l[:, None, :] - lifted) ** 2, axis=-1)
        ip = jnp.einsum("gd,gnd->gn", q, xb)
        for g in range(G):
            np.testing.assert_array_equal(
                np.argsort(np.asarray(dist[g])), np.argsort(-np.asarray(ip[g])))

    def test_mips_topk_masks_invalid(self):
        scores = jnp.asarray(np.arange(32, dtype=np.float32)[None].repeat(4, 0))
        idx, _ = pq.mips_topk(scores, jnp.asarray(10), 4, group=2,
                              head_dim=16, metric="euc")
        assert np.asarray(idx).max() < 10

    def test_recall_oracle_perfect_codes(self):
        # With keys == their reconstruction, PQ top-k ≈ exact ip top-k.
        rng = np.random.default_rng(6)
        H, H_kv, S, d_sub, C, T = 4, 2, 2, 16, 32, 256
        group = H // H_kv
        cent = rng.normal(size=(H_kv, S, C, d_sub)).astype(np.float32) * 3
        codes = rng.integers(0, C, size=(H_kv, S, T)).astype(np.int32)
        keys = np.concatenate(
            [np.take_along_axis(cent[:, s], codes[:, s, :, None], axis=1)
             for s in range(S)], axis=-1)
        q = rng.normal(size=(H, S * d_sub)).astype(np.float32)
        lut = pq.adc_lut_euc(
            jnp.asarray(q.reshape(H, S, d_sub)), jnp.asarray(cent))
        scores = pq.adc_gather_scores(lut, jnp.asarray(codes))
        k = 32
        pq_idx, _ = pq.mips_topk(scores, jnp.asarray(T), k, group=group,
                                 head_dim=S * d_sub, metric="euc")
        exact_idx = pq.exact_topk(
            jnp.asarray(q), jnp.asarray(keys), jnp.asarray(T), k, group=group)
        # PQ scores are exact here, but GQA softmax-sum reduction vs per-head
        # logit ranking differ; recall should still be high.
        r = float(pq.topk_recall(pq_idx, exact_idx, group=group))
        assert r > 0.5, r


def test_codes_uint8_roundtrip_subbits8():
    # n_subbits=8 → 256 centroids; codes 128..255 must survive the uint8
    # state dtype (int8 storage wrapped them negative — ADVICE r01)
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    G, N, d, C = 2, 400, 4, 256
    x = jnp.asarray(rng.normal(size=(G, N, d)), jnp.float32)
    res = pq.kmeans(x, C, iters=3)
    assert int(jnp.max(res.codes)) > 127  # exercises the wrap regime
    codes8 = res.codes.astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(codes8.astype(jnp.int32)),
                                  np.asarray(res.codes))
    # LUT gather with uint8 codes matches int32 codes
    lut = jnp.asarray(rng.normal(size=(G, 1, C)), jnp.float32)
    s8 = pq.adc_gather_scores(lut.reshape(G, 1, C),
                              codes8[:, None, :])
    s32 = pq.adc_gather_scores(lut.reshape(G, 1, C),
                               res.codes[:, None, :])
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s32))


def test_pqconfig_validates_subbits():
    from pqcache_tpu.config import PQConfig
    import pytest as _pytest
    with _pytest.raises(ValueError):
        PQConfig(n_subbits=9)
    PQConfig(n_subbits=8)  # supported with uint8 codes


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_kmeans_ignores_invalid_shards():
    """Distributed Lloyd over sequence shards where half the shards hold
    ONLY invalid (pad) rows: neither the k-means++ seeding (first centroid
    included) nor the empty-cluster relocation may touch a pad row.

    Valid data is a single repeated point at +10 (zeros are pad): every
    centroid must land exactly on the valid point — the old first-centroid
    pick (shard 0's pool head) and the pmean relocation both dragged
    centroids toward the pad cloud at 0."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    G, n_loc, d, C, sp = 2, 64, 8, 4, 8
    N = sp * n_loc
    x = np.zeros((G, N, d), np.float32)
    mask = np.zeros((G, N), np.float32)
    x[:, N // 2:] = 10.0                      # shards 4..7: valid
    mask[:, N // 2:] = 1.0
    mesh = Mesh(np.asarray(jax.devices()[:sp]).reshape(sp,), ("sp",))

    fn = jax.jit(shard_map(
        lambda xs, ws: pq.kmeans(xs, C, iters=4, seed=0, axis_name="sp",
                                 valid_mask=ws).centroids,
        mesh=mesh, in_specs=(P(None, "sp", None), P(None, "sp")),
        out_specs=P(), check_rep=False))
    cents = np.asarray(fn(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(cents, 10.0, atol=1e-5)
