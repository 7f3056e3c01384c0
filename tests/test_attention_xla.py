"""chunked_attention vs dense oracle, plus the score-column semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.ops.attention_xla import (
    chunked_attention, decode_window_attention,
    decode_window_attention_segments, dense_attention)


def _rand_qkv(rng, H, H_kv, T, D):
    q = rng.normal(size=(H, T, D)).astype(np.float32) * 0.5
    k = rng.normal(size=(H_kv, T, D)).astype(np.float32) * 0.5
    v = rng.normal(size=(H_kv, T, D)).astype(np.float32) * 0.5
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestChunkedAttention:
    @pytest.mark.parametrize("T,block", [(96, 32), (128, 128), (130, 64)])
    def test_matches_dense_causal(self, T, block):
        rng = np.random.default_rng(0)
        q, k, v = _rand_qkv(rng, 4, 2, T, 16)
        ref = dense_attention(q, k, v, causal=True)
        out, _ = chunked_attention(q, k, v, block=block)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_valid_len_mask(self):
        rng = np.random.default_rng(1)
        q, k, v = _rand_qkv(rng, 4, 2, 64, 16)
        valid = 50
        ref = dense_attention(q[:, :valid], k[:, :valid], v[:, :valid])
        out, _ = chunked_attention(q, k, v, jnp.asarray(valid), block=32)
        np.testing.assert_allclose(np.asarray(out[:, :valid]),
                                   np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_scores_are_prob_column_sums(self):
        # F[h, t] = sum over q rows of softmax prob — the reference kernel's
        # score_func="sum" semantics (flash_attn_with_score.py:59-104).
        rng = np.random.default_rng(2)
        H, H_kv, T, D = 4, 2, 64, 16
        q, k, v = _rand_qkv(rng, H, H_kv, T, D)
        _, scores = chunked_attention(q, k, v, block=32, with_scores=True)
        # dense reference
        group = H // H_kv
        qn = np.asarray(q); kn = np.asarray(k)
        ref = np.zeros((H, T))
        for h in range(H):
            lg = (qn[h] @ kn[h // group].T) / np.sqrt(D)
            lg[np.triu_indices(T, 1)] = -1e30
            p = np.exp(lg - lg.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[h] = p.sum(0)
        np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-3, atol=1e-4)
        # each valid row sums to 1 → column sums total T per head
        np.testing.assert_allclose(np.asarray(scores).sum(-1),
                                   np.full(H, T), rtol=1e-3)

    def test_max_scores_non_recent(self):
        # score_mode="max": per-key max prob over queries at least
        # recent_cnt after the key (flash_attn_with_score.py:106-155)
        rng = np.random.default_rng(7)
        H, H_kv, T, D, R = 2, 1, 64, 16, 8
        q, k, v = _rand_qkv(rng, H, H_kv, T, D)
        _, scores = chunked_attention(q, k, v, block=32, with_scores=True,
                                      score_mode="max", recent_cnt=R)
        qn, kn = np.asarray(q), np.asarray(k)
        for h in range(H):
            lg = (qn[h] @ kn[0].T) / np.sqrt(D)
            lg[np.triu_indices(T, 1)] = -1e30
            p = np.exp(lg - lg.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            qpos = np.arange(T)[:, None]
            kpos = np.arange(T)[None, :]
            p = np.where(kpos <= qpos - R, p, 0.0)
            np.testing.assert_allclose(np.asarray(scores)[h], p.max(0),
                                       rtol=1e-3, atol=1e-5)

    def test_segmented_window_matches_concat(self):
        rng = np.random.default_rng(9)
        H, H_kv, D = 8, 2, 16
        q = jnp.asarray(rng.normal(size=(H, 1, D)).astype(np.float32))
        segs, ks, vs, ms = [], [], [], []
        for W in (4, 16, 10, 1):
            k = jnp.asarray(rng.normal(size=(H_kv, W, D)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(H_kv, W, D)).astype(np.float32))
            mask = jnp.asarray(rng.random((H_kv, W)) > 0.2)
            segs.append((k, v, mask))
            ks.append(k); vs.append(v); ms.append(mask)
        ref = decode_window_attention(
            q, jnp.concatenate(ks, 1), jnp.concatenate(vs, 1),
            jnp.concatenate(ms, 1))
        out = decode_window_attention_segments(q, segs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_decode_window_matches_dense(self):
        rng = np.random.default_rng(3)
        H, H_kv, W, D = 8, 2, 40, 16
        q = jnp.asarray(rng.normal(size=(H, 1, D)).astype(np.float32))
        kw = jnp.asarray(rng.normal(size=(H_kv, W, D)).astype(np.float32))
        vw = jnp.asarray(rng.normal(size=(H_kv, W, D)).astype(np.float32))
        mask = jnp.asarray(rng.random((H_kv, W)) > 0.3)
        out = decode_window_attention(q, kw, vw, mask)
        # dense with per-kv-head mask
        group = H // H_kv
        ref = np.zeros((H, 1, D))
        for h in range(H):
            lg = (np.asarray(q)[h] @ np.asarray(kw)[h // group].T) / np.sqrt(D)
            lg[:, ~np.asarray(mask)[h // group]] = -1e30
            p = np.exp(lg - lg.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[h] = p @ np.asarray(vw)[h // group]
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
