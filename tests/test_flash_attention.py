"""Pallas flash attention vs the dense oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pqcache_tpu.ops.attention_xla import chunked_attention, dense_attention
from pqcache_tpu.ops.flash_attention import flash_attention, flash_scores


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)


class TestFlashAttention:
    @pytest.mark.parametrize("T,bq,bk", [(256, 128, 128), (384, 128, 256)])
    def test_causal_matches_dense(self, T, bq, bk):
        rng = np.random.default_rng(0)
        H, H_kv, D = 4, 2, 128
        q, k, v = _rand(rng, H, T, D), _rand(rng, H_kv, T, D), _rand(rng, H_kv, T, D)
        ref = dense_attention(q, k, v, causal=True)
        out = flash_attention(q, k, v, block_q=bq, block_k=bk,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_left_pad_mask(self):
        rng = np.random.default_rng(1)
        H, H_kv, D, T, pad = 2, 1, 128, 256, 100
        q, k, v = _rand(rng, H, T, D), _rand(rng, H_kv, T, D), _rand(rng, H_kv, T, D)
        ref = dense_attention(q[:, pad:], k[:, pad:], v[:, pad:], causal=True)
        out = flash_attention(q, k, v, valid_lo=pad, block_q=128,
                              block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out[:, pad:]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_valid_len_mask(self):
        rng = np.random.default_rng(2)
        H, H_kv, D, T, n = 2, 2, 128, 256, 200
        q, k, v = _rand(rng, H, T, D), _rand(rng, H_kv, T, D), _rand(rng, H_kv, T, D)
        ref = dense_attention(q[:, :n], k[:, :n], v[:, :n], causal=True)
        out = flash_attention(q, k, v, valid_len=n, block_q=128,
                              block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("T,pad", [(256, 0), (256, 60)])
    def test_score_sweep_matches_xla(self, T, pad):
        rng = np.random.default_rng(5)
        H, H_kv, D = 4, 2, 128
        q, k, v = _rand(rng, H, T, D), _rand(rng, H_kv, T, D), _rand(rng, H_kv, T, D)
        _, ref = chunked_attention(q, k, v, valid_lo=pad, block=64,
                                   with_scores=True)
        out = flash_scores(q, k, valid_lo=pad, block_q=128, block_k=128,
                           interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)

    def test_bf16_io(self):
        rng = np.random.default_rng(3)
        H, H_kv, D, T = 4, 2, 128, 256
        q = _rand(rng, H, T, D).astype(jnp.bfloat16)
        k = _rand(rng, H_kv, T, D).astype(jnp.bfloat16)
        v = _rand(rng, H_kv, T, D).astype(jnp.bfloat16)
        ref = dense_attention(q, k, v, causal=True)
        out = flash_attention(q, k, v, block_q=128, block_k=128,
                              interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05)


class TestMaxScoreSweep:
    @pytest.mark.parametrize("T,pad", [(256, 0), (256, 60)])
    def test_max_score_matches_xla(self, T, pad):
        # score_mode="max": non-recent column max (reference
        # flash_attn_with_score.py:106-155, RECENT_CNT exclusion)
        rng = np.random.default_rng(6)
        H, H_kv, D = 4, 2, 128
        q, k, v = (_rand(rng, H, T, D), _rand(rng, H_kv, T, D),
                   _rand(rng, H_kv, T, D))
        _, ref = chunked_attention(q, k, v, valid_lo=pad, block=64,
                                   with_scores=True, score_mode="max")
        out = flash_scores(q, k, valid_lo=pad, block_q=128, block_k=128,
                           score_mode="max", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


class TestQOffsetChunk:
    """Rectangular chunked-prefill attention: a q chunk at absolute offset
    q_offset attending its full causal key prefix (the chunked prefill
    path, runtime/offload_engine.py _prefill_attn_chunk)."""

    @pytest.mark.parametrize("bq,bk", [(128, 128), (128, 256)])
    def test_flash_q_offset_matches_dense(self, bq, bk):
        rng = np.random.default_rng(7)
        H, H_kv, D = 4, 2, 128
        Tk, Tq, off, pad = 1024, 256, 512, 37
        q = _rand(rng, H, Tq, D)
        k, v = _rand(rng, H_kv, Tk, D), _rand(rng, H_kv, Tk, D)
        ref = dense_attention(q, k, v, causal=True, q_offset=off,
                              valid_lo=pad)
        out = flash_attention(q, k, v, valid_lo=pad, causal=True,
                              q_offset=off, block_q=bq, block_k=bk,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_flash_q_offset_ragged_tq(self):
        # Tq not a block multiple: padded q rows must not perturb real rows
        rng = np.random.default_rng(8)
        H, H_kv, D = 2, 1, 128
        Tk, Tq, off = 768, 200, 256
        q = _rand(rng, H, Tq, D)
        k, v = _rand(rng, H_kv, Tk, D), _rand(rng, H_kv, Tk, D)
        ref = dense_attention(q, k, v, causal=True, q_offset=off)
        out = flash_attention(q, k, v, causal=True, q_offset=off,
                              block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("off", [96, 160, 224])
    def test_flash_q_offset_misaligned_packed(self, off):
        # q_offset NOT a block multiple on the packed (bq == bk) grid: the
        # causal frontier lands inside interior k-blocks, which must take
        # the masked path (regression: unmasked interior blocks leaked
        # future keys, max err 0.49)
        rng = np.random.default_rng(11)
        H, H_kv, D = 2, 1, 128
        Tk, Tq = off + 256, 256
        q = _rand(rng, H, Tq, D)
        k, v = _rand(rng, H_kv, Tk, D), _rand(rng, H_kv, Tk, D)
        ref = dense_attention(q, k, v, causal=True, q_offset=off)
        out = flash_attention(q, k, v, causal=True, q_offset=off,
                              block_q=128, block_k=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_xla_rect_matches_dense(self):
        from pqcache_tpu.ops.attention_xla import chunked_attention_rect
        rng = np.random.default_rng(9)
        H, H_kv, D = 4, 2, 64       # D % 128 != 0: the XLA fallback's case
        Tk, Tq, off, pad = 640, 192, 320, 21
        q = _rand(rng, H, Tq, D)
        k, v = _rand(rng, H_kv, Tk, D), _rand(rng, H_kv, Tk, D)
        ref = dense_attention(q, k, v, causal=True, q_offset=off,
                              valid_lo=pad)
        out = chunked_attention_rect(q, k, v, valid_lo=pad, q_offset=off,
                                     block=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_full_prefill_from_chunks(self):
        # composing chunk calls over a whole sequence == square prefill
        rng = np.random.default_rng(10)
        H, H_kv, D, T, ch = 2, 2, 128, 512, 128
        q = _rand(rng, H, T, D)
        k, v = _rand(rng, H_kv, T, D), _rand(rng, H_kv, T, D)
        ref = flash_attention(q, k, v, causal=True, block_q=128,
                              block_k=128, interpret=True)
        outs = [
            flash_attention(q[:, c:c + ch], k[:, :c + ch], v[:, :c + ch],
                            causal=True, q_offset=c, block_q=128,
                            block_k=128, interpret=True)
            for c in range(0, T, ch)]
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(outs, axis=1)), np.asarray(ref),
            rtol=2e-4, atol=2e-4)
