"""int8 KV tail (cache.kv_dtype="int8", core/quant.py).

Validates: (1) the per-channel quantize/dequant roundtrip error bound;
(2) the scale-folding algebra used by the fused kernel path — K scale
into q, V scale out of the partials — against explicit dequantization;
(3) end-to-end engine agreement with the f32-tail engine (teacher-forced);
(4) batched (batch-as-heads) == single-sequence token parity at int8.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.core import quant
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


def test_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    H, T, D = 4, 96, 32
    k = jnp.asarray(rng.normal(size=(H, T, D)) * 3.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(H, T, D)), jnp.float32)
    ks, vs = quant.kv_channel_scales(k, v, jnp.asarray(T))
    kv = quant.quantize_kv(k, v, ks, vs)
    assert kv.dtype == jnp.int8
    kd, vd = quant.dequant_kv(kv, ks, vs, dtype=jnp.float32)
    # symmetric rounding: |err| <= scale/2 per element
    assert np.all(np.abs(np.asarray(kd - k)) <= np.asarray(ks) / 2 + 1e-6)
    assert np.all(np.abs(np.asarray(vd - v)) <= np.asarray(vs) / 2 + 1e-6)


def test_quant_scales_mask_invalid_tokens():
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(2, 64, 16)), jnp.float32)
    # poison the invalid region with huge values; scales must ignore them
    k = k.at[:, 40:, :].set(1e6)
    ks, _ = quant.kv_channel_scales(k, k, jnp.asarray(40))
    assert float(jnp.max(ks)) < 1.0


def test_scale_folding_matches_explicit_dequant():
    """(q ⊙ s_k)·K_int8 with acc ⊙ s_v == attention over dequantized K/V
    (the fused-kernel algebra, checked via the XLA reference kernel)."""
    from pqcache_tpu.ops.block_attn_pallas import block_topk_attention_xla
    rng = np.random.default_rng(2)
    H_kv, group, N, D, bs = 2, 2, 128, 32, 16
    H = H_kv * group
    k = jnp.asarray(rng.normal(size=(H_kv, N, D)) * 2.0, jnp.float32)
    v = jnp.asarray(rng.normal(size=(H_kv, N, D)), jnp.float32)
    ks, vs = quant.kv_channel_scales(k, v, jnp.asarray(N))
    kv8 = quant.quantize_kv(k, v, ks, vs)
    kd, vd = quant.dequant_kv(kv8, ks, vs, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(H, 1, D)), jnp.float32)
    blk_idx = jnp.asarray([[0, 3, 5], [1, 2, 7]], jnp.int32)
    n_cand = jnp.asarray(100, jnp.int32)

    # reference: float tail, raw q
    kv_f = jnp.concatenate([kd, vd], axis=-1)[None]       # [1, H_kv, N, 2D]
    m_r, l_r, acc_r = block_topk_attention_xla(
        q, kv_f, jnp.asarray(0), blk_idx, n_cand, block=bs)

    # int8 tail: q pre-scaled per channel, acc post-scaled
    q_s = (q.reshape(H_kv, group, D) * ks).reshape(H, 1, D)
    m_i, l_i, acc_i = block_topk_attention_xla(
        q_s, kv8[None].astype(jnp.float32), jnp.asarray(0), blk_idx,
        n_cand, block=bs)
    acc_i = acc_i * vs

    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(l_i), np.asarray(l_r), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(acc_i), np.asarray(acc_r),
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_reads_int8_tail_interpret():
    """The fused block-retrieval kernel consumes the int8 tail directly
    (scale-folded q in, scale-folded acc out) — interpret mode vs the XLA
    reference on the dequantized tail."""
    from pqcache_tpu.ops.block_attn_pallas import (block_topk_attention,
                                                   block_topk_attention_xla)
    rng = np.random.default_rng(5)
    H_kv, group, N, D, bs = 2, 2, 256, 128, 32
    H = H_kv * group
    k = jnp.asarray(rng.normal(size=(H_kv, N, D)) * 1.5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(H_kv, N, D)), jnp.float32)
    ks, vs = quant.kv_channel_scales(k, v, jnp.asarray(N))
    kv8 = quant.quantize_kv(k, v, ks, vs)[None]           # [1, H_kv, N, 2D]
    kd, vd = quant.dequant_kv(kv8[0], ks, vs, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(H, 1, D)), jnp.float32)
    blk_idx = jnp.asarray([[0, 2, 5, 7], [1, 3, 4, 6]], jnp.int32)
    n_cand = jnp.asarray(230, jnp.int32)

    q_s = (q.reshape(H_kv, group, D) * ks).reshape(H, 1, D)
    m_i, l_i, acc_i = block_topk_attention(
        q_s, kv8, jnp.asarray(0), blk_idx, n_cand, block=bs, n_par=2,
        interpret=True)
    acc_i = acc_i * vs

    kv_f = jnp.concatenate([kd, vd], axis=-1)[None]
    m_r, l_r, acc_r = block_topk_attention_xla(
        q, kv_f, jnp.asarray(0), blk_idx, n_cand, block=bs)
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(l_i), np.asarray(l_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_i), np.asarray(acc_r),
                               rtol=1e-3, atol=1e-4)


def _ecfg(cfg, kv_dtype, **kw):
    block = kw.pop("select_block", 16)
    return EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    select_block=block, approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        cache=CacheConfig(block_size=16, kv_dtype=kv_dtype),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024, **kw),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    motif = rng.integers(0, cfg.vocab_size, size=16)
    ids = np.concatenate([motif, rng.integers(0, cfg.vocab_size, size=200),
                          motif, rng.integers(0, cfg.vocab_size, size=40)])
    return cfg, params, ids.astype(np.int32)


@pytest.mark.parametrize("select_block", [1, 16])
def test_int8_teacher_forced_agreement(setup, select_block):
    """int8-tail pq_search agrees with the f32-tail pq_search on nearly
    every teacher-forced step (argmax flips only at near-ties)."""
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg, params, ids = setup
    P, n = 256, 12
    ids = np.asarray(ids[:P], np.int32)
    b = compute_budget(BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                    sink_size=4), P, 16)
    ecfg_f = _ecfg(cfg, "bf16", select_block=select_block)
    ecfg_q = _ecfg(cfg, "int8", select_block=select_block)
    pf_, pq_ = get_policy(ecfg_f, b), get_policy(ecfg_q, b)

    def run(pol, force=None):
        """Greedy when force is None, else teacher-forced with `force`.
        Returns the per-step argmax predictions."""
        st = pol.init_state(jnp.float32)
        prefill = jax.jit(lambda par, s, t, pol=pol: llama.prefill(
            cfg, par, pol, s, t, jnp.asarray(0), jnp.asarray(P)))
        logits, st = prefill(params, st, jnp.asarray(ids))
        preds = [int(jnp.argmax(logits))]
        step = jax.jit(lambda par, s, t, pos, pol=pol: llama.decode_step(
            cfg, par, pol, s, t, pos))
        for i in range(n):
            tok = preds[-1] if force is None else force[i]
            logits, st = step(params, st, jnp.asarray(tok, jnp.int32),
                              jnp.asarray(P + i, jnp.int32))
            preds.append(int(jnp.argmax(logits)))
        return preds

    ref = run(pf_)                       # greedy f32-tail reference
    got = run(pq_, force=ref)            # int8 fed the reference's tokens
    agree = sum(a == b_ for a, b_ in zip(ref, got))
    assert agree >= (n + 1) - 2, (ref, got)


def test_int8_long_generation_agreement_and_clip(setup):
    """LONG generations (160 steps ≈ 10× the other parity tests) with
    prefill-frozen scales: int8 teacher-forced argmax stays in agreement
    with the bf16-tail engine and generated-token clipping stays rare —
    the drift mode the short tests cannot see (scales never adapt; K/V
    magnitudes beyond the prefill absmax saturate silently)."""
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg, params, ids = setup
    P, n = 256, 160
    ids = np.asarray(ids[:P], np.int32)
    b = compute_budget(BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                    sink_size=4), P, n + 2)
    e_f = _ecfg(cfg, "bf16", select_block=16)
    e_q = _ecfg(cfg, "int8", select_block=16)
    e_f = dataclasses.replace(
        e_f, runtime=dataclasses.replace(e_f.runtime, max_new_tokens=n + 2))
    e_q = dataclasses.replace(
        e_q, runtime=dataclasses.replace(e_q.runtime, max_new_tokens=n + 2))
    pf_, pq_ = get_policy(e_f, b), get_policy(e_q, b)

    def run(pol, force=None):
        st = pol.init_state(jnp.float32)
        prefill = jax.jit(lambda par, s, t, pol=pol: llama.prefill(
            cfg, par, pol, s, t, jnp.asarray(0), jnp.asarray(P)))
        logits, st = prefill(params, st, jnp.asarray(ids))
        preds = [int(jnp.argmax(logits))]
        step = jax.jit(lambda par, s, t, pos, pol=pol: llama.decode_step(
            cfg, par, pol, s, t, pos))
        for i in range(n):
            tok = preds[-1] if force is None else force[i]
            logits, st = step(params, st, jnp.asarray(tok, jnp.int32),
                              jnp.asarray(P + i, jnp.int32))
            preds.append(int(jnp.argmax(logits)))
        return preds, st

    ref, _ = run(pf_)
    got, st_q = run(pq_, force=ref)
    agree = sum(a == b_ for a, b_ in zip(ref, got)) / (n + 1)
    assert agree >= 0.9, f"long-gen int8 agreement {agree:.3f}"

    # clip-rate observable: quantizing the GENERATED rows of the bf16 tail
    # with the frozen scales must rarely saturate (<2%); distribution drift
    # shows up here long before argmax flips do (the int8 tail itself
    # cannot measure its own clipping — it is already saturated)
    from pqcache_tpu.core import quant as q
    _, st_f = run(pf_, force=ref)
    lo = int(st_f.n_cand) - n + b.local   # generated rows' tail span
    kvf = st_f.kv_tail[:, :, max(lo, 0):int(st_f.n_cand) + b.local]
    kf, vf = kvf[..., :cfg.head_dim], kvf[..., cfg.head_dim:]
    cf = float(q.clip_fraction(kf, vf, st_q.k_scale, st_q.v_scale))
    assert cf < 0.02, f"generated-token clip rate {cf:.4f}"


def test_int8_masked_fetch_agrees(setup):
    """fetch_mode='masked' with int8: the full-tail dequant path (and the
    raw-new-token overwrite) tracks the f32-tail masked path."""
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg, params, ids = setup
    P, n = 256, 8
    ids = np.asarray(ids[:P], np.int32)
    b = compute_budget(BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                    sink_size=4), P, 16)
    import dataclasses
    e_f = dataclasses.replace(
        _ecfg(cfg, "bf16", select_block=1),
        pq=dataclasses.replace(_ecfg(cfg, "bf16", select_block=1).pq,
                               fetch_mode="masked"))
    e_q = dataclasses.replace(
        _ecfg(cfg, "int8", select_block=1),
        pq=dataclasses.replace(_ecfg(cfg, "int8", select_block=1).pq,
                               fetch_mode="masked"))
    pf_, pq_ = get_policy(e_f, b), get_policy(e_q, b)

    def run(pol, force=None):
        st = pol.init_state(jnp.float32)
        prefill = jax.jit(lambda par, s, t, pol=pol: llama.prefill(
            cfg, par, pol, s, t, jnp.asarray(0), jnp.asarray(P)))
        logits, st = prefill(params, st, jnp.asarray(ids))
        preds = [int(jnp.argmax(logits))]
        step = jax.jit(lambda par, s, t, pos, pol=pol: llama.decode_step(
            cfg, par, pol, s, t, pos))
        for i in range(n):
            tok = preds[-1] if force is None else force[i]
            logits, st = step(params, st, jnp.asarray(tok, jnp.int32),
                              jnp.asarray(P + i, jnp.int32))
            preds.append(int(jnp.argmax(logits)))
        return preds

    ref = run(pf_)
    got = run(pq_, force=ref)
    agree = sum(a == b_ for a, b_ in zip(ref, got))
    assert agree >= (n + 1) - 2, (ref, got)


def test_chunk_plan_capped_invariants():
    from pqcache_tpu.runtime.generate import chunk_plan, chunk_plan_capped
    # under the cap: identical to chunk_plan
    assert chunk_plan_capped(200, 64, 10_000) == chunk_plan(200, 64)
    # finer quantum rescues a plan the default quantum pads past the cap
    P, ch = chunk_plan_capped(33792, 32768, 35000)
    assert P <= 35000 and ch > 0 and P % ch == 0
    # no plan fits: unchunked fallback at the original P
    assert chunk_plan_capped(200, 64, 201) == (200, 0)


def test_int8_batched_matches_single(setup):
    """batch-as-heads int8 decode == single-sequence int8 decode, token for
    token (both quantize identically, so equality is exact)."""
    from pqcache_tpu.runtime.batch_engine import BatchEngine
    cfg, params, ids = setup
    P, n = 256, 10
    ecfg = _ecfg(cfg, "int8", select_block=16)
    eng = Engine(ecfg, params, dtype=jnp.float32)
    single = eng.generate(ids[:P], max_new_tokens=n)
    beng = BatchEngine(ecfg, params, batch_size=2, prefill_len=P,
                       max_new_tokens=n, dtype=jnp.float32)
    res = beng.run([(0, ids[:P]), (1, ids[:P])], chunk=5)
    assert list(res[0])[:n] == list(single.tokens)[:n]
    assert list(res[1])[:n] == list(single.tokens)[:n]


def test_int8_state_memory_halved(setup):
    cfg, params, ids = setup
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    b = compute_budget(BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                    sink_size=4), 256, 16)
    pol = get_policy(_ecfg(cfg, "int8"), b)
    st = pol.init_state(jnp.float32)
    assert st.kv_tail.dtype == jnp.int8
    assert st.k_scale.shape == st.v_scale.shape
    assert st.k_scale.shape[-1] == cfg.head_dim
