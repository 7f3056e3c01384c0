"""Joint-code-histogram block scorer (core/pq.py build_joint_hist /
jhist_add_tokens / joint_block_mass): exact equivalence to the softmax
block-mass chain, incremental maintenance, and engine-level parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.core import pq
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


def _xla_block_mass(lut, codes, n_valid, *, head_dim, block):
    """Reference chain: ADC scores → masked softmax → per-block sums."""
    scores = pq.adc_gather_scores(lut, codes)            # [H, T]
    H, T = scores.shape
    valid = jnp.arange(T) < n_valid
    masked = jnp.where(valid[None], scores / jnp.sqrt(float(head_dim)),
                       -jnp.inf)
    probs = jnp.where(valid[None], jax.nn.softmax(masked, axis=-1), 0.0)
    return jnp.sum(probs.reshape(H, T // block, block), axis=-1)


def _setup(seed=0, H_kv=2, group=2, T=1024, C=16, block=64, n_valid=900):
    rng = np.random.default_rng(seed)
    H = H_kv * group
    codes = rng.integers(0, C, size=(H_kv, 2, T)).astype(np.int32)
    lut = rng.normal(size=(H, 2, C)).astype(np.float32) * 3.0
    return (jnp.asarray(lut), jnp.asarray(codes),
            jnp.asarray(n_valid, jnp.int32))


def test_joint_mass_matches_xla_chain():
    lut, codes, n_valid = _setup()
    C, block, D = 16, 64, 128
    J = pq.build_joint_hist(codes, n_valid, n_centroids=C, block=block)
    mass = pq.joint_block_mass(lut, J, head_dim=D)
    ref = _xla_block_mass(lut, codes, n_valid, head_dim=D, block=block)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(ref),
                               rtol=2e-3, atol=2e-5)


def test_joint_mass_partial_boundary_block():
    # n_valid inside a block: only the valid prefix may carry mass
    lut, codes, _ = _setup()
    C, block, D = 16, 64, 128
    n_valid = jnp.asarray(777, jnp.int32)  # 777 = 12*64 + 9
    J = pq.build_joint_hist(codes, n_valid, n_centroids=C, block=block)
    mass = pq.joint_block_mass(lut, J, head_dim=D)
    ref = _xla_block_mass(lut, codes, n_valid, head_dim=D, block=block)
    np.testing.assert_allclose(np.asarray(mass), np.asarray(ref),
                               rtol=2e-3, atol=2e-5)
    assert float(jnp.sum(mass[:, 13:])) == 0.0


def test_jhist_incremental_matches_rebuild():
    _, codes, _ = _setup(seed=3)
    C, block = 16, 64
    base = 700
    J = pq.build_joint_hist(codes, jnp.asarray(base), n_centroids=C,
                            block=block)
    for p in range(base, base + 70):
        J = pq.jhist_add_tokens(J, codes[:, :, p], jnp.asarray(p),
                                n_centroids=C, block=block)
    full = pq.build_joint_hist(codes, jnp.asarray(base + 70),
                               n_centroids=C, block=block)
    np.testing.assert_array_equal(np.asarray(J, np.float32),
                                  np.asarray(full, np.float32))


def test_jhist_selection_equals_score_chain_selection():
    lut, codes, n_valid = _setup(seed=5, T=2048, n_valid=1800)
    C, block, D, group = 16, 64, 128, 2
    k = 256
    J = pq.build_joint_hist(codes, n_valid, n_centroids=C, block=block)
    mass = pq.joint_block_mass(lut, J, head_dim=D)
    sel_j = pq.topk_from_block_mass(mass, n_valid, k, group=group,
                                    block=block, approx=False)
    scores = pq.adc_gather_scores(lut, codes)
    sel_s, _ = pq.mips_topk_blocks(scores, n_valid, k, group=group,
                                   head_dim=D, block=block, metric="euc",
                                   approx=False)
    a = np.sort(np.asarray(sel_j), axis=-1)
    b = np.sort(np.asarray(sel_s), axis=-1)
    # identical ranking up to float ties: require near-total agreement
    agree = (a == b).mean()
    assert agree > 0.95, agree


def test_engine_generates_with_block_scorer():
    """End-to-end generation through the block-granular path with BOTH
    scorer backends in one test: `auto` (jhist) must produce the same
    tokens as the XLA score-chain path at float32 (identical ranking)."""
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg_m.vocab_size, size=200).astype(np.int32)
    toks = {}
    for scorer in ("auto", "kernel"):
        ecfg = EngineConfig(
            model=cfg_m,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                        approx_topk=False, select_block=16, scorer=scorer),
            budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                sink_size=4),
            runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                                  max_new_tokens=16, max_seq_len=512),
        )
        eng = Engine(ecfg, params, dtype=jnp.float32)
        r = eng.generate(ids, max_new_tokens=8)
        assert len(r.tokens) == 8
        toks[scorer] = r.tokens
    assert toks["auto"] == toks["kernel"]


def test_large_select_block_constructs_without_jhist():
    """select_block > 256 is jhist-illegal but LEGAL for the kernel/XLA
    score chain: engine construction must not crash computing a jhist
    dtype it will never use (regression: ADVICE r3 — a bare assert in
    jhist_dtype fired from init_state even when use_jhist was False)."""
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=4,
                    approx_topk=False, select_block=512, scorer="kernel"),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=1540, max_seq_len=4096),
    )
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    b = compute_budget(ecfg.budget, 2048, 1540)
    assert b.n_tail_max % 512 == 0, b   # keep the config legal
    pol = get_policy(ecfg, b)
    assert not pol.use_jhist
    st = pol.init_state(jnp.float32)          # must not raise
    assert st.jhist is None
    bst = pol.init_batched_state(2, jnp.float32)
    assert bst.jhist is None


def test_jhist_uint8_saturates_at_255():
    """block=256 histograms store uint8 with SATURATING counts: a fully
    uniform block pins at 255 (≤0.4% mass loss) instead of wrapping to 0,
    both at build time and through the incremental +1."""
    import jax.numpy as jnp
    import numpy as np
    from pqcache_tpu.core import pq

    C, block, T = 4, 256, 512
    # head 0: block 0 entirely code pair (1, 2); block 1 mixed
    codes = np.zeros((1, 2, T), np.int32)
    codes[0, 0, :256] = 1
    codes[0, 1, :256] = 2
    codes[0, 0, 256:] = np.arange(256) % C
    J = pq.build_joint_hist(jnp.asarray(codes), jnp.asarray(T),
                            n_centroids=C, block=block)
    assert J.dtype == jnp.uint8
    assert int(J[0, 0, 1 * C + 2]) == 255          # saturated, not 0
    assert int(np.asarray(J[0, 1]).sum()) == 256   # exact below the cap

    # incremental add on a saturated cell stays pinned
    J2 = pq.jhist_add_tokens(J, jnp.asarray([[1, 2]], jnp.int32),
                             jnp.asarray(10), n_centroids=C, block=block)
    assert int(J2[0, 0, 1 * C + 2]) == 255
    # and a normal cell increments exactly
    J3 = pq.jhist_add_tokens(J, jnp.asarray([[0, 0]], jnp.int32),
                             jnp.asarray(300), n_centroids=C, block=block)
    assert int(J3[0, 1, 0]) == int(J[0, 1, 0]) + 1


def _defer_cfg(cfg_m, mode):
    import dataclasses
    return EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False, select_block=16, jhist_defer=mode),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=24, max_seq_len=512))


def test_jhist_deferred_join_matches_eager_end_to_end():
    """jhist_defer='on' (histogram lags the chunk; scorer adds the EXACT
    pending-token correction) must reproduce the eager per-step-join
    engine's tokens, across several chunk flushes, and leave a BIT-EXACT
    histogram after each flush."""
    from pqcache_tpu.runtime.batch_engine import BatchEngine
    cfg_m = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(7),
                               dtype=jnp.float32)
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256 - 13 * i)
               .astype(np.int32) for i in range(3)]
    outs = {}
    hists = {}
    for mode in ("off", "on"):
        eng = BatchEngine(_defer_cfg(cfg_m, mode), params, batch_size=2,
                          prefill_len=256, max_new_tokens=20,
                          dtype=jnp.float32)
        # chunk 5 → four flushes over 20 tokens
        outs[mode] = eng.run([(i, p) for i, p in enumerate(prompts)],
                             chunk=5)
        hists[mode] = np.asarray(eng.bstate.jhist)
    assert outs["on"] == outs["off"], (outs["on"], outs["off"])
    # post-flush histograms identical (integer saturating adds commute
    # with the eager per-step saturating +1)
    np.testing.assert_array_equal(hists["on"], hists["off"])


def test_jhist_pending_mass_correction_is_exact():
    """raw_mass(J_lagging) + pending correction == mass(J_full) up to f32
    summation order (allclose), with IDENTICAL block selection."""
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg_m = tiny_model_config(num_layers=2)
    ecfg = _defer_cfg(cfg_m, "on")
    b = compute_budget(ecfg.budget, 256, 24)
    pol = get_policy(ecfg, b)
    assert pol.use_jhist and pol.ring_k > 0
    B = 2
    st = pol.init_batched_state(B, jnp.float32)
    rng = np.random.default_rng(5)
    codes = rng.integers(0, pol.C, size=st.codes.shape).astype(np.uint8)
    st = st.replace(codes=jnp.asarray(codes))
    n_cand = jnp.asarray([100, 57], jnp.int32)
    r = 7
    st = st.replace(n_cand=n_cand, ring_r=jnp.asarray(r, jnp.int32))
    # lagging histogram: counts over [0, n_cand - r); full: [0, n_cand)
    from pqcache_tpu.core import pq as pqm
    NB = st.jhist.shape[2]
    J_lag, J_full = [], []
    for b_i in range(B):
        c = jnp.asarray(codes[0, b_i * pol.H_kv:(b_i + 1) * pol.H_kv]
                        .astype(np.int32))
        J_lag.append(pqm.build_joint_hist(
            c, int(n_cand[b_i]) - r, n_centroids=pol.C,
            block=pol.select_block))
        J_full.append(pqm.build_joint_hist(
            c, int(n_cand[b_i]), n_centroids=pol.C,
            block=pol.select_block))
    pad = lambda J: jnp.pad(J, ((0, 0), (0, NB - J.shape[1]), (0, 0)))
    J_lag = jnp.concatenate([pad(j) for j in J_lag], axis=0)[None]
    J_full = jnp.concatenate([pad(j) for j in J_full], axis=0)[None]

    H = B * cfg_m.num_heads
    lut = jnp.asarray(rng.normal(size=(H, 2, pol.C)), jnp.float32)
    eager = pqm.joint_block_mass(lut, J_full[0], head_dim=pol.D)
    st_lag = st.replace(jhist=J_lag)
    raw = pqm.joint_block_mass(lut, J_lag[0], head_dim=pol.D,
                               normalize=False)
    raw = raw + pol._pending_mass(st_lag, jnp.asarray(0, jnp.int32), lut,
                                  {"n_cand": n_cand}, B)
    deferred = raw / jnp.maximum(jnp.sum(raw, -1, keepdims=True), 1e-30)
    np.testing.assert_allclose(np.asarray(deferred), np.asarray(eager),
                               rtol=2e-5, atol=2e-7)
    sel_e = pqm.topk_from_block_mass(eager, jnp.repeat(n_cand, pol.H_kv),
                                     b.topk, group=pol.group,
                                     block=pol.select_block, approx=False)
    sel_d = pqm.topk_from_block_mass(deferred,
                                     jnp.repeat(n_cand, pol.H_kv),
                                     b.topk, group=pol.group,
                                     block=pol.select_block, approx=False)
    np.testing.assert_array_equal(np.asarray(sel_e), np.asarray(sel_d))


def test_ring_batched_decode_pallas_matches_xla_logits():
    """Ring-active (jhist_defer='on') batched decode through the fused
    kernel (interpret; the local window rides the kernel via win_len) vs
    the XLA path: mid-ring state (r > 0), logits allclose — covers the
    window coverage + pending-mass + per-slot n_cand interaction the
    engine runs at bench config."""
    import dataclasses
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg_m = tiny_model_config(num_layers=2, num_heads=4, num_kv_heads=2,
                              head_dim=128, hidden_size=128)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(3),
                               dtype=jnp.float32)
    base = _defer_cfg(cfg_m, "on")
    # C·H_kv·S must be 128-aligned for the Pallas ADC (use_pallas gate):
    # subbits 5 → C=32, 32·2·2 = 128
    base = dataclasses.replace(
        base, pq=dataclasses.replace(base.pq, n_subbits=5))
    mk = lambda kern: get_policy(dataclasses.replace(
        base, runtime=dataclasses.replace(base.runtime, kernels=kern)),
        compute_budget(base.budget, 256, 24))
    pol_x, pol_p = mk("xla"), mk("pallas-interpret")
    assert pol_x.ring_k > 0 and pol_p.use_pallas

    rng = np.random.default_rng(11)
    B = 2
    st = None
    bstate = pol_x.init_batched_state(B, jnp.float32)
    for slot, n in enumerate((256, 243)):
        ids = rng.integers(0, cfg_m.vocab_size, size=n).astype(np.int32)
        toks = np.zeros((256,), np.int32)
        toks[256 - n:] = ids
        s = pol_x.init_state(jnp.float32)
        _, s = llama.prefill(cfg_m, params, pol_x, s, jnp.asarray(toks),
                             jnp.asarray(256 - n, jnp.int32),
                             jnp.asarray(n, jnp.int32))
        bstate = pol_x.insert_slot(bstate, s, jnp.asarray(slot, jnp.int32))
    # advance 3 steps (xla) WITHOUT flushing: mid-ring state, r = 3
    tok = jnp.asarray([7, 9], jnp.int32)
    pos = jnp.asarray([256, 243], jnp.int32)
    for _ in range(3):
        logits, bstate = llama.decode_step_batched(
            cfg_m, params, pol_x, bstate, tok, pos)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1
    assert int(bstate.ring_r) == 3
    lx, _ = llama.decode_step_batched(cfg_m, params, pol_x, bstate, tok,
                                      pos)
    lp, _ = llama.decode_step_batched(cfg_m, params, pol_p, bstate, tok,
                                      pos)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx), rtol=3e-2,
                               atol=3e-2)
    # the two paths select the SAME blocks: argmax tokens agree
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lx, -1)),
                                  np.asarray(jnp.argmax(lp, -1)))
