"""End-to-end generation through the Engine for every policy.

Mirrors the reference's verification style (SURVEY.md §4): the accuracy twin
("same math, no hierarchy") is `original`; compressed policies should agree
with it for most greedy tokens on a model with real structure, and the PQ
retrieval recall is checked directly by the recall-oracle test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, CacheConfig, EngineConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.models import llama
from pqcache_tpu.runtime.generate import Engine


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(num_layers=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    # structured prompt: repeated motif + noise so attention has real signal
    motif = rng.integers(0, cfg.vocab_size, size=16)
    ids = np.concatenate([motif, rng.integers(0, cfg.vocab_size, size=200),
                          motif, rng.integers(0, cfg.vocab_size, size=40)])
    return cfg, params, ids.astype(np.int32)


def _with_block(ecfg, block):
    import dataclasses
    return dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=block))


def _engine(cfg, params, policy, **bud):
    defaults = dict(compress_ratio=0.3, recent_ratio=0.5, sink_size=4)
    defaults.update(bud)
    ecfg = EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8),
        budget=BudgetConfig(**defaults),
        cache=CacheConfig(block_size=16),  # fine blocks for tiny prompts
        runtime=RuntimeConfig(policy=policy, prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024),
    )
    return Engine(ecfg, params, dtype=jnp.float32)



def _tf_agreement(cfg, params, ecfg_pol, ecfg_ref, ids, P=256, n=12):
    """Teacher-forced per-step argmax agreement vs the `original` policy.

    Greedy-token agreement on a tiny random model is chaotic (one near-tie
    argmax flip cascades through every later token, regardless of retrieval
    fidelity); feeding BOTH policies the reference's token each step removes
    the cascade and measures what the policy actually controls — the
    attention output."""
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    ids = np.asarray(ids[:P], np.int32)
    b = compute_budget(ecfg_ref.budget, P, 16)
    pr, pp = get_policy(ecfg_ref, b), get_policy(ecfg_pol, b)
    sr, sp_ = pr.init_state(jnp.float32), pp.init_state(jnp.float32)
    pf = lambda pol, st: jax.jit(
        lambda par, s, t: llama.prefill(cfg, par, pol, s, t,
                                        jnp.asarray(0), jnp.asarray(P)))(
        params, st, jnp.asarray(ids))
    lr, sr = pf(pr, sr)
    lp, sp_ = pf(pp, sp_)
    tok, pos, m = int(jnp.argmax(lr)), P, int(jnp.argmax(lr) == jnp.argmax(lp))
    stepr = jax.jit(lambda par, s, t, p: llama.decode_step(cfg, par, pr, s, t, p))
    stepp = jax.jit(lambda par, s, t, p: llama.decode_step(cfg, par, pp, s, t, p))
    for _ in range(n):
        lr, sr = stepr(params, sr, jnp.asarray(tok), jnp.asarray(pos))
        lp, sp_ = stepp(params, sp_, jnp.asarray(tok), jnp.asarray(pos))
        m += int(jnp.argmax(lr)) == int(jnp.argmax(lp))
        tok = int(jnp.argmax(lr))
        pos += 1
    return m


class TestEndToEnd:
    def test_original_generates(self, setup):
        cfg, params, ids = setup
        res = _engine(cfg, params, "original").generate(ids, max_new_tokens=8)
        assert len(res.tokens) == 8
        assert res.policy_name == "original"

    @pytest.mark.parametrize("policy", [
        "pq_search", "h2o", "no_drop_lb", "sparq_f", "infllm"])
    def test_policy_matches_original_mostly(self, setup, policy):
        cfg, params, ids = setup
        e_ref = _engine(cfg, params, "original").cfg
        e_pol = _engine(cfg, params, policy).cfg
        m = _tf_agreement(cfg, params, e_pol, e_ref, ids, n=12)
        assert m >= 10, m  # of 13 teacher-forced steps
        # cascade smoke: generation runs end-to-end under the policy
        out = _engine(cfg, params, policy).generate(ids, max_new_tokens=8)
        assert out.policy_name == policy and len(out.tokens) == 8

    def test_pq_short_prompt_falls_back_to_dense(self, setup):
        cfg, params, _ = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=20).astype(np.int32)
        eng = _engine(cfg, params, "pq_search")
        res = eng.generate(ids, max_new_tokens=4)
        assert res.policy_name == "original"
        assert len(res.tokens) == 4

    def test_pq_block_selection_mode(self, setup):
        cfg, params, ids = setup
        e_ref = _engine(cfg, params, "original").cfg
        e_pol = _with_block(_engine(cfg, params, "pq_search").cfg, 4)
        m = _tf_agreement(cfg, params, e_pol, e_ref, ids, n=12)
        assert m >= 10, m

    def test_pq_ip_metric_e2e(self, setup):
        cfg, params, ids = setup
        import dataclasses
        e_ref = _engine(cfg, params, "original").cfg
        e_pol = _engine(cfg, params, "pq_search").cfg
        e_pol = dataclasses.replace(
            e_pol, pq=dataclasses.replace(e_pol.pq, metric="ip"))
        m = _tf_agreement(cfg, params, e_pol, e_ref, ids, n=12)
        assert m >= 10, m

    def test_pq_decode_deterministic(self, setup):
        cfg, params, ids = setup
        eng = _engine(cfg, params, "pq_search")
        a = eng.generate(ids, max_new_tokens=6)
        b = eng.generate(ids, max_new_tokens=6)
        assert a.tokens == b.tokens

    def test_pq_nogqa_per_head_selection(self, setup):
        # gqa=False: per-q-head top-k (the reference parses the flag but
        # raises "wo GQA not supported"; here it is a working mode). The
        # decode output must approximate the dense oracle at least as well
        # as the GQA group-reduced path on the same state (per-head
        # selection is strictly more targeted).
        import dataclasses
        from pqcache_tpu.core.budget import compute_budget
        from pqcache_tpu.policies.base import get_policy
        from pqcache_tpu.ops.attention_xla import decode_window_attention
        cfg, params, ids = setup
        ecfg = _engine(cfg, params, "pq_search").cfg
        no = dataclasses.replace(
            ecfg, runtime=dataclasses.replace(ecfg.runtime, gqa=False))
        assert "gqa_False" in "_".join(no.config_str_list())
        P, max_new = 128, 8
        b = compute_budget(ecfg.budget, P, max_new)
        pol_no, pol_g = get_policy(no, b), get_policy(ecfg, b)
        rng = np.random.default_rng(0)
        H, H_kv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
        st = pol_no.init_state(jnp.float32)
        i0 = jnp.asarray(0)
        _, st = pol_no.prefill_attn(st, i0, r(H, P, D), r(H_kv, P, D),
                                    r(H_kv, P, D), jnp.asarray(0),
                                    jnp.asarray(P))
        q, k_new, v_new = r(H, 1, D), r(H_kv, 1, D), r(H_kv, 1, D)
        shared = pol_no.shared_pre(st)
        o_no, _ = pol_no.decode_attn(st, i0, q, k_new, v_new, shared)
        o_g, _ = pol_g.decode_attn(st, i0, q, k_new, v_new, shared)
        n_cand = int(st.n_cand)
        tail = st.kv_tail[0]
        k_all = jnp.concatenate(
            [st.k_sink[0], tail[:, :n_cand + b.local, :D], k_new], axis=1)
        v_all = jnp.concatenate(
            [st.v_sink[0], tail[:, :n_cand + b.local, D:], v_new], axis=1)
        o_dense = decode_window_attention(q, k_all, v_all)
        err_no = float(jnp.abs(o_no - o_dense).max())
        err_g = float(jnp.abs(o_g - o_dense).max())
        assert err_no < 0.5, err_no
        assert err_no <= err_g * 1.3, (err_no, err_g)

    def test_infllm_streaming_block_formation(self, setup):
        # generated tokens must form new retrievable blocks as decoding
        # proceeds (InfLLM context_manager.py:196-815 streaming append)
        from pqcache_tpu.core.budget import compute_budget
        from pqcache_tpu.policies.base import get_policy
        from pqcache_tpu.models import llama as L
        cfg, params, ids = setup
        ecfg = _engine(cfg, params, "infllm").cfg
        P, max_new = 64, 40
        budget = compute_budget(ecfg.budget, P, max_new)
        pol = get_policy(ecfg, budget)
        st = pol.init_state(jnp.float32)
        tokens = jnp.asarray(np.resize(ids, P).astype(np.int32))
        logits, st = jax.jit(lambda p, s, t: L.prefill(
            cfg, p, pol, s, t, jnp.asarray(0), jnp.asarray(P)))(
                params, st, tokens)
        nb_pre = (P + pol.block - 1) // pol.block
        valid_before = np.asarray(st.repr_valid).any(axis=(1, 3))[0]
        tok = jnp.argmax(logits).astype(jnp.int32)
        _, st = jax.jit(lambda p, s, t: L.decode_loop(
            cfg, p, pol, s, t, jnp.asarray(P), max_new - 1))(params, st, tok)
        valid_after = np.asarray(st.repr_valid).any(axis=(1, 3))[0]
        assert valid_after[nb_pre:].sum() > 0, (nb_pre, valid_after)
        assert valid_after.sum() > valid_before.sum()


class TestChunkedPrefill:
    """Chunked (activation-bounded) HBM-tier prefill must reproduce the
    single-shot prefill for both the pq and dense policies: logits from
    prefill_chunked equal prefill's (same math, chunked schedule)."""

    @pytest.mark.parametrize("policy", ["pq_search", "original"])
    def test_chunked_prefill_logits_match(self, setup, policy):
        import dataclasses
        from pqcache_tpu.core.budget import compute_budget
        from pqcache_tpu.policies.base import get_policy
        cfg, params, ids = setup
        P, ch = 256, 64
        ids = np.asarray(ids[:P], np.int32)
        ecfg = EngineConfig(
            model=cfg,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8),
            budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                sink_size=4),
            runtime=RuntimeConfig(policy=policy, prefill_bucket=64,
                                  max_new_tokens=16, max_seq_len=1024),
        )
        b = compute_budget(ecfg.budget, P, 16)
        pol = get_policy(ecfg, b)
        lg_full, st_full = jax.jit(
            lambda par, s, t: llama.prefill(
                cfg, par, pol, s, t, jnp.asarray(0), jnp.asarray(P)))(
            params, pol.init_state(jnp.float32), jnp.asarray(ids))
        lg_ch, st_ch = jax.jit(
            lambda par, s, t: llama.prefill_chunked(
                cfg, par, pol, s, t, jnp.asarray(0), jnp.asarray(P),
                chunk=ch))(
            params, pol.init_state(jnp.float32), jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(lg_ch), np.asarray(lg_full),
                                   rtol=2e-3, atol=2e-3)
        # state parity: every leaf (codebooks, caches, counters) must agree
        for a, c in zip(jax.tree_util.tree_leaves(st_full),
                        jax.tree_util.tree_leaves(st_ch)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(c, np.float32),
                rtol=2e-3, atol=2e-3)

    def test_engine_chunked_prefill_generates(self, setup):
        import dataclasses
        cfg, params, ids = setup
        ecfg = EngineConfig(
            model=cfg,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8),
            budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                                sink_size=4),
            runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                                  max_new_tokens=16, max_seq_len=1024),
        )
        full = Engine(ecfg, params, dtype=jnp.float32).generate(
            ids, max_new_tokens=10)
        ecfg_ch = dataclasses.replace(
            ecfg, runtime=dataclasses.replace(ecfg.runtime,
                                              prefill_chunk=64))
        chunked = Engine(ecfg_ch, params, dtype=jnp.float32).generate(
            ids, max_new_tokens=10)
        agree = sum(a == b for a, b in zip(full.tokens, chunked.tokens))
        assert agree >= 8, (full.tokens, chunked.tokens)

    def test_chunk_plan_pads_one_quantum_not_one_chunk(self):
        from pqcache_tpu.runtime.generate import chunk_plan
        # naive chunk-multiple rounding would give 65536 here
        assert chunk_plan(33792, 32768) == (34816, 17408)
        assert chunk_plan(131072, 32768) == (131072, 32768)
        assert chunk_plan(320, 64) == (320, 64)
        for P, ch in [(33792, 32768), (500, 64), (98304, 32768)]:
            Pp, c = chunk_plan(P, ch)
            assert Pp % c == 0 and Pp >= P
            assert chunk_plan(Pp, ch) == (Pp, c)   # idempotent


def test_fetch_pair_rejects_unsatisfiable_block(setup):
    """fetch_pair must raise on configs it cannot honor (select_block
    outside (1,128] or not dividing the 256-aligned tail) instead of
    silently measuring the non-pair path."""
    import dataclasses
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy
    cfg, params, ids = setup
    ecfg = EngineConfig(
        model=cfg,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    fetch_pair=True, select_block=256),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=16, max_seq_len=1024),
    )
    b = compute_budget(ecfg.budget, 256, 16)
    for bad in (256, 1, 96):
        e = dataclasses.replace(
            ecfg, pq=dataclasses.replace(ecfg.pq, select_block=bad))
        with pytest.raises(ValueError, match="fetch_pair"):
            get_policy(e, b)
    ok = dataclasses.replace(
        ecfg, pq=dataclasses.replace(ecfg.pq, select_block=128))
    assert get_policy(ok, b).fetch_pair
