"""Fused block-retrieval attention kernel vs XLA reference (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.ops.attention_xla import (decode_window_attention,
                                           decode_window_attention_segments)
from pqcache_tpu.ops.block_attn_pallas import (block_topk_attention,
                                               block_topk_attention_xla)


def _mk(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.4)


@pytest.mark.parametrize("bs,nb_sel,n_cand", [(128, 3, 512), (128, 4, 300),
                                              (256, 2, 512), (128, 5, 700),
                                              (128, 7, 1024)])
def test_kernel_matches_xla_reference(bs, nb_sel, n_cand):
    rng = np.random.default_rng(0)
    L, H_kv, group, N, D = 2, 2, 4, 1024, 128
    H = H_kv * group
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    blk_idx = jnp.asarray(
        np.stack([rng.choice(N // bs, nb_sel, replace=False)
                  for _ in range(H_kv)]), jnp.int32)
    layer = jnp.asarray(1, jnp.int32)
    nc = jnp.asarray(n_cand, jnp.int32)

    m, l, acc = block_topk_attention(q, kv_tail, layer, blk_idx, nc,
                                     block=bs, interpret=True)
    mr, lr, accr = block_topk_attention_xla(q, kv_tail, layer, blk_idx, nc,
                                            block=bs)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(l), np.asarray(lr), rtol=1e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(accr), rtol=2e-2,
                               atol=2e-2)


def test_partials_merge_equals_concat_attention():
    # [sink | topk(partials) | new] merged via partials must equal plain
    # attention over the concatenated window
    rng = np.random.default_rng(1)
    L, H_kv, group, N, D, bs = 1, 2, 2, 512, 128, 128
    H = H_kv * group
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    k_sink, v_sink = _mk(rng, H_kv, 4, D), _mk(rng, H_kv, 4, D)
    k_new, v_new = _mk(rng, H_kv, 1, D), _mk(rng, H_kv, 1, D)
    blk_idx = jnp.asarray([[0, 2], [1, 3]], jnp.int32)
    nc = jnp.asarray(N, jnp.int32)

    m, l, acc = block_topk_attention(q, kv_tail, jnp.asarray(0), blk_idx,
                                     nc, block=bs, interpret=True)
    out = decode_window_attention_segments(
        q, [(k_sink, v_sink, None), (k_new, v_new, None)],
        partials=[(m, l, acc)])

    heads = jnp.arange(H_kv)
    rows = (blk_idx[:, :, None] * bs + jnp.arange(bs)[None, None, :]
            ).reshape(H_kv, -1)
    kv_sel = kv_tail[0, heads[:, None], rows]
    k_all = jnp.concatenate(
        [k_sink, kv_sel[..., :D].astype(jnp.float32), k_new], axis=1)
    v_all = jnp.concatenate(
        [v_sink, kv_sel[..., D:].astype(jnp.float32), v_new], axis=1)
    ref = decode_window_attention(q, k_all, v_all)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_policy_block_pallas_path_matches_xla_path():
    # full decode step through the fused kernel (interpret) vs the XLA
    # gather path — same tokens selected, near-identical output
    import dataclasses
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                    RuntimeConfig, tiny_model_config)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy

    cfg_m = tiny_model_config(num_layers=1, num_heads=4, num_kv_heads=2,
                              head_dim=128, hidden_size=64)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=4,
                    approx_topk=False, select_block=128),
        budget=BudgetConfig(compress_ratio=0.45, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", max_new_tokens=8,
                              kernels="pallas-interpret"))
    P = 2048
    b = compute_budget(ecfg.budget, P, 8)
    pol_pal = get_policy(ecfg, b)
    pol_xla = get_policy(dataclasses.replace(
        ecfg, runtime=dataclasses.replace(ecfg.runtime, kernels="xla")), b)
    rng = np.random.default_rng(5)
    H, H_kv, D = cfg_m.num_heads, cfg_m.num_kv_heads, cfg_m.head_dim
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    st = pol_xla.init_state(jnp.float32)
    i0 = jnp.asarray(0)
    _, st = pol_xla.prefill_attn(st, i0, r(H, P, D), r(H_kv, P, D),
                                 r(H_kv, P, D), jnp.asarray(0),
                                 jnp.asarray(P))
    q, k_new, v_new = r(H, 1, D), r(H_kv, 1, D), r(H_kv, 1, D)
    shared = pol_xla.shared_pre(st)
    o_x, _ = pol_xla.decode_attn(st, i0, q, k_new, v_new, shared)
    o_p, _ = pol_pal.decode_attn(st, i0, q, k_new, v_new, shared)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x), rtol=3e-2,
                               atol=3e-2)


def test_batched_block_modes_match_token_mode():
    # batch-as-heads decode with select_block (XLA expansion AND fused
    # kernel interpret) vs per-token top-k: same state, outputs close
    import dataclasses
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                    RuntimeConfig, tiny_model_config)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.policies.base import get_policy

    cfg_m = tiny_model_config(num_layers=1, num_heads=4, num_kv_heads=2,
                              head_dim=128, hidden_size=64)
    base = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=4,
                    approx_topk=False, select_block=128),
        budget=BudgetConfig(compress_ratio=0.45, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", max_new_tokens=8,
                              kernels="xla"))
    P, B = 2048, 2
    bud = compute_budget(base.budget, P, 8)
    pol_xla = get_policy(base, bud)
    pol_pal = get_policy(dataclasses.replace(
        base, runtime=dataclasses.replace(base.runtime,
                                          kernels="pallas-interpret")), bud)
    rng = np.random.default_rng(6)
    H, H_kv, D = cfg_m.num_heads, cfg_m.num_kv_heads, cfg_m.head_dim
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    st = pol_xla.init_state(jnp.float32)
    i0 = jnp.asarray(0)
    _, st = pol_xla.prefill_attn(st, i0, r(H, P, D), r(H_kv, P, D),
                                 r(H_kv, P, D), jnp.asarray(0),
                                 jnp.asarray(P))
    bstate = pol_xla.init_batched_state(B, jnp.float32)
    for slot in range(B):
        bstate = pol_xla.insert_slot(bstate, st, jnp.asarray(slot))
    q, k_new, v_new = r(B, H, D), r(B, H_kv, D), r(B, H_kv, D)
    shared = pol_xla.shared_pre_batched(bstate)
    o_blk_xla, _ = pol_xla.decode_attn_batched(bstate, i0, q, k_new, v_new,
                                               shared)
    o_blk_pal, _ = pol_pal.decode_attn_batched(bstate, i0, q, k_new, v_new,
                                               shared)
    np.testing.assert_allclose(np.asarray(o_blk_pal), np.asarray(o_blk_xla),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("nb_sel,n_cand,n_par", [(3, 512, 1), (5, 700, 2),
                                                 (7, 1024, 4), (4, 300, 16)])
def test_pair_fetch_matches_xla_reference(nb_sel, n_cand, n_par):
    """pair=True DMAs the 256-aligned pair of each selected 128-block and
    masks the unselected half — identical partials to per-block fetch."""
    rng = np.random.default_rng(2)
    L, H_kv, group, N, D, bs = 2, 2, 4, 1024, 128, 128
    H = H_kv * group
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    blk_idx = jnp.sort(jnp.asarray(
        np.stack([rng.choice(N // bs, nb_sel, replace=False)
                  for _ in range(H_kv)]), jnp.int32), axis=-1)
    layer = jnp.asarray(1, jnp.int32)
    nc = jnp.asarray(n_cand, jnp.int32)

    m, l, acc = block_topk_attention(q, kv_tail, layer, blk_idx, nc,
                                     block=bs, n_par=n_par, pair=True,
                                     interpret=True)
    mr, lr, accr = block_topk_attention_xla(q, kv_tail, layer, blk_idx, nc,
                                            block=bs)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(l), np.asarray(lr), rtol=1e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(accr), rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("pair,n_par,win_len", [(False, 4, 200),
                                                (False, 2, 0),
                                                (True, 4, 257),
                                                (False, 16, 384)])
def test_window_coverage_matches_xla_reference(pair, n_par, win_len):
    """win_max coverage: the kernel's range-masked local blocks must equal
    the XLA reference with the same span appended (incl. win_len=0 and an
    unaligned span crossing block boundaries)."""
    rng = np.random.default_rng(7)
    L, H_kv, group, N, D, bs = 2, 2, 4, 1024, 128, 128
    H = H_kv * group
    win_max = 384
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    nb_sel = 3
    blk_idx = jnp.asarray(
        np.stack([rng.choice(N // bs, nb_sel, replace=False)
                  for _ in range(H_kv)]), jnp.int32)
    layer = jnp.asarray(1, jnp.int32)
    # per-head candidate counts, deliberately block-UNALIGNED
    nc = jnp.asarray([300, 517], jnp.int32)
    wl = jnp.asarray(win_len, jnp.int32)

    m, l, acc = block_topk_attention(
        q, kv_tail, layer, blk_idx, nc, block=bs, n_par=n_par, pair=pair,
        win_len=wl, win_max=win_max, interpret=True)
    mr, lr, accr = block_topk_attention_xla(
        q, kv_tail, layer, blk_idx, nc, block=bs,
        win_len=wl, win_max=win_max)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(l), np.asarray(lr), rtol=1e-2,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(accr), rtol=2e-2,
                               atol=2e-2)


def test_window_coverage_equals_separate_window_segment():
    """Kernel-with-window partials merged alone must equal [topk partials]
    + an explicit local-window segment (the path the policy replaces)."""
    from pqcache_tpu.ops.attention_xla import segment_partial
    rng = np.random.default_rng(8)
    L, H_kv, group, N, D, bs = 1, 2, 2, 1024, 128, 128
    H = H_kv * group
    win_max, win_len = 300, 300
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    blk_idx = jnp.asarray([[0, 1], [2, 0]], jnp.int32)
    nc = jnp.asarray([290, 401], jnp.int32)
    lay = jnp.asarray(0, jnp.int32)

    m, l, acc = block_topk_attention(
        q, kv_tail, lay, blk_idx, nc, block=bs,
        win_len=jnp.asarray(win_len), win_max=win_max, interpret=True)
    out = decode_window_attention_segments(q, [], partials=[(m, l, acc)])

    m2, l2, acc2 = block_topk_attention(
        q, kv_tail, lay, blk_idx, nc, block=bs, interpret=True)
    qg = q.reshape(H_kv, group, D)
    parts = []
    for h in range(H_kv):
        kvl = jax.lax.dynamic_slice(
            kv_tail, (0, h, int(nc[h]), 0), (1, 1, win_len, 2 * D))[0]
        kl, vl = kvl[..., :D], kvl[..., D:]
        parts.append(segment_partial(qg[h:h + 1], kl, vl, None))
    loc = tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                for i in range(3))
    ref = decode_window_attention_segments(
        q, [], partials=[(m2, l2, acc2), loc])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_window_at_tail_no_duplicate_block():
    """Regression (advisor r4): when n_cand + win reaches the end of
    kv_tail, clamped over-range window entries duplicated the last block
    and double-counted its rows in l/acc. Kernel AND XLA reference must
    both equal an explicit dynamic-slice window segment."""
    from pqcache_tpu.ops.attention_xla import segment_partial
    rng = np.random.default_rng(9)
    L, H_kv, group, N, D, bs = 1, 2, 2, 512, 128, 128
    H = H_kv * group
    win_max = 128          # nb_local = 2 entries; span fits in 1-2 blocks
    kv_tail = _mk(rng, L, H_kv, N, 2 * D).astype(jnp.bfloat16)
    q = _mk(rng, H, 1, D)
    blk_idx = jnp.asarray([[0, 1], [1, 0]], jnp.int32)
    # head 0: the advisor's repro shape (n_cand + win == N, span inside the
    # last block only -> 2nd entry clamps onto it); head 1: aligned tail
    nc = jnp.asarray([411, 384], jnp.int32)
    wl = jnp.asarray([100, 128], jnp.int32)
    lay = jnp.asarray(0, jnp.int32)

    # ground truth: top-k partials + explicit sliced window segment
    m2, l2, acc2 = block_topk_attention(q, kv_tail, lay, blk_idx, nc,
                                        block=bs, interpret=True)
    qg = q.reshape(H_kv, group, D)
    parts = []
    for h in range(H_kv):
        w = int(wl[h])
        kvl = jax.lax.dynamic_slice(
            kv_tail, (0, h, int(nc[h]), 0), (1, 1, w, 2 * D))[0]
        kl, vl = kvl[..., :D], kvl[..., D:]
        p = segment_partial(qg[h:h + 1], kl, vl, None)
        parts.append(p)
    loc = tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                for i in range(3))
    ref = decode_window_attention_segments(
        q, [], partials=[(m2, l2, acc2), loc])

    for impl in ("pallas", "xla"):
        if impl == "pallas":
            m, l, acc = block_topk_attention(
                q, kv_tail, lay, blk_idx, nc, block=bs,
                win_len=wl, win_max=win_max, interpret=True)
        else:
            m, l, acc = block_topk_attention_xla(
                q, kv_tail, lay, blk_idx, nc, block=bs,
                win_len=wl, win_max=win_max)
        out = decode_window_attention_segments(q, [], partials=[(m, l, acc)])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"impl={impl}")
