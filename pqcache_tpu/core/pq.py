"""Pure, jittable product-quantization math.

This is the TPU-native replacement for the reference's CPU clustering backend
(multi_core_compressor_v2.py): instead of 48 host cores running sklearn Lloyd
k-means in 16 spawned processes fed through shared memory, codebooks are
trained on-chip with batched Lloyd iterations — the distance and update steps
are matmuls that run on the MXU, vectorized over all (kv_head × subvec) groups
at once. At ~0.5 GFLOP per iteration per layer this is negligible next to the
prefill attention itself, so "overlap clustering with prefill" becomes simply
"fuse clustering into the prefill computation".

Conventions:
  G = n_groups = num_kv_heads * n_subvec_per_head   (independent PQ subspaces)
  N = number of points (padded, static)             (non-sink tokens)
  d = subvector dim = head_dim // n_subvec_per_head
  C = number of centroids = 2 ** n_subbits

All functions are batch-free; vmap for a batch dimension.

Reference semantics mirrored here:
  * k-means init: centroid indices drawn once and shared across all groups and
    layers (multi_core_compressor_v2.py:136-139).
  * "euc" metric: cluster keys in L2; at decode, score candidates by
    q·centroid lookup (pq_search.py:316-322) — an inner-product approximation
    of the attention logits.
  * "ip" metric: MIPS→L2 lift (ip2l2): keys get an extra column
    sqrt(phi − ‖x‖²) with phi = max ‖x‖² per group
    (multi_core_compressor_v2.py:15-19), queries get a zero column appended
    (pq_search.py:456-458); candidates are ranked by ascending lifted L2
    distance (pq_search.py:407-417).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# MIPS → L2 lift

def ip2l2_lift(
    xb: jax.Array, valid_len: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Lift points for inner-product search via L2 k-means.

    xb: [G, N, d] → ([G, N, d+1], phi [G, 1, 1]). Points at index >=
    valid_len are excluded from the per-group max-norm phi.
    """
    norms = jnp.sum(xb.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    if valid_len is not None:
        n = xb.shape[-2]
        valid = (jnp.arange(n)[None, :, None] < valid_len)
        phi = jnp.max(jnp.where(valid, norms, 0.0), axis=-2, keepdims=True)
    else:
        phi = jnp.max(norms, axis=-2, keepdims=True)
    extracol = jnp.sqrt(jnp.maximum(phi - norms, 0.0))
    return jnp.concatenate([xb.astype(jnp.float32), extracol], axis=-1), phi


def ip2l2_lift_with_phi(x: jax.Array, phi: jax.Array) -> jax.Array:
    """Lift new points with a fixed phi (pq_search.py:169-174). x: [G, M, d]."""
    norms = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    extracol = jnp.sqrt(jnp.maximum(phi - norms, 0.0))
    return jnp.concatenate([x.astype(jnp.float32), extracol], axis=-1)


def lift_query(q: jax.Array) -> jax.Array:
    """Append a zero column to queries for ip2l2 search (pq_search.py:456-458).

    q: [..., d] → [..., d+1]
    """
    return jnp.concatenate([q, jnp.zeros_like(q[..., :1])], axis=-1)


# ---------------------------------------------------------------------------
# Batched Lloyd k-means

class KMeansResult(NamedTuple):
    centroids: jax.Array   # [G, C, d] float32
    codes: jax.Array       # [G, N] int32 — final assignment of every point


def _assign_chunked(x, w, centroids, chunk: int):
    """Assign each point to its nearest centroid and accumulate per-cluster
    sums/counts, scanning over N in chunks to bound the [G, chunk, C] distance
    tensor. x: [G, N, d] f32, w: [G, N] f32 (0/1), centroids: [G, C, d].

    Returns (codes [G, N] i32, sums [G, C, d], counts [G, C],
    point_dist [G, N] — each point's distance-to-assigned-centroid offset by
    ||x||², sufficient for farthest-point ranking).
    """
    G, N, d = x.shape
    C = centroids.shape[1]
    n_chunks = N // chunk
    xc = x.reshape(G, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    wc = w.reshape(G, n_chunks, chunk).transpose(1, 0, 2)
    cent_sq = jnp.sum(centroids ** 2, axis=-1)  # [G, C]

    def body(carry, inp):
        sums, counts = carry
        xb, wb = inp  # [G, chunk, d], [G, chunk]
        # ||x - c||^2 = ||x||^2 - 2 x·c + ||c||^2 ; ||x||^2 constant in argmin
        dots = jnp.einsum("gnd,gcd->gnc", xb, centroids,
                          preferred_element_type=jnp.float32)
        dist = cent_sq[:, None, :] - 2.0 * dots
        codes_b = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # [G, chunk]
        pdist_b = (jnp.min(dist, axis=-1)
                   + jnp.sum(xb * xb, axis=-1))  # true ||x-c||², >= 0
        onehot = jax.nn.one_hot(codes_b, C, dtype=jnp.float32) * wb[..., None]
        sums = sums + jnp.einsum("gnc,gnd->gcd", onehot, xb,
                                 preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=1)
        return (sums, counts), (codes_b, pdist_b)

    init = (jnp.zeros((G, C, d), jnp.float32), jnp.zeros((G, C), jnp.float32))
    (sums, counts), (codes, pdist) = jax.lax.scan(body, init, (xc, wc))
    codes = codes.transpose(1, 0, 2).reshape(G, N)
    pdist = pdist.transpose(1, 0, 2).reshape(G, N)
    return codes, sums, counts, pdist


def _kmeanspp_init(x, valid_len, n_clusters, key, pool: int = 4096,
                   group_offset=0):
    """k-means++ (D² sampling) initialization over a bounded candidate pool.

    The reference initializes with a plain random point subset shared across
    groups (multi_core_compressor_v2.py:136-139), which regularly lands two
    seeds in one natural cluster and none in another — Lloyd then converges
    to merged/split clusters. D² seeding avoids that for ~1 Lloyd iteration's
    worth of FLOPs. Deterministic given `key`; per-group independent, with
    each group's noise keyed by its GLOBAL id (group_offset + local index)
    so a head-sharded (shard_map) clustering reproduces the single-device
    centroids exactly.

    x: [G, N, d] f32 → centroids [G, C, d].
    """
    G, N, d = x.shape
    P = min(N, pool)
    kperm, kpick = jax.random.split(key)
    pool_idx = jax.random.permutation(kperm, N)[:P] % jnp.maximum(valid_len, 1)
    xp = jnp.take(x, pool_idx, axis=1)              # [G, P, d]
    # pool entries may collide after the fold; dedup not needed — D² weight
    # of a duplicate is 0 once one copy is chosen.
    first = jnp.take(x, pool_idx[:1], axis=1)       # [G, 1, d]
    group_ids = jnp.asarray(group_offset, jnp.int32) + jnp.arange(G)

    def step(carry, key_i):
        min_d2, = carry
        keys_g = jax.vmap(lambda gi: jax.random.fold_in(key_i, gi))(group_ids)
        g = -jnp.log(-jnp.log(jax.vmap(
            lambda kk: jax.random.uniform(kk, (P,), minval=1e-12,
                                          maxval=1.0))(keys_g)))
        # Gumbel-max sample ∝ min_d2
        logit = jnp.where(min_d2 > 0, jnp.log(jnp.maximum(min_d2, 1e-30)), -jnp.inf)
        pick = jnp.argmax(logit + g, axis=-1)       # [G]
        c = jnp.take_along_axis(xp, pick[:, None, None], axis=1)  # [G, 1, d]
        d2 = jnp.sum((xp - c) ** 2, axis=-1)
        return (jnp.minimum(min_d2, d2),), c[:, 0]

    min_d2_0 = jnp.sum((xp - first) ** 2, axis=-1)
    keys = jax.random.split(kpick, n_clusters - 1)
    (_,), rest = jax.lax.scan(step, (min_d2_0,), keys)
    return jnp.concatenate([first, rest.transpose(1, 0, 2)], axis=1)


@jax.named_scope("pq_kmeans")
def kmeans(
    x: jax.Array,
    n_clusters: int,
    iters: int,
    *,
    seed: int = 4321,
    valid_len: Optional[jax.Array] = None,
    chunk: int = 4096,
    init: str = "kmeans++",
    axis_name: Optional[str] = None,
    valid_mask: Optional[jax.Array] = None,
    group_offset=0,
) -> KMeansResult:
    """Batched Lloyd k-means over G independent groups.

    x: [G, N, d]. N is static; points at index >= valid_len (traced scalar)
    are excluded from training. init="kmeans++" (default) does per-group D²
    seeding; init="random" mirrors the reference's shared random point subset
    (multi_core_compressor_v2.py:130-139). Runs exactly `iters` Lloyd
    iterations (static); empty clusters are relocated to the current
    farthest-from-centroid points (sklearn's strategy).

    axis_name: distributed Lloyd for SEQUENCE-SHARDED data — `x` is this
    shard's points; per-iteration cluster sums/counts are psum-reduced over
    the mesh axis so every shard iterates identical (replicated) centroids.
    Seeding pools candidates from every shard (all_gather of a small pool).
    valid_mask [G or 1, N]: explicit per-point validity (overrides
    valid_len; used by sharded callers whose valid region is not a prefix).
    """
    G, N, d = x.shape
    x = x.astype(jnp.float32)
    if valid_len is None:
        valid_len = jnp.asarray(N, jnp.int32)
    valid_len = jnp.asarray(valid_len, jnp.int32)

    chunk = min(chunk, N)
    Npad = _round_up(N, chunk)
    if Npad != N:
        x = jnp.pad(x, ((0, 0), (0, Npad - N), (0, 0)))
    if valid_mask is not None:
        w = valid_mask.astype(jnp.float32)
        if Npad != N:
            w = jnp.pad(w, ((0, 0), (0, Npad - N)))
        w = jnp.broadcast_to(w, (G, Npad))
    else:
        w = (jnp.arange(Npad, dtype=jnp.int32)[None, :]
             < valid_len).astype(jnp.float32)
        w = jnp.broadcast_to(w, (G, Npad))

    key = jax.random.PRNGKey(seed)
    if axis_name is not None:
        centroids0 = _kmeanspp_init_sharded(x, w, n_clusters, key, axis_name)
    elif init == "kmeans++":
        centroids0 = _kmeanspp_init(x, valid_len, n_clusters, key,
                                    group_offset=group_offset)
    else:
        perm = jax.random.permutation(key, Npad)[:n_clusters]
        init_idx = perm % jnp.maximum(valid_len, 1)
        centroids0 = jnp.take(x, init_idx, axis=1)  # [G, C, d]

    def body(_, centroids):
        _, sums, counts, pdist = _assign_chunked(x, w, centroids, chunk)
        if axis_name is not None:
            sums = jax.lax.psum(sums, axis_name)
            counts = jax.lax.psum(counts, axis_name)
        new = sums / jnp.maximum(counts, 1.0)[..., None]
        # Empty-cluster relocation, sklearn-style: the e-th empty cluster
        # (by cluster index) is relocated to the e-th farthest valid point.
        # (Sharded: relocation draws from THIS shard's farthest points —
        # shards agree on emptiness but relocate independently; the next
        # psum'd iteration re-synchronizes assignments, and relocated
        # centroids only ever absorb local outliers.)
        empty = counts <= 0.0  # [G, C]
        if axis_name is not None:
            # relocate to the GLOBALLY farthest valid point, keeping
            # centroids replicated: each shard nominates its locally
            # farthest candidates with their distances; the shard holding
            # the global max wins (exact ties psum-average, which is a
            # no-op when the tied rows are identical). Shards with no
            # valid points nominate val=-1 and never win while any shard
            # has data; if NO shard has a valid nomination, skip the
            # relocation (keep the mean update) rather than average
            # arbitrary rows.
            far_val, far_idx = jax.lax.top_k(
                jnp.where(w > 0, pdist, -1.0), n_clusters)
            rank = jnp.cumsum(empty.astype(jnp.int32), axis=-1) - 1
            rank = jnp.clip(rank, 0, n_clusters - 1)
            reloc_idx = jnp.take_along_axis(far_idx, rank, axis=-1)
            reloc_val = jnp.take_along_axis(far_val, rank, axis=-1)  # [G,C]
            reloc = jnp.take_along_axis(x, reloc_idx[..., None], axis=1)
            vmax = jax.lax.pmax(reloc_val, axis_name)                # [G,C]
            win = ((reloc_val >= vmax) & (vmax >= 0.0)
                   ).astype(jnp.float32)                             # [G,C]
            n_win = jax.lax.psum(win, axis_name)
            reloc_g = (jax.lax.psum(reloc * win[..., None], axis_name)
                       / jnp.maximum(n_win, 1.0)[..., None])
            do_reloc = empty & (n_win > 0.0)
            return jnp.where(do_reloc[..., None], reloc_g, new)
        far_val, far_idx = jax.lax.top_k(
            jnp.where(w > 0, pdist, -1.0), n_clusters)  # [G, C]
        rank = jnp.cumsum(empty.astype(jnp.int32), axis=-1) - 1  # [G, C]
        rank = jnp.clip(rank, 0, n_clusters - 1)
        reloc_idx = jnp.take_along_axis(far_idx, rank, axis=-1)  # [G, C]
        reloc = jnp.take_along_axis(x, reloc_idx[..., None], axis=1)  # [G,C,d]
        return jnp.where(empty[..., None], reloc, new)

    centroids = jax.lax.fori_loop(0, iters, body, centroids0)
    codes, _, _, _ = _assign_chunked(x, w, centroids, chunk)
    return KMeansResult(centroids=centroids, codes=codes[:, :N])


def _kmeanspp_init_sharded(x, w, n_clusters, key, axis_name, pool: int = 512):
    """k-means++ D² seeding over sequence-sharded points: each shard
    contributes a fixed-size candidate pool; pools are all_gathered (small:
    pool × d floats) and the D² Gumbel sampling runs replicated."""
    G, N, d = x.shape
    P = min(N, pool)
    kperm, kfirst, kpick = jax.random.split(key, 3)
    r = jax.lax.axis_index(axis_name)
    # per-shard distinct pool positions (valid-biased: invalid pool entries
    # get zero D² weight below)
    pool_idx = jax.random.permutation(
        jax.random.fold_in(kperm, r), N)[:P]
    xp_loc = jnp.take(x, pool_idx, axis=1)               # [G, P, d]
    wp_loc = jnp.take(w, pool_idx, axis=1)               # [G, P]
    xp = jax.lax.all_gather(xp_loc, axis_name, axis=1,
                            tiled=True)                  # [G, sp*P, d]
    wp = jax.lax.all_gather(wp_loc, axis_name, axis=1, tiled=True)
    # first centroid: uniform Gumbel pick over VALID pool entries — for a
    # left-padded prompt, shard 0's pool (and thus xp[:, :1]) is mostly
    # pad rows; seeding on one would skew every subsequent D² pick
    g0 = -jnp.log(-jnp.log(jax.random.uniform(
        kfirst, (1, xp.shape[1]), minval=1e-12, maxval=1.0)))
    logit0 = jnp.where(wp > 0, 0.0, -jnp.inf)
    pick0 = jnp.argmax(logit0 + g0, axis=-1)             # [G]
    first = jnp.take_along_axis(xp, pick0[:, None, None], axis=1)

    def step(carry, key_i):
        min_d2, = carry
        g = -jnp.log(-jnp.log(jax.random.uniform(
            key_i, (1, xp.shape[1]), minval=1e-12, maxval=1.0)))
        logit = jnp.where((min_d2 > 0) & (wp > 0),
                          jnp.log(jnp.maximum(min_d2, 1e-30)), -jnp.inf)
        pick = jnp.argmax(logit + g, axis=-1)
        c = jnp.take_along_axis(xp, pick[:, None, None], axis=1)
        d2 = jnp.sum((xp - c) ** 2, axis=-1)
        return (jnp.minimum(min_d2, d2),), c[:, 0]

    min_d2_0 = jnp.sum((xp - first) ** 2, axis=-1)
    keys = jax.random.split(kpick, n_clusters - 1)
    (_,), rest = jax.lax.scan(step, (min_d2_0,), keys)
    return jnp.concatenate([first, rest.transpose(1, 0, 2)], axis=1)


@jax.named_scope("pq_append")
def pq_encode(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid encoding (pq_search.py:201-212 predict_index).

    x: [G, M, d], centroids: [G, C, d] → codes [G, M] int32.
    """
    x = x.astype(jnp.float32)
    cent_sq = jnp.sum(centroids ** 2, axis=-1)
    dots = jnp.einsum("gmd,gcd->gmc", x, centroids,
                      preferred_element_type=jnp.float32)
    dist = cent_sq[:, None, :] - 2.0 * dots
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# ADC (asymmetric distance computation) scoring

@jax.named_scope("pq_score")
def adc_lut_euc(q: jax.Array, centroids: jax.Array) -> jax.Array:
    """Inner-product lookup table for the "euc" metric.

    q: [H, S, d] per-q-head subvectors; centroids: [H_kv, S, C, d] —
    broadcast over the GQA group. Returns LUT [H, S, C] f32 where
    LUT[h,s,c] = q[h,s]·centroids[kv(h),s,c]  (pq_search.py:316).
    """
    H = q.shape[0]
    H_kv = centroids.shape[0]
    group = H // H_kv
    cent = jnp.repeat(centroids, group, axis=0)  # [H, S, C, d]
    return jnp.einsum("hsd,hscd->hsc", q.astype(jnp.float32),
                      cent.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


@jax.named_scope("pq_score")
def adc_lut_ip(q_lifted: jax.Array, centroids: jax.Array) -> jax.Array:
    """Squared-L2 lookup table for the ip2l2 metric (pq_search.py:408).

    q_lifted: [H, S, d+1]; centroids: [H_kv, S, C, d+1] → LUT [H, S, C].
    """
    H = q_lifted.shape[0]
    H_kv = centroids.shape[0]
    group = H // H_kv
    cent = jnp.repeat(centroids, group, axis=0)
    diff_sq = jnp.sum((q_lifted[:, :, None, :].astype(jnp.float32)
                       - cent.astype(jnp.float32)) ** 2, axis=-1)
    return diff_sq


@jax.named_scope("pq_score")
def adc_gather_scores(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """Gather+sum the LUT by PQ codes.

    lut: [H, S, C]; codes: [H_kv, S, T] int32 (broadcast over the GQA group).
    Returns scores [H, T] f32: scores[h,t] = Σ_s lut[h,s,codes[kv(h),s,t]]
    (pq_search.py:317: gather + sum over subvectors).
    """
    H, S, C = lut.shape
    H_kv = codes.shape[0]
    group = H // H_kv
    # [H_kv, group, S, C] gathered at [H_kv, 1, S, T] → [H_kv, group, S, T]
    lut_g = lut.reshape(H_kv, group, S, C)
    gathered = jnp.take_along_axis(
        lut_g, codes[:, None, :, :].astype(jnp.int32), axis=-1)
    return jnp.sum(gathered, axis=2).reshape(H, -1)


# ---------------------------------------------------------------------------
# Joint-code-histogram block scorer (S=2 exact factorization).
#
# With S=2 subvectors (the paper's default, run_llama.sh:14) the per-token
# softmax numerator factorizes over subvectors:
#     exp(s_t·λ) = exp(LUT[0, c0(t)]·λ) · exp(LUT[1, c1(t)]·λ)
# so a block's total attention mass is an inner product between the
# outer product of the two exponentiated LUT rows and the block's JOINT
# code histogram J[c0·C+c1, blk] — a counts matrix that depends only on
# the codes, precomputed at prefill and updated by +1 as tokens join the
# candidate set. Scoring a decode step then costs one [g, C²]·[C², NB]
# matmul per kv head (pure MXU, ~C²·NB MACs) instead of sweeping all T
# candidate codes (the adc_* kernels above) — the score work per step
# drops from O(T) to O(C²·T/block) with IDENTICAL ranking (normalized
# per-q-head block mass, same as adc_block_scores_pallas).

@jax.named_scope("pq_score")
def build_joint_hist(codes: jax.Array, n_valid: jax.Array, *,
                     n_centroids: int, block: int) -> jax.Array:
    """codes [H_kv, 2, T] int (T % block == 0); tokens at index >= n_valid
    are excluded. Returns J [H_kv, T//block, C²] uint8 — counts exact
    below 255, saturated at 255 (see jhist_dtype). C² is the MINOR dim:
    it is 128-lane-aligned for C ≥ 12 (no tile padding — NB-minor padded
    258 → 384, 1.5× the memory) and it is the contraction dim of
    joint_block_mass's matmul."""
    H_kv, S, T = codes.shape
    assert S == 2, "joint histogram requires exactly 2 subvectors"
    assert block <= 256, "counts exact only up to 256"
    C = n_centroids
    NB = T // block
    pair = (codes[:, 0].astype(jnp.int32) * C
            + codes[:, 1].astype(jnp.int32))                 # [H_kv, T]
    blk = jnp.arange(T, dtype=jnp.int32) // block
    seg = blk[None, :] * (C * C) + pair                      # [H_kv, T]
    ones = jnp.where(jnp.arange(T) < jnp.asarray(n_valid, jnp.int32),
                     1.0, 0.0).astype(jnp.float32)
    J = jax.vmap(lambda s: jax.ops.segment_sum(
        ones, s, num_segments=NB * C * C))(seg)
    dt = jhist_dtype(block)
    if jnp.issubdtype(dt, jnp.integer):
        J = jnp.minimum(J, jnp.iinfo(dt).max)   # saturate (block == 256)
    return J.reshape(H_kv, NB, C * C).astype(dt)


def jhist_dtype(block: int):
    """uint8 counts (half the scorer's HBM reads vs bf16). A count can
    only reach 256 when ALL `block` tokens of a 256-block share one code
    pair; counts SATURATE at 255, losing ≤1/256 (0.4%) of such a block's
    mass — ranking-irrelevant (the exp LUT factor dominates), and the
    memory halving is what fits a 16-slot 32k pool's scorer on chip.

    Only meaningful for jhist-scorer configs (block ≤ 256); callers must
    gate on use_jhist before asking for a dtype."""
    if block > 256:
        raise ValueError(
            f"joint-histogram scorer requires select_block <= 256 "
            f"(uint8 counts saturate); got block={block}. Configs with "
            f"larger blocks must not use the jhist scorer.")
    return jnp.uint8


def jhist_increment(J: jax.Array, idx) -> jax.Array:
    """+1 at `idx` (an advanced-index tuple addressing one cell per
    (leading, head) row). Integer histograms increment SATURATING at the
    dtype max — a wrap at 255+1 would zero the block's dominant pair —
    via gather → min → scatter-SET (rows never collide, so set is
    race-free). The one shared implementation for every join site
    (jhist_add_tokens, the batched join, the offload tier)."""
    if jnp.issubdtype(J.dtype, jnp.integer):
        cap = jnp.iinfo(J.dtype).max
        cur = J[idx].astype(jnp.int32)
        return J.at[idx].set(jnp.minimum(cur + 1, cap).astype(J.dtype))
    return J.at[idx].add(jnp.asarray(1.0, J.dtype))


@jax.named_scope("pq_append")
def jhist_add_tokens(J: jax.Array, codes_tok: jax.Array,
                     pos: jax.Array, *, n_centroids: int,
                     block: int) -> jax.Array:
    """Count newly-joined candidate tokens into the histogram.

    J [..., H_kv, NB, C²]; codes_tok [..., H_kv, 2] int — the joining
    token's codes per (leading dims, kv head); pos i32 scalar — its tail
    position (same for every leading dim). Returns J + 1 (saturating,
    jhist_increment) at ([...], h, pos // block, pair)."""
    C = n_centroids
    pair = (codes_tok[..., 0].astype(jnp.int32)
            * C + codes_tok[..., 1].astype(jnp.int32))       # [..., H_kv]
    blk = jnp.asarray(pos, jnp.int32) // block
    lead = tuple(jnp.ix_(*[jnp.arange(n) for n in pair.shape]))
    return jhist_increment(J, lead + (blk, pair))


def jhist_exp_lut(lut: jax.Array, head_dim: int) -> jax.Array:
    """The scorer's exponentiated LUT factors: e[h, s, c] =
    exp((lut − max_c lut)·scale). Shared by joint_block_mass and the
    deferred-join correction so both add EXACTLY the same terms."""
    scale = 1.0 / (head_dim ** 0.5)
    m = jnp.max(lut, axis=-1, keepdims=True)                 # [H, 2, 1]
    return jnp.exp((lut.astype(jnp.float32) - m) * scale)    # [H, 2, C]


@jax.named_scope("pq_score")
def joint_block_mass(lut: jax.Array, J: jax.Array, *,
                     head_dim: int, normalize: bool = True) -> jax.Array:
    """Per-q-head normalized block attention mass from the joint histogram.

    lut [H, 2, C] f32 (H may be a folded B·H); J [H_kv, NB, C²] with
    H_kv | H. Returns [H, NB] f32, rows summing to 1 over non-empty
    blocks — the same quantity adc_block_scores_pallas emits, computed as
    one batched matmul. The per-subvec max subtraction is a per-q-head
    constant shift, so the normalized mass is exactly the softmax mass.
    normalize=False returns the raw mass (deferred-join callers add the
    pending-token correction first, then normalize)."""
    H, S, C = lut.shape
    H_kv = J.shape[0]
    g = H // H_kv
    e = jhist_exp_lut(lut, head_dim)                         # [H, 2, C]
    pair = (e[:, 0, :, None] * e[:, 1, None, :]).reshape(H, C * C)
    mass = jnp.einsum(
        "hgp,hnp->hgn", pair.reshape(H_kv, g, C * C),
        J.astype(jnp.float32),
        preferred_element_type=jnp.float32).reshape(H, -1)
    if not normalize:
        return mass
    z = jnp.sum(mass, axis=-1, keepdims=True)
    return mass / jnp.maximum(z, 1e-30)


def _valid_masks(n_valid: jax.Array, H_kv: int, group: int, T: int):
    """Candidate-validity masks from a scalar n_valid (single sequence) or a
    per-kv-head [H_kv] vector (batch-as-heads: slots folded into the head
    axis carry per-slot candidate counts). Returns (valid_kv [H_kv or 1, T],
    valid_q [H or 1, T])."""
    n_valid = jnp.asarray(n_valid, jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)
    if n_valid.ndim == 0:
        v = (pos < n_valid)[None, :]
        return v, v
    valid_kv = pos[None, :] < n_valid[:, None]           # [H_kv, T]
    valid_q = jnp.repeat(valid_kv, group, axis=0)        # [H, T]
    return valid_kv, valid_q


@jax.named_scope("pq_select")
def group_scores(
    scores: jax.Array,
    n_valid: jax.Array,
    *,
    group: int,
    head_dim: int,
    metric: str = "euc",
) -> jax.Array:
    """GQA-reduced per-kv-head candidate importances (the reduction inside
    mips_topk, without the selection): euc → softmax attention mass summed
    over the group (pq_search.py:319-321); ip → negative summed distance.
    n_valid: scalar or [H_kv]. Returns [H_kv, T] with invalid at -inf."""
    H, T = scores.shape
    H_kv = H // group
    valid_kv, valid_q = _valid_masks(n_valid, H_kv, group, T)
    if metric == "euc":
        masked = jnp.where(valid_q, scores / jnp.sqrt(float(head_dim)),
                           -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        probs = jnp.where(valid_q, probs, 0.0)
        g = jnp.sum(probs.reshape(H_kv, group, T), axis=1)
    else:
        g = -jnp.sum(scores.reshape(H_kv, group, T), axis=1)
    return jnp.where(valid_kv, g, -jnp.inf)


@jax.named_scope("pq_select")
def mips_topk(
    scores: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    group: int,
    head_dim: int,
    metric: str = "euc",
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """GQA-reduced top-k candidate selection (pq_search.py:318-322, 416-417).

    scores: [H, T] raw per-q-head ADC scores; positions >= n_valid are
    padding (n_valid: scalar, or [H_kv] per-kv-head counts for
    batch-as-heads). euc: softmax(scores/√head_dim) per q-head, summed over
    each GQA group, take largest k. ip: sum the (distance) scores over the
    group, take *smallest* k. Returns (topk_idx [H_kv, k] i32,
    group_scores [H_kv, T]).
    """
    H, T = scores.shape
    H_kv = H // group
    valid_kv, valid_q = _valid_masks(n_valid, H_kv, group, T)

    def pick(sel):
        # sort-based exact top-k is O(T log T) per head on TPU; the
        # TPU-optimized approx_max_k (recall ≥ 0.98 of an already
        # approximate PQ ranking) is the production path.
        if approx:
            _, idx = jax.lax.approx_max_k(sel, k, recall_target=0.98)
        else:
            _, idx = jax.lax.top_k(sel, k)
        return idx.astype(jnp.int32)

    if metric == "euc":
        masked = jnp.where(valid_q, scores / jnp.sqrt(float(head_dim)),
                           -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        probs = jnp.where(valid_q, probs, 0.0)
        g = jnp.sum(probs.reshape(H_kv, group, T), axis=1)
        return pick(jnp.where(valid_kv, g, -jnp.inf)), g
    elif metric == "ip":
        g = jnp.sum(scores.reshape(H_kv, group, T), axis=1)
        return pick(jnp.where(valid_kv, -g, -jnp.inf)), g
    raise ValueError(f"unknown metric {metric}")


@jax.named_scope("pq_select")
def mips_topk_blocks(
    scores: jax.Array,
    n_valid: jax.Array,
    k_tokens: int,
    *,
    group: int,
    head_dim: int,
    block: int,
    metric: str = "euc",
    approx: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Block-granular MIPS selection: rank fixed-size candidate blocks by
    their total (GQA-reduced) attention mass and select ⌈k/block⌉ blocks.

    TPU-first variant of the per-token top-k: the selection problem shrinks
    by `block`× and the KV fetch becomes contiguous block reads instead of
    scattered rows. Token-level recall is slightly diluted (quality-checked
    by the recall oracle); the reference's own HBM cache works at the same
    block granularity (cache_manager.py:119-123).

    n_valid: scalar, or [H_kv] per-kv-head counts (batch-as-heads).
    Returns (block_idx [H_kv, k_blocks] i32, group_scores [H_kv, T]).
    """
    H, T = scores.shape
    H_kv = H // group
    assert T % block == 0, (T, block)
    k_blocks = max((k_tokens + block - 1) // block, 1)
    valid_kv, valid_q = _valid_masks(n_valid, H_kv, group, T)
    if metric == "euc":
        masked = jnp.where(valid_q, scores / jnp.sqrt(float(head_dim)),
                           -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        probs = jnp.where(valid_q, probs, 0.0)
        g = jnp.sum(probs.reshape(H_kv, group, T), axis=1)
        blk = jnp.sum(g.reshape(H_kv, T // block, block), axis=-1)
    else:
        g = jnp.sum(scores.reshape(H_kv, group, T), axis=1)
        gv = jnp.where(valid_kv, -g, 0.0)  # smaller distance = better
        # mean over VALID tokens, not sum: negated-distance sums would
        # systematically favor partially-valid boundary blocks (fewer terms
        # → less negative mass) over full blocks regardless of content
        cnt = jnp.sum(jnp.broadcast_to(valid_kv, (H_kv, T))
                      .astype(jnp.float32)
                      .reshape(H_kv, T // block, block), axis=-1)
        blk = (jnp.sum(gv.reshape(H_kv, T // block, block), axis=-1)
               / jnp.maximum(cnt, 1.0))
    n_valid_b = jnp.asarray(n_valid, jnp.int32)
    if n_valid_b.ndim == 0:
        n_valid_b = n_valid_b[None, None]
    else:
        n_valid_b = n_valid_b[:, None]
    blk_valid = (jnp.arange(T // block, dtype=jnp.int32)[None, :] * block
                 < n_valid_b)
    sel = jnp.where(blk_valid, blk, -jnp.inf)
    if approx:
        _, idx = jax.lax.approx_max_k(sel, k_blocks, recall_target=0.98)
    else:
        _, idx = jax.lax.top_k(sel, k_blocks)
    return idx.astype(jnp.int32), g


@jax.named_scope("pq_select")
def topk_from_block_mass(
    blk_mass: jax.Array,
    n_valid: jax.Array,
    k_tokens: int,
    *,
    group: int,
    block: int,
    approx: bool = True,
) -> jax.Array:
    """Block selection from pre-reduced per-q-head block attention mass
    (the fused adc_block_scores_pallas kernel's output): group-sum
    [H → H_kv], mask blocks past n_valid, top-⌈k/block⌉.

    blk_mass [H, NB] f32 (rows ~sum to 1); n_valid scalar or [H_kv].
    Returns block_idx [H_kv, k_blocks] i32 — same contract as
    mips_topk_blocks' first return.
    """
    H, NB = blk_mass.shape
    H_kv = H // group
    k_blocks = max((k_tokens + block - 1) // block, 1)
    g = jnp.sum(blk_mass.reshape(H_kv, group, NB), axis=1)
    n_valid_b = jnp.asarray(n_valid, jnp.int32)
    n_valid_b = (n_valid_b[None, None] if n_valid_b.ndim == 0
                 else n_valid_b[:, None])
    blk_valid = (jnp.arange(NB, dtype=jnp.int32)[None, :] * block
                 < n_valid_b)
    sel = jnp.where(blk_valid, g, -jnp.inf)
    if approx:
        _, idx = jax.lax.approx_max_k(sel, k_blocks, recall_target=0.98)
    else:
        _, idx = jax.lax.top_k(sel, k_blocks)
    return idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Convenience: full exact-vs-PQ recall oracle (retrieval quality test)

def exact_topk(q: jax.Array, keys: jax.Array, n_valid: jax.Array, k: int,
               *, group: int) -> jax.Array:
    """Exact per-q-head attention-logit top-k over candidates, matching the
    recall oracle of the reference (retrieval_based_compressor.py:19-29:
    real_weight = q @ K^T, largest-k per q head, no softmax/group reduction).

    q: [H, d]; keys: [H_kv, T, d] → idx [H, k].
    """
    H, d = q.shape
    H_kv, T, _ = keys.shape
    keys_rep = jnp.repeat(keys, group, axis=0)  # [H, T, d]
    logits = jnp.einsum("hd,htd->ht", q.astype(jnp.float32),
                        keys_rep.astype(jnp.float32))
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_valid
    masked = jnp.where(valid, logits, -jnp.inf)
    _, idx = jax.lax.top_k(masked, k)
    return idx.astype(jnp.int32)


def topk_recall(pq_idx: jax.Array, exact_idx: jax.Array, *, group: int) -> jax.Array:
    """Fraction of exact top-k recovered by the PQ top-k
    (retrieval_based_compressor.py:32-52). pq_idx [H_kv, k] is broadcast over
    the GQA group and intersected with exact_idx [H, k] per q head."""
    pq_rep = jnp.repeat(pq_idx, group, axis=0)  # [H, k]
    eq = exact_idx[:, :, None] == pq_rep[:, None, :]
    hits = jnp.sum(jnp.any(eq, axis=-1))
    return hits / exact_idx.size
