"""dp×tp batched serving engine: batch-as-heads decode under shard_map.

Combines the two parallel axes over one mesh:
  * `dp` shards the SLOT pool: each data-parallel group owns B/dp sequence
    slots (its own prompts, counters, and KV/PQ state);
  * `tp` shards the heads within every slot (Megatron psums on the
    attention-output and MLP-down projections, as in parallel/tp_decode.py).

State layout: the batched state is kept 5-D at rest —
[L, B, H_kv, ...] with PartitionSpec (None, "dp", "tp", ...) — and each
device FOLDS its local [L, B_loc, H_kv_loc, ...] block to the
batch-as-heads layout [L, B_loc·H_kv_loc, ...] inside the shard_map body
(reshape, free). This keeps the global layout independent of the mesh
shape while the per-device compute is exactly the single-device batched
engine (policies/pq_search.py decode_attn_batched).

Prefill runs in dp WAVES: wave w prefills dp sequences concurrently (each
dp group its own prompt, tp-sharded compute) and inserts them at local
slot w.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy
from pqcache_tpu.parallel.tp_decode import PARAM_SPECS, local_model_config
from pqcache_tpu.runtime.state import PQState


# 5-D state specs: [L, B, H_kv, ...] → (None, "dp", "tp", ...)
def batch_state_specs(jhist: bool = False, ring: bool = False,
                      int8_scales: bool = False) -> PQState:
    h5 = P(None, "dp", "tp", None, None)
    return PQState(
        k_sink=h5, v_sink=h5, kv_tail=h5, codes=h5,
        centroids=P(None, "dp", "tp", None, None, None),
        phi=h5, n_cand=P("dp"), pos=P("dp"),
        jhist=h5 if jhist else None,
        ring_kv=h5 if ring else None,
        ring_r=P() if ring else None,
        k_scale=h5 if int8_scales else None,
        v_scale=h5 if int8_scales else None)


BATCH_STATE_SPECS = batch_state_specs()


def _unfold(state: PQState, B: int) -> PQState:
    """[L, B·H_kv, ...] folded → [L, B, H_kv, ...] at-rest layout."""
    def go(a):
        if a.ndim <= 1:
            return a
        return a.reshape(a.shape[0], B, a.shape[1] // B, *a.shape[2:])
    return jax.tree_util.tree_map(go, state)


def _fold(state: PQState) -> PQState:
    """[L, B, H_kv, ...] at-rest → [L, B·H_kv, ...] batch-as-heads."""
    def go(a):
        if a.ndim <= 1:
            return a
        return a.reshape(a.shape[0], a.shape[1] * a.shape[2], *a.shape[3:])
    return jax.tree_util.tree_map(go, state)


class BatchTPEngine:
    """B sequence slots over a (dp, tp) mesh; batch-as-heads decode."""

    def __init__(self, cfg: EngineConfig, params: dict, mesh: Mesh,
                 prefill_len: int, max_new_tokens: int, dtype=jnp.bfloat16,
                 interleave: str = "auto"):
        """interleave: "auto"/"on"/"off" — same contract as
        runtime/batch_engine.BatchEngine. "on"/"auto" (with a chunked
        prefill) gives serve_local SLAB-wise collective admission: one
        chunk-major slab program per decode chunk instead of a monolithic
        prefill wave, so running streams on every host stall at most one
        slab per admission."""
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.tp = mesh.shape["tp"]
        self.cfg_local = local_model_config(cfg, self.tp)
        # with chunked prefill on, round the slot capacity up to the
        # chunk_plan padding so prefill_wave ALWAYS takes the chunked path
        # (a silent full-length fallback would reintroduce the activation
        # OOM the feature exists to prevent); callers pad prompts to self.P
        ch_eff = 0
        if cfg.runtime.prefill_chunk and prefill_len > cfg.runtime.prefill_chunk:
            from pqcache_tpu.runtime.generate import chunk_plan_capped
            # max_seq_len is a hard reservation cap here too (chunk_plan
            # alone silently padded the pool past it — review finding)
            # ch_eff == 0 means the cap forced the unchunked fallback
            prefill_len, ch_eff = chunk_plan_capped(
                prefill_len, cfg.runtime.prefill_chunk,
                cfg.runtime.max_seq_len)
        self.P = prefill_len
        self._pf_chunk = ch_eff
        self.max_new = max_new_tokens
        self.dtype = dtype
        self.params = params
        self.budget = compute_budget(cfg.budget, prefill_len, max_new_tokens)
        self.policy = get_policy(self.cfg_local, self.budget)
        if interleave not in ("auto", "on", "off"):
            raise ValueError(f"interleave must be auto/on/off, "
                             f"got {interleave!r}")
        self.interleave = bool(ch_eff) and interleave != "off"
        if interleave == "on" and not self.interleave:
            raise ValueError("interleave='on' requires a chunked prefill "
                             "(runtime.prefill_chunk)")

        local_m = self.cfg_local.model
        policy = self.policy
        sspec = batch_state_specs(jhist=policy.use_jhist,
                                  ring=bool(policy.ring_k),
                                  int8_scales=policy.kv_int8)
        self._sspec = sspec

        def insert_single(bstate, st, lslot, admit):
            """Predicated fold of a prefilled single-sequence LOCAL state
            into local slot `lslot` (admit == 0: state untouched;
            lax.cond keeps the no-admit branch copy-free). Shared by the
            monolithic prefill wave and the slab admission's tail."""
            def do_insert(b_in):
                def ins(b, s):
                    # b [L, B_loc, H_kv_loc, ...]; s [L, H_kv_loc, ...]
                    return jax.lax.dynamic_update_slice(
                        b, s[:, None].astype(b.dtype),
                        (0, lslot) + (0,) * (b.ndim - 2))
                return PQState(
                    k_sink=ins(b_in.k_sink, st.k_sink),
                    v_sink=ins(b_in.v_sink, st.v_sink),
                    kv_tail=ins(b_in.kv_tail, st.kv_tail),
                    codes=ins(b_in.codes, st.codes),
                    centroids=ins(b_in.centroids, st.centroids),
                    phi=ins(b_in.phi, st.phi),
                    n_cand=b_in.n_cand.at[lslot].set(st.n_cand),
                    pos=b_in.pos.at[lslot].set(st.pos),
                    jhist=(ins(b_in.jhist, st.jhist)
                           if policy.use_jhist else None),
                    ring_kv=b_in.ring_kv, ring_r=b_in.ring_r,
                    k_scale=(ins(b_in.k_scale, st.k_scale)
                             if policy.kv_int8 else None),
                    v_scale=(ins(b_in.v_scale, st.v_scale)
                             if policy.kv_int8 else None))

            return jax.lax.cond(admit[0] > 0, do_insert, lambda b: b,
                                bstate)

        def prefill_wave(p, bstate, tokens, pad, tlen, lslot, admit):
            """One dp wave: each dp group prefills ITS prompt (tokens local
            [1, P]) and inserts the result at local slot `lslot` — unless
            its `admit` flag is 0 (continuous serving: groups with nothing
            to admit participate in the collective prefill but leave their
            state untouched)."""
            single = policy.init_state(dtype)
            if ch_eff:
                # __init__ chunk-planned self.P, so the plan always divides
                assert prefill_len % ch_eff == 0, (prefill_len, ch_eff)
                logits, st = llama.prefill_chunked(
                    local_m, p, policy, single, tokens[0], pad[0], tlen[0],
                    chunk=ch_eff, axis_name="tp")
            else:
                logits, st = llama.prefill(local_m, p, policy, single,
                                           tokens[0], pad[0], tlen[0],
                                           axis_name="tp")
            first = jnp.argmax(logits).astype(jnp.int32)
            return first[None], insert_single(bstate, st, lslot, admit)

        def admit_tail(p, bstate, kbuf, vbuf, h_last, pad, tlen, lslot,
                       admit):
            """Finish a slab-wise admission wave: the policy tail over the
            assembled per-layer K/V, first token, predicated insert —
            exactly what the monolithic wave computes, sliced so decode
            chunks ran between the slabs."""
            single = policy.init_state(dtype)
            logits, st = llama.prefill_finish_tail(
                local_m, p, policy, single, kbuf[0], vbuf[0], h_last[0],
                pad[0], tlen[0])
            first = jnp.argmax(logits).astype(jnp.int32)
            return first[None], insert_single(bstate, st, lslot, admit)

        def decode_chunk(p, bstate, toks, poss, n):
            folded = _fold(bstate)
            out, folded = llama.decode_loop_batched(
                local_m, p, policy, folded, toks, poss, n, axis_name="tp")
            B_loc = bstate.n_cand.shape[0]
            return out.T, _unfold(folded, B_loc)   # [B_loc, n]

        self.chunk = min(16, max(max_new_tokens - 1, 1))
        if policy.ring_k:
            self.chunk = min(self.chunk, policy.ring_k)
        self._prefill = jax.jit(shard_map(
            prefill_wave, mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P("dp", None), P("dp"), P("dp"),
                      P(), P("dp")),
            out_specs=(P("dp"), sspec), check_rep=False),
            donate_argnums=(1,))
        self._decode = jax.jit(shard_map(
            lambda p, s, t, pos, n=self.chunk: decode_chunk(p, s, t, pos, n),
            mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P("dp"), P("dp")),
            out_specs=(P("dp", None), sspec), check_rep=False),
            donate_argnums=(1,))

        # slab-wise admission programs (interleaved serve_local): per-dp
        # admission K/V buffers [dp, L, H_kv, P, D] (head axis tp-sharded),
        # one chunk-major slab program per static offset, one tail program
        self._kvspec = P("dp", None, "tp", None, None)
        self._slab_cache: dict = {}
        if self.interleave:
            self._admit_tail = jax.jit(shard_map(
                admit_tail, mesh=mesh,
                in_specs=(PARAM_SPECS, sspec, self._kvspec, self._kvspec,
                          P("dp", None, None), P("dp"), P("dp"), P(),
                          P("dp")),
                out_specs=(P("dp"), sspec), check_rep=False),
                donate_argnums=(1, 2, 3, 4))

    def _slab_fn(self, c0: int):
        """Jitted collective slab program for STATIC offset c0: every dp
        group advances its admission's rows [c0, c0+ch) through all layers
        (tp-sharded heads, psum'd projections)."""
        if c0 in self._slab_cache:
            return self._slab_cache[c0]
        local_m = self.cfg_local.model
        pol = self.policy

        def f(p, kbuf, vbuf, toks_c, pad):
            hidden_c = llama.embed_lookup(p, toks_c[0])
            kb, vb, h = llama.prefill_chunk_step(
                local_m, p, kbuf[0], vbuf[0], hidden_c, pad[0], c0,
                use_pallas=getattr(pol, "use_pallas", None),
                interpret=getattr(pol, "interpret", False), axis_name="tp")
            return kb[None], vb[None], h[None]

        fn = jax.jit(shard_map(
            f, mesh=self.mesh,
            in_specs=(PARAM_SPECS, self._kvspec, self._kvspec,
                      P("dp", None), P("dp")),
            out_specs=(self._kvspec, self._kvspec, P("dp", None, None)),
            check_rep=False), donate_argnums=(1, 2))
        self._slab_cache[c0] = fn
        return fn

    def init_state(self, B: int) -> PQState:
        """Global 5-D zero state for B slots (B divisible by dp)."""
        from pqcache_tpu.runtime.state import make_pq_state
        import dataclasses
        cfg_g = dataclasses.replace(
            self.cfg_local,
            model=dataclasses.replace(
                self.cfg_local.model,
                num_kv_heads=self.cfg_local.model.num_kv_heads * self.tp,
                num_heads=self.cfg_local.model.num_heads * self.tp))
        folded = make_pq_state(
            cfg_g, self.budget, dtype=self.dtype, batch=B,
            **self.policy._batched_alloc())
        return _unfold(folded, B)

    def generate_batch(self, prompts: list, max_new_tokens: int,
                       eos_ids=()) -> list:
        """Prefill + decode B = len(prompts) sequences (B % dp == 0).
        Returns a list of token lists."""
        B = len(prompts)
        assert B % self.dp == 0, (B, self.dp)
        if max_new_tokens > self.max_new:
            raise ValueError("max_new_tokens exceeds engine reservation")
        B_loc = B // self.dp
        bstate = self.init_state(B)

        firsts = np.zeros((B,), np.int32)
        for w in range(B_loc):
            toks = np.zeros((self.dp, self.P), np.int32)
            pads = np.zeros((self.dp,), np.int32)
            tlens = np.zeros((self.dp,), np.int32)
            for g in range(self.dp):
                ids = np.asarray(prompts[g * B_loc + w], np.int32)
                pads[g] = self.P - len(ids)
                tlens[g] = len(ids)
                toks[g, pads[g]:] = ids
            first, bstate = self._prefill(
                self.params, bstate, jnp.asarray(toks), jnp.asarray(pads),
                jnp.asarray(tlens), jnp.asarray(w, jnp.int32),
                jnp.ones((self.dp,), jnp.int32))
            f = np.asarray(first)
            for g in range(self.dp):
                firsts[g * B_loc + w] = f[g]

        # slot order on device: dp-major (group g, local slot w)
        outs = [[int(firsts[i])] for i in range(B)]
        poss = np.asarray([len(np.asarray(p)) for p in prompts], np.int32)
        done = [outs[i][0] in eos_ids for i in range(B)]
        while any(len(o) < max_new_tokens and not d
                  for o, d in zip(outs, done)):
            cur = jnp.asarray([o[-1] for o in outs], jnp.int32)
            toks, bstate = self._decode(
                self.params, bstate, cur, jnp.asarray(poss))
            t_np = np.asarray(toks)  # [B, chunk]
            poss = poss + self.chunk
            for i in range(B):
                if done[i]:
                    continue
                for t in t_np[i]:
                    outs[i].append(int(t))
                    if int(t) in eos_ids or len(outs[i]) >= max_new_tokens:
                        done[i] = True
                        break
        return [o[:max_new_tokens] for o in outs]
