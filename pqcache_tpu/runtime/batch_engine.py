"""Slot-based continuous batching engine (batch-as-heads).

The reference hard-asserts batch size 1 (mistral_patch.py:61,
pq_search.py:234); serving throughput there comes from nothing. Round 1
vmapped the single-sequence decode over a slot pool, which scaled
pathologically (B=2 ≈ 2.4× B=1 — the vmapped scan/carry composition
serializes). This engine instead folds the B slots into the KV-HEAD axis
(state [L, B·H_kv, ...], counters [B] — see policies/pq_search.py
`decode_attn_batched`): attention/ADC/top-k/gather are head-parallel
already, and the MLP/embedding side becomes ordinary [B, E] matmuls.

Scheduling is iteration-level at chunk granularity (Orca/vLLM-style):

  * prefill runs per-sequence (single-sequence program, reused across
    slots) and the resulting state is inserted into the batched state at a
    free slot (one dynamic_update_slice per array along the head axis);
  * the fused decode loop advances ALL active slots `chunk` tokens in one
    device program;
  * between chunks, finished sequences retire and waiting sequences are
    admitted into their slots, with the chunk length bounding admission
    latency.

All slots share one (bucketed) prefill length P and therefore one budget —
the usual padded-batch discipline. Finished slots keep computing until
retired; their outputs are masked.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy
from pqcache_tpu.runtime.generate import bucket_length


@dataclasses.dataclass
class _Slot:
    seq_id: Optional[int] = None
    tokens: Optional[list] = None
    done: bool = True
    next_tok: int = 0
    pos: int = 0


@dataclasses.dataclass
class _Admission:
    """An in-flight INTERLEAVED admission: chunk-major prefill advanced
    one slab at a time between decode chunks (llama.prefill_chunk_step).
    Holds the per-layer K/V buffers being assembled and the cursor."""
    seq_id: int
    tokens: object          # np [P] left-padded prompt
    pad: int
    true_len: int
    kbuf: object            # [L, H_kv, P, D] device
    vbuf: object
    h: object = None        # last slab's hidden rows [ch, E]
    i: int = 0              # next slab index
    n_slabs: int = 0


class BatchEngine:
    """Fixed-pool continuous batching over B slots (one device)."""

    def __init__(self, cfg: EngineConfig, params: dict, *, batch_size: int = 4,
                 prefill_len: int, max_new_tokens: int, dtype=jnp.bfloat16,
                 prefix=None, interleave: str = "auto"):
        """prefix: optional PrefixCache (runtime/generate.prefill_prefix) —
        the pool-wide shared prompt prefix (the serving pattern: one system
        prompt for every request). Each admitted prompt is then a SUFFIX of
        at most prefill_len - prefix.n tokens; its prefill pays only the
        suffix's triangle slab against the cached prefix K/V.

        interleave: "auto" (on whenever the prefill is chunked, there is
        no prefix cache, AND the admission buffers fit next to the
        resident set — see _interleave_fits), "on", or "off".
        Interleaved admissions advance
        one prefill SLAB between decode chunks (bounded stalls — tail
        latency), but hold full-length all-layer K/V admission buffers
        (kbuf/vbuf, [L, H_kv, P, D] ≈ 1 GiB at 32k/8L) for the whole
        admission. The monolithic path ("off") is layer-major: it holds
        ONE layer's K/V plus the hidden rows (~0.4 GiB) — at pool sizes
        where the batched state + weights nearly fill the chip (pool=16
        int8 @ 32k/8L ≈ 14 GiB of 16), "off" is what makes admission fit,
        at the cost of a full-prefill stall per admission."""
        self.cfg = cfg
        self.params = params
        self.B = batch_size
        self.P = prefill_len
        self.prefix = prefix
        self.P_suf = prefill_len - (prefix.n if prefix is not None else 0)
        if self.P_suf <= 0:
            raise ValueError(f"prefix {prefix.n} leaves no suffix room "
                             f"under prefill_len {prefill_len}")
        # chunked (activation-bounded) admit prefill: admissions run with
        # the pool's multi-GB batched state RESIDENT, so full-length
        # prefill activations are the pool's peak-memory term (measured
        # RESOURCE_EXHAUSTED at pool=8 @ 32k/8L on a 16 GB chip). The
        # chunk plan may pad the pool prefill length up to a chunk
        # multiple; budget/state derive from the padded length.
        from pqcache_tpu.policies.base import policy_class
        from pqcache_tpu.runtime.generate import chunk_plan_capped
        ch = cfg.runtime.prefill_chunk
        pf_chunk = 0
        if prefix is None and ch and self.P > ch:
            if not hasattr(policy_class(cfg.runtime.policy), "prefill_tail"):
                # the policy can't split prefill passes; full-length
                # prefill reintroduces the activation transient the flag
                # exists to bound — surface it instead of silently padding.
                # (Both current batched policies have prefill_tail, so this
                # guards future policies; unbatched ones raise below.)
                import warnings
                warnings.warn(
                    f"policy {cfg.runtime.policy!r} has no prefill_tail; "
                    f"admissions run UNCHUNKED full-length prefill")
            else:
                # max_seq_len is a hard reservation cap (same invariant as
                # Engine.generate / OffloadEngine / BatchTPEngine)
                self.P, pf_chunk = chunk_plan_capped(
                    self.P, ch, cfg.runtime.max_seq_len)
        self.max_new = max_new_tokens
        self.dtype = dtype
        self.budget = compute_budget(cfg.budget, self.P, max_new_tokens)
        self.policy = get_policy(cfg, self.budget)
        self._pf_chunk = pf_chunk
        if not hasattr(self.policy, "decode_attn_batched"):
            raise ValueError(
                f"policy {cfg.runtime.policy!r} has no batch-as-heads decode")
        if prefix is not None and not hasattr(self.policy, "prefill_tail"):
            raise ValueError(
                f"policy {cfg.runtime.policy!r} has no prefill_tail; "
                f"prefix caching unsupported")

        m = cfg.model
        from pqcache_tpu.core.sampling import make_sampler
        self.sampler = make_sampler(cfg.runtime.temperature,
                                    cfg.runtime.top_k, cfg.runtime.top_p)
        self._key = jax.random.PRNGKey(cfg.runtime.sample_seed)

        # prefix K/V are passed as jit OPERANDS (not closure captures):
        # captured multi-hundred-MB arrays would be baked into the
        # executable as constants, duplicating the PrefixCache copy and
        # forcing a retrace if the prefix object is swapped (the Engine
        # prefix path, generate.py _fns_prefix, threads them the same way)
        if self.prefix is not None:
            def prefill_fn(params, state, pre_k, pre_v, tokens, true_len):
                # tokens [P_suf] right-padded; true_len = suffix length
                logits, st = llama.prefill_with_prefix(
                    m, params, self.policy, state, pre_k, pre_v, tokens,
                    true_len)
                if self.sampler is None:
                    return jnp.argmax(logits).astype(jnp.int32), st
                return logits, st         # first token sampled host-side
        else:
            pf_chunk = self._pf_chunk

            def prefill_fn(params, state, tokens, pad_len, true_len):
                if pf_chunk:
                    logits, st = llama.prefill_chunked(
                        m, params, self.policy, state, tokens, pad_len,
                        true_len, chunk=pf_chunk)
                else:
                    logits, st = llama.prefill(m, params, self.policy, state,
                                               tokens, pad_len, true_len)
                if self.sampler is None:
                    return jnp.argmax(logits).astype(jnp.int32), st
                return logits, st         # first token sampled host-side

        self._prefill = jax.jit(prefill_fn, donate_argnums=(1,))
        if self.sampler is None:
            def decode_chunk(params, bstate, toks, poss, n_steps):
                out, bstate = llama.decode_loop_batched(
                    m, params, self.policy, bstate, toks, poss, n_steps)
                return out.T, bstate      # [B, chunk]
            self._decode = jax.jit(decode_chunk, donate_argnums=(1,),
                                   static_argnums=(4,))
        else:
            def decode_chunk(params, bstate, toks, poss, rng, n_steps):
                out, bstate = llama.decode_loop_batched(
                    m, params, self.policy, bstate, toks, poss, n_steps,
                    sample=self.sampler, rng=rng)
                return out.T, bstate      # [B, chunk]
            self._decode = jax.jit(decode_chunk, donate_argnums=(1,),
                                   static_argnums=(5,))
        self._insert = jax.jit(
            lambda bstate, state, slot: self.policy.insert_slot(
                bstate, state, slot),
            donate_argnums=(0,))

        # INTERLEAVED admission (default whenever the prefill is chunked
        # and there is no prefix cache): admissions advance ONE slab
        # between decode chunks instead of a monolithic prefill call, so
        # running streams never stall more than one slab (the monolithic
        # path measured tbt_p95 = 16× p50 under a burst). Token streams
        # are identical either way (same math, sliced differently).
        if interleave not in ("auto", "on", "off"):
            raise ValueError(f"interleave must be auto/on/off, "
                             f"got {interleave!r}")
        self.interleave = bool(pf_chunk) and prefix is None
        if interleave == "off":
            self.interleave = False
        elif interleave == "on" and not self.interleave:
            raise ValueError("interleave='on' requires a chunked prefill "
                             "(runtime.prefill_chunk) and no prefix cache")
        self.bstate = self.policy.init_batched_state(self.B, dtype)
        self.slots: List[_Slot] = [_Slot() for _ in range(self.B)]
        if interleave == "auto" and self.interleave:
            # memory-aware fallback: at pool sizes where state + weights
            # nearly fill the chip, the interleave path's admission
            # buffers are the difference between running and
            # RESOURCE_EXHAUSTED — drop to the layer-major monolithic
            # admission instead of OOMing (explicit 'on' overrides)
            self.interleave = self._interleave_fits()
        self._slab_cache: dict = {}
        if self.interleave:
            def tail_fn(params, state, kbuf, vbuf, h_last, pad, tlen):
                logits, st = llama.prefill_finish_tail(
                    m, params, self.policy, state, kbuf, vbuf, h_last,
                    pad, tlen)
                if self.sampler is None:
                    return jnp.argmax(logits).astype(jnp.int32), st
                return logits, st
            self._admit_tail = jax.jit(tail_fn, donate_argnums=(1, 2, 3))

    def _interleave_fits(self) -> bool:
        """Whether interleaved admission's full-length all-layer K/V
        buffers (kbuf/vbuf, [L, H_kv, P, D] ≈ 1 GiB at 32k/8L) fit next
        to the resident set. Measured: pool=16 int8 @ 32k/8L holds
        bstate 8.76 + params 5.21 GiB on a 16 GiB chip — interleave OOMs
        while the layer-major monolithic admission (~0.4 GiB transient)
        runs (MEASURE_r4 serving_pool16_int8[_mono]). Conservative 90%
        threshold; devices whose limit can't be determined (CPU, or
        remote devices whose memory_stats() is None — the axon tunnel)
        keep interleave. PQCACHE_HBM_BYTES overrides."""
        lim = self._device_memory_limit()
        if not lim:
            return True
        m = self.cfg.model
        pbytes = sum(getattr(x, "nbytes", 0)
                     for x in jax.tree_util.tree_leaves(self.params))
        sbytes = sum(getattr(x, "nbytes", 0)
                     for x in jax.tree_util.tree_leaves(self.bstate))
        buf = (2 * m.num_layers * m.num_kv_heads * self.P * m.head_dim
               * jnp.dtype(self.dtype).itemsize)
        return pbytes + sbytes + buf <= 0.90 * lim

    @staticmethod
    def _device_memory_limit():
        """Device memory in bytes, or None if undeterminable. Order:
        PQCACHE_HBM_BYTES env → PJRT memory_stats()["bytes_limit"] →
        a device_kind table (remote/tunnelled TPUs report no stats)."""
        import os
        env = os.environ.get("PQCACHE_HBM_BYTES")
        if env:
            return int(env)
        d = jax.devices()[0]
        try:
            stats = d.memory_stats()
            if stats and stats.get("bytes_limit"):
                return int(stats["bytes_limit"])
        except Exception:
            pass
        kind = getattr(d, "device_kind", "") or ""
        gib = 1 << 30
        # most-specific kinds first; unknown variants (e.g. a future
        # 'v6p') fall through to None rather than guessing — an over-
        # estimate defeats the memory-aware fallback and an under-
        # estimate silently drops to monolithic admission
        # (PQCACHE_HBM_BYTES is the override for ambiguous kinds)
        for pat, size in (("v5 lite", 16 * gib), ("v5e", 16 * gib),
                          ("v5p", 95 * gib), ("v6 lite", 32 * gib),
                          ("v6e", 32 * gib),
                          ("v4", 32 * gib), ("v3", 16 * gib),
                          ("v2", 8 * gib)):
            if pat in kind.lower():
                return size
        return None

    # -- interleaved admission ----------------------------------------------

    def _slab_fn(self, c0: int):
        """Jitted chunk-major slab program for STATIC offset c0 (one
        compile per slab index, shared across admissions)."""
        if c0 in self._slab_cache:
            return self._slab_cache[c0]
        m = self.cfg.model
        ch = self._pf_chunk
        pol = self.policy

        def f(params, kbuf, vbuf, toks_c, pad):
            hidden_c = llama.embed_lookup(params, toks_c)
            return llama.prefill_chunk_step(
                m, params, kbuf, vbuf, hidden_c, pad, c0,
                use_pallas=getattr(pol, "use_pallas", None),
                interpret=getattr(pol, "interpret", False))

        fn = jax.jit(f, donate_argnums=(1, 2))
        self._slab_cache[c0] = fn
        return fn

    def _admission_start(self, seq_id: int, ids: np.ndarray) -> _Admission:
        m = self.cfg.model
        true_len = int(ids.shape[0])
        pad = self.P - true_len
        if pad < 0:
            raise ValueError(
                f"prompt {true_len} > engine prefill_len {self.P}")
        tokens = np.zeros((self.P,), np.int32)
        tokens[pad:] = ids
        kbuf = jnp.zeros((m.num_layers, m.num_kv_heads, self.P, m.head_dim),
                         self.dtype)
        return _Admission(seq_id=seq_id, tokens=tokens, pad=pad,
                          true_len=true_len, kbuf=kbuf,
                          vbuf=jnp.zeros_like(kbuf),
                          n_slabs=self.P // self._pf_chunk)

    def _admission_step(self, adm: _Admission) -> bool:
        """Advance one slab; True when the prefill slabs are exhausted."""
        ch = self._pf_chunk
        c0 = adm.i * ch
        toks_c = jnp.asarray(adm.tokens[c0:c0 + ch])
        adm.kbuf, adm.vbuf, adm.h = self._slab_fn(c0)(
            self.params, adm.kbuf, adm.vbuf, toks_c,
            jnp.asarray(adm.pad, jnp.int32))
        adm.i += 1
        return adm.i >= adm.n_slabs

    def _admission_finish(self, adm: _Admission) -> int:
        """Policy tail + slot insert; returns the slot index."""
        slot = next(i for i, s in enumerate(self.slots) if s.done)
        state = self.policy.init_state(self.dtype)
        first, state = self._admit_tail(
            self.params, state, adm.kbuf, adm.vbuf, adm.h,
            jnp.asarray(adm.pad, jnp.int32),
            jnp.asarray(adm.true_len, jnp.int32))
        if self.sampler is not None:
            self._key, sub = jax.random.split(self._key)
            first = self.sampler(sub, first)
        self.bstate = self._insert(self.bstate, state,
                                   jnp.asarray(slot, jnp.int32))
        self.slots[slot] = _Slot(seq_id=adm.seq_id, tokens=[int(first)],
                                 done=False, next_tok=int(first),
                                 pos=adm.true_len)
        return slot

    def _admit(self, seq_id: int, ids: np.ndarray) -> int:
        slot = next(i for i, s in enumerate(self.slots) if s.done)
        true_len = int(ids.shape[0])
        if self.prefix is not None:
            # suffix of the pool's shared prefix: RIGHT-padded to P_suf
            if true_len > self.P_suf:
                raise ValueError(f"suffix {true_len} > suffix capacity "
                                 f"{self.P_suf} (prefix {self.prefix.n})")
            pad = 0
            tokens = np.zeros((self.P_suf,), np.int32)
            tokens[:true_len] = ids
            pos0 = self.prefix.n + true_len
        else:
            pad = self.P - true_len
            if pad < 0:
                raise ValueError(
                    f"prompt {true_len} > engine prefill_len {self.P}")
            tokens = np.zeros((self.P,), np.int32)
            tokens[pad:] = ids
            pos0 = true_len
        state = self.policy.init_state(self.dtype)
        if self.prefix is not None:
            first, state = self._prefill(
                self.params, state, self.prefix.k, self.prefix.v,
                jnp.asarray(tokens), jnp.asarray(true_len, jnp.int32))
        else:
            first, state = self._prefill(
                self.params, state, jnp.asarray(tokens),
                jnp.asarray(pad, jnp.int32),
                jnp.asarray(true_len, jnp.int32))
        if self.sampler is not None:  # prefill returned logits: sample
            self._key, sub = jax.random.split(self._key)
            first = self.sampler(sub, first)
        self.bstate = self._insert(self.bstate, state,
                                   jnp.asarray(slot, jnp.int32))
        self.slots[slot] = _Slot(seq_id=seq_id, tokens=[int(first)],
                                 done=False, next_tok=int(first),
                                 pos=pos0)
        return slot

    def run(self, requests: Iterable[tuple[int, np.ndarray]],
            eos_ids=(), chunk: int = 16,
            arrivals: Optional[dict] = None,
            timing: Optional[dict] = None,
            admission: str = "fifo") -> dict[int, list]:
        """Process (seq_id, prompt_ids) requests; returns seq_id → tokens.

        arrivals: seq_id → earliest admission time (seconds relative to the
        call start) — a simulated request-arrival schedule; requests are
        admitted FIFO once their arrival time has passed (admission happens
        at chunk boundaries, so the chunk length bounds admission latency).
        timing: pass an empty dict to collect per-sequence wall-clock events
        (seconds relative to call start): "arrive", "admit" (prefill start,
        admit−arrive = queue wait), "first" (prefill done = first token
        available; first−arrive = TTFT under load), "done", and
        "token_times" (completion time of the chunk that produced each
        generated token — chunk-granularity decode pacing).

        With `interleave` (the default for chunked non-prefix configs),
        admissions advance one prefill SLAB per decode chunk instead of
        running monolithically, bounding every running stream's stall to
        one slab. Per-sequence token streams are identical either way.

        admission: queue discipline among ARRIVED requests —
          * "fifo": arrival order (a not-yet-arrived head never blocks an
            arrived request behind it);
          * "spf": shortest-prompt-first — under a burst, short prompts
            overtake long ones, trading worst-case wait for mean TTFT
            (the classic SJF trade; every admitted prefill still costs
            the pool-wide padded P, but spf orders the queue drain).
        """
        import time

        if admission not in ("fifo", "spf"):
            raise ValueError(f"admission must be fifo/spf, "
                             f"got {admission!r}")
        ring_k = getattr(self.policy, "ring_k", 0)
        if ring_k:
            chunk = min(chunk, ring_k)   # chunks bounded by ring capacity
        queue = list(requests)
        arrivals = arrivals or {}
        results: dict[int, list] = {}
        t0 = time.perf_counter()
        now = lambda: time.perf_counter() - t0

        def next_admit():
            """Index into `queue` of the next request to admit, or None
            if nothing has arrived yet."""
            t_now = now()
            ready = [i for i, (sid, _) in enumerate(queue)
                     if t_now >= arrivals.get(sid, 0.0)]
            if not ready:
                return None
            if admission == "spf":
                return min(ready, key=lambda i: len(queue[i][1]))
            return ready[0]

        def sleep_to_next_arrival():
            nxt_t = min(arrivals.get(sid, 0.0) for sid, _ in queue)
            time.sleep(max(0.0, nxt_t - now()))

        def rec(sid, key, val):
            if timing is not None:
                timing.setdefault(sid, {})[key] = val

        def decode_once():
            toks = jnp.asarray([s.next_tok for s in self.slots], jnp.int32)
            poss = jnp.asarray([s.pos for s in self.slots], jnp.int32)
            if self.sampler is None:
                out_toks, self.bstate = self._decode(
                    self.params, self.bstate, toks, poss, chunk)
            else:
                self._key, sub = jax.random.split(self._key)
                out_toks, self.bstate = self._decode(
                    self.params, self.bstate, toks, poss, sub, chunk)
            out_np = np.asarray(out_toks)  # [B, chunk] (sync point)
            t_chunk = now()
            for i, s in enumerate(self.slots):
                if s.done:
                    continue
                for t in out_np[i]:
                    t = int(t)
                    s.tokens.append(t)
                    s.pos += 1
                    if timing is not None:
                        timing[s.seq_id]["token_times"].append(t_chunk)
                    if t in eos_ids or len(s.tokens) >= self.max_new:
                        s.done = True
                        results[s.seq_id] = s.tokens
                        rec(s.seq_id, "done", t_chunk)
                        break
                s.next_tok = s.tokens[-1]

        if self.interleave:
            pending: Optional[_Admission] = None
            while queue or pending is not None or any(
                    not s.done for s in self.slots):
                if (pending is None and queue
                        and any(s.done for s in self.slots)):
                    q_i = next_admit()
                    if q_i is not None:
                        sid, ids = queue.pop(q_i)
                        rec(sid, "arrive", arrivals.get(sid, 0.0))
                        rec(sid, "admit", now())
                        pending = self._admission_start(
                            sid, np.asarray(ids, np.int32))
                active = any(not s.done for s in self.slots)
                if active:
                    decode_once()
                if pending is not None:
                    if self._admission_step(pending):
                        self._admission_finish(pending)
                        rec(pending.seq_id, "first", now())
                        if timing is not None:
                            timing[pending.seq_id]["token_times"] = [
                                timing[pending.seq_id]["first"]]
                        pending = None
                elif not active and queue:
                    # pool idle, nothing arrived: sleep to earliest arrival
                    sleep_to_next_arrival()
            return results

        def admit_all():
            while queue and any(s.done for s in self.slots):
                q_i = next_admit()
                if q_i is None:
                    break                 # nothing has arrived yet
                sid, ids = queue.pop(q_i)
                rec(sid, "arrive", arrivals.get(sid, 0.0))
                rec(sid, "admit", now())
                self._admit(sid, np.asarray(ids, np.int32))
                rec(sid, "first", now())   # _admit syncs on the first token
                if timing is not None:
                    timing[sid]["token_times"] = [timing[sid]["first"]]

        admit_all()
        while queue or any(not s.done for s in self.slots):
            if not any(not s.done for s in self.slots):
                # pool idle, requests still queued: sleep until the next
                # arrival, then admit
                sleep_to_next_arrival()
                admit_all()
                continue
            decode_once()
            admit_all()
        return results
