"""Generation engine: bucketed prefill + jitted greedy decode loop.

Replaces the reference's HF `model.generate` driver (vq_pred.py:166-185,
greedy, batch 1) with an engine that:

  * left-pads prompts to a bucket length so each (bucket, config) pair
    compiles exactly once (the reference re-runs eager torch per prompt);
  * jits one fused decode step (all layers + policy retrieval + sampling)
    with donated state so HBM buffers update in place;
  * falls back to the `original` policy when the PQ budgets are degenerate
    for a short prompt — the reference's code_book-is-None dense fallback
    (pq_search.py:271-273).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import compute_budget, pq_is_applicable
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy


def bucket_length(n: int, bucket: int, minimum: int = 128) -> int:
    b = max(minimum, ((n + bucket - 1) // bucket) * bucket)
    return b


def chunk_plan(P: int, ch: int, quantum: int = 1024) -> tuple[int, int]:
    """(P_padded, chunk) for chunked prefill: n = ceil(P/ch) chunks of
    equal quantum-aligned length, P_padded = n·chunk. Rounding P up to a
    multiple of `ch` itself can nearly double the work (33792 → 65536 at
    ch=32768); shrinking the chunk instead pads at most one quantum per
    chunk (33792 → 2×17408 = 34816). Idempotent on its own output."""
    quantum = min(quantum, ch)
    n = -(-P // ch)
    per = -(-P // n)
    chunk = (per + quantum - 1) // quantum * quantum
    return n * chunk, chunk


def chunk_plan_capped(P: int, ch: int, cap: int) -> tuple[int, int]:
    """chunk_plan under a hard reservation cap (max_seq_len): retry with
    the finer 256 quantum if the default plan pads past `cap`, and fall
    back to UNCHUNKED at the original P (chunk 0) if still over. One
    helper so every engine applies the same invariant (the dp×tp engine
    had drifted and silently padded past the cap)."""
    P_c, ch_c = chunk_plan(P, ch)
    if P_c > cap:
        P_c, ch_c = chunk_plan(P, ch, quantum=256)
    if P_c > cap:
        return P, 0
    return P_c, ch_c


@dataclass
class GenerateResult:
    tokens: list            # generated token ids (ints)
    prefill_seconds: float  # wall time of the prefill call (compile excluded
                            # on repeat calls with the same bucket)
    decode_seconds: float   # wall time of the decode loop
    policy_name: str


@dataclass
class PrefixCache:
    """Snapshot of a prefilled shared prompt PREFIX (e.g. a system prompt):
    the per-layer rope'd K/V, policy-independent. Build once with
    Engine.prefill_prefix, reuse across requests via generate(prefix=...) —
    each request then pays only its suffix's prefill (at 32k the shared
    part is the ~1.4 s TTFT term). HBM cost = the prefix's dense KV."""
    k: object               # [L, H_kv, T_pre, D]
    v: object               # [L, H_kv, T_pre, D]
    n: int                  # T_pre (unpadded prefix length)


class Engine:
    """Single-sequence generation engine (batch via outer vmap later)."""

    def __init__(self, cfg: EngineConfig, params: dict,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.params = params
        self.dtype = dtype
        self._prefill_cache = {}
        self._decode_cache = {}
        # host-offload tier (CacheConfig.offload): KV in host RAM with an
        # HBM block cache — see runtime/offload_engine.py
        self._off_engine = None
        if cfg.cache.offload and cfg.runtime.policy == "pq_search":
            from pqcache_tpu.runtime.offload_engine import OffloadEngine
            self._off_engine = OffloadEngine(cfg, params, dtype)

    # -- jit caches --------------------------------------------------------

    def _fns(self, P: int, policy_name: str):
        # state reservation (and therefore the compiled programs) depends on
        # cfg.runtime.max_new_tokens, not the per-call limit — one compile
        # serves every generate() length up to the reservation
        key = (P, policy_name)
        if key in self._prefill_cache:
            return self._prefill_cache[key]
        cfg = self.cfg
        budget = compute_budget(cfg.budget, P, cfg.runtime.max_new_tokens)
        eff = (cfg if policy_name == cfg.runtime.policy
               else _with_policy(cfg, policy_name))
        policy = get_policy(eff, budget)

        # chunked (activation-bounded) prefill for long buckets: bounds the
        # q/attention/MLP transients at ~prefill_chunk rows (full-length
        # chains OOM single-chip prefill past ~128k at llama31-width).
        # chunk_plan is idempotent, so recomputing it from the padded P
        # reproduces generate()'s choice.
        ch = cfg.runtime.prefill_chunk
        chunked = ch and P > ch and hasattr(policy, "prefill_tail")
        if chunked:
            P_c, ch_eff = chunk_plan(P, ch)
            if P_c != P:           # generate() may have used the finer plan
                P_c, ch_eff = chunk_plan(P, ch, quantum=256)
            chunked = P_c == P     # P from a caller that didn't pad: fall back

        # stochastic decoding (RuntimeConfig.temperature > 0): the sampler
        # is a static closure, so each sampling configuration is its own
        # compiled program; greedy keeps the key-free fast path
        from pqcache_tpu.core.sampling import make_sampler
        sampler = make_sampler(cfg.runtime.temperature, cfg.runtime.top_k,
                               cfg.runtime.top_p)

        def prefill_fn(params, state, tokens, pad_len, true_len):
            if chunked:
                logits, st = llama.prefill_chunked(
                    cfg.model, params, policy, state, tokens, pad_len,
                    true_len, chunk=ch_eff)
            else:
                logits, st = llama.prefill(cfg.model, params, policy, state,
                                           tokens, pad_len, true_len)
            if sampler is None:
                return jnp.argmax(logits).astype(jnp.int32), st
            return logits, st     # first token sampled host-side

        if sampler is None:
            def decode_fn(params, state, token, pos, n_steps):
                return llama.decode_loop(cfg.model, params, policy, state,
                                         token, pos, n_steps)
            decode_jit = jax.jit(decode_fn, donate_argnums=(1,),
                                 static_argnums=(4,))
        else:
            def decode_fn(params, state, token, pos, rng, n_steps):
                return llama.decode_loop(cfg.model, params, policy, state,
                                         token, pos, n_steps,
                                         sample=sampler, rng=rng)
            decode_jit = jax.jit(decode_fn, donate_argnums=(1,),
                                 static_argnums=(5,))

        prefill_jit = jax.jit(prefill_fn, donate_argnums=(1,))
        out = (policy, budget, prefill_jit, decode_jit, sampler)
        self._prefill_cache[key] = out
        return out

    def _fns_prefix(self, T_pre: int, P_suf: int, policy_name: str):
        """Jitted prefix-continuation prefill for a (T_pre, P_suf) shape
        pair. The decode program and sampler are shared with the plain
        path at P_total = T_pre + P_suf (state shapes are identical)."""
        key = ("prefix", T_pre, P_suf, policy_name)
        if key in self._prefill_cache:
            return self._prefill_cache[key]
        policy, budget, _, decode_jit, sampler = self._fns(
            T_pre + P_suf, policy_name)
        cfg = self.cfg

        def prefill_fn(params, state, pre_k, pre_v, tokens, true_suf):
            logits, st = llama.prefill_with_prefix(
                cfg.model, params, policy, state, pre_k, pre_v, tokens,
                true_suf)
            if sampler is None:
                return jnp.argmax(logits).astype(jnp.int32), st
            return logits, st

        prefill_jit = jax.jit(prefill_fn, donate_argnums=(1,))
        out = (policy, budget, prefill_jit, decode_jit, sampler)
        self._prefill_cache[key] = out
        return out

    def prefill_prefix(self, prefix_ids) -> PrefixCache:
        """Prefill a shared prompt prefix once and snapshot its per-layer
        K/V for reuse (generate(..., prefix=...)). The prefix is processed
        UNPADDED — one compile per distinct prefix length, which is the
        intended use (a fixed system prompt)."""
        ids = np.asarray(prefix_ids, np.int32)
        T_pre = int(ids.shape[0])
        if T_pre + 1 > self.cfg.runtime.max_seq_len:
            raise ValueError(
                f"prefix {T_pre} leaves no room under max_seq_len "
                f"{self.cfg.runtime.max_seq_len}")
        key = ("prefix_capture", T_pre)
        if key not in self._prefill_cache:
            cfg = self.cfg
            mode = cfg.runtime.kernels
            import jax as _jax
            use_pallas = (_jax.default_backend() == "tpu" if mode == "auto"
                          else mode.startswith("pallas"))
            interpret = mode == "pallas-interpret"
            self._prefill_cache[key] = jax.jit(
                lambda params, tokens: llama.prefill_capture_kv(
                    cfg.model, params, tokens, use_pallas=use_pallas,
                    interpret=interpret))
        k, v = self._prefill_cache[key](self.params, jnp.asarray(ids))
        return PrefixCache(k=k, v=v, n=T_pre)

    def pick_policy(self, true_len: int, P: int) -> str:
        """Host-side policy selection incl. the short-prompt dense fallback."""
        name = self.cfg.runtime.policy
        if name != "pq_search":
            return name
        b = compute_budget(self.cfg.budget, P, self.cfg.runtime.max_new_tokens)
        # budgets are sized from the bucket P but validity depends on the
        # true length (candidates live in [0, true_len - sink - local)).
        runtime_cand = true_len - b.sink - b.local
        if (not pq_is_applicable(b, self.cfg.pq.n_centroids)
                or runtime_cand < max(b.topk, 1)):
            return "original"
        return name

    # -- public API --------------------------------------------------------

    def generate(self, prompt_ids, max_new_tokens: Optional[int] = None,
                 eos_ids=(), collect_timing: bool = False,
                 prefix: Optional[PrefixCache] = None) -> GenerateResult:
        import time

        max_new = self._check_max_new(max_new_tokens)
        ids = np.asarray(prompt_ids, np.int32)
        t0 = time.perf_counter()
        it = self._stream(ids, max_new, eos_ids, prefix=prefix)
        out_tokens = [next(it)]
        t1 = time.perf_counter()
        out_tokens.extend(it)
        t2 = time.perf_counter()
        return GenerateResult(tokens=out_tokens, prefill_seconds=t1 - t0,
                              decode_seconds=t2 - t1,
                              policy_name=self._last_policy)

    def generate_stream(self, prompt_ids,
                        max_new_tokens: Optional[int] = None,
                        eos_ids=(), chunk: int = 8,
                        prefix: Optional[PrefixCache] = None):
        """Yield generated token ids as they become available: the first
        token right after prefill, then one per decoded token (tokens
        arrive in device chunks of `chunk` — smaller = lower streaming
        latency, one extra compiled loop program per distinct chunk size;
        the offload tier streams per token natively). Abandoning the
        iterator early leaves the engine reusable but skips the current
        sequence's remaining decode."""
        max_new = self._check_max_new(max_new_tokens)
        yield from self._stream(np.asarray(prompt_ids, np.int32), max_new,
                                eos_ids, chunk=chunk, prefix=prefix)

    def _check_max_new(self, max_new_tokens: Optional[int]) -> int:
        max_new = max_new_tokens or self.cfg.runtime.max_new_tokens
        if max_new > self.cfg.runtime.max_new_tokens:
            raise ValueError(
                f"max_new_tokens {max_new} exceeds the engine reservation "
                f"{self.cfg.runtime.max_new_tokens}")
        return max_new

    def _stream(self, ids: np.ndarray, max_new: int, eos_ids=(),
                chunk: Optional[int] = None,
                prefix: Optional[PrefixCache] = None):
        """Core generation loop: yields generated token ids (ints)."""
        cfg = self.cfg
        true_len = int(ids.shape[0])

        if prefix is not None:
            # continuation from a cached prefix: the suffix is RIGHT-padded
            # to its bucket (causality masks the pad keys; the logits come
            # from the last real row), positions start at prefix.n
            if self._off_engine is not None:
                raise ValueError(
                    "prefix caching is not supported on the offload tier")
            true_total = prefix.n + true_len
            if true_total + max_new > cfg.runtime.max_seq_len:
                raise ValueError(
                    f"prefix {prefix.n} + suffix {true_len} + {max_new} new "
                    f"tokens exceeds max_seq_len {cfg.runtime.max_seq_len}")
            P_suf = min(bucket_length(true_len, cfg.runtime.prefill_bucket),
                        cfg.runtime.max_seq_len - prefix.n)
            policy_name = self.pick_policy(true_total, prefix.n + P_suf)
            self._last_policy = policy_name
            policy, budget, prefill_jit, decode_jit, sampler = \
                self._fns_prefix(prefix.n, P_suf, policy_name)
            rng = (jax.random.PRNGKey(cfg.runtime.sample_seed)
                   if sampler is not None else None)
            tokens = np.zeros((P_suf,), np.int32)
            tokens[:true_len] = ids
            state = policy.init_state(self.dtype)
            first_tok, state = prefill_jit(
                self.params, state, prefix.k, prefix.v, jnp.asarray(tokens),
                jnp.asarray(true_len, jnp.int32))
            if sampler is not None:
                rng, sub = jax.random.split(rng)
                first_tok = sampler(sub, first_tok)
            next_tok = int(first_tok)
            yield next_tok
            yield from self._decode_stream(
                decode_jit, sampler, rng, state, next_tok, true_total,
                max_new, eos_ids, chunk)
            return
        P = bucket_length(true_len, cfg.runtime.prefill_bucket)
        P = min(P, cfg.runtime.max_seq_len)
        if true_len > P:  # middle truncation is the harness's job
            raise ValueError(f"prompt {true_len} exceeds max_seq_len {P}")
        ch = cfg.runtime.prefill_chunk
        if ch and P > ch:
            # max_seq_len is a hard reservation cap: never let chunk
            # padding expand past it (no aligned plan under the cap →
            # unchunked prefill at P; _fns recomputes the same decision)
            P, _ = chunk_plan_capped(P, ch, cfg.runtime.max_seq_len)

        policy_name = self.pick_policy(true_len, P)
        if self._off_engine is not None and policy_name == "pq_search":
            self._last_policy = "pq_search_offload"
            yield from self._off_engine.stream(ids, max_new,
                                               eos_ids=eos_ids)
            return
        self._last_policy = policy_name
        policy, budget, prefill_jit, decode_jit, sampler = self._fns(
            P, policy_name)
        rng = (jax.random.PRNGKey(cfg.runtime.sample_seed)
               if sampler is not None else None)

        pad = P - true_len
        tokens = np.zeros((P,), np.int32)
        tokens[pad:] = ids
        state = policy.init_state(self.dtype)

        first_tok, state = prefill_jit(
            self.params, state, jnp.asarray(tokens),
            jnp.asarray(pad, jnp.int32), jnp.asarray(true_len, jnp.int32))
        if sampler is not None:       # prefill returned logits: sample
            rng, sub = jax.random.split(rng)
            first_tok = sampler(sub, first_tok)
        next_tok = int(first_tok)
        yield next_tok
        yield from self._decode_stream(decode_jit, sampler, rng, state,
                                       next_tok, true_len, max_new,
                                       eos_ids, chunk)

    def _decode_stream(self, decode_jit, sampler, rng, state, next_tok: int,
                       pos: int, max_new: int, eos_ids, chunk):
        """Decode runs fully on-device in fused chunks (lax.scan over
        steps): no EOS → one chunk of exactly max_new-1; with EOS,
        fixed-size chunks so we can stop between device calls (a
        tunnel/PCIe round trip per chunk instead of per token)."""
        cfg = self.cfg
        count = 1
        remaining = max_new - 1
        # fixed chunk size independent of the per-call max_new → ONE
        # compiled loop program per engine config; tail chunks overshoot
        # and their excess tokens are not yielded
        if chunk is None:
            chunk = min(32, max(cfg.runtime.max_new_tokens - 1, 1))
        chunk = min(chunk, max(cfg.runtime.max_new_tokens - 1, 1))
        stop = next_tok in eos_ids
        while remaining > 0 and not stop and chunk > 0:
            if sampler is None:
                toks, state = decode_jit(
                    self.params, state, jnp.asarray(next_tok, jnp.int32),
                    jnp.asarray(pos, jnp.int32), chunk)
            else:
                rng, sub = jax.random.split(rng)
                toks, state = decode_jit(
                    self.params, state, jnp.asarray(next_tok, jnp.int32),
                    jnp.asarray(pos, jnp.int32), sub, chunk)
            toks = np.asarray(toks).tolist()
            pos += chunk
            remaining -= chunk
            for t in toks:
                next_tok = int(t)
                yield next_tok
                count += 1
                if next_tok in eos_ids or count >= max_new:
                    stop = True
                    break


def _with_policy(cfg: EngineConfig, name: str) -> EngineConfig:
    import dataclasses
    return dataclasses.replace(
        cfg, runtime=dataclasses.replace(cfg.runtime, policy=name))
