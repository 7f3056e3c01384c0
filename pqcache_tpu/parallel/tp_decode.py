"""Explicit tensor-parallel engine: shard_map over the `tp` mesh axis.

Two multi-chip paths exist:
  * GSPMD (parallel/sharding.py + NamedSharding on jit): XLA partitions the
    XLA-op decode automatically — used by dryrun_multichip.
  * THIS module: shard_map with hand-placed psums (Megatron pattern). Each
    device runs the full decode program on its head shard — which is what
    lets the Pallas kernels (flash attention, ADC, gather) execute
    per-shard on real multi-chip TPU, where GSPMD cannot partition a
    pallas_call.

Sharding: q/kv heads, PQ codebooks/codes and KV state split over `tp`; the
attention-output and MLP-down projections psum over `tp`; embeddings and
the LM head are replicated (logits come out replicated). The per-shard
model is just a ModelConfig with num_heads/num_kv_heads divided by the
shard count — every policy already computes head-parallel.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy
from pqcache_tpu.runtime.state import PQState


def local_model_config(cfg: EngineConfig, tp: int):
    m = cfg.model
    if m.num_kv_heads % tp or m.num_heads % tp:
        raise ValueError(f"tp={tp} must divide head counts "
                         f"({m.num_heads}/{m.num_kv_heads})")
    local_m = dataclasses.replace(
        m, num_heads=m.num_heads // tp, num_kv_heads=m.num_kv_heads // tp)
    return dataclasses.replace(
        cfg, model=local_m,
        runtime=dataclasses.replace(cfg.runtime, shard_axis="tp"))


PARAM_SPECS = {
    "embed": P(None, None),
    "final_norm": P(None),
    "lm_head": P(None, None),
    "layers": {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "wq": P(None, None, "tp"),
        "wk": P(None, None, "tp"),
        "wv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "gate": P(None, None, "tp"),
        "up": P(None, None, "tp"),
        "down": P(None, "tp", None),
    },
}

# PQState partition specs come from the single source of truth in
# parallel/sharding.py (duplicating them here let the two copies drift as
# state fields were added)
from pqcache_tpu.parallel.sharding import pq_state_specs

PQ_STATE_SPECS = pq_state_specs()


class TPEngine:
    """Single-sequence pq_search engine with explicit tp sharding."""

    def __init__(self, cfg: EngineConfig, params: dict, mesh: Mesh,
                 prefill_len: int, max_new_tokens: int, dtype=jnp.bfloat16):
        self.mesh = mesh
        tp = mesh.shape["tp"]
        self.cfg_global = cfg
        self.cfg_local = local_model_config(cfg, tp)
        self.P = prefill_len
        self.max_new = max_new_tokens
        budget = compute_budget(cfg.budget, prefill_len, max_new_tokens)
        self.budget = budget
        self.policy = get_policy(self.cfg_local, budget)
        self.dtype = dtype
        self.params = params  # global (unsharded) pytree; shard_map splits

        local_m = self.cfg_local.model
        policy = self.policy

        def prefill_body(p, s, tokens, pad, tlen):
            logits, st = llama.prefill(local_m, p, policy, s, tokens, pad,
                                       tlen, axis_name="tp")
            return jnp.argmax(logits).astype(jnp.int32), st

        def decode_body(p, s, tok, pos, n):
            return llama.decode_loop(local_m, p, policy, s, tok, pos, n,
                                     axis_name="tp")

        sspec = pq_state_specs(jhist=policy.use_jhist,
                               int8_scales=policy.kv_int8)
        self._prefill = jax.jit(shard_map(
            prefill_body, mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P(), P(), P()),
            out_specs=(P(), sspec), check_rep=False))
        # fixed-size decode CHUNKS so generation length is per-call and EOS
        # can stop between device calls (one dispatch per chunk, not per
        # token — mirrors runtime/generate.py)
        self.chunk = min(16, max(max_new_tokens - 1, 1))
        self._decode = jax.jit(shard_map(
            lambda p, s, t, pos, n=self.chunk: decode_body(p, s, t, pos, n),
            mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P(), P()),
            out_specs=(P(), sspec), check_rep=False))

    def _ring_prefill_program(self, inner: int):
        """Jitted ring-prefill → decode-state handoff over the SAME mesh
        axis: sequence-sharded ring attention (weights replicated — the
        context-parallel standard), then gather_state_tp's all_to_all
        reshard + per-shard prefill_tail. Output state is head-sharded
        exactly like the TP prefill's, so self._decode consumes it
        directly. One program; compiled lazily on first generate_ring."""
        key = ("ring", inner)
        if not hasattr(self, "_ring_cache"):
            self._ring_cache = {}
        if key in self._ring_cache:
            return self._ring_cache[key]
        from pqcache_tpu.parallel.ring_prefill import (gather_state_tp,
                                                       ring_forward)
        model_g = self.cfg_global.model
        policy = self.policy
        dtype = self.dtype

        def body(p, tokens_local, pad, tlen):
            logits, kv_layers = ring_forward(model_g, p, tokens_local, pad,
                                             tlen, "tp", inner=inner)
            state = gather_state_tp(policy, kv_layers, pad, tlen, "tp",
                                    dtype=dtype)
            return jnp.argmax(logits).astype(jnp.int32), state

        sspec = pq_state_specs(jhist=policy.use_jhist,
                               int8_scales=policy.kv_int8)
        fn = jax.jit(shard_map(
            body, mesh=self.mesh,
            # P() as a tree PREFIX replicates the whole params pytree
            in_specs=(P(), P("tp"), P(), P()),
            out_specs=(P(), sspec), check_rep=False))
        self._ring_cache[key] = fn
        return fn

    def generate_ring(self, prompt_ids, max_new_tokens: int, eos_ids=(),
                      inner: int = 512):
        """Generate with SEQUENCE-PARALLEL prefill: the prompt is ring-
        prefilled across the mesh (per-shard activations/KV ∝ P/sp — the
        path for prompts beyond one chip's prefill capacity), the state is
        resharded head-major in the same program, and decode runs the
        engine's ordinary TP chunks. Tokens match `generate` exactly
        (gather_state_tp builds the state through prefill_tail)."""
        import numpy as np
        if max_new_tokens > self.max_new:
            raise ValueError(
                f"max_new_tokens {max_new_tokens} exceeds the engine "
                f"reservation {self.max_new}")
        tp = self.mesh.shape["tp"]
        m = self.cfg_global.model
        if m.num_kv_heads % tp:
            raise ValueError(
                f"ring handoff all_to_all needs tp ({tp}) to divide "
                f"num_kv_heads ({m.num_kv_heads})")
        if self.P % tp:
            raise ValueError(f"prefill_len {self.P} not divisible by "
                             f"tp {tp}")
        ids = np.asarray(prompt_ids, np.int32)
        true_len = int(ids.shape[0])
        pad = self.P - true_len
        if pad < 0:
            raise ValueError(f"prompt {true_len} > prefill_len {self.P}")
        tokens = np.zeros((self.P,), np.int32)
        tokens[pad:] = ids
        prefill = self._ring_prefill_program(inner)
        first, state = prefill(
            self.params, jnp.asarray(tokens), jnp.asarray(pad, jnp.int32),
            jnp.asarray(true_len, jnp.int32))
        out = [int(first)]
        pos = true_len
        stop = out[0] in eos_ids
        while len(out) < max_new_tokens and not stop:
            toks, state = self._decode(
                self.params, state, jnp.asarray(out[-1], jnp.int32),
                jnp.asarray(pos, jnp.int32))
            pos += self.chunk
            for t in np.asarray(toks).tolist():
                out.append(int(t))
                if int(t) in eos_ids or len(out) >= max_new_tokens:
                    stop = True
                    break
        return out[:max_new_tokens]

    def init_state(self):
        """Global-shape zero state; shard_map slices the head dimension.
        Allocated directly at global shape (no tile-by-tp copies). The
        jhist buffer must be allocated whenever the policy scores via the
        joint histogram — the shard_map specs carry a jhist leaf then, and
        a None state leaf is a pytree-structure mismatch at call time."""
        from pqcache_tpu.core import pq
        from pqcache_tpu.runtime.state import make_pq_state
        return make_pq_state(
            self.cfg_global, self.budget, dtype=self.dtype,
            jhist_blocks=self.policy._jhist_blocks(),
            jhist_dtype=(pq.jhist_dtype(self.policy.select_block)
                         if self.policy.use_jhist else jnp.bfloat16))

    def generate(self, prompt_ids, max_new_tokens: int, eos_ids=()):
        import numpy as np
        if max_new_tokens > self.max_new:
            raise ValueError(
                f"max_new_tokens {max_new_tokens} exceeds the engine "
                f"reservation {self.max_new}")
        ids = np.asarray(prompt_ids, np.int32)
        true_len = int(ids.shape[0])
        pad = self.P - true_len
        tokens = np.zeros((self.P,), np.int32)
        tokens[pad:] = ids
        state = self.init_state()
        first, state = self._prefill(
            self.params, state, jnp.asarray(tokens),
            jnp.asarray(pad, jnp.int32), jnp.asarray(true_len, jnp.int32))
        out = [int(first)]
        pos = true_len
        stop = out[0] in eos_ids
        while len(out) < max_new_tokens and not stop:
            toks, state = self._decode(
                self.params, state, jnp.asarray(out[-1], jnp.int32),
                jnp.asarray(pos, jnp.int32))
            pos += self.chunk
            for t in np.asarray(toks).tolist():
                out.append(int(t))
                if int(t) in eos_ids or len(out) >= max_new_tokens:
                    stop = True
                    break
        return out[:max_new_tokens]
