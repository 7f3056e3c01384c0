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
    return dataclasses.replace(cfg, model=local_m)


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

PQ_STATE_SPECS = PQState(
    k_sink=P(None, "tp", None, None), v_sink=P(None, "tp", None, None),
    kv_tail=P(None, "tp", None, None),
    codes=P(None, "tp", None, None),
    centroids=P(None, "tp", None, None, None),
    phi=P(None, "tp", None, None),
    n_cand=P(), pos=P(),
)


class TPEngine:
    """Single-sequence pq_search engine with explicit tp sharding."""

    def __init__(self, cfg: EngineConfig, params: dict, mesh: Mesh,
                 prefill_len: int, max_new_tokens: int, dtype=jnp.bfloat16):
        self.mesh = mesh
        tp = mesh.shape["tp"]
        self.cfg_local = local_model_config(cfg, tp)
        self.P = prefill_len
        budget = compute_budget(cfg.budget, prefill_len, max_new_tokens)
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

        sspec = PQ_STATE_SPECS
        self._prefill = jax.jit(shard_map(
            prefill_body, mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P(), P(), P()),
            out_specs=(P(), sspec), check_rep=False))
        self._decode = jax.jit(shard_map(
            lambda p, s, t, pos, n=max_new_tokens - 1: decode_body(
                p, s, t, pos, n),
            mesh=mesh,
            in_specs=(PARAM_SPECS, sspec, P(), P()),
            out_specs=(P(), sspec), check_rep=False))

    def init_state(self):
        # global-shape state; shard_map slices the head dimension
        return self.policy_global_state()

    def policy_global_state(self):
        tp = self.mesh.shape["tp"]
        local = self.policy.init_state(self.dtype)

        # build a GLOBAL state by tiling the local template over heads
        def glob(a, axis):
            if axis is None:
                return a
            reps = [1] * a.ndim
            reps[axis] = tp
            return jnp.tile(a, reps)

        axes = PQState(k_sink=1, v_sink=1, kv_tail=1, codes=1, centroids=1,
                      phi=1, n_cand=None, pos=None)
        return jax.tree_util.tree_map(glob, local, axes)

    def generate(self, prompt_ids, max_new_tokens: int):
        import numpy as np
        ids = np.asarray(prompt_ids, np.int32)
        true_len = int(ids.shape[0])
        pad = self.P - true_len
        tokens = np.zeros((self.P,), np.int32)
        tokens[pad:] = ids
        state = self.init_state()
        first, state = self._prefill(
            self.params, state, jnp.asarray(tokens),
            jnp.asarray(pad, jnp.int32), jnp.asarray(true_len, jnp.int32))
        toks, state = self._decode(
            self.params, state, first, jnp.asarray(true_len, jnp.int32))
        return [int(first)] + np.asarray(toks).tolist()[: max_new_tokens - 1]
