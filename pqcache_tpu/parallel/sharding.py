"""Mesh + sharding rules: tensor parallelism over ICI, data over DCN.

The reference's only multi-device mechanism is static layer→device placement
with sequential execution ("pipeline parallelism", mistral_patch.py:37-40,
356-363) — no collectives at all (SURVEY.md §2.4). The TPU-native design
shards *within* every tensor instead:

  * "tp" (ICI): kv heads — attention, PQ codebooks/codes, ADC scoring and
    MIPS top-k are all head-parallel, so the whole retrieval pipeline runs
    without communication; XLA inserts the psum for the attention output
    projection and the MLP down-projection (Megatron pattern), and an
    all-gather for the vocab-sharded LM head.
  * "dp" (DCN): batch of sequences (vmapped engine states).

jit + NamedSharding lets GSPMD propagate these through the layer scan and the
policy state; no hand-written collectives are needed on this path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqcache_tpu.config import ModelConfig


def make_mesh(dp: int, tp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * tp != len(devices):
        raise ValueError(f"mesh {dp}x{tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_specs(cfg: ModelConfig) -> dict:
    """Megatron-style TP specs for the stacked parameter pytree."""
    return {
        "embed": P(None, None),
        "final_norm": P(None),
        "lm_head": P(None, "tp"),
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


def _prepend(spec: P, axis: Optional[str]) -> P:
    if axis is None:
        return spec
    return P(axis, *spec)


def pq_state_specs(batch_axis: Optional[str] = None,
                   jhist: bool = False, int8_scales: bool = False) -> Any:
    """PartitionSpecs for PQState (kv-head dim sharded over tp). Pass
    jhist=True when the policy's joint-histogram scorer is active (the
    state then carries the extra [L, H_kv, C², NB] buffer); int8_scales=True
    when cache.kv_dtype="int8" (per-channel scale leaves ride the head dim)."""
    from pqcache_tpu.runtime.state import PQState
    h4 = _prepend(P(None, "tp", None, None), batch_axis)
    return PQState(
        k_sink=h4, v_sink=h4, kv_tail=h4, codes=h4,
        centroids=_prepend(P(None, "tp", None, None, None), batch_axis),
        phi=_prepend(P(None, "tp", None, None), batch_axis),
        n_cand=_prepend(P(), batch_axis),
        pos=_prepend(P(), batch_axis),
        jhist=h4 if jhist else None,
        k_scale=h4 if int8_scales else None,
        v_scale=h4 if int8_scales else None,
    )


def dense_state_specs(batch_axis: Optional[str] = None,
                      with_scores: bool = False) -> Any:
    from pqcache_tpu.runtime.state import DenseState
    h4 = _prepend(P(None, "tp", None, None), batch_axis)
    h3 = _prepend(P(None, "tp", None), batch_axis)
    s = _prepend(P(), batch_axis)
    return DenseState(
        k_cache=h4, v_cache=h4, length=s, start=s, pos=s,
        scores=h3 if with_scores else None,
        mask=h3 if with_scores else None,
    )


def to_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, cfg: ModelConfig, params: dict) -> dict:
    return jax.device_put(params, to_shardings(mesh, param_specs(cfg)))
