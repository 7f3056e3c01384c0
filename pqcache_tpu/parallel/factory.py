"""Typed-config entry point for the parallel engines.

`ParallelConfig` (config.py) names the mesh — `data × tensor` — and this
factory is the single place that turns it into a `jax.sharding.Mesh` plus
the matching engine. It replaces the reference's parallel "configuration"
surface (`--pp-size` choices + `CUDA_VISIBLE_DEVICES` layer placement,
vq_pred.py:59, mistral_patch.py:37-40) with a real device mesh: `tensor`
shards heads/codes over ICI (Megatron psums, parallel/tp_decode.py), `data`
shards the serving slot pool (parallel/batch_tp.py). For multi-process
(DCN) deployments use `parallel/dcn.py`, which builds a process-aware mesh
with the dp axis across hosts.

Usage:
    cfg = EngineConfig(parallel=ParallelConfig(data=2, tensor=4), ...)
    eng = make_engine(cfg, params, prefill_len=32768, max_new_tokens=64)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pqcache_tpu.config import EngineConfig, ParallelConfig


def make_mesh(pcfg: ParallelConfig, devices=None) -> Mesh:
    """(dp=data, tp=tensor) mesh over the first data·tensor devices.

    Axis order puts dp outermost so that on multi-host platforms the dp
    groups land on distinct hosts (DCN) while each tp group stays within
    one host's ICI domain — the layout §2.4 of SURVEY.md prescribes."""
    devices = list(devices if devices is not None else jax.devices())
    n = pcfg.data * pcfg.tensor
    if len(devices) < n:
        raise ValueError(
            f"ParallelConfig wants data={pcfg.data} x tensor={pcfg.tensor} "
            f"= {n} devices; only {len(devices)} available")
    arr = np.asarray(devices[:n]).reshape(pcfg.data, pcfg.tensor)
    return Mesh(arr, ("dp", "tp"))


def make_engine(cfg: EngineConfig, params: dict, *, prefill_len: int,
                max_new_tokens: int, batched: bool | None = None,
                dtype=jnp.bfloat16, devices=None):
    """Build the engine `cfg.parallel` describes.

    batched=None picks by mesh shape: a dp axis > 1 implies the slot-pool
    engine (`BatchTPEngine`); data == 1 gives the single-sequence
    `TPEngine`. Pass batched=True to force the pool engine on a pure-tp
    mesh (dp=1, B slots still fold into the head axis)."""
    mesh = make_mesh(cfg.parallel, devices)
    if batched is None:
        batched = cfg.parallel.data > 1
    if batched:
        from pqcache_tpu.parallel.batch_tp import BatchTPEngine
        return BatchTPEngine(cfg, params, mesh, prefill_len=prefill_len,
                             max_new_tokens=max_new_tokens, dtype=dtype)
    from pqcache_tpu.parallel.tp_decode import TPEngine
    return TPEngine(cfg, params, mesh, prefill_len=prefill_len,
                    max_new_tokens=max_new_tokens, dtype=dtype)
