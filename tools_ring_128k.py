"""Evidence run: 128k-token sequence-parallel ring prefill on the 8-device
virtual CPU mesh (reduced-scale model; per-device KV shard = 16k tokens).

Validates SURVEY §2.4's beyond-HBM prefill target end-to-end: sequence-
sharded activations, ppermute ring attention, distributed-Lloyd PQ build.
Run: python tools_ring_128k.py [P] [n_devices]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else 8
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_dev}").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as PS

from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                PQConfig, RuntimeConfig)
from pqcache_tpu.models import llama
from pqcache_tpu.parallel.ring_prefill import sp_prefill

P = int(sys.argv[1]) if len(sys.argv) > 1 else 131072

model = ModelConfig(
    name="ring128k", vocab_size=256, hidden_size=64, intermediate_size=128,
    num_layers=1, num_heads=4, num_kv_heads=2, head_dim=16,
    rope_theta=500000.0, max_position_embeddings=262144)
cfg = EngineConfig(
    model=model,
    pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=2),
    budget=BudgetConfig(compress_ratio=0.1, recent_ratio=0.5, sink_size=32),
    runtime=RuntimeConfig(policy="pq_search", max_seq_len=P))

params = llama.init_params(model, jax.random.PRNGKey(0), dtype=jnp.float32)
mesh = Mesh(np.asarray(jax.devices()).reshape(n_dev,), ("sp",))
ring = jax.jit(shard_map(
    lambda p, t: sp_prefill(cfg, p, t, jnp.asarray(0, jnp.int32),
                            jnp.asarray(P, jnp.int32), "sp", inner=1024),
    mesh=mesh,
    in_specs=(jax.tree_util.tree_map(lambda _: PS(), params), PS("sp")),
    out_specs=(PS(), PS(None, None, "sp", None), PS(None, None, None, "sp"),
               PS(), PS()),
    check_rep=False))

rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(0, 256, size=P), jnp.int32)
t0 = time.perf_counter()
logits, kv, codes, cents, _phi = ring(params, tokens)
logits_np = np.asarray(logits)
dt = time.perf_counter() - t0
assert np.isfinite(logits_np).all()
print(f"ring prefill ok: P={P}, sp={n_dev}, per-device shard "
      f"{P // n_dev} tokens, kv {kv.shape} ({kv.dtype}), codes {codes.shape}, "
      f"{dt:.1f}s (compile+run, CPU mesh)")
