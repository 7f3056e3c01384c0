"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); we use JAX host-device
simulation so PQ math, kernels (interpret mode), and multi-chip shardings are
all exercised in CI without TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers the TPU-tunnel backend in every
# interpreter when this is set; tests must run on the virtual CPU mesh.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# Tests must NOT share the persistent compilation cache with live TPU
# harness runs: harness modules enable it at import (so in-process harness
# tests flip it on process-wide), and a concurrently-killed writer once
# left a corrupted entry that SEGFAULTED cache deserialization. CPU
# compiles are cheap — give tests their own throwaway dir.
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/pqcache_jax_cache_tests"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize's register() overrides jax_platforms to "axon,cpu"
# at interpreter start; point it back at the virtual CPU mesh before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


# Bound accumulated XLA:CPU state across the suite: with ~200 compiled
# programs resident, the ring-prefill shard_map compile segfaulted
# deterministically at ~2/3 of the suite (backend_compile_and_load, twice,
# same test — passes in isolation and after either suite half). Dropping
# executables between MODULES keeps per-module caching (fixtures reuse
# programs within a file) while capping the resident-program count.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
