"""Attention-policy interface.

The reference plugs "compressor" objects into monkey-patched HF attention
layers with two contracts (SURVEY.md L3): retrieval-based
(``prefill_attn``/``decoding_attn``, pq_search.py:214/460) and score-based
(``apply``/``restore``, baseline_compressor.py:108/155). Here both become one
functional interface: a policy owns the per-sequence state pytree and
exposes pure per-layer prefill/decode attention functions that the model
stack calls inside its layer scan.

All methods are jit-traceable; `layer_state` is the per-layer slice of the
stacked state (scan carries it), and scalars shared across layers (counters)
live outside the per-layer slice.
"""

from __future__ import annotations

from typing import Any, Protocol, Tuple

import jax

from pqcache_tpu.config import EngineConfig
from pqcache_tpu.core.budget import Budget


class AttentionPolicy(Protocol):
    """Functional attention policy.

    Shapes (no batch dim — vmapped by the runtime):
      q        [H, T, D]    (T = padded prompt len at prefill, 1 at decode)
      k, v     [H_kv, T, D]
      out      [H, T, D]
    """

    def init_state(self, dtype) -> Any:
        """Allocate the stacked (over layers) state pytree for one sequence."""

    def prefill_attn(
        self, state: Any, layer_idx: jax.Array, q: jax.Array, k: jax.Array,
        v: jax.Array, pad_len: jax.Array, true_len: jax.Array,
    ) -> Tuple[jax.Array, Any]:
        """Full-prompt attention + state build for layer `layer_idx`.

        `state` is the FULL stacked state, threaded through the model's
        layer-scan carry; implementations write their layer's slice with
        dynamic_update_slice so XLA keeps the buffers in place. The prompt
        is LEFT-padded: positions [0, pad_len) are garbage, [pad_len, P)
        are real. Returns (attn_out [H, P, D], state).
        """

    def decode_attn(
        self, state: Any, layer_idx: jax.Array, q: jax.Array,
        k_new: jax.Array, v_new: jax.Array, shared: Any,
    ) -> Tuple[jax.Array, Any]:
        """One-token attention for layer `layer_idx` over the full stacked
        state (indexed reads: gathers/dynamic slices only). `shared` carries
        cross-layer scalars (e.g. n_cand). Returns (out [H, 1, D], state)."""

    def shared_pre(self, state: Any) -> Any:
        """Extract cross-layer scalars before the decode layer scan."""

    def shared_post(self, state: Any, shared: Any) -> Any:
        """Fold updated scalars back after the decode layer scan (the
        reference's 'only layer 0 advances counters' rule,
        cache_manager.py:224-226)."""


_REGISTRY: dict[str, Any] = {}


def register_policy(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def _ensure_registered():
    import pqcache_tpu.policies.original  # noqa: F401
    import pqcache_tpu.policies.pq_search  # noqa: F401
    import pqcache_tpu.policies.h2o  # noqa: F401
    import pqcache_tpu.policies.infllm  # noqa: F401
    import pqcache_tpu.policies.no_drop_lb  # noqa: F401
    import pqcache_tpu.policies.sparq  # noqa: F401


def policy_class(name: str) -> Any:
    """Registry lookup without constructing (capability checks — e.g.
    `hasattr(cls, "prefill_tail")` — before the budget exists)."""
    _ensure_registered()
    if name not in _REGISTRY:
        raise KeyError(f"unknown policy {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def get_policy(cfg: EngineConfig, budget: Budget) -> AttentionPolicy:
    return policy_class(cfg.runtime.policy)(cfg, budget)
