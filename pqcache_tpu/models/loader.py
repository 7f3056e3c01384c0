"""HF checkpoint loading: safetensors → stacked JAX parameter pytree.

Replaces the reference's reliance on `AutoModelForCausalLM.from_pretrained`
(vq_pred.py:264, 300, 338). Reads *.safetensors shards directly (zero-copy
via numpy framework), transposes linear weights to [in, out], and stacks
per-layer tensors into [L, ...] arrays for the scan-based decoder.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pqcache_tpu.config import ModelConfig


_LAYER_KEYS = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "mlp.gate_proj.weight": ("gate", True),
    "mlp.up_proj.weight": ("up", True),
    "mlp.down_proj.weight": ("down", True),
    "input_layernorm.weight": ("ln1", False),
    "post_attention_layernorm.weight": ("ln2", False),
}


def load_hf_config(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        return ModelConfig.from_hf_config(json.load(f), name=os.path.basename(path))


def load_hf_checkpoint(path: str, cfg: Optional[ModelConfig] = None,
                       dtype=jnp.bfloat16) -> tuple[ModelConfig, dict]:
    """Load a llama/mistral-family HF checkpoint directory."""
    from safetensors import safe_open

    cfg = cfg or load_hf_config(path)
    L = cfg.num_layers

    shards = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(f"no safetensors shards in {path}")

    raw: dict[str, np.ndarray] = {}
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="np") as f:
            for key in f.keys():
                raw[key] = f.get_tensor(key)

    def to_jnp(a, transpose=False):
        a = np.asarray(a)
        if a.dtype == np.uint16 or str(a.dtype) == "bfloat16":
            a = a.view(np.uint16).astype(np.uint32) << 16
            a = a.view(np.float32)
        if transpose:
            a = a.T
        return jnp.asarray(a, dtype)

    layers: dict[str, list] = {v[0]: [None] * L for v in _LAYER_KEYS.values()}
    params: dict = {"layers": {}}
    for key, t in raw.items():
        if key == "model.embed_tokens.weight":
            params["embed"] = to_jnp(t)
        elif key == "model.norm.weight":
            params["final_norm"] = to_jnp(t)
        elif key == "lm_head.weight":
            params["lm_head"] = to_jnp(t, transpose=True)
        elif key.startswith("model.layers."):
            rest = key[len("model.layers."):]
            idx_s, sub = rest.split(".", 1)
            if sub in _LAYER_KEYS:
                name, tr = _LAYER_KEYS[sub]
                layers[name][int(idx_s)] = to_jnp(t, transpose=tr)

    for name, lst in layers.items():
        missing = [i for i, a in enumerate(lst) if a is None]
        if missing:
            raise ValueError(f"layer tensors missing for {name}: {missing}")
        params["layers"][name] = jnp.stack(lst)

    if "lm_head" not in params:
        params["lm_head"] = params["embed"].T  # tied embeddings
    return cfg, params
