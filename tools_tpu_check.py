"""End-to-end TPU correctness check: generate with the Pallas kernel path on
the live device and compare greedy tokens against the CPU/XLA reference path.

Run: python tools_tpu_check.py   (on TPU)
The CPU reference tokens are computed in-process by forcing kernels=xla via
a subprocess on the CPU backend.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CHILD = os.environ.get("TPU_CHECK_CHILD") == "1"


def build(policy="pq_search", kernels="auto", select_block=1):
    import jax
    import jax.numpy as jnp
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.models import llama
    from pqcache_tpu.runtime.generate import Engine

    model = ModelConfig(
        name="check", vocab_size=2048, hidden_size=512,
        intermediate_size=1024, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=128, rope_theta=10000.0, max_position_embeddings=8192)
    cfg = EngineConfig(
        model=model,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                    approx_topk=False, select_block=select_block),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                            sink_size=16),
        runtime=RuntimeConfig(policy=policy, prefill_bucket=512,
                              max_new_tokens=16, max_seq_len=8192,
                              kernels=kernels),
    )
    params = llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, model.vocab_size, size=3000).astype(np.int32)
    return Engine(cfg, params), ids


def main():
    from pqcache_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    # same device, pallas kernels vs pure-XLA: isolates kernel correctness
    # from cross-device bf16 numerics
    for kernels, blk in (("auto", 1), ("xla", 1), ("auto", 128),
                         ("xla", 128)):
        eng, ids = build(kernels=kernels, select_block=blk)
        res = eng.generate(ids, max_new_tokens=12)
        print(json.dumps({"kernels": kernels, "select_block": blk,
                          "tokens": res.tokens,
                          "policy": res.policy_name}), flush=True)


if __name__ == "__main__":
    if CHILD:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
        main()
    else:
        main()  # on TPU (pallas kernels active)
        env = dict(os.environ, TPU_CHECK_CHILD="1", JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True)
        print("CPU reference:", out.stdout.strip().splitlines()[-1])
