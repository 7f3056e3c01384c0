"""Two-process DCN serving validation on CPU.

tests/test_dcn.py exercises parallel/dcn.py under a single process, where
local == global by definition. This tool runs the REAL multi-process path:
two jax.distributed processes (4 CPU devices each), a hybrid dp=2 × tp=4
serving mesh whose dp axis spans the processes, and the full
DistributedBatchTPEngine.serve_local continuous-batching loop — each
process feeding only its own request queue, termination agreed by process
allgather, tokens read back per-host from addressable shards.

Usage:
  python tools_dcn_2proc.py ref                 # single-process reference
  python tools_dcn_2proc.py worker PID          # one of the two processes
  python tools_dcn_2proc.py                     # orchestrate: ref + 2 procs

Validates (per process) that serve_local's {seq_id: tokens} matches the
single-process BatchTPEngine.generate_batch reference for the same
prompts. Exercised claims: serving_mesh hybrid construction, global_params
(host_local_array_to_global_array), host_local_rows /
read_local_rows addressable-shard feeding, all_hosts_done allgather,
predicated admit waves across hosts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REF_JSON = "/tmp/dcn_2proc_ref.json"
COORD = "127.0.0.1:49731"
N_REQ = 6          # 3 per process; odd per-wave admissions exercise the
                   # predicated (admit=0) prefill path across hosts
MAX_NEW = 8


def build(mesh):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                    RuntimeConfig, tiny_model_config)
    from pqcache_tpu.models import llama

    cfg_m = tiny_model_config(num_layers=2, num_heads=8, num_kv_heads=4,
                              hidden_size=64)
    params = llama.init_params(cfg_m, jax.random.PRNGKey(9),
                               dtype=jnp.float32)
    ecfg = EngineConfig(
        model=cfg_m,
        pq=PQConfig(n_subvec_per_head=2, n_subbits=4, kmeans_iters=8,
                    approx_topk=False),
        budget=BudgetConfig(compress_ratio=0.3, recent_ratio=0.5,
                            sink_size=4),
        runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                              max_new_tokens=MAX_NEW, max_seq_len=512,
                              kernels="xla"),
    )
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, cfg_m.vocab_size, size=256).astype(np.int32)
               for _ in range(N_REQ)]
    return ecfg, params, prompts


def run_ref():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax.numpy as jnp
    from pqcache_tpu.parallel import dcn
    from pqcache_tpu.parallel.batch_tp import BatchTPEngine

    mesh = dcn.serving_mesh(2, 4)
    ecfg, params, prompts = build(mesh)
    eng = BatchTPEngine(ecfg, params, mesh, prefill_len=256,
                        max_new_tokens=MAX_NEW, dtype=jnp.float32)
    refs = {}
    for i in range(0, N_REQ, 2):
        for sid, toks in zip((i, i + 1), eng.generate_batch(
                prompts[i:i + 2], max_new_tokens=MAX_NEW)):
            refs[sid] = toks
    with open(REF_JSON, "w") as f:
        json.dump({str(k): v for k, v in refs.items()}, f)
    print("ref written:", refs)


def run_worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from pqcache_tpu.parallel import dcn

    mesh = dcn.serving_mesh(2, 4)     # hybrid: dp spans the two processes
    ecfg, params, prompts = build(mesh)
    eng = dcn.DistributedBatchTPEngine(ecfg, params, mesh, prefill_len=256,
                                       max_new_tokens=MAX_NEW,
                                       dtype=jnp.float32)
    # each process feeds its own half of the queue
    mine = [(i, prompts[i]) for i in range(N_REQ) if i % 2 == pid]
    outs = eng.serve_local(mine, max_new_tokens=MAX_NEW)

    with open(REF_JSON) as f:
        refs = {int(k): v for k, v in json.load(f).items()}
    assert set(outs) == {i for i in range(N_REQ) if i % 2 == pid}, outs
    for sid, toks in outs.items():
        assert toks == refs[sid], (pid, sid, toks, refs[sid])
    print(f"proc {pid}: {len(outs)} sequences match the single-process "
          f"reference")


def orchestrate():
    here = os.path.abspath(__file__)
    # PYTHONPATH may carry a sitecustomize that hijacks the platform
    # registry at interpreter startup (e.g. the axon TPU tunnel plugin,
    # which overrides JAX_PLATFORMS before user code runs) — strip it so
    # the workers run pure-CPU
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")}
    r = subprocess.run([sys.executable, here, "ref"], env=env, timeout=900)
    assert r.returncode == 0, "reference run failed"
    procs = [subprocess.Popen([sys.executable, here, "worker", str(p)],
                              env=env) for p in range(2)]
    codes = [p.wait(timeout=900) for p in procs]
    assert codes == [0, 0], codes
    print("DCN 2-process serving validation: OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ref":
        run_ref()
    elif len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]))
    else:
        orchestrate()
