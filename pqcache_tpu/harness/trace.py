"""In-program decode-step decomposition from a jax.profiler device trace.

TPU-native replacement for the reference's global timer
(global_timer.py:33-54; armed via SYNC_TEST_TIME, mistral_patch.py:524-528):
the reference brackets every PQ compute region and transfer with paired CUDA
events and reports pq / non-pq / transfer milliseconds per decode step. On
TPU the whole decode step is ONE fused XLA program, so event pairs cannot be
injected at runtime — but the same decomposition falls out of compile-time
metadata plus a device trace:

  1. Retrieval-stage functions are annotated with `jax.named_scope`
     (core/pq.py, ops/adc_pallas.py, ops/block_attn_pallas.py,
     ops/gather_pallas.py): pq_score / pq_select / pq_fetch / pq_append /
     pq_kmeans.
  2. The compiled module's optimized HLO carries each instruction's
     `metadata={op_name="jit(f)/<scopes>/<op>"}` — `hlo_scope_map` parses
     instruction name -> scope path.
  3. One steady-state loop runs under `jax.profiler.trace`; every device op
     event carries its HLO op name (`args["hlo_op"]` on CPU, the event name
     on TPU "XLA Ops" lanes). Joining events against the scope map and
     summing durations yields ms/step per bucket.

Buckets (mirroring get_decode_time_parts, global_timer.py:33-54):
  pq        — ADC LUT/score/jhist + top-k selection + encode/append
  fetch     — selected-block DMA / row gather / fused block attention
              (the reference counts this as "transfer": it is the
              PCIe-fetch analog — HBM reads of the selected KV)
  transfer  — explicit copies / host transfers / collectives
  model     — everything else (dense decoder body: weights, MLP, lm_head)

Caveat (documented, inherent): XLA fuses across scope boundaries and a
fusion carries one representative op_name, so the split is approximate at
fusion granularity — still far finer than the A/B knockout attribution in
profile_decode.py, and it needs only ONE run.

Usage:  python -m pqcache_tpu.harness.trace [policy ...]
Env: CTX (4096), LAYERS (2), STEPS (8), BLOCK (1), TRACE_DIR.
Library use: `decompose_jitted(fn, args, steps=N)` for any jitted callable.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile
import time
from typing import Any, Callable, Dict, Iterable, List, Tuple

import numpy as np

# Instruction definition with op_name metadata, e.g.
#   %fusion.3 = f32[...] fusion(...), ..., metadata={op_name="jit(f)/pq_score/mul" ...}
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([A-Za-z0-9_.\-]+)\s*=\s*.*?metadata=\{[^}]*?"
    r'op_name="([^"]*)"', re.M)

_PQ_SCOPES = ("pq_score", "pq_select", "pq_append", "pq_kmeans")
# ops that are data movement regardless of scope
_TRANSFER_OPS = ("copy", "copy-start", "copy-done", "all-reduce",
                 "all-gather", "reduce-scatter", "collective-permute",
                 "infeed", "outfeed", "send", "recv")


def hlo_scope_map(hlo_text: str) -> Dict[str, str]:
    """Map optimized-HLO instruction name -> full op_name scope path."""
    return {m.group(1): m.group(2) for m in _INSTR_RE.finditer(hlo_text)}


def classify(hlo_op: str, scope: str) -> str:
    base = hlo_op.split(".")[0]
    if any(base == t or base.startswith(t) for t in _TRANSFER_OPS):
        return "transfer"
    if "pq_fetch" in scope:
        return "fetch"
    if any(s in scope for s in _PQ_SCOPES):
        return "pq"
    return "model"


# control-flow/container HLOs whose duration includes their children
# (counting them alongside the children double-books the time)
_CONTAINER_OPS = ("while", "call", "conditional", "tuple",
                  "get-tuple-element", "parameter")


def load_trace_ops(trace_dir: str,
                   module: str | None = None) -> List[Tuple[str, float]]:
    """Yield (hlo_op_name, duration_us) device-op events from the newest
    trace under `trace_dir`. Handles both TPU ("XLA Ops" lane: event name is
    the op) and CPU (args["hlo_op"]) trace layouts. When `module` is given,
    events carrying an hlo_module tag from OTHER programs (input converts,
    helper jits) are dropped; container ops (while/call/...) are always
    dropped since their duration double-books their children."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    lanes = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e["tid"])] = e["args"].get("name", "")
    out = []
    for e in ev:
        if e.get("ph") != "X":
            continue
        lane = lanes.get((e["pid"], e["tid"]), "")
        args = e.get("args") or {}
        if lane == "XLA Ops":                       # TPU
            name = e["name"]
        elif "hlo_op" in args:                      # CPU backend
            name = args["hlo_op"]
        else:
            continue
        if module and args.get("hlo_module") not in (None, module):
            continue
        if name.split(".")[0] in _CONTAINER_OPS:
            continue
        out.append((name, float(e.get("dur", 0))))
    return out


def decompose_ops(ops: Iterable[Tuple[str, float]],
                  scope_map: Dict[str, str], steps: int) -> Dict[str, Any]:
    """Aggregate (hlo_op, dur_us) events into per-step bucket milliseconds."""
    buckets = collections.Counter()
    unmapped_us = 0.0
    for name, dur in ops:
        scope = scope_map.get(name) or scope_map.get(name.split("%")[-1], "")
        if not scope:
            unmapped_us += dur
        buckets[classify(name, scope)] += dur
    total = sum(buckets.values())
    r = {f"{k}_ms": v / steps / 1e3 for k, v in sorted(buckets.items())}
    for k in ("pq", "fetch", "transfer", "model"):
        r.setdefault(f"{k}_ms", 0.0)
    r["total_ms"] = total / steps / 1e3
    # parity with the reference's report: pq / non-pq / transfer
    r["non_pq_ms"] = r["model_ms"]
    r["unmapped_ms"] = unmapped_us / steps / 1e3
    return r


def decompose_jitted(fn: Callable, args: tuple, *, steps: int,
                     trace_dir: str | None = None,
                     donate_argnums: tuple = ()) -> Dict[str, Any]:
    """Compile `fn(*args)`, run once warm, trace one more run, and return the
    per-step pq / fetch / transfer / model decomposition. `steps` is the
    number of decode steps the program covers (divides the totals)."""
    import jax
    jfn = jax.jit(fn, donate_argnums=donate_argnums)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    smap = hlo_scope_map(hlo_text)
    m = re.search(r"^HloModule ([^\s,]+)", hlo_text)
    module = m.group(1) if m else None
    out = jfn(*args)                                 # warm (compile cached)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x))
        if hasattr(x, "dtype") else x, out)
    tdir = trace_dir or tempfile.mkdtemp(prefix="pqtrace_")
    import jax.profiler
    with jax.profiler.trace(tdir):
        out = jfn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x))
            if hasattr(x, "dtype") else x, out)
    res = decompose_ops(load_trace_ops(tdir, module), smap, steps)
    res["trace_dir"] = tdir
    return res


# ---------------------------------------------------------------------------
# CLI: decode-step decomposition on the profile_decode model
# ---------------------------------------------------------------------------

def _main(argv: List[str]) -> None:
    from pqcache_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.models import llama
    from pqcache_tpu.policies.base import get_policy

    CTX = int(os.environ.get("CTX", "4096"))
    LAYERS = int(os.environ.get("LAYERS", "2"))
    STEPS = int(os.environ.get("STEPS", "8"))
    BLOCK = int(os.environ.get("BLOCK", "1"))
    model = ModelConfig(
        name=f"trace{LAYERS}L", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_layers=LAYERS, num_heads=32,
        num_kv_heads=8, head_dim=128, rope_theta=500000.0,
        rope_scaling_factor=8.0, max_position_embeddings=131072)
    params = llama.init_params(model, jax.random.PRNGKey(0))
    for name in (argv or ["pq_search"]):
        cfg = EngineConfig(
            model=model,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                        select_block=BLOCK),
            budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                                sink_size=32),
            runtime=RuntimeConfig(policy=name, prefill_bucket=1024,
                                  max_new_tokens=64, max_seq_len=CTX * 2))
        budget = compute_budget(cfg.budget, CTX, 64)
        policy = get_policy(cfg, budget)
        st = policy.init_state(jnp.bfloat16)
        rng = np.random.default_rng(0)
        if name == "pq_search":
            st = st.replace(
                n_cand=jnp.asarray(budget.n_cand_init, jnp.int32),
                pos=jnp.asarray(CTX, jnp.int32),
                codes=jnp.asarray(rng.integers(0, 64, size=st.codes.shape),
                                  st.codes.dtype),
                centroids=jnp.asarray(rng.normal(size=st.centroids.shape),
                                      jnp.float32),
                kv_tail=jnp.asarray(rng.normal(size=st.kv_tail.shape) * 0.1,
                                    jnp.bfloat16))
        elif hasattr(st, "length"):
            st = st.replace(length=jnp.asarray(CTX, jnp.int32),
                            pos=jnp.asarray(CTX, jnp.int32))
        t0 = time.perf_counter()
        res = decompose_jitted(
            lambda p, s, t, pos: llama.decode_loop(
                model, p, policy, s, t, pos, STEPS),
            (params, st, jnp.asarray(3, jnp.int32),
             jnp.asarray(CTX, jnp.int32)),
            steps=STEPS)
        res.update(policy=name, ctx=CTX, layers=LAYERS, steps=STEPS,
                   block=BLOCK, wall_s=round(time.perf_counter() - t0, 1))
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    import sys
    _main(sys.argv[1:])
