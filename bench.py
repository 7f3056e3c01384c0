"""Headline benchmark: pq_search vs full-attention decode throughput at long
context, on whatever accelerator JAX sees.

Default protocol: BATCHED decode (B concurrent sequences at 32k ctx), the
serving case (BASELINE.md: concurrent long-context streams). Batch-1
decode of a dense model is weight-bandwidth-bound, which hides KV costs;
with B streams the weights amortize and the dense baseline pays B× the KV
reads while PQCache pays B× (codes + selected-block DMA) — the regime
PQCache exists for. One sequence is prefilled (PQ codebooks trained on-MXU
in the prefill program), its state is inserted into all B slots of the
batch-as-heads engine, and decode runs as one fused loop with the
block-retrieval Pallas kernel.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": R, ...}

Env knobs: BENCH_CTX (32768), BENCH_GEN (128), BENCH_RING (128),
BENCH_LAYERS (8),
BENCH_BATCH (8; 1 = the reference's single-stream protocol),
BENCH_PQ_BLOCK (256; 1 = per-token parity selection — 256 is the
measured-fastest DMA granularity; when key-importance locality is finer
than the block it costs recall vs 128, see
tests/test_recall.py::test_block_granularity_128_vs_256_at_32k),
BENCH_FETCH_PAR (32), BENCH_W_INT8 (1; the dense baseline always runs
bf16 weights regardless).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _accelerator_reachable(timeout_s: int = 240) -> bool:
    """Probe `import jax; jax.devices()` in a subprocess under a timeout.

    When the axon tunnel is down-but-hanging, `import jax` blocks forever
    in device-plugin init (ROUND_NOTES.md) — without this probe the bench
    would hang instead of reporting. BENCH_SKIP_PROBE=1 bypasses it.
    """
    if os.environ.get("BENCH_SKIP_PROBE", "0") == "1":
        return True
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError,
            OSError):
        return False


def main():
    if not _accelerator_reachable():
        print(json.dumps({
            "metric": "pq_search decode tok/s (accelerator unreachable)",
            "value": 0.0,
            "unit": "tok/s",
            "vs_baseline": None,
            "error": ("jax device init hung/failed (axon tunnel down?); "
                      "bench aborted instead of hanging — see "
                      "ROUND_NOTES.md 'tunnel-down hang'"),
        }))
        sys.exit(1)
    from pqcache_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                    PQConfig, RuntimeConfig)
    from pqcache_tpu.core.budget import compute_budget
    from pqcache_tpu.models import llama
    from pqcache_tpu.policies.base import get_policy

    ctx = int(os.environ.get("BENCH_CTX", "32768"))
    # 128-token generations in 128-step fused decode chunks (BENCH_RING):
    # one dispatch per chunk amortizes the per-dispatch host latency
    # (~28 ms through the dev tunnel = 0.9 ms/step at 32-step chunks;
    # measured knee: ring 32/64/128/256 = 1172/1251/1288/1239 tok/s at
    # B=8 W8). The dense baseline equally decodes gen steps per dispatch.
    gen = int(os.environ.get("BENCH_GEN", "128"))
    layers = int(os.environ.get("BENCH_LAYERS", "8"))
    # retrieval granularity (PQConfig.select_block): 128 = the TPU fast
    # path (fused block-retrieval kernel; recall-oracle-gated), 1 = the
    # reference's per-token parity mode
    sel_block = int(os.environ.get("BENCH_PQ_BLOCK", "256"))
    # 32 concurrent block-DMA streams saturate the fetch kernel (measured
    # B=8: 16→32→64 = 1127→1172→1175 tok/s; B=16: 1715→1839)
    fetch_par = int(os.environ.get("BENCH_FETCH_PAR", "32"))
    # chunked (activation-bounded) prefill: default ON past 96k, where
    # full-length prefill activations OOM a single chip before the KV does
    pf_chunk = int(os.environ.get(
        "BENCH_PREFILL_CHUNK", "32768" if ctx > 98304 else "0"))
    # pair fetch (BENCH_FETCH_PAIR=1): DMA 2·block-aligned pairs with the
    # unselected half masked — select_block ≤ 128 quality at ~half the
    # latency-bound DMA count (ops/block_attn_pallas.py)
    fetch_pair = os.environ.get("BENCH_FETCH_PAIR", "0") == "1"
    # headline = batched serving (B concurrent 32k streams on one chip,
    # batch-as-heads decode) — the regime PQCache exists for; the
    # reference is hard-limited to batch 1 (mistral_patch.py:61).
    # BENCH_BATCH=1 BENCH_PQ_BLOCK=1 reproduces the reference's
    # single-stream per-token protocol.
    B = int(os.environ.get("BENCH_BATCH", "8"))

    # Llama-3.1 widths at reduced depth: per-layer cost identical to the
    # flagship; depth scaled so random weights + B KV states fit one chip.
    model = ModelConfig(
        name=f"llama31-{layers}L-bench",
        vocab_size=128256, hidden_size=4096, intermediate_size=14336,
        num_layers=layers, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=500000.0, rope_scaling_factor=8.0,
        max_position_embeddings=131072,
        # prefill-MLP chunk A/B (0 = unchunked); see ModelConfig.mlp_chunk
        mlp_chunk=int(os.environ.get("BENCH_MLP_CHUNK", "16384")))

    # Weight-only int8 is the DEFAULT pq arm (BENCH_W_INT8=0 reverts):
    # halves the weight-streaming bytes that dominate the decode step
    # (trace r5: MLP 3.76 + proj 0.87 + lm_head 1.39 of 14.19 ms at B=16;
    # B=8: 768 → 1067 tok/s, B=16: 1243 → 1715). Quality gate: the
    # trained-copy battery holds the full-attention ceiling with W8
    # (synth_quality --weight-int8: original 1.0 / pq_search 1.0). The
    # dense BASELINE always stays bf16 weights.
    # Init + quantize on the HOST: materializing the bf16 params on device
    # first OOMs exactly the full-depth shapes W8 exists to enable (32L
    # llama31-width bf16 = 16.05 GB > the whole chip).
    w_int8 = os.environ.get("BENCH_W_INT8", "1") == "1"

    def make_params(quantized: bool):
        if quantized:
            from pqcache_tpu.core import quant
            with jax.default_device(jax.devices("cpu")[0]):
                p = llama.init_params(model, jax.random.PRNGKey(0))
                p = quant.quantize_weight_tree(p)
            return jax.device_put(p, jax.devices()[0])
        return llama.init_params(model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, model.vocab_size, size=ctx).astype(np.int32)

    # chunked prefill needs P to be a chunk multiple: left-pad the prompt
    # to the chunk_plan length (same plan every engine-path caller uses)
    from pqcache_tpu.runtime.generate import chunk_plan
    if pf_chunk and ctx > pf_chunk:
        P, ch_eff = chunk_plan(ctx, pf_chunk)
    else:
        P, ch_eff = ctx, 0
    pad = P - ctx
    toks_np = np.zeros((P,), np.int32)
    toks_np[pad:] = ids

    # contexts where the dense baseline cannot run (OOM — e.g. 128k on one
    # chip): measure pq alone, report vs_baseline as null
    skip_base = os.environ.get("BENCH_SKIP_BASE", "0") == "1"
    # int8 HBM tail (per-channel scales, core/quant.py) is the DEFAULT pq
    # arm: measured 653 vs 627 tok/s at B=8/32k over bf16 with the
    # trained-copy depth grid holding the full-attention ceiling
    # (PARITY.md round-3 table). BENCH_KV_INT8=0 reverts to bf16. The
    # dense baseline always stays bf16 (its quality contract).
    kv_dtype = "int8" if os.environ.get("BENCH_KV_INT8", "1") == "1" else "bf16"
    from pqcache_tpu.config import CacheConfig
    results = {}
    for policy_name in (("pq_search",) if skip_base
                        else ("pq_search", "original")):
        # W8 applies to the pq arm ONLY — the dense baseline keeps bf16
        # weights (its quality contract; quantized baseline weights also
        # inflate its tok/s, understating/overstating vs_baseline)
        params = make_params(w_int8 and policy_name == "pq_search")
        cfg = EngineConfig(
            model=model,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=6,
                        select_block=sel_block, fetch_par=fetch_par,
                        fetch_pair=fetch_pair,
                        ring_cap=int(os.environ.get("BENCH_RING", "128"))),
            budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5,
                                sink_size=32),
            cache=CacheConfig(
                kv_dtype=kv_dtype if policy_name == "pq_search" else "bf16"),
            runtime=RuntimeConfig(policy=policy_name, prefill_bucket=1024,
                                  max_new_tokens=gen + 2,
                                  max_seq_len=P + 2048,
                                  prefill_chunk=pf_chunk),
        )
        budget = compute_budget(cfg.budget, P, gen + 2)
        policy = get_policy(cfg, budget)

        # prefill one sequence (argmax fused into the program; first call
        # compiles, second call is the reported prefill time)
        def prefill_fn(p, s, t):
            if ch_eff:
                logits, st = llama.prefill_chunked(
                    model, p, policy, s, t, jnp.asarray(pad, jnp.int32),
                    jnp.asarray(ctx, jnp.int32), chunk=ch_eff)
            else:
                logits, st = llama.prefill(
                    model, p, policy, s, t, jnp.asarray(pad, jnp.int32),
                    jnp.asarray(ctx, jnp.int32))
            return jnp.argmax(logits).astype(jnp.int32), st
        prefill = jax.jit(prefill_fn, donate_argnums=(1,))
        state = policy.init_state(jnp.bfloat16)
        tok0, state = prefill(params, state, jnp.asarray(toks_np))
        first = int(tok0)
        # free the compile-run state BEFORE allocating the timing run's:
        # at 128k the dense arm's KV state is ~8.6 GB — two copies plus
        # weights exceed a 16 GB v5e chip (measured RESOURCE_EXHAUSTED)
        state = None
        state2 = policy.init_state(jnp.bfloat16)
        t0 = time.perf_counter()
        tok0, state = prefill(params, state2, jnp.asarray(toks_np))
        int(tok0)
        prefill_s = time.perf_counter() - t0

        if B == 1:
            steps = gen
            decode = jax.jit(
                lambda p, s, t, pos: llama.decode_loop(
                    model, p, policy, s, t, pos, gen),
                donate_argnums=(1,))
            tok0 = jnp.asarray(first, jnp.int32)
            pos0 = jnp.asarray(ctx, jnp.int32)
            out, state = decode(params, state, tok0, pos0)  # compile+warm
            np.asarray(out)
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                out, state = decode(params, state, tok0 + 0,
                                    pos0 + gen * (rep + 1))
                np.asarray(out)
                times.append(time.perf_counter() - t0)
            dt = min(times)
        else:
            # batch-as-heads: B slots folded into the kv-head axis (the
            # vmapped decode loop serialized pathologically; see
            # policies/pq_search.py decode_attn_batched)
            bstate = policy.init_batched_state(B, jnp.bfloat16)
            insert = jax.jit(policy.insert_slot, donate_argnums=(0,))
            for slot in range(B):
                bstate = insert(bstate, state, jnp.asarray(slot, jnp.int32))
            del state
            # decode in chunks bounded by the policy's write-combining ring
            # capacity (flushes happen at program end; BENCH_GEN above the
            # cap runs several fused chunks per rep)
            chunk = min(gen, getattr(policy, "ring_k", 0) or gen)
            # a rep decodes whole chunks; when gen isn't a chunk multiple
            # the rep overshoots — time and report the ACTUAL step count
            # so per-step/tok_s stay exact (and reps never overlap the
            # previous rep's position range)
            steps = -(-gen // chunk) * chunk
            decode = jax.jit(
                lambda p, bs, t, pos: llama.decode_loop_batched(
                    model, p, policy, bs, t, pos, chunk),
                donate_argnums=(1,))
            toks = jnp.full((B,), first, jnp.int32)
            poss = jnp.full((B,), ctx, jnp.int32)
            out, bstate = decode(params, bstate, toks, poss)  # compile+warm
            np.asarray(out)
            times = []
            for rep in range(3):
                t0 = time.perf_counter()
                done = 0
                while done < steps:
                    out, bstate = decode(
                        params, bstate, toks + 0,
                        poss + (chunk + steps * rep + done))
                    done += chunk
                np.asarray(out)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            # free this arm's multi-GB batched state before the next arm
            # allocates its own — both alive at once pressures the device
            # heap enough to slow the second arm ~3× (measured: dense
            # 14.3 ms/step alone vs 40.2 with the pq state resident)
            bstate = None
            state = None
        results[policy_name] = {
            "tok_s": B * steps / dt,
            "per_step_ms": dt / steps * 1e3,
            "prefill_s": prefill_s,
        }
        del state, policy, params

    pq_tok_s = results["pq_search"]["tok_s"]
    base = results.get("original")
    label = ("decode tok/s" if B == 1 else f"aggregate decode tok/s, B={B}")
    print(json.dumps({
        "metric": (f"pq_search {label} @ {ctx} ctx "
                   f"({layers}L llama31-width, bf16 model, {kv_dtype} pq "
                   f"tail, single v5e chip)"),
        "value": round(pq_tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": (round(pq_tok_s / base["tok_s"], 3) if base
                        else None),
        "detail": {
            "baseline_full_attn_tok_s": (round(base["tok_s"], 2) if base
                                         else "OOM (skipped)"),
            "pq_step_ms": round(results["pq_search"]["per_step_ms"], 2),
            "base_step_ms": (round(base["per_step_ms"], 2) if base
                             else None),
            "pq_prefill_s": round(results["pq_search"]["prefill_s"], 3),
            "base_prefill_s": (round(base["prefill_s"], 3) if base
                               else None),
            "ctx": ctx, "layers": layers, "batch": B,
            "select_block": sel_block, "pq_kv_dtype": kv_dtype,
            "w_int8": w_int8,
        },
    }))


if __name__ == "__main__":
    main()
