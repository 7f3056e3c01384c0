"""Asset-free QUALITY evidence: a trained model through the real engine.

The container has no checkpoints, so LongBench/GSM8k/NAH runs cannot produce
meaningful scores (random weights emit noise). This harness closes the gap
with the copy (induction-head) task: train a 2-layer model on sequences
whose second half repeats the first —

    x1 x2 ... xn | x1 x2 ... xn          (LM loss on the second half)

— then evaluate through the INFERENCE engine: prompt = first half + the
first k tokens of the repeat; the model must free-run the continuation
x_{k+1} x_{k+2} ... by attending, at every generated token, to the position
right after the previous occurrence of its last token. Those positions lie
in the early prompt, far outside the decode local window at compress 0.2 ·
recent 0.5, so pq_search only scores points if the PQ/ADC retrieval chain
actually finds them among the evicted middle — the capability the
reference's needle-in-a-haystack harness measures on real checkpoints
(test_nah.py:17-92) and the paper's central claim (quality with 1/5 of
tokens attending, README.md:18). Free-running copying is self-correcting
evidence: one missed retrieval derails every subsequent token.

Baselines under the same budget: h2o (accumulated-score eviction),
no_drop_lb (exact-score oracle = upper bound for any budgeted policy),
original (full attention = task ceiling).

Usage:  python -m pqcache_tpu.harness.synth_quality
        [--n 200] [--steps 600] [--eval-n 32] [--gen 24]
Prints one JSON line: per-policy mean per-token copy accuracy.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                PQConfig, RuntimeConfig)
from pqcache_tpu.models.llama import (apply_rope, mlp, rms_norm,
                                      rope_cos_sin)

VOCAB = 514          # ids [2, 514) are content tokens; 0/1 reserved


def model_config(n: int) -> ModelConfig:
    return ModelConfig(
        name="synthcopy", vocab_size=VOCAB, hidden_size=128,
        intermediate_size=256, num_layers=2, num_heads=4, num_kv_heads=4,
        head_dim=32, rope_theta=10000.0,
        max_position_embeddings=4 * (2 * n + 2))


def gen_copy(rng: np.random.Generator, n: int, batch: int) -> np.ndarray:
    """[B, 2n] sequences whose second half repeats the first."""
    seq = rng.integers(2, VOCAB, size=(batch, n))
    return np.concatenate([seq, seq], axis=1).astype(np.int32)


def gen_copy_varlen(rng: np.random.Generator, n: int, batch: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """[B, 2n] cyclic repeats of a VARIABLE-length prefix (n' uniform in
    [n/2, n]): position t ≥ n' copies t − n'. A fixed-position-offset
    circuit cannot solve this — the model must form a CONTENT-matching
    induction head (which is also what makes zero-shot associative recall
    work; the fixed-offset copy task trains a positional shortcut that
    scores 0 on recall). Returns (tokens, n_prime [B])."""
    n_p = rng.integers(n // 2, n + 1, size=batch)
    seq = np.empty((batch, 2 * n), np.int32)
    for b in range(batch):
        x = rng.integers(2, VOCAB, size=n_p[b])
        reps = -(-2 * n // n_p[b])
        seq[b] = np.tile(x, reps)[: 2 * n]
    return seq, n_p.astype(np.int32)


# -- associative recall (multi-needle with distractors) ----------------------
#
# The NAH-analog point-retrieval task, evaluated on the COPY-TRAINED
# model: a copy-capable induction head already performs associative
# recall zero-shot — at the query key it attends to the key's previous
# occurrence and predicts the token that followed it (the value). The
# prompt is m UNIQUE (key, value) pairs followed by one query key; the
# other m−1 pairs are the distractors, the answer position is a single
# point deep in the evicted middle, and a budgeted policy scores only if
# its selection contains that pair — no free-run local-context
# scaffolding softens the retrieval requirement. (Training the recall
# objective from scratch was tried and does not converge in this tiny
# regime — the copy objective forms the same circuit reliably.)
# Reference protocol: test_nah.py:17-92 (needle at controlled depths).

KEY_LO, KEY_HI = 2, 172          # key alphabet
V1_LO, V1_HI = 172, 342          # first-value alphabet
V2_LO, V2_HI = 342, VOCAB        # second-value alphabet


def gen_kv(rng: np.random.Generator, m: int, batch: int,
           depth: float | None = None) -> tuple[np.ndarray, np.ndarray]:
    """[B, 3m+3] sequences ``k1 v11 v12 ... km vm1 vm2 kq a1 a2`` with
    UNIQUE keys and UNIQUE first-values (TRIPLET pairs: the value is two
    tokens). The split matters for what the eval can measure: a1 comes
    from the PREFILL logits (budget-independent — every policy prefills
    dense), but a2 is generated at a DECODE step whose induction lookup
    (previous occurrence of a1 → following token) targets the queried
    triplet's position deep in the evicted middle — a budgeted policy
    scores a2 only if its decode-time retrieval finds that pair's block.
    depth: queried pair's position as a fraction (0 = oldest), None =
    uniform. Returns (tokens, a1_pos = 3m+1)."""
    assert m <= KEY_HI - KEY_LO and m <= V1_HI - V1_LO
    keys = np.stack([rng.permutation(np.arange(KEY_LO, KEY_HI))[:m]
                     for _ in range(batch)])
    v1 = np.stack([rng.permutation(np.arange(V1_LO, V1_HI))[:m]
                   for _ in range(batch)])
    v2 = rng.integers(V2_LO, V2_HI, size=(batch, m))
    if depth is None:
        qi = rng.integers(0, m, size=batch)
    else:
        qi = np.full((batch,), min(int(m * depth), m - 1))
    seq = np.empty((batch, 3 * m + 3), np.int32)
    seq[:, 0:3 * m:3] = keys
    seq[:, 1:3 * m + 1:3] = v1
    seq[:, 2:3 * m + 2:3] = v2
    ar = np.arange(batch)
    seq[:, 3 * m] = keys[ar, qi]
    seq[:, 3 * m + 1] = v1[ar, qi]
    seq[:, 3 * m + 2] = v2[ar, qi]
    return seq, 3 * m + 1


def evaluate_kv(cfg: ModelConfig, params: dict, policies, m: int,
                eval_n: int = 64, depth: float | None = None, seed: int = 7,
                compress_ratio: float = 0.1, metric: str = "euc",
                kv_dtype: str = "bf16", **pq_kw):
    """Per-policy recall accuracy through the inference Engine: prompt =
    pairs + SEP + query key, generate ONE token, compare to the answer."""
    from pqcache_tpu.config import CacheConfig
    from pqcache_tpu.runtime.generate import Engine
    rng = np.random.default_rng(seed)
    toks, apos = gen_kv(rng, m, eval_n, depth=depth)
    prompt = toks[:, :apos]
    t1, t2 = toks[:, apos], toks[:, apos + 1]
    T = prompt.shape[1]
    out = {}
    for name in policies:
        ecfg = EngineConfig(
            model=cfg,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=12,
                        approx_topk=False, metric=metric, **pq_kw),
            budget=BudgetConfig(compress_ratio=compress_ratio,
                                recent_ratio=0.5, sink_size=4),
            cache=CacheConfig(
                kv_dtype=kv_dtype if name == "pq_search" else "bf16"),
            runtime=RuntimeConfig(policy=name, prefill_bucket=T,
                                  max_new_tokens=4,
                                  max_seq_len=2 * (T + 8),
                                  kernels="xla"))
        eng = Engine(ecfg, params, dtype=jnp.float32)
        c1 = c2 = 0
        for i in range(eval_n):
            res = eng.generate(prompt[i], max_new_tokens=2)
            c1 += int(res.tokens[0] == t1[i])
            # a2 is the DECODE-retrieval measurement: scored only when a1
            # was right (a wrong a1 makes a2's lookup target undefined)
            c2 += int(res.tokens[0] == t1[i] and res.tokens[1] == t2[i])
        out[name] = {"a1_prefill": round(c1 / eval_n, 4),
                     "a2_decode_retrieval": round(c2 / max(c1, 1), 4)}
    return out


def lm_forward(cfg: ModelConfig, params: dict, tokens: jax.Array):
    """Dense-causal training forward → all-position logits [B, T, V].
    Same params pytree as the inference stack (models/llama.py), so the
    trained weights drop straight into Engine/policies."""
    B, T = tokens.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    hidden = jnp.take(params["embed"], tokens, axis=0)    # [B, T, E]
    cos, sin = rope_cos_sin(cfg, jnp.arange(T, dtype=jnp.int32))
    causal = jnp.tril(jnp.ones((T, T), bool))

    def layer(hidden, lp):
        hn = rms_norm(hidden, lp["ln1"], cfg.rms_norm_eps)
        q = (hn @ lp["wq"]).reshape(B, T, H, D).transpose(0, 2, 1, 3)
        k = (hn @ lp["wk"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        v = (hn @ lp["wv"]).reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
        q = jax.vmap(apply_rope, in_axes=(0, None, None))(q, cos, sin)
        k = jax.vmap(apply_rope, in_axes=(0, None, None))(k, cos, sin)
        if H != Hkv:
            rep = H // Hkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        s = jnp.where(causal[None, None], s, -1e30)
        attn = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * D)
        hidden = hidden + attn @ lp["wo"]
        hn2 = rms_norm(hidden, lp["ln2"], cfg.rms_norm_eps)
        hidden = hidden + mlp(lp, hn2.reshape(B * T, -1)).reshape(B, T, -1)
        return hidden, None

    hidden, _ = jax.lax.scan(layer, hidden, params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return (hidden @ params["lm_head"]).astype(jnp.float32)


def train(cfg: ModelConfig, n: int, steps: int, batch: int = 32,
          lr: float = 2e-3, seed: int = 0, log_every: int = 0,
          varlen: bool = False) -> dict:
    """AdamW on second-half LM cross-entropy. f32 params throughout.
    varlen=True trains on variable-offset cyclic repeats (content-based
    induction; required for the recall eval)."""
    import optax
    from pqcache_tpu.models import llama
    params = llama.init_params(cfg, jax.random.PRNGKey(seed),
                               dtype=jnp.float32)
    opt = optax.adamw(lr)
    ost = opt.init(params)

    def loss_fn(p, toks, mask):
        logits = lm_forward(cfg, p, toks)[:, :-1]
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, toks[:, 1:])
        return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    @jax.jit
    def step(p, o, toks, mask):
        l, g = jax.value_and_grad(loss_fn)(p, toks, mask)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    rng = np.random.default_rng(seed)
    pos = np.arange(1, 2 * n)
    for i in range(steps):
        if varlen:
            toks, n_p = gen_copy_varlen(rng, n, batch)
            mask = (pos[None, :] >= n_p[:, None]).astype(np.float32)
        else:
            toks = gen_copy(rng, n, batch)
            mask = np.broadcast_to((pos >= n).astype(np.float32),
                                   (batch, 2 * n - 1))
        params, ost, l = step(params, ost, jnp.asarray(toks),
                              jnp.asarray(mask))
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}: loss {float(l):.4f}", flush=True)
    return params


def evaluate(cfg: ModelConfig, params: dict, policies, n: int,
             eval_n: int = 32, gen: int = 24, k_prefix: int = 4,
             seed: int = 123, compress_ratio: float = 0.2,
             kv_dtype: str = "bf16", **pq_kw):
    """Per-policy mean per-token copy accuracy through the inference
    Engine: prompt [x1..xn x1..xk], free-run `gen` tokens, compare to
    x_{k+1}..x_{k+gen}."""
    from pqcache_tpu.config import CacheConfig
    from pqcache_tpu.runtime.generate import Engine
    rng = np.random.default_rng(seed)
    toks = gen_copy(rng, n, eval_n)
    prompt = toks[:, :n + k_prefix]
    target = toks[:, n + k_prefix:n + k_prefix + gen]
    T = prompt.shape[1]
    out = {}
    for name in policies:
        ecfg = EngineConfig(
            model=cfg,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=12,
                        approx_topk=False, **pq_kw),
            budget=BudgetConfig(compress_ratio=compress_ratio,
                                recent_ratio=0.5, sink_size=4),
            cache=CacheConfig(
                kv_dtype=kv_dtype if name == "pq_search" else "bf16"),
            runtime=RuntimeConfig(policy=name, prefill_bucket=T,
                                  max_new_tokens=gen + 2,
                                  max_seq_len=2 * (T + gen),
                                  kernels="xla"))
        eng = Engine(ecfg, params, dtype=jnp.float32)
        correct = total = 0
        for i in range(eval_n):
            res = eng.generate(prompt[i], max_new_tokens=gen)
            got = np.asarray(res.tokens[:gen])
            correct += int((got == target[i, :len(got)]).sum())
            total += len(got)
        out[name] = round(correct / max(total, 1), 4)
    return out


def run_offload_locality(args) -> None:
    """VERDICT-r4 weakness 1: every offload hit-rate number was measured
    on RANDOM weights, whose near-uniform block selections make hit ≈
    cache fraction by construction (a random admission policy ties the
    LFU). A TRAINED copy model retrieves the position right after the
    previous occurrence of its last token — the selection advances ~1
    token/step, so consecutive steps' block sets overlap almost entirely
    and an LFU should hit ≈ (1 − churn), far above the cache fraction.
    This mode trains the copy model at --n (default 512 → ~500
    in-distribution free-run steps), then decodes through the REAL
    OffloadEngine sweeping the cache fraction, reporting hit rate per
    fraction."""
    import dataclasses
    from pqcache_tpu.config import CacheConfig
    from pqcache_tpu.runtime.offload_engine import OffloadEngine
    n = args.n
    cfg = model_config(n)
    t0 = time.perf_counter()
    params = train(cfg, n, args.steps, batch=args.batch,
                   log_every=max(args.steps // 6, 1))
    train_s = time.perf_counter() - t0
    if getattr(args, "weight_int8", False):
        from pqcache_tpu.core import quant
        params = quant.quantize_weight_tree(params)
    rng = np.random.default_rng(321)
    toks = gen_copy(rng, n, 2)
    k_prefix = 4
    prompt = toks[0, : n + k_prefix]
    gen = n - k_prefix - 8          # stay in-distribution while free-running
    T = len(prompt)
    bs = 16
    rows = []
    sel_stats = None
    for frac in (0.1, 0.25, 0.5, 0.75):
        cache_tokens = max(int(T * frac) // bs * bs, bs)
        ecfg = EngineConfig(
            model=cfg,
            pq=PQConfig(n_subvec_per_head=2, n_subbits=6, kmeans_iters=12,
                        approx_topk=False, metric=args.metric,
                        select_block=bs),
            budget=BudgetConfig(compress_ratio=args.compress_ratio,
                                recent_ratio=0.5, sink_size=4),
            cache=CacheConfig(offload=True, block_size=bs,
                              hbm_cache_tokens=cache_tokens,
                              cache_topk_blocks=2 * cache_tokens // bs,
                              kv_dtype=args.kv_dtype,
                              stale_select=False),
            runtime=RuntimeConfig(policy="pq_search", prefill_bucket=64,
                                  max_new_tokens=gen + 2,
                                  max_seq_len=2 * (T + gen),
                                  kernels="xla"))
        eng = OffloadEngine(ecfg, params, dtype=jnp.float32)
        if sel_stats is None:
            eng.selection_log = []
        out = eng.generate(prompt, max_new_tokens=gen)
        target = toks[0, n + k_prefix: n + k_prefix + gen]
        acc = float((np.asarray(out[:len(target)]) == target).mean())
        if eng.selection_log:
            # per-step unique selected blocks (union over layers/heads)
            # and consecutive-step Jaccard overlap — whether an LFU has
            # any locality to exploit at all
            sets = [set(np.concatenate([b.ravel() for b in step]))
                    for step in eng.selection_log]
            sizes = [len(s) for s in sets]
            jac = [len(a & b) / max(len(a | b), 1)
                   for a, b in zip(sets, sets[1:])]
            sel_stats = {
                "mean_unique_blocks_per_step": round(float(np.mean(sizes)),
                                                     2),
                "total_blocks": T // bs,
                "mean_consecutive_jaccard": round(float(np.mean(jac)), 4),
            }
            eng.selection_log = None
        rows.append({
            "cache_fraction": round(cache_tokens / T, 3),
            "cache_tokens": cache_tokens,
            "hit_rate": round(eng.store.hit_rate, 4),
            "steps": eng.timings["steps"],
            "copy_acc": round(acc, 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    # random-weights CONTROL at one fraction: the locality delta is
    # (trained hit − random hit) at equal fraction
    from pqcache_tpu.models import llama as _llama
    rnd_params = _llama.init_params(cfg, jax.random.PRNGKey(99),
                                    dtype=jnp.float32)
    frac = 0.25
    cache_tokens = max(int(T * frac) // bs * bs, bs)
    ecfg_r = dataclasses.replace(
        ecfg, cache=dataclasses.replace(ecfg.cache,
                                        hbm_cache_tokens=cache_tokens))
    eng_r = OffloadEngine(ecfg_r, rnd_params, dtype=jnp.float32)
    eng_r.generate(prompt, max_new_tokens=gen)
    control = {"cache_fraction": round(cache_tokens / T, 3),
               "hit_rate_random_weights": round(eng_r.store.hit_rate, 4)}
    print(json.dumps({
        "task": f"offload LFU locality on TRAINED copy model, n={n}, "
                f"{gen} decode steps",
        "train_steps": args.steps, "train_s": round(train_s, 1),
        "metric": args.metric,
        "selection_stats": sel_stats,
        "random_control": control,
        "hit_vs_fraction": rows}), flush=True)


def run_recall(args) -> None:
    # train the COPY objective (forms the induction circuit reliably);
    # evaluate zero-shot associative recall through the engine. n chosen
    # so the recall prompt (3m+2) sits inside the trained length (2n).
    m = args.pairs
    n = max((3 * m + 4) // 2, args.n)
    cfg = model_config(n)
    t0 = time.perf_counter()
    params = train(cfg, n, args.steps, batch=args.batch,
                   log_every=max(args.steps // 6, 1), varlen=True)
    train_s = time.perf_counter() - t0
    if getattr(args, "weight_int8", False):
        from pqcache_tpu.core import quant
        params = quant.quantize_weight_tree(params)
    if args.budget_grid:
        grid = {}
        for comp in (0.05, 0.1, 0.2):
            for met in ("euc", "ip"):
                grid[f"c{comp}_{met}"] = evaluate_kv(
                    cfg, params, args.policies, m, eval_n=args.eval_n,
                    compress_ratio=comp, metric=met,
                    kv_dtype=args.kv_dtype)
        print(json.dumps({
            "task": f"associative recall, {m} pairs (dup-key distractors, "
                    "last-occurrence wins)",
            "train_steps": args.steps, "train_s": round(train_s, 1),
            "kv_dtype": args.kv_dtype,
            "accuracy_by_budget": grid}), flush=True)
        return
    if args.depth_grid:
        grid = {}
        for frac in (0.05, 0.25, 0.5, 0.75):
            grid[f"depth_{frac}"] = evaluate_kv(
                cfg, params, args.policies, m, eval_n=args.eval_n,
                depth=frac, compress_ratio=args.compress_ratio,
                metric=args.metric, kv_dtype=args.kv_dtype)
        print(json.dumps({
            "task": f"associative recall depth grid, {m} pairs",
            "budget": f"compress {args.compress_ratio}, recent 0.5, sink 4",
            "train_steps": args.steps, "train_s": round(train_s, 1),
            "accuracy_by_depth": grid}), flush=True)
        return
    acc = evaluate_kv(cfg, params, args.policies, m, eval_n=args.eval_n,
                      compress_ratio=args.compress_ratio,
                      metric=args.metric, kv_dtype=args.kv_dtype)
    print(json.dumps({
        "task": f"associative recall, {m} pairs (dup-key distractors)",
        "budget": f"compress {args.compress_ratio}, recent 0.5, sink 4",
        "metric": args.metric,
        "train_steps": args.steps, "train_s": round(train_s, 1),
        "accuracy": acc}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200,
                    help="copy half-length; prompt is n+4 tokens")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-n", type=int, default=32)
    ap.add_argument("--gen", type=int, default=24)
    ap.add_argument("--compress-ratio", type=float, default=0.2)
    ap.add_argument("--metric", default="euc", choices=["euc", "ip"])
    ap.add_argument("--task", default="copy", choices=["copy", "recall"],
                    help="copy = free-run induction copying; recall = "
                         "associative key-value recall with duplicate-key "
                         "distractors (NAH-analog point retrieval)")
    ap.add_argument("--pairs", type=int, default=96,
                    help="recall task: (key, value) pair count; prompt is "
                         "2·pairs+2 tokens")
    ap.add_argument("--depth-grid", action="store_true",
                    help="NAH-style depth sweep: free-run from several "
                         "offsets so the retrieved positions sit at "
                         "increasing depths of the evicted middle "
                         "(reference protocol: test_nah.py depth grid)")
    ap.add_argument("--budget-grid", action="store_true",
                    help="sweep compress 0.05/0.1/0.2 × metric euc/ip on "
                         "the chosen task — the trade-off curve the "
                         "paper's Table 2 gives (vq_pred.py:427-429); "
                         "pq_search < original with visible margins is "
                         "the point")
    ap.add_argument("--policies", nargs="*",
                    default=["original", "pq_search", "h2o", "no_drop_lb"])
    ap.add_argument("--kv-dtype", dest="kv_dtype", default="bf16",
                    choices=["bf16", "int8"],
                    help="pq_search HBM-tail dtype (int8 quality check)")
    ap.add_argument("--weight-int8", dest="weight_int8",
                    action="store_true",
                    help="quantize the trained weights to int8 (W8A16, "
                         "core/quant.quantize_weight_tree) before the "
                         "engine evals — the quality gate for the "
                         "BENCH_W_INT8 serving configuration")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tiny models train/eval "
                         "fine on CPU and this avoids touching a TPU that "
                         "a measurement arm owns — one TPU process rule)")
    ap.add_argument("--offload-locality", dest="offload_locality",
                    action="store_true",
                    help="train the copy model, then free-run ~--n decode "
                         "steps through the OffloadEngine sweeping the "
                         "HBM cache fraction: the trained induction "
                         "head's selections advance ~1 token/step, so "
                         "LFU hit rate must beat the cache fraction "
                         "(the r4 random-weight numbers could not show "
                         "this)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.offload_locality:
        run_offload_locality(args)
        return
    if args.task == "recall":
        run_recall(args)
        return
    cfg = model_config(args.n)
    t0 = time.perf_counter()
    params = train(cfg, args.n, args.steps, batch=args.batch,
                   log_every=max(args.steps // 6, 1))
    train_s = time.perf_counter() - t0
    if getattr(args, "weight_int8", False):
        from pqcache_tpu.core import quant
        params = quant.quantize_weight_tree(params)
    if args.budget_grid:
        grid = {}
        for comp in (0.05, 0.1, 0.2):
            for met in ("euc", "ip"):
                grid[f"c{comp}_{met}"] = evaluate(
                    cfg, params, args.policies, args.n,
                    eval_n=args.eval_n, gen=args.gen,
                    compress_ratio=comp, metric=met,
                    kv_dtype=args.kv_dtype)
        print(json.dumps({
            "task": f"copy/induction budget grid, half-length {args.n}, "
                    f"free-run {args.gen}",
            "train_steps": args.steps, "train_s": round(train_s, 1),
            "kv_dtype": args.kv_dtype,
            "accuracy_by_budget": grid}, ), flush=True)
        return
    if args.depth_grid:
        # retrieved positions for offset k are [k+1, k+gen] of the n-token
        # first half — sweep k to place them at 10%..75% depth
        grid = {}
        for frac in (0.02, 0.25, 0.5, 0.75):
            k = max(4, int(args.n * frac))
            grid[f"depth_{frac}"] = evaluate(
                cfg, params, args.policies, args.n, eval_n=args.eval_n,
                gen=args.gen, k_prefix=k,
                compress_ratio=args.compress_ratio, metric=args.metric,
                kv_dtype=args.kv_dtype)
        print(json.dumps({
            "task": f"copy/induction depth grid, half-length {args.n}",
            "budget": f"compress {args.compress_ratio}, recent 0.5, sink 4",
            "metric": args.metric, "train_steps": args.steps,
            "train_s": round(train_s, 1),
            "accuracy_by_depth": grid}), flush=True)
        return
    acc = evaluate(cfg, params, args.policies, args.n, eval_n=args.eval_n,
                   gen=args.gen, compress_ratio=args.compress_ratio,
                   metric=args.metric, kv_dtype=args.kv_dtype)
    print(json.dumps({
        "task": f"copy/induction, half-length {args.n} (prompt "
                f"{args.n+4} tokens), free-run {args.gen} tokens",
        "budget": f"compress {args.compress_ratio}, recent 0.5, sink 4 — "
                  "retrieved positions outside the local window",
        "metric": args.metric,
        "train_steps": args.steps, "train_s": round(train_s, 1),
        "accuracy": acc}), flush=True)


if __name__ == "__main__":
    main()
