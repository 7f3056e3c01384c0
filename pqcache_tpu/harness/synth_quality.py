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
          lr: float = 2e-3, seed: int = 0, log_every: int = 0) -> dict:
    """AdamW on second-half LM cross-entropy. f32 params throughout."""
    import optax
    from pqcache_tpu.models import llama
    params = llama.init_params(cfg, jax.random.PRNGKey(seed),
                               dtype=jnp.float32)
    opt = optax.adamw(lr)
    ost = opt.init(params)

    def loss_fn(p, toks):
        logits = lm_forward(cfg, p, toks)[:, n - 1:2 * n - 1]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, toks[:, n:]).mean()

    @jax.jit
    def step(p, o, toks):
        l, g = jax.value_and_grad(loss_fn)(p, toks)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    rng = np.random.default_rng(seed)
    for i in range(steps):
        params, ost, l = step(params, ost, jnp.asarray(gen_copy(rng, n,
                                                                batch)))
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
    ap.add_argument("--depth-grid", action="store_true",
                    help="NAH-style depth sweep: free-run from several "
                         "offsets so the retrieved positions sit at "
                         "increasing depths of the evicted middle "
                         "(reference protocol: test_nah.py depth grid)")
    ap.add_argument("--policies", nargs="*",
                    default=["original", "pq_search", "h2o", "no_drop_lb"])
    ap.add_argument("--kv-dtype", dest="kv_dtype", default="bf16",
                    choices=["bf16", "int8"],
                    help="pq_search HBM-tail dtype (int8 quality check)")
    args = ap.parse_args(argv)
    cfg = model_config(args.n)
    t0 = time.perf_counter()
    params = train(cfg, args.n, args.steps, batch=args.batch,
                   log_every=max(args.steps // 6, 1))
    train_s = time.perf_counter() - t0
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
