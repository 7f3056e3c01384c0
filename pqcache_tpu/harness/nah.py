"""Needle-in-a-haystack harness (reference: test_nah.py:17-92).

Reads prompts from a jsonl file ({"prompt": ...} or raw LongBench-style
lines), generates `--max-new` tokens with the configured compressor, dumps
{"response": ...} lines. When no input file is given, builds synthetic
haystacks with a planted needle across depth×length grid and reports
retrieval accuracy (substring match of the needle payload).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


NEEDLE = "The best thing to do in San Francisco is eat a sandwich and sit in Dolores Park on a sunny day."
QUESTION = "What is the best thing to do in San Francisco?"
FILLER = ("The grass is green. The sky is blue. The sun is warm. "
          "Trees grow tall. Rivers flow to the sea. ")


def build_haystack(tokenizer, ctx_tokens: int, depth: float) -> str:
    filler_ids = tokenizer(FILLER, add_special_tokens=False)["input_ids"]
    reps = max(1, ctx_tokens // max(len(filler_ids), 1) + 1)
    body = FILLER * reps
    ids = tokenizer(body, add_special_tokens=False)["input_ids"][:ctx_tokens]
    cut = int(len(ids) * depth)
    pre = tokenizer.decode(ids[:cut])
    post = tokenizer.decode(ids[cut:])
    return (f"{pre}\n{NEEDLE}\n{post}\n\nBased on the content above, "
            f"answer: {QUESTION}\nAnswer:")


def run(args) -> None:
    from pqcache_tpu.harness.longbench import load_model, make_engine_config
    from pqcache_tpu.runtime.generate import Engine
    from pqcache_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # checkpoint = HF directory, or 'random:tiny' for an asset-free run
    # with the whitespace tokenizer (harness smoke / CI)
    model_cfg, params, tokenizer = load_model(args)
    cfg = make_engine_config(args, model_cfg)
    engine = Engine(cfg, params)
    eos = (tokenizer.eos_token_id,)

    results = []
    if args.input:
        with open(args.input, encoding="utf-8") as f:
            prompts = [json.loads(l).get("prompt", "") for l in f]
        for p in prompts:
            ids = tokenizer(p)["input_ids"]
            res = engine.generate(np.asarray(ids, np.int32),
                                  max_new_tokens=args.max_new, eos_ids=eos)
            text = tokenizer.decode(res.tokens, skip_special_tokens=True)
            results.append({"response": text})
    else:
        hits = 0
        grid = [(c, d) for c in args.ctx for d in args.depths]
        for ctx, depth in grid:
            prompt = build_haystack(tokenizer, ctx, depth)
            ids = tokenizer(prompt)["input_ids"]
            res = engine.generate(np.asarray(ids, np.int32),
                                  max_new_tokens=args.max_new, eos_ids=eos)
            text = tokenizer.decode(res.tokens, skip_special_tokens=True)
            ok = "Dolores" in text or "sandwich" in text
            hits += ok
            row = {"ctx": ctx, "depth": depth, "hit": bool(ok),
                   "response": text[:200]}
            results.append(row)
            print(json.dumps(row), flush=True)
        print(json.dumps({"accuracy": hits / max(len(grid), 1)}))

    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            for r in results:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--compressor", default="pq_search")
    p.add_argument("--compress-ratio", dest="compress_ratio", type=float,
                   default=0.1)
    p.add_argument("--recent-ratio", dest="recent_ratio", type=float,
                   default=0.5)
    p.add_argument("--important-ratio", dest="important_ratio", type=float,
                   default=0.5)
    p.add_argument("--sink-size", dest="sink_size", type=int, default=32)
    p.add_argument("--n-subvec-per-head", type=int, default=2)
    p.add_argument("--n-subbits", type=int, default=6)
    p.add_argument("--metric", default="euc")
    p.add_argument("--max-iter", dest="max_iter", type=int, default=0)
    p.add_argument("--topr", type=int, default=32)
    p.add_argument("--gqa", type=lambda s: s == "True", default=True)
    p.add_argument("--max-seq-len", dest="max_seq_len", type=int,
                   default=33000)
    p.add_argument("--prefill-bucket", type=int, default=2048)
    p.add_argument("--max-new", dest="max_new", type=int, default=128)
    p.add_argument("--input", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--ctx", type=int, nargs="*", default=[4096, 8192, 16384])
    p.add_argument("--depths", type=float, nargs="*",
                   default=[0.1, 0.5, 0.9])
    p.set_defaults()
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
