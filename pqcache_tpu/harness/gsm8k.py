"""GSM8k many-shot evaluation (reference: GSM8k/evaluation_gsm8k.py).

Builds an n-shot prompt from the train split, generates with the configured
compressor, and scores by last-number match (evaluation_gsm8k.py:67-86:
final numeric token of the prediction vs the gold answer).

Data: expects gsm8k jsonl files ({"question", "answer"}) via --train/--test
(the container has no network; pass local files).
"""

from __future__ import annotations

import argparse
import json
import re

import numpy as np


def extract_last_number(s: str):
    s = s.replace(",", "")
    nums = re.findall(r"\d*\.?\d+", s)
    return float(nums[-1]) if nums else None


def answer_correct(pred: str, gold: str) -> bool:
    p, g = extract_last_number(pred), extract_last_number(gold)
    return p is not None and g is not None and p == g


def build_prompt(shots, question) -> str:
    parts = []
    for s in shots:
        parts.append(f"Question: {s['question']}\nAnswer: {s['answer']}\n")
    parts.append(f"Question: {question}\nAnswer:")
    return "\n".join(parts)


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

    with open(args.train, encoding="utf-8") as f:
        train = [json.loads(l) for l in f][: args.shots]
    with open(args.test, encoding="utf-8") as f:
        test = [json.loads(l) for l in f]
    if args.limit:
        test = test[: args.limit]

    correct = 0
    for i, sample in enumerate(test):
        prompt = build_prompt(train, sample["question"])
        ids = tokenizer(prompt)["input_ids"]
        res = engine.generate(np.asarray(ids, np.int32),
                              max_new_tokens=args.max_new, eos_ids=eos)
        pred = tokenizer.decode(res.tokens, skip_special_tokens=True)
        pred = pred.split("Question:")[0]  # stop at the next few-shot turn
        ok = answer_correct(pred, sample["answer"])
        correct += ok
        if args.out:
            with open(args.out, "a", encoding="utf-8") as f:
                json.dump({"idx": i, "pred": pred, "gold": sample["answer"],
                           "correct": bool(ok)}, f, ensure_ascii=False)
                f.write("\n")
    acc = correct / max(len(test), 1)
    print(json.dumps({"accuracy": acc, "n": len(test),
                      "shots": args.shots}))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--train", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--shots", type=int, default=64)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--max-new", dest="max_new", type=int, default=256)
    p.add_argument("--out", default=None)
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
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
