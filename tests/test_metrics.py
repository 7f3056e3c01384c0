"""LongBench metric unit tests."""

from pqcache_tpu.harness import metrics as M


def test_qa_f1():
    assert M.qa_f1_score("the answer is Paris", "Paris") > 0.3
    assert M.qa_f1_score("Paris", "Paris") == 1.0
    assert M.qa_f1_score("", "Paris") == 0.0


def test_classification():
    assert M.classification_score(
        "This is about sports", "sports",
        all_classes=["sports", "politics"]) == 1.0
    assert M.classification_score(
        "sports and politics", "sports",
        all_classes=["sports", "politics"]) == 0.5
    assert M.classification_score(
        "none of these", "sports", all_classes=["sports"]) == 0.0


def test_count_and_retrieval():
    assert M.count_score("there are 5 passages", "5") == 1.0
    assert M.count_score("3 or 5", "5") == 0.5
    assert M.retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert M.retrieval_score("see 3", "Paragraph 7") == 0.0


def test_code_sim():
    assert M.code_sim_score("return x + 1", "return x + 1") == 1.0
    assert M.code_sim_score("# comment\nreturn x + 1", "return x + 1") == 1.0


def test_rouge_nonzero():
    s = M.rouge_score("the cat sat on the mat", "a cat sat on a mat")
    assert 0.4 < s <= 1.0


def test_scorer_first_line_rule():
    # trec predictions are trimmed to their first line (eval.py:63-64)
    val = M.scorer("trec", ["sports\ngarbage"], [["sports"]],
                   all_classes=["sports", "politics"])
    assert val == 100.0


def test_gsm8k_answer_match():
    from pqcache_tpu.harness.gsm8k import answer_correct
    assert answer_correct("so the total is 42 dollars", "#### 42")
    assert not answer_correct("maybe 41", "#### 42")
    assert answer_correct("1,234 apples", "#### 1234")


def test_scorer_e_buckets():
    # LongBench-E length-bucketed scoring (eval.py:50-66)
    preds = ["Paris", "London", "Paris"]
    answers = [["Paris"], ["Paris"], ["Paris"]]
    lengths = [1000, 5000, 9000]
    out = M.scorer_e("qasper", preds, answers, lengths)
    assert out == {"0-4k": 100.0, "4-8k": 0.0, "8k+": 100.0}
    # empty bucket scores 0.0 instead of NaN
    out2 = M.scorer_e("qasper", ["Paris"], [["Paris"]], [100])
    assert out2["4-8k"] == 0.0 and out2["0-4k"] == 100.0
