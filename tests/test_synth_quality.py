"""Asset-free quality gate: a TRAINED model through the real Engine.

The strongest quality evidence available without checkpoints (container has
no weights): train a 2-layer model to convergence on the copy/induction task,
then free-run the copy continuation through the inference engine. The
retrieved positions lie outside the decode local window at compress 0.2, so
pq_search passes only if PQ/ADC retrieval finds them among the evicted
middle — the capability the reference measures with needle-in-a-haystack on
real checkpoints (test_nah.py:17-92) and the paper's central claim
(README.md:18: quality with 1/5 of tokens attending). h2o's accumulated-score
eviction demonstrably degrades on the same task, pinning that the gate has
teeth (it is not passed by any budgeted policy).

Runtime ~2.5 min on CPU (one training run shared across policies).
"""

import pytest

from pqcache_tpu.harness import synth_quality as sq

N = 96          # copy half-length; prompt = N+4 tokens
STEPS = 200


@pytest.fixture(scope="module")
def trained():
    cfg = sq.model_config(N)
    params = sq.train(cfg, N, STEPS, batch=16)
    return cfg, params


def test_pq_search_matches_full_attention_h2o_degrades(trained):
    cfg, params = trained
    acc = sq.evaluate(cfg, params, ["original", "pq_search", "h2o"], N,
                      eval_n=6, gen=12)
    # Task is learned: full attention free-runs the copy near-perfectly.
    assert acc["original"] >= 0.95, acc
    # PQ retrieval at 1/5 budget preserves it (paper claim).
    assert acc["pq_search"] >= 0.90, acc
    # Eviction under the same budget loses the evicted-middle positions.
    assert acc["h2o"] <= acc["pq_search"] - 0.10, acc
