"""Smoke test of the serving-latency harness (harness/serving.py).

The harness is the TPU serving-percentile protocol (TTFT / inter-token
percentiles under load, reference protocol: test_latency.py:74-141
generalized to concurrent requests); --tiny runs the identical code path
(prefix capture, admission waves, percentile summary) at toy widths.
"""

import numpy as np

from pqcache_tpu.harness import serving


def test_serving_harness_tiny_smoke():
    args = serving.parse_args([
        "--tiny", "--ctx", "384", "--pool", "2", "--requests", "3",
        "--gen", "6", "--chunk", "3",
        "--policies", "pq_search", "original"])
    rows = serving.run(args)
    assert [r["policy"] for r in rows] == ["pq_search", "original"]
    for r in rows:
        assert r["ttft_p50_s"] > 0 and r["agg_tok_s"] > 0
        assert r["tbt_p50_ms"] > 0
        assert np.isfinite(r["e2e_p95_s"])


def test_serving_harness_shared_prefix_tiny():
    """Pool-wide shared prefix: TTFT must reflect suffix-only prefill and
    the prefix snapshot is built once for all policy rows."""
    args = serving.parse_args([
        "--tiny", "--ctx", "384", "--pool", "2", "--requests", "3",
        "--gen", "4", "--chunk", "2", "--prefix-len", "256",
        "--policies", "pq_search", "original"])
    rows = serving.run(args)
    assert len(rows) == 2
    for r in rows:
        assert r["prefix_len"] == 256
        assert r["agg_tok_s"] > 0
