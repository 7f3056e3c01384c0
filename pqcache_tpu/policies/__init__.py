"""Pluggable attention policies — the reference's "compressor" strategies
(vq_pred.py:25 choices: original / pq_search / h2o / no_drop_lb / sparq_f),
re-designed as pure functions over fixed-shape state pytrees so a whole
decoder step jits into one XLA program.
"""

from pqcache_tpu.policies.base import AttentionPolicy, get_policy  # noqa: F401
