from pqcache_tpu.core.budget import Budget, compute_budget  # noqa: F401
