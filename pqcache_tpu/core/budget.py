"""Token-budget arithmetic.

The PQCache attention set at every decode step is
``[sink | local window | top-k retrieved | current token]``. Budget sizes are
derived from the prefill length exactly as the reference does
(pq_search.py:235-237 and cache_manager.py:164-171):

    local = int((P - sink) * compress_ratio * recent_ratio)
    topk  = int((P - sink) * compress_ratio * (1 - recent_ratio))

These are *static* (Python ints) — on TPU they size jit-compiled buffers, so
each (padded prefill length, config) pair compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pqcache_tpu.config import BudgetConfig


@dataclass(frozen=True)
class Budget:
    prefill_len: int      # P: (padded) prompt length the budget was derived from
    sink: int             # leading sink tokens kept verbatim
    local: int            # recent-window size (ring of the most recent tokens)
    topk: int             # retrieved-token count per step
    max_new_tokens: int   # static reservation for generated tokens

    @property
    def attn_window(self) -> int:
        """Tokens attended per decode step: sink + local + topk + 1 (the new
        token) — the reference's ``total_budget`` (cache_manager.py:171)."""
        return self.sink + self.local + self.topk + 1

    @property
    def n_tail_max(self) -> int:
        """Capacity of the non-sink token store: all prefill tokens after the
        sink plus every token we may generate (mirrors the reserved shared
        code buffer of multi_core_compressor_v2.py:47-51). Rounded up to 256
        so row-tile DMA gathers stay in bounds for every dtype and every
        block-selection granularity (select_block ≤ 256) divides it."""
        n = self.prefill_len - self.sink + self.max_new_tokens
        return (n + 255) // 256 * 256

    @property
    def n_cand_init(self) -> int:
        """Retrieval candidates right after prefill: non-sink tokens that are
        outside the local window (pq_search.py:283: past - recent - sink)."""
        return self.prefill_len - self.sink - self.local


def compute_budget(cfg: BudgetConfig, prefill_len: int, max_new_tokens: int) -> Budget:
    if prefill_len <= cfg.sink_size:
        raise ValueError(
            f"prefill_len {prefill_len} must exceed sink_size {cfg.sink_size}")
    n = prefill_len - cfg.sink_size
    local = int(n * cfg.compress_ratio * cfg.recent_ratio)
    topk = int(n * cfg.compress_ratio * (1.0 - cfg.recent_ratio))
    return Budget(
        prefill_len=prefill_len,
        sink=cfg.sink_size,
        local=local,
        topk=topk,
        max_new_tokens=max_new_tokens,
    )


def pq_is_applicable(budget: Budget, n_centroids: int) -> bool:
    """Whether the PQ pipeline can run for this sequence. The reference skips
    compression when there are fewer training points than centroids
    (pq_search.py:155-166, code_book stays None → dense fallback at
    pq_search.py:271-273) and needs ≥1 retrieved and ≥1 local token."""
    return (
        budget.n_cand_init > 0
        and budget.topk >= 1
        and budget.local >= 1
        and (budget.prefill_len - budget.sink) > n_centroids
        and budget.topk <= budget.n_cand_init
    )
