"""Typed configuration tree.

Replaces the reference's three uncoordinated config layers (bash env vars in
run_llama.sh:31-39, argparse in vq_pred.py:23-61, and attributes stapled onto
the HF AutoConfig in vq_pred.py:232-258) with one frozen dataclass tree.

All defaults mirror the reference's published run configuration
(run_llama.sh:4-29, vq_pred.py:253-257).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Literal, Optional


Metric = Literal["euc", "ip"]
Policy = Literal["original", "pq_search", "h2o", "no_drop_lb", "sparq_f",
                 "infllm"]


@dataclass(frozen=True)
class ModelConfig:
    """Architecture of a llama-family decoder (covers Llama-2/3.1 and Mistral)."""

    name: str = "tiny"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    # Llama-3.1 rope scaling (config.json "rope_scaling" with rope_type=llama3)
    rope_scaling_factor: Optional[float] = None
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 32768
    dtype: str = "bfloat16"
    # token-chunk size for the prefill MLP (bounds the [chunk, I]
    # transient; 0 = unchunked). 16384 measured best of the tried sizes;
    # kept configurable for MFU A/Bs (prefill MLP is ~46% MFU at 32k)
    mlp_chunk: int = 16384

    @property
    def num_groups(self) -> int:
        """GQA group size (q heads per kv head)."""
        return self.num_heads // self.num_kv_heads

    @staticmethod
    def from_hf_config(d: dict, name: str = "hf") -> "ModelConfig":
        """Build from a HuggingFace config.json dict (mistral/llama families)."""
        rs = d.get("rope_scaling") or {}
        is_llama3_rs = rs.get("rope_type", rs.get("type")) == "llama3"
        head_dim = d.get("head_dim") or d["hidden_size"] // d["num_attention_heads"]
        return ModelConfig(
            name=name,
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            num_kv_heads=d.get("num_key_value_heads", d["num_attention_heads"]),
            head_dim=head_dim,
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
            rope_scaling_factor=rs.get("factor") if is_llama3_rs else None,
            rope_low_freq_factor=rs.get("low_freq_factor", 1.0),
            rope_high_freq_factor=rs.get("high_freq_factor", 4.0),
            rope_original_max_position=rs.get("original_max_position_embeddings", 8192),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            max_position_embeddings=d.get("max_position_embeddings", 32768),
        )


@dataclass(frozen=True)
class PQConfig:
    """Product-quantization scheme knobs.

    Mirrors SUBVEC/SUBBITS/METRIC env vars + --max_iter of the reference
    (run_llama.sh:14-20, pq_search.py:69-79).
    """

    n_subvec_per_head: int = 2        # SUBVEC; must divide head_dim
    n_subbits: int = 6                # SUBBITS; centroids = 2**n_subbits
    metric: Metric = "euc"            # METRIC (euc | ip via ip2l2 lift)
    kmeans_iters: int = 8             # MAX_ITER (reference: 0 = adaptive 3..300)
    kmeans_seed: int = 4321           # RANDOM_SEED (run_llama.sh:33)
    adaptive_iters: bool = False      # pick iters from a profile table at runtime
    approx_topk: bool = True          # TPU approx_max_k (recall 0.98) vs sort
    # Retrieval granularity: 1 = per-token top-k (reference parity,
    # pq_search.py:322); >1 = block-granular selection (TPU fast path —
    # contiguous fetches, block×-smaller top-k; recall-oracle-checked).
    select_block: int = 1
    # Compiled-program variant selection (these used to be PQ_* env vars read
    # inside the jitted hot path — the anti-pattern SURVEY §5 flags in the
    # reference; as config they select a compiled program explicitly).
    adc_mode: str = "v2"              # "v2" | "v1" | "xla" ADC kernel variant
    fetch_mode: str = "gather"        # "gather" | "masked" retrieval fetch
    gather_mode: str = "xla"          # "xla" | "pallas" row-gather impl
    check_recall: bool = False        # runtime recall oracle (debug print)
    # Parallel in-flight block DMAs per grid step of the fused
    # block-retrieval kernel (ops/block_attn_pallas.block_topk_attention):
    # the per-block DMA is latency-bound, so more in-flight refs cut the
    # sequential wait count — at the price of n_par× the double-buffered
    # VMEM (n_par · 2 · block · 2D · 2B).
    fetch_par: int = 4
    # Pair fetch: keep SELECTION at select_block granularity but DMA the
    # 2·block-aligned pair containing each selected block (unselected half
    # masked): adjacent selections share one DMA, halving the
    # latency-bound DMA count under key locality while retrieval quality
    # stays at the finer granularity. select_block ≤ 128 only (the tail is
    # 256-row-aligned).
    fetch_pair: bool = False
    # Block-score backend: "auto" uses the joint-code-histogram matmul
    # scorer (core/pq.py joint_block_mass — O(C²·NB) MXU work per step
    # instead of an O(T) code sweep, exactly the same normalized-mass
    # ranking) whenever it applies (S=2, euc, select_block in (1, 256],
    # gqa); "kernel" forces the fused Pallas sweep.
    scorer: str = "auto"
    # Batched jhist JOIN deferral: "auto" defers the per-step histogram
    # join to the chunk flush whenever the histogram is large enough that
    # XLA's per-step join scatter triggers whole-buffer layout copies
    # (measured at B·H_kv = 128 / 545 MB: 3 copies = 5.3 ms/step; absent
    # at 403 MB). While deferred, the scorer adds an EXACT per-step
    # correction for the ≤ ring_k pending tokens (same exp-LUT terms the
    # histogram would contribute; fp summation order differs from the
    # eager matmul, which can flip exact-tie block rankings only).
    # "on"/"off" force it (tests pin the correction math with "on").
    jhist_defer: str = "auto"
    # Write-combining ring capacity cap (policies/pq_search.py ring_k =
    # min(ring_cap, budget.local)): a decode chunk of up to ring_k steps
    # runs as ONE dispatch, so a higher cap amortizes per-dispatch host
    # latency over more steps — at the price of a longer per-step
    # pending-mass correction while jhist joins are deferred. 32 is the
    # measured sweet spot on local hardware; raise it when dispatch
    # latency dominates (e.g. a remote/tunnelled device).
    ring_cap: int = 32

    def __post_init__(self):
        if self.scorer not in ("auto", "kernel"):
            raise ValueError(f"unknown scorer {self.scorer}")
        if self.jhist_defer not in ("auto", "on", "off"):
            raise ValueError(f"unknown jhist_defer {self.jhist_defer}")
        if self.n_subvec_per_head not in (1, 2, 4, 8, 16):
            # pq_search.py:104-105
            raise ValueError("PQ subvec must be in {1,2,4,8,16}")
        if not 1 <= self.n_subbits <= 8:
            # codes are stored uint8 — 2**8 centroids is the ceiling
            raise ValueError("PQ n_subbits must be in [1, 8]")
        if self.adc_mode not in ("v2", "v1", "xla"):
            raise ValueError(f"unknown adc_mode {self.adc_mode}")
        if self.fetch_mode not in ("gather", "masked"):
            raise ValueError(f"unknown fetch_mode {self.fetch_mode}")
        if self.gather_mode not in ("xla", "pallas"):
            raise ValueError(f"unknown gather_mode {self.gather_mode}")
        if self.ring_cap < 1:
            raise ValueError("ring_cap must be >= 1")

    @property
    def n_centroids(self) -> int:
        return 2 ** self.n_subbits


@dataclass(frozen=True)
class BudgetConfig:
    """Token-budget arithmetic knobs (run_llama.sh:9-13, vq_pred.py:31-37)."""

    compress_ratio: float = 0.2       # COMPRESS: fraction of ctx in the budget
    recent_ratio: float = 0.5         # RECENT_RATIO: recent share of the budget
    sink_size: int = 32               # SINK_SIZE: attention-sink tokens kept


@dataclass(frozen=True)
class CacheConfig:
    """Memory-hierarchy knobs.

    The reference's GPU cache geometry (vq_pred.py:255-257): 4096-token GPU
    cache in 128-token blocks, top-32 blocks refreshed per step, LFU policy.
    On TPU the default tier keeps all retrievable KV in HBM; the host tier
    (offload=True) keeps full KV in host memory with an HBM block cache
    managed by the native LFU library.
    """

    offload: bool = False             # host-offload tier for >HBM contexts
    block_size: int = 128             # cache_block_size
    hbm_cache_tokens: int = 4096      # global_cache_size
    cache_topk_blocks: int = 32       # cache_topk
    # KV-tail storage dtype for the HBM tier ("bf16" | "int8"). int8 halves
    # the dominant state buffer (the [L, H_kv, N, 2D] tail) with
    # per-(layer, head, CHANNEL) scales frozen at prefill: the K scale
    # folds into q before scoring and the V scale folds out of the
    # attention partials, so the fused block-retrieval kernel reads int8
    # rows with no per-row scale plumbing. Beyond the reference (fp16
    # everywhere); enables pool=16 serving at 32k on one 16 GB chip.
    kv_dtype: str = "bf16"
    # One-step-stale block selection for the offload tier: fetch step t's
    # blocks from the selections computed by step t-1's queries, so the
    # whole decode step runs with ONE blocking device sync instead of one
    # per layer (the exact path's classify→stage→launch chain costs
    # 2·L round trips — 488 ms/step of device_wait at 192k through the
    # dev tunnel, 66% of the step). The top-k set is already a PQ
    # approximation and consecutive queries select heavily-overlapping
    # blocks; the sink/local/tail segments stay exact. CHANGES TOKENS
    # relative to exact selection (except when top-k covers every valid
    # block), so it is a mode, off by default. The reference's hierarchy
    # is likewise approximate by design (cache_manager.py:364-418 promotes
    # asynchronously on a side stream).
    stale_select: bool = False

    def __post_init__(self):
        if self.kv_dtype not in ("bf16", "int8"):
            raise ValueError(f"unknown kv_dtype {self.kv_dtype}")


@dataclass(frozen=True)
class RuntimeConfig:
    """Decode-loop and padding knobs."""

    max_seq_len: int = 33000          # vq_pred.py:254 (mistral preset)
    prefill_bucket: int = 1024        # pad prompts up to a multiple of this
    max_new_tokens: int = 512         # static decode-state reservation
    # chunked (activation-bounded) prefill: prompts longer than this are
    # processed in prefill_chunk-row slabs per layer — full-length q/attn
    # transients (~2 GB each at 192k) are what OOM single-chip prefill
    # before the KV does; 0 disables. Both tiers: HBM
    # (models/llama.py prefill_chunked) and offload
    # (runtime/offload_engine.py passes A/B/C).
    prefill_chunk: int = 0
    policy: Policy = "pq_search"
    gqa: bool = True                  # GQA-aware score reduction (run_llama.sh:18)
    kernels: str = "auto"   # "auto" | "pallas" | "xla" | "pallas-interpret"
    # mesh axis this config's policy shards heads over (set by
    # parallel/tp_decode.local_model_config; makes per-shard k-means
    # seeding reproduce the single-device draws via global group ids)
    shard_axis: Optional[str] = None
    # sparq knobs (vq_pred.py:47, 50)
    sparq_topr: int = 32
    sparq_mean_v_trick: bool = False
    # h2o / no_drop_lb knobs (vq_pred.py:32, 42)
    important_ratio: float = 0.5
    score_func: str = "sum"
    # sampling (beyond the reference, which is greedy-only —
    # vq_pred.py:166-185 do_sample=False): temperature 0 = greedy (argmax,
    # the default everywhere); >0 enables categorical sampling with
    # optional top-k / nucleus (top-p) truncation, seeded per generate()
    # call for reproducibility (core/sampling.py)
    temperature: float = 0.0
    top_k: int = 0                    # 0 = off
    top_p: float = 1.0                # 1.0 = off
    sample_seed: int = 0


@dataclass(frozen=True)
class ParallelConfig:
    """Mesh shape. data*tensor must equal the device count in use."""

    data: int = 1
    tensor: int = 1


@dataclass(frozen=True)
class EngineConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    pq: PQConfig = field(default_factory=PQConfig)
    budget: BudgetConfig = field(default_factory=BudgetConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "EngineConfig":
        d = json.loads(s)
        return EngineConfig(
            model=ModelConfig(**d.get("model", {})),
            pq=PQConfig(**d.get("pq", {})),
            budget=BudgetConfig(**d.get("budget", {})),
            cache=CacheConfig(**d.get("cache", {})),
            runtime=RuntimeConfig(**d.get("runtime", {})),
            parallel=ParallelConfig(**d.get("parallel", {})),
        )

    def config_str_list(self) -> list[str]:
        """Experiment-naming strings, feature parity with vq_pred.py:360-406."""
        p = self.runtime.policy
        if p == "original":
            return ["original"]
        if p == "pq_search":
            return [
                f"budget_{self.budget.compress_ratio}",
                f"rec_{self.budget.recent_ratio}",
                f"sink_{self.budget.sink_size}",
                f"mode_{p}",
                f"gqa_{self.runtime.gqa}",
                f"subvec_{self.pq.n_subvec_per_head}",
                f"subbit_{self.pq.n_subbits}",
                f"max_iter_{0 if self.pq.adaptive_iters else self.pq.kmeans_iters}",
            ]
        if p == "sparq_f":
            return [
                f"budget_{self.budget.compress_ratio}",
                f"rec_{self.budget.recent_ratio}",
                f"sink_{self.budget.sink_size}",
                f"mode_{p}",
                f"gqa_{self.runtime.gqa}",
                f"topr_{self.runtime.sparq_topr}",
                f"mean_v_trick_{self.runtime.sparq_mean_v_trick}",
            ]
        return [
            f"budget_{self.budget.compress_ratio}",
            f"topk_{self.runtime.important_ratio}",
            f"rec_{self.budget.recent_ratio}",
            f"sink_{self.budget.sink_size}",
            f"mode_{p}",
            f"score_{self.runtime.score_func}",
            f"gqa_{self.runtime.gqa}",
        ]


# ---------------------------------------------------------------------------
# Model presets matching the reference's supported checkpoints (README.md:36-37,
# config/model2path.json).

MISTRAL_7B = ModelConfig(
    name="mistral-7b-Instruct-32k",
    vocab_size=32000, hidden_size=4096, intermediate_size=14336,
    num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
    rope_theta=1000000.0, max_position_embeddings=32768,
)

LLAMA2_7B = ModelConfig(
    name="llama2-7b-chat-4k",
    vocab_size=32000, hidden_size=4096, intermediate_size=11008,
    num_layers=32, num_heads=32, num_kv_heads=32, head_dim=128,
    rope_theta=10000.0, max_position_embeddings=4096,
)

LLAMA31_8B = ModelConfig(
    name="llama-3.1",
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
    rope_theta=500000.0, rope_scaling_factor=8.0,
    rope_low_freq_factor=1.0, rope_high_freq_factor=4.0,
    rope_original_max_position=8192, max_position_embeddings=131072,
)

MODEL_PRESETS = {
    "mistral-7b-Instruct-32k": MISTRAL_7B,
    "llama2-7b-chat-4k": LLAMA2_7B,
    "llama-3.1": LLAMA31_8B,
}


def tiny_model_config(**overrides) -> ModelConfig:
    """Small GQA config for tests (CPU-runnable, HF-comparable)."""
    base = dict(
        name="tiny", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, max_position_embeddings=512,
    )
    base.update(overrides)
    return ModelConfig(**base)
