"""pqcache-tpu: a TPU-native long-context LLM inference engine.

Implements the PQCache scheme (SIGMOD'25, arXiv 2407.12820) from scratch on
JAX/XLA/Pallas: product-quantized keys built during prefill (k-means fused into
the forward pass on the MXU, replacing the reference's 48-core CPU clustering,
cf. /root/reference/vq_method/retrieval_based/multi_core_compressor_v2.py), and
asymmetric-distance MIPS top-k retrieval at decode over an HBM-resident code
store (cf. pq_search.py:265-360 in the reference).

Layout:
  core/      pure jittable math: budgets, k-means, PQ encode, ADC scoring
  ops/       attention kernels (XLA reference impls + Pallas TPU kernels)
  models/    from-scratch Llama/Mistral decoder stack + HF safetensors loader
  policies/  pluggable attention policies: original / pq_search / h2o /
             no_drop_lb / sparq (the reference's "compressor" strategies)
  runtime/   KV+PQ state pytrees, jitted prefill/decode steps, generation loop
  parallel/  mesh + sharding rules (TP over kv heads / ICI)
  native/    C++ components (LFU residency manager) with ctypes bindings
  harness/   LongBench / latency / NAH / GSM8k drivers and scorers
"""

__version__ = "0.1.0"
