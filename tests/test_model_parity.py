"""Logit parity of the from-scratch decoder vs HuggingFace transformers.

The reference monkey-patches HF models (mistral_patch.py etc.); our decoder
is independent, so equivalence is established numerically: identical weights
→ identical logits (float32, CPU), for both a full prefill and incremental
decode with the `original` policy, including left-padded prompts.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pqcache_tpu.config import (BudgetConfig, EngineConfig, ModelConfig,
                                PQConfig, RuntimeConfig, tiny_model_config)
from pqcache_tpu.core.budget import compute_budget
from pqcache_tpu.models import llama
from pqcache_tpu.policies.base import get_policy

torch = pytest.importorskip("torch")


def _hf_model_from_params(cfg: ModelConfig, params):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False,
        mlp_bias=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    pt = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    sd = model.state_dict()
    sd["model.embed_tokens.weight"].copy_(pt(params["embed"]))
    sd["model.norm.weight"].copy_(pt(params["final_norm"]))
    sd["lm_head.weight"].copy_(pt(params["lm_head"]).T)
    lp = params["layers"]
    for i in range(cfg.num_layers):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"].copy_(pt(lp["wq"][i]).T)
        sd[pre + "self_attn.k_proj.weight"].copy_(pt(lp["wk"][i]).T)
        sd[pre + "self_attn.v_proj.weight"].copy_(pt(lp["wv"][i]).T)
        sd[pre + "self_attn.o_proj.weight"].copy_(pt(lp["wo"][i]).T)
        sd[pre + "mlp.gate_proj.weight"].copy_(pt(lp["gate"][i]).T)
        sd[pre + "mlp.up_proj.weight"].copy_(pt(lp["up"][i]).T)
        sd[pre + "mlp.down_proj.weight"].copy_(pt(lp["down"][i]).T)
        sd[pre + "input_layernorm.weight"].copy_(pt(lp["ln1"][i]))
        sd[pre + "post_attention_layernorm.weight"].copy_(pt(lp["ln2"][i]))
    return model


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_model_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    with torch.no_grad():
        hf = _hf_model_from_params(cfg, params)
    return cfg, params, hf


def _engine_cfg(cfg, policy="original"):
    return EngineConfig(
        model=cfg, pq=PQConfig(),
        budget=BudgetConfig(compress_ratio=0.2, recent_ratio=0.5, sink_size=4),
        runtime=RuntimeConfig(policy=policy, prefill_bucket=32,
                              max_new_tokens=8, max_seq_len=256),
    )


class TestParity:
    def test_prefill_logits_match_hf(self, tiny_setup):
        cfg, params, hf = tiny_setup
        T = 48
        rng = np.random.default_rng(0)
        ids = rng.integers(0, cfg.vocab_size, size=T).astype(np.int32)
        with torch.no_grad():
            hf_logits = hf(torch.from_numpy(ids[None].astype(np.int64))
                           ).logits[0, -1].numpy()

        ecfg = _engine_cfg(cfg)
        budget = compute_budget(ecfg.budget, T, 8)
        policy = get_policy(ecfg, budget)
        state = policy.init_state(jnp.float32)
        logits, _ = llama.prefill(
            cfg, params, policy, state, jnp.asarray(ids),
            jnp.asarray(0, jnp.int32), jnp.asarray(T, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits), hf_logits,
                                   rtol=2e-4, atol=2e-4)

    def test_left_padded_prefill_matches_unpadded(self, tiny_setup):
        cfg, params, _ = tiny_setup
        T, pad = 40, 24
        rng = np.random.default_rng(1)
        ids = rng.integers(0, cfg.vocab_size, size=T).astype(np.int32)
        padded = np.concatenate([np.zeros(pad, np.int32), ids])

        ecfg = _engine_cfg(cfg)
        budget = compute_budget(ecfg.budget, T, 8)
        policy = get_policy(ecfg, budget)
        logits_ref, _ = llama.prefill(
            cfg, params, policy, policy.init_state(jnp.float32),
            jnp.asarray(ids), jnp.asarray(0, jnp.int32),
            jnp.asarray(T, jnp.int32))

        budget_p = compute_budget(ecfg.budget, T + pad, 8)
        policy_p = get_policy(ecfg, budget_p)
        logits_pad, _ = llama.prefill(
            cfg, params, policy_p, policy_p.init_state(jnp.float32),
            jnp.asarray(padded), jnp.asarray(pad, jnp.int32),
            jnp.asarray(T, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits_pad),
                                   np.asarray(logits_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_original_decode_matches_hf(self, tiny_setup):
        cfg, params, hf = tiny_setup
        T, G = 32, 6
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, size=T).astype(np.int32)

        # HF greedy continuation
        with torch.no_grad():
            out = hf.generate(
                torch.from_numpy(ids[None].astype(np.int64)),
                max_new_tokens=G, do_sample=False, num_beams=1,
                pad_token_id=0)
        hf_tokens = out[0, T:].numpy().tolist()

        ecfg = _engine_cfg(cfg)
        budget = compute_budget(ecfg.budget, T, G)
        policy = get_policy(ecfg, budget)
        state = policy.init_state(jnp.float32)
        logits, state = llama.prefill(
            cfg, params, policy, state, jnp.asarray(ids),
            jnp.asarray(0, jnp.int32), jnp.asarray(T, jnp.int32))
        toks = [int(jnp.argmax(logits))]
        pos = T
        for _ in range(G - 1):
            logits, state = llama.decode_step(
                cfg, params, policy, state,
                jnp.asarray(toks[-1], jnp.int32), jnp.asarray(pos, jnp.int32))
            toks.append(int(jnp.argmax(logits)))
            pos += 1
        assert toks == hf_tokens
