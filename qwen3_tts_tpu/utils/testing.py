"""Random parameter fabrication (no torch) for benches, dryruns and tests.

Produces param trees in the *prepared* layout that `prepare_talker_params` /
`prepare_decoder_params` emit, at any architecture size.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig


def _init(key, shape, scale=0.02, dtype=jnp.float32):
    return scale * jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def _decoder_layer_stack(key, n_layers, hidden, heads, kv_heads, head_dim,
                         inter, dtype):
    ks = jax.random.split(key, 8)
    qkv_rows = (heads + 2 * kv_heads) * head_dim
    return {
        "self_attn": {
            "qkv_proj": {"weight": _init(ks[0], (n_layers, qkv_rows, hidden), dtype=dtype)},
            "o_proj": {"weight": _init(ks[3], (n_layers, hidden, heads * head_dim), dtype=dtype)},
            "q_norm": {"weight": jnp.ones((n_layers, head_dim), dtype)},
            "k_norm": {"weight": jnp.ones((n_layers, head_dim), dtype)},
        },
        "mlp": {
            "gate_up_proj": {"weight": _init(ks[4], (n_layers, 2 * inter, hidden), dtype=dtype)},
            "down_proj": {"weight": _init(ks[6], (n_layers, hidden, inter), dtype=dtype)},
        },
        "input_layernorm": {"weight": jnp.ones((n_layers, hidden), dtype)},
        "post_attention_layernorm": {"weight": jnp.ones((n_layers, hidden), dtype)},
    }


def random_talker_params(cfg: TalkerConfig, key: jax.Array,
                         dtype=jnp.bfloat16) -> Dict[str, Any]:
    cp_cfg = cfg.code_predictor_config
    ks = jax.random.split(key, 12)
    hd = cfg.resolved_head_dim
    params: Dict[str, Any] = {
        "layers": _decoder_layer_stack(
            ks[0], cfg.num_hidden_layers, cfg.hidden_size,
            cfg.num_attention_heads, cfg.num_key_value_heads, hd,
            cfg.intermediate_size, dtype),
        "norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        "codec_embedding": _init(ks[1], (cfg.vocab_size, cfg.hidden_size), dtype=dtype),
        "text_embedding": _init(ks[2], (cfg.text_vocab_size, cfg.text_hidden_size), dtype=dtype),
        "text_projection": {
            "linear_fc1": {
                "weight": _init(ks[3], (cfg.text_hidden_size, cfg.text_hidden_size), dtype=dtype),
                "bias": jnp.zeros((cfg.text_hidden_size,), dtype)},
            "linear_fc2": {
                "weight": _init(ks[4], (cfg.hidden_size, cfg.text_hidden_size), dtype=dtype),
                "bias": jnp.zeros((cfg.hidden_size,), dtype)},
        },
        "codec_head": _init(ks[5], (cfg.vocab_size, cfg.hidden_size), dtype=dtype),
    }
    qm1 = cfg.num_code_groups - 1
    cp: Dict[str, Any] = {
        "layers": _decoder_layer_stack(
            ks[6], cp_cfg.num_hidden_layers, cp_cfg.hidden_size,
            cp_cfg.num_attention_heads, cp_cfg.num_key_value_heads,
            cp_cfg.head_dim, cp_cfg.intermediate_size, dtype),
        "norm": {"weight": jnp.ones((cp_cfg.hidden_size,), dtype)},
        "embeddings": _init(ks[7], (qm1, cp_cfg.vocab_size, cfg.hidden_size), dtype=dtype),
        "lm_heads": _init(ks[8], (qm1, cp_cfg.vocab_size, cp_cfg.hidden_size), dtype=dtype),
    }
    if cp_cfg.hidden_size != cfg.hidden_size:
        cp["proj"] = {
            "weight": _init(ks[9], (cp_cfg.hidden_size, cfg.hidden_size), dtype=dtype),
            "bias": jnp.zeros((cp_cfg.hidden_size,), dtype),
        }
    else:
        cp["proj"] = None
    params["code_predictor"] = cp
    return params


# Architecture presets for the released checkpoints (SURVEY.md §0: Qwen3-style
# 0.6B/1.7B decoders, 16 codebooks at 12.5 Hz).
TALKER_0B6 = TalkerConfig(
    vocab_size=6400, hidden_size=1024, intermediate_size=3072,
    num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
    head_dim=128, text_hidden_size=1024, text_vocab_size=151936,
    num_code_groups=16,
    rope_scaling={"rope_type": "default", "mrope_section": [24, 20, 20],
                  "interleaved": True},
    code_predictor_config=CodePredictorConfig(
        vocab_size=2048, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=5, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, num_code_groups=16),
)

TALKER_1B7 = TalkerConfig(
    vocab_size=6400, hidden_size=2048, intermediate_size=6144,
    num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
    head_dim=128, text_hidden_size=2048, text_vocab_size=151936,
    num_code_groups=16,
    rope_scaling={"rope_type": "default", "mrope_section": [24, 20, 20],
                  "interleaved": True},
    code_predictor_config=CodePredictorConfig(
        vocab_size=2048, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=5, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, num_code_groups=16),
)
