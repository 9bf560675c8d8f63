"""Random parameter fabrication (no torch) for benches, dryruns and tests.

Produces param trees in the *prepared* layout that `prepare_talker_params` /
`prepare_decoder_params` emit, at any architecture size.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import CodecV2DecoderConfig, CodePredictorConfig, TalkerConfig


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


def random_vocoder_params(cfg: CodecV2DecoderConfig, key: jax.Array,
                          dtype=jnp.float32) -> Dict[str, Any]:
    """Random 12Hz vocoder params in the prepared layout, any config size."""
    rngs = iter(jax.random.split(key, 400))

    def init(*shape, scale=0.05):
        return scale * jax.random.normal(next(rngs), shape, jnp.float32).astype(dtype)

    def conv(o, i, k):
        return {"conv": {"weight": init(o, i, k), "bias": jnp.zeros((o,), dtype)}}

    def tconv(i, o, k):
        return {"conv": {"weight": init(i, o, k), "bias": jnp.zeros((o,), dtype)}}

    h, lat, dd = cfg.hidden_size, cfg.latent_dim, cfg.decoder_dim
    layers = {}
    for li in range(cfg.num_hidden_layers):
        layers[str(li)] = {
            "self_attn": {
                "q_proj": {"weight": init(h, h)},
                "k_proj": {"weight": init(h, h)},
                "v_proj": {"weight": init(h, h)},
                "o_proj": {"weight": init(h, h)},
            },
            "mlp": {"gate_proj": {"weight": init(cfg.intermediate_size, h)},
                    "up_proj": {"weight": init(cfg.intermediate_size, h)},
                    "down_proj": {"weight": init(h, cfg.intermediate_size)}},
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "self_attn_layer_scale": {"scale": jnp.full((h,), 0.01, dtype)},
            "mlp_layer_scale": {"scale": jnp.full((h,), 0.01, dtype)},
        }
    upsample = {}
    for i in range(len(cfg.upsampling_ratios)):
        upsample[str(i)] = {
            "0": tconv(lat, lat, cfg.upsampling_ratios[i]),
            "1": {"dwconv": conv(lat, 1, 7), "norm": {
                      "weight": jnp.ones((lat,), dtype),
                      "bias": jnp.zeros((lat,), dtype)},
                  "pwconv1": {"weight": init(4 * lat, lat),
                              "bias": jnp.zeros((4 * lat,), dtype)},
                  "pwconv2": {"weight": init(lat, 4 * lat),
                              "bias": jnp.zeros((lat,), dtype)},
                  "gamma": jnp.full((lat,), 1e-6, dtype)},
        }
    decoder = {"0": conv(dd, lat, 7)}
    for i in range(len(cfg.upsample_rates)):
        ind = dd // (2 ** i)
        outd = dd // (2 ** (i + 1))
        block = {"0": {"alpha": jnp.zeros((ind,), dtype),
                       "beta": jnp.zeros((ind,), dtype)},
                 "1": tconv(ind, outd, 2 * cfg.upsample_rates[i])}
        for j, dil in enumerate((1, 3, 9)):
            block[str(2 + j)] = {
                "act1": {"alpha": jnp.zeros((outd,), dtype),
                         "beta": jnp.zeros((outd,), dtype)},
                "conv1": conv(outd, outd, 7),
                "act2": {"alpha": jnp.zeros((outd,), dtype),
                         "beta": jnp.zeros((outd,), dtype)},
                "conv2": conv(outd, outd, 1),
            }
        decoder[str(1 + i)] = {"block": block}
    outd = dd // (2 ** len(cfg.upsample_rates))
    decoder[str(1 + len(cfg.upsample_rates))] = {
        "alpha": jnp.zeros((outd,), dtype), "beta": jnp.zeros((outd,), dtype)}
    decoder[str(2 + len(cfg.upsample_rates))] = conv(1, outd, 7)

    return {
        "_codebooks": init(cfg.num_quantizers, cfg.codebook_size,
                           cfg.codebook_dim, scale=0.02),
        "pre_conv": conv(lat, cfg.codebook_dim, 3),
        "pre_transformer": {
            "input_proj": {"weight": init(h, lat), "bias": jnp.zeros((h,), dtype)},
            "layers": layers,
            "norm": {"weight": jnp.ones((h,), dtype)},
            "output_proj": {"weight": init(lat, h), "bias": jnp.zeros((lat,), dtype)},
        },
        "upsample": upsample,
        "decoder": decoder,
    }


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
