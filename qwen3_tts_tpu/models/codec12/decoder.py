"""12 Hz codec decoder (codes -> waveform), TPU-native XLA implementation.

Re-implements the behavior of the reference vocoder
(qwen_tts/core/tokenizer_12hz/modeling_qwen3_tts_tokenizer_v2.py:824-896,
Qwen3TTSTokenizerV2Decoder) with a TPU-first design:

- The split-RVQ dequantization (reference lines 661-821) is folded at
  load time into 16 pre-projected codebooks so decode is a single
  gather + sum instead of 16 embedding lookups and two 1x1 convs
  (`prepare_decoder_params`).
- The 8-layer sliding-window(72) transformer (reference lines 409-575) runs
  as plain XLA GQA attention with fp32 softmax.
- Conv stacks (ConvNeXt upsample, SnakeBeta decoder blocks, reference lines
  211-243 / 578-658) compile to MXU convs with the reference's exact causal
  padding.
- `chunked_decode` (reference lines 886-896) is re-expressed with static
  chunk shapes so streaming emission compiles once.

Parameters are the checkpoint state dict unflattened (see weights.py), with
an extra `_codebooks` entry added by `prepare_decoder_params`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...config import CodecV2DecoderConfig
from ...ops.attention import attention, causal_mask
from ...ops.conv import causal_conv1d, causal_conv_transpose1d, snake_beta
from ...ops.norms import layer_norm, rms_norm
from ...ops.rope import apply_rope, default_inv_freq, rope_tables
from ...weights import numeric_children

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# RVQ dequantization
# ---------------------------------------------------------------------------


def _normalized_codebook(codebook: Params, eps: float = 1e-5) -> jax.Array:
    """EMA codebook -> embedding table. Reference: EuclideanCodebook.decode
    (modeling...v2.py:676-679): embedding_sum / clamp(cluster_usage, eps)."""
    usage = jnp.clip(codebook["cluster_usage"].astype(jnp.float32), min=eps)
    return codebook["embedding_sum"].astype(jnp.float32) / usage[:, None]


def prepare_decoder_params(params: Params, cfg: CodecV2DecoderConfig) -> Params:
    """Fold the split-RVQ output projections into the codebooks.

    dequant(codes) = W_first @ E_0[c_0] + W_rest @ sum_{k>=1} E_k[c_k]
    so we precompute E'_k = E_k @ W^T, giving a single (Q, bins, codebook_dim)
    gather table.  Reference math: SplitResidualVectorQuantizer.decode
    (modeling...v2.py:815-821) with project_out == Identity (dim == codebook
    dim) and output_proj a 1x1 conv.
    """
    q = params["quantizer"]
    w_first = q["rvq_first"]["output_proj"]["weight"].astype(jnp.float32)[..., 0]  # (D_out, D)
    w_rest = q["rvq_rest"]["output_proj"]["weight"].astype(jnp.float32)[..., 0]

    tables = []
    first_layers = numeric_children(q["rvq_first"]["vq"]["layers"])
    for layer in first_layers:
        emb = _normalized_codebook(layer["_codebook"])
        tables.append(emb @ w_first.T)
    for layer in numeric_children(q["rvq_rest"]["vq"]["layers"]):
        emb = _normalized_codebook(layer["_codebook"])
        tables.append(emb @ w_rest.T)
    out = dict(params)
    out["_codebooks"] = jnp.stack(tables, axis=0)  # (Q, bins, codebook_dim)
    return out


def rvq_dequantize(codebooks: jax.Array, codes: jax.Array) -> jax.Array:
    """codes: (B, Q, T) int -> (B, codebook_dim, T) fp32."""
    Q = codebooks.shape[0]
    if codes.shape[1] != Q:
        raise ValueError(f"Expected {Q} layers of codes, got {codes.shape[1]}")
    # clamp into the valid id range (the reference clamps min=0 at decode,
    # modeling...v2.py:1014; we also clip high so bad ids degrade gracefully)
    codes = jnp.clip(codes, 0, codebooks.shape[1] - 1)
    out = None
    for k in range(Q):
        e = jnp.take(codebooks[k], codes[:, k, :], axis=0)  # (B, T, D)
        out = e if out is None else out + e
    return jnp.transpose(out, (0, 2, 1))


# ---------------------------------------------------------------------------
# Pre-transformer (sliding-window causal, RoPE, RMSNorm, LayerScale)
# ---------------------------------------------------------------------------


def _transformer_layer(layer: Params, cfg: CodecV2DecoderConfig, h: jax.Array,
                       cos: jax.Array, sin: jax.Array, mask: jax.Array) -> jax.Array:
    B, T, _ = h.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    attn = layer["self_attn"]

    x = rms_norm(h, layer["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q = (x @ attn["q_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, H, D)
    k = (x @ attn["k_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, Hkv, D)
    v = (x @ attn["v_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, Hkv, D)
    q, k = apply_rope(q, k, cos, sin)
    o = attention(q, k, v, mask)
    o = o.reshape(B, T, H * D) @ attn["o_proj"]["weight"].T.astype(x.dtype)
    h = h + layer["self_attn_layer_scale"]["scale"].astype(h.dtype) * o

    x = rms_norm(h, layer["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    mlp = layer["mlp"]
    gate = jax.nn.silu(x @ mlp["gate_proj"]["weight"].T.astype(x.dtype))
    up = x @ mlp["up_proj"]["weight"].T.astype(x.dtype)
    down = (gate * up) @ mlp["down_proj"]["weight"].T.astype(x.dtype)
    h = h + layer["mlp_layer_scale"]["scale"].astype(h.dtype) * down
    return h


def pre_transformer(params: Params, cfg: CodecV2DecoderConfig,
                    x: jax.Array) -> jax.Array:
    """x: (B, T, latent) -> (B, T, latent).

    Reference: Qwen3TTSTokenizerV2DecoderTransformerModel.forward
    (modeling...v2.py:499-575): input_proj -> 8 sliding-window layers -> norm
    -> output_proj.
    """
    B, T, _ = x.shape
    h = x @ params["input_proj"]["weight"].T.astype(x.dtype) + params["input_proj"]["bias"].astype(x.dtype)

    pos = jnp.arange(T)[None, :]
    inv_freq = default_inv_freq(cfg.head_dim, cfg.rope_theta)
    cos, sin = rope_tables(pos, inv_freq)
    mask = causal_mask(pos, pos, sliding_window=cfg.sliding_window)

    for layer in numeric_children(params["layers"]):
        h = _transformer_layer(layer, cfg, h, cos, sin, mask)

    h = rms_norm(h, params["norm"]["weight"], cfg.rms_norm_eps)
    return h @ params["output_proj"]["weight"].T.astype(h.dtype) + params["output_proj"]["bias"].astype(h.dtype)


# ---------------------------------------------------------------------------
# Conv stacks
# ---------------------------------------------------------------------------


def _convnext_block(block: Params, x: jax.Array) -> jax.Array:
    """Reference: Qwen3TTSTokenizerV2ConvNeXtBlock (modeling...v2.py:211-243)."""
    resid = x
    dim = x.shape[1]
    h = causal_conv1d(x, block["dwconv"]["conv"]["weight"],
                      block["dwconv"]["conv"]["bias"], groups=dim)
    h = jnp.transpose(h, (0, 2, 1))
    h = layer_norm(h, block["norm"]["weight"], block["norm"]["bias"], eps=1e-6)
    h = h @ block["pwconv1"]["weight"].T.astype(h.dtype) + block["pwconv1"]["bias"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = h @ block["pwconv2"]["weight"].T.astype(h.dtype) + block["pwconv2"]["bias"].astype(h.dtype)
    h = block["gamma"].astype(h.dtype) * h
    h = jnp.transpose(h, (0, 2, 1))
    return resid + h


def _residual_unit(unit: Params, x: jax.Array, dilation: int) -> jax.Array:
    """Reference: Qwen3TTSTokenizerV2DecoderDecoderResidualUnit (619-635)."""
    resid = x
    h = snake_beta(x, unit["act1"]["alpha"], unit["act1"]["beta"])
    h = causal_conv1d(h, unit["conv1"]["conv"]["weight"], unit["conv1"]["conv"]["bias"],
                      dilation=dilation)
    h = snake_beta(h, unit["act2"]["alpha"], unit["act2"]["beta"])
    h = causal_conv1d(h, unit["conv2"]["conv"]["weight"], unit["conv2"]["conv"]["bias"])
    return h + resid


def _decoder_block(block: Params, cfg: CodecV2DecoderConfig, layer_idx: int,
                   x: jax.Array) -> jax.Array:
    """Reference: Qwen3TTSTokenizerV2DecoderDecoderBlock (638-658)."""
    rate = cfg.upsample_rates[layer_idx]
    mods = numeric_children(block["block"])
    h = snake_beta(x, mods[0]["alpha"], mods[0]["beta"])
    h = causal_conv_transpose1d(h, mods[1]["conv"]["weight"], mods[1]["conv"]["bias"],
                                stride=rate)
    for unit, dilation in zip(mods[2:], (1, 3, 9)):
        h = _residual_unit(unit, h, dilation)
    return h


def decode_frames(params: Params, cfg: CodecV2DecoderConfig,
                  codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Full decoder forward. codes: (B, Q, T) int -> wav (B, 1, T*upsample).

    Reference: Qwen3TTSTokenizerV2Decoder.forward (modeling...v2.py:869-884).
    """
    hidden = rvq_dequantize(params["_codebooks"], codes).astype(dtype)
    hidden = causal_conv1d(hidden, params["pre_conv"]["conv"]["weight"],
                           params["pre_conv"]["conv"]["bias"])
    hidden = jnp.transpose(hidden, (0, 2, 1))
    hidden = pre_transformer(params["pre_transformer"], cfg, hidden)
    hidden = jnp.transpose(hidden, (0, 2, 1))

    for i, group in enumerate(numeric_children(params["upsample"])):
        mods = numeric_children(group)
        factor = cfg.upsampling_ratios[i]
        hidden = causal_conv_transpose1d(hidden, mods[0]["conv"]["weight"],
                                         mods[0]["conv"]["bias"], stride=factor)
        hidden = _convnext_block(mods[1], hidden)

    decoder_mods = numeric_children(params["decoder"])
    wav = causal_conv1d(hidden, decoder_mods[0]["conv"]["weight"],
                        decoder_mods[0]["conv"]["bias"])
    n_blocks = len(cfg.upsample_rates)
    for i in range(n_blocks):
        wav = _decoder_block(decoder_mods[1 + i], cfg, i, wav)
    wav = snake_beta(wav, decoder_mods[1 + n_blocks]["alpha"],
                     decoder_mods[1 + n_blocks]["beta"])
    wav = causal_conv1d(wav, decoder_mods[2 + n_blocks]["conv"]["weight"],
                        decoder_mods[2 + n_blocks]["conv"]["bias"])
    return jnp.clip(wav, -1.0, 1.0)


def to_pcm16(wav: jax.Array) -> jax.Array:
    """Float waveform in [-1, 1] -> int16 PCM, on device.

    Same math as utils/audio.write_wav's host-side conversion; doing it on
    device quarters the fp32 device->host transfer for served audio (PCM16
    is the delivery format — the reference writes 16-bit WAVs)."""
    return jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)


# one compiled program per (chunk shape, cfg); eager dispatch of the ~600-op
# conv stack costs tens of seconds of per-op mini-compiles on first use
decode_frames_jit = partial(jax.jit,
                            static_argnames=("cfg", "dtype"))(decode_frames)


def chunked_decode(params: Params, cfg: CodecV2DecoderConfig, codes: jax.Array,
                   chunk_size: int = 300, left_context_size: int = 25,
                   dtype=jnp.float32) -> jax.Array:
    """Streaming chunked decode matching reference chunked_decode
    (modeling...v2.py:886-896): each chunk re-decodes `left_context` frames of
    context and drops the corresponding samples.

    Python loop over chunks with *static per-chunk shapes* — at most two
    distinct compiled shapes (first chunk and steady-state), so long audio
    streams without recompilation.
    """
    total = codes.shape[-1]
    up = cfg.total_upsample
    wavs = []
    start = 0
    codes = jnp.asarray(codes)
    while start < total:
        end = min(start + chunk_size, total)
        ctx = left_context_size if start - left_context_size > 0 else start
        chunk = codes[..., start - ctx:end]
        wav = decode_frames_jit(params, cfg, chunk, dtype=dtype)
        wavs.append(wav[..., ctx * up:])
        start = end
    return jnp.concatenate(wavs, axis=-1)
