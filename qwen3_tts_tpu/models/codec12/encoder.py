"""12 Hz codec encoder (waveform -> codes): JAX rebuild of the Mimi encoder.

The reference wraps HF `MimiModel` with decoder halves nulled out
(qwen_tts/core/tokenizer_12hz/modeling_qwen3_tts_tokenizer_v2.py:899-908,
Qwen3TTSTokenizerV2Encoder) and calls `MimiModel.encode` ->
`_encode_frame` (HF transformers models/mimi/modeling_mimi.py:1442-1481):
SEANet conv encoder -> 8-layer causal transformer -> strided downsample conv
-> split-RVQ encode.  This module re-implements that pipeline TPU-first:

- convs via lax.conv_general_dilated in NCH with checkpoint-layout kernels;
- the transformer as XLA GQA attention (fp32 softmax, LayerNorm, LayerScale);
- the residual VQ search as one batched matmul argmin per quantizer
  (distance = |x|^2 - 2 x.e + |e|^2 -> argmin over the 2048-entry codebook
  rides the MXU), with the EMA codebooks normalized once at load.

Parameter tree = the checkpoint state dict under `encoder.` unflattened.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import MimiEncoderConfig
from ...ops.attention import attention, causal_mask
from ...ops.conv import causal_conv1d
from ...ops.norms import layer_norm
from ...ops.rope import apply_rope, default_inv_freq, rope_tables
from ...weights import numeric_children

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# SEANet encoder
# ---------------------------------------------------------------------------


def _resnet_block(block: Params, cfg: MimiEncoderConfig, x: jax.Array,
                  dilation: int) -> jax.Array:
    """MimiResnetBlock: [ELU, conv k=residual_kernel dil=d, ELU, conv k=1],
    identity shortcut (use_conv_shortcut=False in Mimi defaults)."""
    # torch ModuleList indices: 0=ELU (no params), 1=conv, 2=ELU, 3=conv
    h = jax.nn.elu(x)
    h = causal_conv1d(h, block["block"]["1"]["conv"]["weight"],
                      block["block"]["1"]["conv"]["bias"],
                      dilation=dilation, pad_mode=cfg.pad_mode)
    h = jax.nn.elu(h)
    h = causal_conv1d(h, block["block"]["3"]["conv"]["weight"],
                      block["block"]["3"]["conv"]["bias"],
                      pad_mode=cfg.pad_mode)
    return x + h


def seanet_encode(params: Params, cfg: MimiEncoderConfig, x: jax.Array) -> jax.Array:
    """x: (B, 1, T) waveform -> (B, hidden, T') features.

    Layer list layout mirrors MimiEncoder.__init__ (modeling_mimi.py:444-480):
    conv0, then per downsample ratio (reversed): residual blocks, ELU, strided
    conv; finally ELU + last conv.
    """
    layers = params["layers"]  # keyed by torch ModuleList index (ELUs absent)
    idx = 0
    h = causal_conv1d(x, layers[str(idx)]["conv"]["weight"],
                      layers[str(idx)]["conv"]["bias"], pad_mode=cfg.pad_mode)
    idx += 1
    for ratio in reversed(cfg.upsampling_ratios):
        for j in range(cfg.num_residual_layers):
            h = _resnet_block(layers[str(idx)], cfg, h, cfg.dilation_growth_rate ** j)
            idx += 1
        idx += 1  # ELU slot (no params)
        h = jax.nn.elu(h)
        h = causal_conv1d(h, layers[str(idx)]["conv"]["weight"],
                          layers[str(idx)]["conv"]["bias"],
                          stride=ratio, pad_mode=cfg.pad_mode)
        idx += 1
    idx += 1  # final ELU slot
    h = jax.nn.elu(h)
    h = causal_conv1d(h, layers[str(idx)]["conv"]["weight"],
                      layers[str(idx)]["conv"]["bias"], pad_mode=cfg.pad_mode)
    return h


# ---------------------------------------------------------------------------
# Encoder transformer (causal, RoPE, LayerNorm + LayerScale)
# ---------------------------------------------------------------------------


def _transformer_layer(layer: Params, cfg: MimiEncoderConfig, h: jax.Array,
                       cos: jax.Array, sin: jax.Array, mask: jax.Array) -> jax.Array:
    B, T, _ = h.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.resolved_head_dim
    attn = layer["self_attn"]

    x = layer_norm(h, layer["input_layernorm"]["weight"],
                   layer["input_layernorm"]["bias"], cfg.norm_eps)
    q = (x @ attn["q_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, H, D)
    k = (x @ attn["k_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, Hkv, D)
    v = (x @ attn["v_proj"]["weight"].T.astype(x.dtype)).reshape(B, T, Hkv, D)
    q, k = apply_rope(q, k, cos, sin)
    o = attention(q, k, v, mask)
    o = o.reshape(B, T, H * D) @ attn["o_proj"]["weight"].T.astype(x.dtype)
    h = h + layer["self_attn_layer_scale"]["scale"].astype(h.dtype) * o

    x = layer_norm(h, layer["post_attention_layernorm"]["weight"],
                   layer["post_attention_layernorm"]["bias"], cfg.norm_eps)
    mlp = layer["mlp"]
    x = x @ mlp["fc1"]["weight"].T.astype(x.dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ mlp["fc2"]["weight"].T.astype(x.dtype)
    h = h + layer["mlp_layer_scale"]["scale"].astype(h.dtype) * x
    return h


def encoder_transformer(params: Params, cfg: MimiEncoderConfig,
                        h: jax.Array) -> jax.Array:
    """h: (B, T, hidden) -> (B, T, hidden). Causal full attention (eager Mimi
    path ignores the sliding window; modeling_mimi.py:647-706)."""
    B, T, _ = h.shape
    pos = jnp.arange(T)[None, :]
    inv_freq = default_inv_freq(cfg.resolved_head_dim, cfg.rope_theta)
    cos, sin = rope_tables(pos, inv_freq)
    mask = causal_mask(pos, pos)
    for layer in numeric_children(params["layers"]):
        h = _transformer_layer(layer, cfg, h, cos, sin, mask)
    return h


# ---------------------------------------------------------------------------
# Split residual VQ encode
# ---------------------------------------------------------------------------


def _normalized_codebooks(rvq: Params, eps: float = 1e-5) -> jax.Array:
    """Stack a residual VQ's EMA codebooks -> (n_q, bins, dim) fp32.

    Reference: MimiEuclideanCodebook.embed = embed_sum / clamp(cluster_usage)
    (modeling_mimi.py:1198-1202).
    """
    tables = []
    for layer in numeric_children(rvq["layers"]):
        cb = layer["codebook"]
        usage = jnp.clip(cb["cluster_usage"].astype(jnp.float32), min=eps)
        tables.append(cb["embed_sum"].astype(jnp.float32) / usage[:, None])
    return jnp.stack(tables, axis=0)


def prepare_encoder_params(params: Params, cfg: MimiEncoderConfig) -> Params:
    """Precompute normalized codebook stacks for both RVQ halves."""
    out = dict(params)
    q = params["quantizer"]
    out["_semantic_codebooks"] = _normalized_codebooks(
        q["semantic_residual_vector_quantizer"])
    out["_acoustic_codebooks"] = _normalized_codebooks(
        q["acoustic_residual_vector_quantizer"])
    return out


def _rvq_encode(codebooks: jax.Array, input_proj: Optional[jax.Array],
                emb: jax.Array, num_quantizers: int) -> jax.Array:
    """Residual VQ encode. emb: (B, hidden, T) -> codes (B, n_q, T).

    Nearest-neighbour search per quantizer as a matmul argmin in fp32
    (MXU-friendly); residual update via table gather.  Matches
    MimiResidualVectorQuantizer.encode (modeling_mimi.py:1269-1303).
    """
    x = emb.astype(jnp.float32)
    if input_proj is not None:
        x = jnp.einsum("oc,bct->bot", input_proj.astype(jnp.float32)[..., 0], x)
    x = jnp.transpose(x, (0, 2, 1))  # (B, T, D)

    residual = x
    codes = []
    for k in range(num_quantizers):
        table = codebooks[k]  # (bins, D)
        # |r - e|^2 = |r|^2 - 2 r.e + |e|^2 ; |r|^2 constant over bins
        scores = residual @ table.T  # (B, T, bins)
        dist = jnp.sum(table * table, axis=-1)[None, None, :] - 2.0 * scores
        idx = jnp.argmin(dist, axis=-1)  # (B, T)
        codes.append(idx)
        quantized = jnp.take(table, idx, axis=0)
        residual = residual - quantized
    return jnp.stack(codes, axis=1)


def split_rvq_encode(params: Params, cfg: MimiEncoderConfig, emb: jax.Array,
                     num_quantizers: Optional[int] = None) -> jax.Array:
    """emb: (B, hidden, T) -> codes (B, Q, T).

    Reference: MimiSplitResidualVectorQuantizer.encode
    (modeling_mimi.py:1318-1345): semantic RVQ first, acoustic RVQ on the
    *unquantized* embeddings for the remaining codebooks.
    """
    q = params["quantizer"]
    nq = num_quantizers if num_quantizers is not None else cfg.num_quantizers
    n_sem = cfg.num_semantic_quantizers

    def proj(rvq):
        ip = rvq.get("input_proj")
        return ip["weight"] if ip is not None else None

    sem = _rvq_encode(params["_semantic_codebooks"],
                      proj(q["semantic_residual_vector_quantizer"]), emb, n_sem)
    if nq > n_sem:
        ac = _rvq_encode(params["_acoustic_codebooks"],
                         proj(q["acoustic_residual_vector_quantizer"]), emb,
                         nq - n_sem)
        return jnp.concatenate([sem, ac], axis=1)
    return sem


# ---------------------------------------------------------------------------
# Full encode
# ---------------------------------------------------------------------------


def encode_waveform(params: Params, cfg: MimiEncoderConfig, wav: jax.Array,
                    num_quantizers: Optional[int] = None,
                    dtype=jnp.float32) -> jax.Array:
    """wav: (B, T) in [-1, 1] -> codes (B, Q, T//1920).

    Mirrors MimiModel._encode_frame (modeling_mimi.py:1442-1481): SEANet ->
    transformer -> downsample conv (replicate-pad causal, stride 2) -> RVQ.
    """
    h = seanet_encode(params["encoder"], cfg, wav[:, None, :].astype(dtype))
    h = jnp.transpose(h, (0, 2, 1))
    h = encoder_transformer(params["encoder_transformer"], cfg, h)
    h = jnp.transpose(h, (0, 2, 1))
    ds = params["downsample"]["conv"]
    h = causal_conv1d(h, ds["weight"], ds.get("bias"), stride=2,
                      pad_mode="replicate")
    return split_rvq_encode(params, cfg, h, num_quantizers)
