"""1-D convolution ops matching the reference codecs' exact padding semantics.

All convs run in NCH layout with torch-layout kernels (O, I/groups, K) so
checkpoint weights load without reshuffling; XLA lowers these onto the MXU.

Padding semantics matched bit-for-bit:
- causal conv: modeling_qwen3_tts_tokenizer_v2.py:159-192
  (Qwen3TTSTokenizerV2CausalConvNet / _get_extra_padding_for_conv1d) and HF
  Mimi's MimiConv1d (same math, `padding_total = eff_kernel - stride`).
- causal transposed conv: modeling_qwen3_tts_tokenizer_v2.py:195-208 (full
  transposed conv then right-trim `kernel - stride`).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def conv1d(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
           stride: int = 1, dilation: int = 1, groups: int = 1,
           padding=((0, 0),)) -> jax.Array:
    """Plain conv1d. x: (B, C, T); weight: (O, I/groups, K) torch layout."""
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    return out.astype(x.dtype)


def _causal_pad_amounts(length: int, kernel_size: int, stride: int,
                        dilation: int) -> tuple:
    """(left, right) zero padding used by the reference causal convs."""
    eff_k = (kernel_size - 1) * dilation + 1
    pad_total = eff_k - stride
    n_frames = (length - eff_k + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_k - pad_total)
    extra = ideal - length
    return pad_total, extra


def causal_conv1d(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None,
                  stride: int = 1, dilation: int = 1, groups: int = 1,
                  pad_mode: str = "constant") -> jax.Array:
    """Causal conv1d with the reference's left+extra padding. x: (B, C, T)."""
    k = weight.shape[-1]
    left, extra = _causal_pad_amounts(x.shape[-1], k, stride, dilation)
    if pad_mode == "replicate":
        x = jnp.pad(x, ((0, 0), (0, 0), (left, max(extra, 0))), mode="edge")
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (left, max(extra, 0))))
    return conv1d(x, weight, bias, stride=stride, dilation=dilation, groups=groups)


def causal_conv_transpose1d(x: jax.Array, weight: jax.Array,
                            bias: Optional[jax.Array] = None,
                            stride: int = 1) -> jax.Array:
    """Causal transposed conv1d: full transposed conv, trim `k - stride` right.

    weight: torch ConvTranspose1d layout (I, O, K).
    """
    k = weight.shape[-1]
    # torch ConvTranspose1d(padding=0) == zero-insert (stride-1) between
    # inputs (lhs_dilation), pad k-1 both sides, correlate with the spatially
    # flipped kernel in (O, I, K) layout.
    w = jnp.flip(weight, axis=-1).swapaxes(0, 1)  # (in, out, k) -> (out, in, k) flipped
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1,),
        padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    right = k - stride
    if right > 0:
        out = out[..., :-right]
    return out.astype(x.dtype)


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array) -> jax.Array:
    """SnakeBeta activation: x + exp(-beta) * sin^2(x * exp(alpha)).

    Reference: modeling_qwen3_tts_tokenizer_v2.py:578-616 — alpha/beta stored
    in log scale; x: (B, C, T), alpha/beta: (C,).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    a = jnp.exp(alpha.astype(jnp.float32))[None, :, None]
    b = jnp.exp(beta.astype(jnp.float32))[None, :, None]
    s = jnp.sin(xf * a)
    out = xf + (1.0 / (b + 1e-9)) * s * s
    return out.astype(dtype)
