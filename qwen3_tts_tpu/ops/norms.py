"""Normalization ops with the reference's fp32 islands.

Reference numerics: RMSNorm always computes in fp32 then casts back
(modeling_qwen3_tts.py:595-610); LayerNorm used by the ConvNeXt blocks and the
Mimi transformer is standard torch LayerNorm (fp32 accumulate is implicit on
TPU via preferred types).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis in fp32, result in input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Standard LayerNorm over the last axis (fp32 internals)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
