"""Attention ops: GQA with fp32 softmax, causal / sliding-window masks.

XLA-first implementation: one fused einsum-softmax-einsum chain that XLA maps
onto the MXU; masks are additive fp32 biases built from boolean predicates
(static shapes).  This is the production decode/prefill path (a per-layer
Pallas decode kernel measured slower and was removed — docs/DESIGN.md §9);
long prefills route to `ops/pallas/prefill_attention.py`.

Reference semantics matched: eager_attention_forward in
modeling_qwen3_tts.py:634-657 (fp32 softmax, GQA via repeat_kv) and HF
create_causal_mask / create_sliding_window_causal_mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def causal_mask(q_pos: jax.Array, kv_pos: jax.Array,
                kv_valid: Optional[jax.Array] = None,
                sliding_window: Optional[int] = None) -> jax.Array:
    """Boolean attention mask.

    q_pos: (B, Tq) int positions of the query tokens.
    kv_pos: (B, Tk) int positions of the key tokens.
    kv_valid: optional (B, Tk) bool — False for padding / empty cache slots.
    sliding_window: if set, keys older than `window` positions are masked
        (HF semantics: key is visible iff q_pos - window < k_pos <= q_pos).

    Returns (B, 1, Tq, Tk) bool, True = attend.
    """
    ok = kv_pos[:, None, :] <= q_pos[:, :, None]
    if sliding_window is not None:
        ok &= kv_pos[:, None, :] > (q_pos[:, :, None] - sliding_window)
    if kv_valid is not None:
        ok &= kv_valid[:, None, :]
    return ok[:, None, :, :]


def mask_to_bias(mask: jax.Array) -> jax.Array:
    """Boolean mask -> additive fp32 bias."""
    return jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)


def attention_kv_quant(q: jax.Array, kq: jax.Array, ks: jax.Array,
                       vq: jax.Array, vs: jax.Array,
                       mask: Optional[jax.Array] = None,
                       scale: Optional[float] = None) -> jax.Array:
    """GQA over an int8-quantized KV window without dequantizing it.

    kq/vq: (B, Tk, Hkv, D) int8; ks/vs: (B, Tk, Hkv) fp32 per-(slot, head)
    scales.  The K scale folds into the score matrix and the V scale into the
    probabilities, so the only HBM reads of the KV window are the int8
    buffers + the tiny scale planes (the int8->compute convert fuses into the
    matmul operand loads; a dequantized (B, Tk, Hkv, D) tensor is never
    materialized).
    """
    B, Tq, Hq, D = q.shape
    Hkv = kq.shape[2]
    if scale is None:
        scale = D ** -0.5
    groups = Hq // Hkv

    qg = q.reshape(B, Tq, Hkv, groups, D)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kq.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    # scores[b,h,g,q,s] *= ks[b,s,h] * 1/sqrt(D)
    scores = scores * (ks.astype(jnp.float32).transpose(0, 2, 1)
                       [:, :, None, None, :] * scale)
    if mask is not None:
        bias = mask_to_bias(mask) if mask.dtype == jnp.bool_ else mask.astype(jnp.float32)
        scores = scores + bias[:, :, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    # fold the V scale into the probabilities (fp32) before the int8 matmul
    probs = (probs * vs.astype(jnp.float32).transpose(0, 2, 1)
             [:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vq.astype(q.dtype))
    return out.reshape(B, Tq, Hq, D)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: Optional[jax.Array] = None,
              scale: Optional[float] = None) -> jax.Array:
    """Grouped-query attention.

    q: (B, Tq, Hq, D); k/v: (B, Tk, Hkv, D); mask: (B, 1, Tq, Tk) bool or
    additive bias.  Returns (B, Tq, Hq, D) in q.dtype.  Softmax in fp32.
    """
    B, Tq, Hq, D = q.shape
    Hkv = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    groups = Hq // Hkv

    qg = q.reshape(B, Tq, Hkv, groups, D)
    # scores: (B, Hkv, groups, Tq, Tk)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            bias = mask_to_bias(mask)
        else:
            bias = mask.astype(jnp.float32)
        # bias: (B, 1, Tq, Tk) -> broadcast over (Hkv, groups)
        scores = scores + bias[:, :, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    return out.reshape(B, Tq, Hq, D)
