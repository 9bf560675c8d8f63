"""Rotary position embeddings: plain 1-D RoPE and the talker's 3-axis mrope.

Reference math:
- 1-D tables: modeling_qwen3_tts.py:561-592 (Qwen3TTSRotaryEmbedding) — fp32
  tables, `emb = cat(freqs, freqs)`, scaled by `attention_scaling`.
- mrope tables: modeling_qwen3_tts.py:526-559 — positions are (3, B, T).
- mrope application: modeling_qwen3_tts.py:660-724
  (apply_multimodal_rotary_pos_emb), sectioned or interleaved mixing of the
  three axes' tables, then the usual rotate-half form.

All table math is fp32 regardless of activation dtype (the reference forces
float32 with autocast disabled).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def default_inv_freq(head_dim: int, theta: float) -> jax.Array:
    """Default RoPE inverse frequencies (fp32), matching HF `default` rope."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_tables(position_ids: jax.Array, inv_freq: jax.Array,
                attention_scaling: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for positions of shape (..., T).

    Returns cos, sin with shape (..., T, head_dim) in fp32.
    """
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq  # (..., T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * attention_scaling, jnp.sin(emb) * attention_scaling


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    """Apply 1-D RoPE. q/k: (B, T, H, D); cos/sin: (B, T, D) fp32."""
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + rotate_half(qf) * sin
    k_out = kf * cos + rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def _mix_mrope_sections(tab: jax.Array, mrope_section: Sequence[int]) -> jax.Array:
    """Sectioned mrope mixing (non-interleaved).

    tab: (3, B, T, D). Splits the last dim into chunks of sizes
    mrope_section*2 and takes chunk i from axis i % 3.  Reference:
    modeling_qwen3_tts.py:713-720.
    """
    sections = list(mrope_section) * 2
    pieces = []
    start = 0
    for i, size in enumerate(sections):
        pieces.append(tab[i % 3, ..., start:start + size])
        start += size
    return jnp.concatenate(pieces, axis=-1)


def _mix_mrope_interleaved(tab: jax.Array, mrope_section: Sequence[int]) -> jax.Array:
    """Interleaved mrope mixing. tab: (3, B, T, D).

    Reference: modeling_qwen3_tts.py:692-712 — operates on the first half of
    the last dim then duplicates.  For each modality axis i>=1, channels
    [i : section_i * 3 : 3] of the half-table take axis i's values; all other
    channels take axis 0's.
    """
    dim = tab.shape[-1]
    half = tab[..., : dim // 2]  # (3, B, T, D/2)
    n = len(mrope_section)
    out = half[0]
    idx = jnp.arange(dim // 2)
    for i in range(1, n):
        sel = (idx >= i) & (idx < mrope_section[i] * n) & ((idx - i) % n == 0)
        out = jnp.where(sel, half[i], out)
    return jnp.concatenate([out, out], axis=-1)


def apply_mrope(q: jax.Array, k: jax.Array, cos3: jax.Array, sin3: jax.Array,
                mrope_section: Optional[Sequence[int]],
                interleaved: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Apply 3-axis multimodal RoPE.

    q/k: (B, T, H, D); cos3/sin3: (3, B, T, D) fp32 per-axis tables.
    For TTS all three axes usually carry identical positions, but we keep full
    generality so checkpoint `rope_scaling` settings behave identically.
    """
    if mrope_section is None:
        # All axes identical: plain rope on axis 0.
        return apply_rope(q, k, cos3[0], sin3[0])
    if interleaved:
        cos = _mix_mrope_interleaved(cos3, mrope_section)
        sin = _mix_mrope_interleaved(sin3, mrope_section)
    else:
        cos = _mix_mrope_sections(cos3, mrope_section)
        sin = _mix_mrope_sections(sin3, mrope_section)
    return apply_rope(q, k, cos, sin)
