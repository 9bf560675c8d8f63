"""Pallas TPU kernel: fused flash-decode GQA attention over the KV cache.

One decode step attends a (B, Hq, D) query against the (B, S, Hkv, D) cache.
Validity is the contiguous window [start_b, end_b) — exactly the shape of
this framework's decode state (left-padded prefill prefix + contiguous
generated region).

Design:
- grid = (B, S/BLK); each program handles every KV head of one batch row for
  one key block (the (Hkv, D) trailing dims satisfy TPU tiling, and all
  G = Hq/Hkv query heads of each KV head ride the MXU together);
- scratch (m, l, acc) persists across the key-block grid axis (TPU grid
  steps are sequential), giving classic flash accumulation in fp32;
- the window scalars arrive via scalar prefetch (SMEM), so a later revision
  can skip the DMA of fully-invalid blocks.

`interpret=True` runs on CPU for tests; the compiled path needs a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _decode_attn_kernel(start_ref, end_ref, q_ref, k_ref, v_ref, out_ref,
                        m_ref, l_ref, acc_ref, *, scale: float, blocks: int,
                        blk: int, hkv: int, g: int, d: int):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # blocks wholly outside [start, end) skip compute; their DMA is also
    # skipped because the index_map clamps them onto the window's last block
    # (same block index -> the pipeline reuses the buffered block)
    in_window = (j * blk < end_ref[b]) & ((j + 1) * blk > start_ref[b])

    @pl.when(in_window)
    def _():
        pos = j * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        valid = (pos >= start_ref[b]) & (pos < end_ref[b])    # (1, BLK)

        # Mosaic lowers 2-D matmuls only: loop the (few) KV heads statically.
        for h in range(hkv):
            rows = slice(h * g, (h + 1) * g)
            q = q_ref[0, rows, :].astype(jnp.float32)         # (G, D)
            k = k_ref[0, :, h, :].astype(jnp.float32)         # (BLK, D)
            v = v_ref[0, :, h, :].astype(jnp.float32)

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(valid, s, NEG_INF)                  # (G, BLK)

            m_prev = m_ref[rows, 0:1]                         # (G, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
            corr = jnp.exp(m_prev - m_new)

            l_ref[rows, 0:1] = l_ref[rows, 0:1] * corr + jnp.sum(
                p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[rows, :] = acc_ref[rows, :] * corr + pv
            m_ref[rows, 0:1] = m_new

    @pl.when(j == blocks - 1)
    def _():
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     start: jax.Array, end: jax.Array,
                     scale: float | None = None, block_size: int = 512,
                     interpret: bool = False) -> jax.Array:
    """q: (B, Hq, D); k/v_cache: (B, S, Hkv, D); start/end: (B,) int32 —
    valid key window per row. Returns (B, Hq, D) in q.dtype."""
    B, Hq, D = q.shape
    S, Hkv = k_cache.shape[1], k_cache.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    blk = min(block_size, S)
    if S % blk != 0:
        pad = blk - S % blk
        k_cache = jnp.pad(k_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        S += pad
    blocks = S // blk

    # interleave query heads so heads sharing a KV head are adjacent:
    # (B, Hq, D) -> (B, Hkv*G, D) with row h*G+g  == query head for kv head h
    qg = q.reshape(B, Hkv, G, D).reshape(B, Hkv * G, D)

    def kv_index(b, j, s0, s1):
        # clamp out-of-window block indices to the window edge: repeated
        # indices make the pipeline skip the HBM->VMEM copy for those steps
        first = s0[b] // blk
        last = jnp.maximum((s1[b] - 1) // blk, first)
        return (b, jnp.clip(j, first, last), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, blocks),
        in_specs=[
            pl.BlockSpec((1, Hkv * G, D), lambda b, j, s0, s1: (b, 0, 0)),
            pl.BlockSpec((1, blk, Hkv, D), kv_index),
            pl.BlockSpec((1, blk, Hkv, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, Hkv * G, D), lambda b, j, s0, s1: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, 128), jnp.float32),
            pltpu.VMEM((Hkv * G, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, scale=float(scale),
                          blocks=blocks, blk=blk, hkv=Hkv, g=G, d=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv * G, D), q.dtype),
        interpret=interpret,
    )(start.astype(jnp.int32), end.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(B, Hq, D)
