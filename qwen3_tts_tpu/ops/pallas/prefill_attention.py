"""Pallas TPU kernel: causal flash attention for the prefill pass.

The XLA prefill path (`ops/attention.py::attention`) materializes the fp32
score tensor (B, Hkv, G, T, T) plus the additive mask bias — fine at the
64-token buckets of custom-voice prompts, but at long ICL voice-clone
prompts (reference `modeling_qwen3_tts.py:1968-2019` builds ref_text + text
+ per-frame summed ref codec embeds) that is gigabytes of HBM traffic per
layer.  This kernel streams K/V blocks through VMEM with the classic flash
recurrence instead, and skips blocks that are entirely masked.

Masking model (exactly the left-padded prefill layout of
`models/talker.py::talker_prefill`):
  query slot i attends key slot j  iff  start_b <= j <= i
  (+ optional sliding window:  j > i - window)
where `start` (B,) is the first valid slot per row — left padding is
contiguous by construction (`runtime/prompts.py` left-pads embeds).

Grid = (B, Hkv, T/BQ, T/BK): one program covers ALL G = Hq/Hkv query heads
of one KV head (they share the K/V block; a static G-loop keeps every
matmul 2-D for Mosaic), so the program count stays B*Hkv*ni*nj — measured
8x fewer grid steps than a per-query-head grid, which was what made the
first cut slower than XLA at moderate T.  The KV-block axis is innermost so
the fp32 (m, l, acc) scratch carries the running softmax across KV blocks
of one query block; causally-dead and padding-dead blocks skip both compute
and (via index-map clamping onto an already-needed block) their HBM->VMEM
DMA.

Measured (v5e, bf16, Hq16/Hkv8/D128, vs the dense XLA path): wins from
T>=2048 (B=16: 0.46s vs 0.48s; B=8 T=4096: 0.20s vs 1.54s); below that the
dense path's single big MXU matmul wins.  `models/talker.py` routes prefill
here when T >= 2048.

`interpret=True` runs on CPU for tests; the compiled path needs a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _prefill_kernel(start_ref, q_ref, k_ref, v_ref, out_ref,
                    m_ref, l_ref, acc_ref, *, scale: float, blk_q: int,
                    blk_k: int, nj: int, g: int, window: int | None):
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_lo = i * blk_q                      # first query slot of this block
    q_hi = q_lo + blk_q - 1               # last
    k_lo = j * blk_k
    # block is live unless entirely above the causal diagonal, entirely in
    # the left padding, or entirely behind the sliding window
    live = (k_lo <= q_hi) & (k_lo + blk_k > start_ref[b])
    if window is not None:
        live &= k_lo + blk_k - 1 > q_lo - window

    @pl.when(live)
    def _():
        qpos = q_lo + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
        kpos = k_lo + jax.lax.broadcasted_iota(jnp.int32, (1, blk_k), 1)
        ok = (kpos <= qpos) & (kpos >= start_ref[b])
        if window is not None:
            ok &= kpos > qpos - window

        k = k_ref[0, 0].astype(jnp.float32)               # (BK, D)
        v = v_ref[0, 0].astype(jnp.float32)

        # all G query heads of this KV head ride the same K/V block
        for gi in range(g):
            rows = slice(gi * blk_q, (gi + 1) * blk_q)
            q = q_ref[0, 0, gi].astype(jnp.float32)       # (BQ, D)

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(ok, s, NEG_INF)                 # (BQ, BK)

            m_prev = m_ref[rows, 0:1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
            corr = jnp.exp(m_prev - m_new)

            l_ref[rows, 0:1] = l_ref[rows, 0:1] * corr + jnp.sum(
                p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_ref[rows, :] = acc_ref[rows, :] * corr + pv
            m_ref[rows, 0:1] = m_new

    @pl.when(j == nj - 1)
    def _():
        # fully-padded query rows (qpos < start) never see a live key:
        # l == 0 there; emit zeros (their output is discarded upstream)
        denom = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out = acc_ref[:] / denom                          # (G*BQ, D)
        for gi in range(g):
            out_ref[0, 0, gi] = out[gi * blk_q:(gi + 1) * blk_q].astype(
                out_ref.dtype)


def flash_prefill(q: jax.Array, k: jax.Array, v: jax.Array,
                  start: jax.Array, scale: float | None = None,
                  sliding_window: int | None = None,
                  block_q: int = 256, block_k: int = 512,
                  interpret: bool = False) -> jax.Array:
    """Causal left-padded GQA flash attention.

    q: (B, T, Hq, D); k/v: (B, T, Hkv, D); start: (B,) int32 first valid
    slot per row.  Returns (B, T, Hq, D) in q.dtype.  Matches
    `ops.attention.attention` with the `talker_prefill` mask to fp32-softmax
    accuracy.
    """
    B, T, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    blk_q = min(block_q, T)
    blk_k = min(block_k, T)
    Tp = ((T + blk_q - 1) // blk_q) * blk_q
    Tp = ((Tp + blk_k - 1) // blk_k) * blk_k
    if Tp != T:
        # pad keys at the END: real queries mask padded keys via kpos <=
        # qpos; padded queries' output is dropped below
        q = jnp.pad(q, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Tp - T), (0, 0), (0, 0)))
    ni = Tp // blk_q
    nj = Tp // blk_k

    # grouped head-major layouts: blocks keep (seq, D) as the trailing dims
    qh = q.reshape(B, Tp, Hkv, G, D).transpose(0, 2, 3, 1, 4)  # (B,Hkv,G,T,D)
    kh = jnp.swapaxes(k, 1, 2)                                 # (B,Hkv,T,D)
    vh = jnp.swapaxes(v, 1, 2)

    def q_index(b, h, i, j, s0):
        return (b, h, 0, i, 0)

    def kv_index(b, h, i, j, s0):
        # clamp dead blocks onto the last live one -> repeated index, DMA
        # skipped by the pipeline
        first = s0[b] // blk_k
        last = jnp.maximum((i * blk_q + blk_q - 1) // blk_k, first)
        return (b, h, jnp.clip(j, first, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1, G, blk_q, D), q_index),
            pl.BlockSpec((1, 1, blk_k, D), kv_index),
            pl.BlockSpec((1, 1, blk_k, D), kv_index),
        ],
        out_specs=pl.BlockSpec((1, 1, G, blk_q, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((G * blk_q, 128), jnp.float32),
            pltpu.VMEM((G * blk_q, 128), jnp.float32),
            pltpu.VMEM((G * blk_q, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_prefill_kernel, scale=float(scale), blk_q=blk_q,
                          blk_k=blk_k, nj=nj, g=G, window=sliding_window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Tp, D), q.dtype),
        interpret=interpret,
    )(start.astype(jnp.int32), qh, kh, vh)
    # (B, Hkv, G, Tp, D) -> (B, T, Hq, D)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tp, Hq, D)[:, :T]
