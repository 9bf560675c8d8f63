"""Pallas TPU megakernel: the ENTIRE talker decode step in one kernel.

The talker half of a decode frame (reference: 28-layer decode forward,
modeling_qwen3_tts.py:1635-1744) is weight-DMA-bound: the XLA int8 path
measures 4.2 ms/step at B=32 while its pure weight stream is 1.41 GB
(1.72 ms at v5e's 819 GB/s) — XLA's dequantize-then-dot pattern reaches only
~66% of HBM peak (measured; the bf16 chain reaches 78%, so the per-element
int8->bf16 convert of the full weight stream is what it loses).

This kernel runs all layers in one `pallas_call`, grid (L, nS + C):

- phases 0..nS-1 of layer l are the attention sublayer over nS KV-cache
  chunks of Sc slots each (online softmax: running max / sum / accumulator
  in scratch), with the qkv projection + rope computed in phase 0 and the
  output projection + residual + post-attention norm at the end of phase
  nS-1.  Chunking the KV reads bounds VMEM at ANY attended window length;
- phases nS..nS+C-1 are the MLP in C column chunks (full gate_up blocks
  would not leave room to double-buffer);
- layer weights and KV chunks stream HBM->VMEM through Pallas's automatic
  double-buffered pipeline — layer l+1's qkv DMAs while layer l computes,
  which is the overlap the retired per-op decode-attention kernel could not
  get;
- matmuls are W8A8: activations are dynamically quantized per row and the
  MXU consumes the int8 weights directly (int8 x int8 -> int32) — the
  1.41 G per-step weight converts of the XLA path disappear;
- the KV cache is read in a fused-mode layout (L, B, Hkv, S, D) so scores/
  probs keep S on the lane axis and D-contractions stay in native (16, 128)
  bf16 tiles — no in-kernel relayouts.  `transpose_cache_in/out` convert
  from the standard (L, B, S, Hkv, D) layout once per generate call;
- the new K/V slot is substituted over the (stale) cached slot in-register,
  and also emitted as outputs for the caller to scatter into the cache.

Numerics: W8A8 (per-row dynamic activation scales) differs from the XLA
W8A16 path exactly as the sub-talker megakernel does (ops/pallas/
subtalker.py); the online softmax additionally reassociates the
softmax/PV reduction per chunk; greedy codes can differ on near-ties.
`talker_step_ref` implements the identical math in plain JAX for exact
parity testing.

Requires weight-only int8 params (`quantize_talker_params`).  The KV cache
is bf16 by default; int8-KV mode (pass int8 caches plus fp32 per-(slot,
head) `k_scale`/`v_scale`) folds the K scale into the scores and the V
scale into the probabilities in-kernel (mxu attention only) — the
measured-fastest long-generation config, auto-enabled by
`GenerationConfig(kv_quant=True, fused_talker_step=True)`.  The attended
window must be coverable by the chunking rule in `_pick_chunk` (any length
when it equals the buffer, otherwise a multiple of the 128-slot chunk —
the attend buckets are multiples of 256).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .subtalker import _mm8, _quant_rows, _rms32, _rot_half

# finite large-negative (fp32 min, NOT -inf): fully-masked chunks then keep
# the running max at this value and a later live chunk's correction factor
# exp(min - real) underflows to exactly 0 — no NaN guards needed
NEG_INF = float(jnp.finfo(jnp.float32).min)

# one-chunk ceiling: windows <= this (equal to the whole buffer) skip the
# chunked path; beyond it VMEM wants Sc-sized pieces
ONE_CHUNK_MAX = 384


def _pick_mlp_chunks(inter: int) -> int:
    """MLP column-chunk count (shared by kernel and ref — the chunked
    down-proj accumulation order is part of the math)."""
    for c in (6, 4, 2):
        if inter % c == 0:
            return c
    return 1


def _pick_chunk(S: int, S_buf: int,
                kv_chunk: int = 0) -> Optional[Tuple[int, int]]:
    """(Sc, nS) covering an attended window of S slots, or None if the
    window cannot be blocked (callers then route to the XLA path).

    128-slot chunks are the default: at B=32 a 256-slot chunk is 16.8 MB
    (x2 for k+v, x2 double-buffered) and its fp32 score/PV temporaries
    another 33 MB — past the 128 MB scoped-VMEM budget once layer weights
    are resident.  `kv_chunk` overrides the preferred chunk size (a
    multiple of 128; the hardware sweep lever for the grid-step-count vs
    VMEM trade — fewer, larger phases amortize Mosaic's per-grid-step
    overhead).  The single whole-buffer chunk is only for small odd
    buffers (e.g. 129 slots) that 128 cannot tile."""
    if kv_chunk and S % kv_chunk == 0:
        return kv_chunk, S // kv_chunk
    if S % 128 == 0:
        return 128, S // 128
    if S == S_buf and S <= ONE_CHUNK_MAX:
        return S, 1
    return None


def _kernel(x_ref, cos_ref, sin_ref, bias_ref,
            ln1_ref, ln2_ref, qn_ref, kn_ref, fn_ref,
            qkvs_ref, os_ref, gs_ref, us_ref, dns_ref,
            qkvq_ref, oq_ref, gug_ref, guu_ref, dnq_ref,
            kc_ref, vc_ref, *rest,
            B: int, H: int, heads: int, kv_heads: int, D: int,
            inter: int, C: int, Sc: int, nS: int, eps: float,
            mxu_attn: bool, quant_kv: bool = False):
    # int8-KV mode threads two extra chunk refs (per-(slot, head) fp32
    # scales); scores fold the K scale in after the dot, probabilities fold
    # the V scale in before the PV dot — a dequantized chunk copy is never
    # materialized beyond the int8->bf16 convert the MXU needs
    if quant_kv:
        (kcs_ref, vcs_ref, h_out, newk_out, newv_out,
         x_scr, xn2_scr, q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr) = rest
    else:
        (h_out, newk_out, newv_out,
         x_scr, xn2_scr, q_scr, k_scr, v_scr, m_scr, l_scr, acc_scr) = rest
    l = pl.program_id(0)
    p = pl.program_id(1)
    G = heads // kv_heads
    nq, nkv = heads * D, kv_heads * D
    scale = D ** -0.5

    @pl.when((l == 0) & (p == 0))
    def _():
        x_scr[:] = x_ref[:]

    @pl.when(p == 0)
    def _qkv_rope():
        x = x_scr[:]
        xn = _rms32(x.astype(jnp.float32), ln1_ref[0, 0], eps
                    ).astype(jnp.bfloat16)
        qkv = _mm8(xn, qkvq_ref[0], qkvs_ref[0, 0])       # (B, nq+2nkv) f32
        q = qkv[:, :nq].reshape(B, heads, D)
        k = qkv[:, nq:nq + nkv].reshape(B, kv_heads, D)
        v = qkv[:, nq + nkv:].reshape(B, kv_heads, D)
        q = _rms32(q, qn_ref[0, 0], eps)
        k = _rms32(k, kn_ref[0, 0], eps)
        # rope: per-row tables, broadcast over the row's heads
        cos = cos_ref[:][:, None, :]                      # (B, 1, D) f32
        sin = sin_ref[:][:, None, :]
        q = (q * cos + _rot_half(q) * sin).astype(jnp.bfloat16)
        k = (k * cos + _rot_half(k) * sin).astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        q_scr[:] = q
        k_scr[:] = k
        v_scr[:] = v
        newk_out[0] = k
        newv_out[0] = v
        m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    @pl.when(p < nS)
    def _attn_chunk():
        # online softmax over KV chunk p.  The current slot ci is masked OUT
        # of the host-built bias (its cached value is stale) and the fresh
        # K/V is folded in analytically at finalize — substituting it here
        # would cost two full-chunk copy passes per phase.
        if mxu_attn:
            # (B, Hkv) flattened into ONE dot_general batch dim: scores and
            # PV become batched (G, D)x(D, Sc) / (G, Sc)x(Sc, D) MXU matmuls
            # instead of VPU mul+lane-reduce over the full chunk.  Scratch
            # layouts are (B*Hkv, G[, D]) in this mode.
            kf = kc_ref[0].reshape(B * kv_heads, Sc, D)   # bf16 / int8
            vf = vc_ref[0].reshape(B * kv_heads, Sc, D)
            if quant_kv:
                kf = kf.astype(jnp.bfloat16)
                vf = vf.astype(jnp.bfloat16)
            qb = q_scr[:].reshape(B * kv_heads, G, D)     # bf16
            s = jax.lax.dot_general(
                qb, kf, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (BHkv, G, Sc)
            if quant_kv:
                s = s * kcs_ref[0].reshape(B * kv_heads, 1, Sc)
            bias = jnp.broadcast_to(
                bias_ref[:].reshape(B, 1, 1, Sc),
                (B, kv_heads, G, Sc)).reshape(B * kv_heads, G, Sc)
            s = s * scale + bias
            m_old = m_scr[:]                              # (BHkv, G)
            m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
            corr = jnp.exp(m_old - m_new)
            e = jnp.exp(s - m_new[..., None]).astype(jnp.bfloat16)
            l_scr[:] = (l_scr[:] * corr
                        + jnp.sum(e.astype(jnp.float32), axis=-1))
            if quant_kv:
                ev = (e.astype(jnp.float32)
                      * vcs_ref[0].reshape(B * kv_heads, 1, Sc)
                      ).astype(jnp.bfloat16)
            else:
                ev = e
            pv = jax.lax.dot_general(
                ev, vf, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)       # (BHkv, G, D)
            acc_scr[:] = acc_scr[:] * corr[..., None] + pv
            m_scr[:] = m_new
        else:
            # Layouts keep S on the lane axis: kc (B, Hkv, Sc, D), scores
            # (B, Hkv, Sc).
            kf = kc_ref[0]                                # (B, Hkv, Sc, D)
            vf = vc_ref[0]
            bias = bias_ref[:].reshape(B, 1, Sc)          # additive f32
            q4 = q_scr[:].reshape(B, kv_heads, G, D).astype(jnp.float32)
            for g in range(G):
                qg = q4[:, :, g, :].reshape(B, kv_heads, 1, D)
                # bf16 -> f32 casts stay inside the product expressions: a
                # stored fp32 chunk copy would double its VMEM footprint
                s = (jnp.sum(kf.astype(jnp.float32) * qg, axis=-1) * scale
                     + bias)                              # (B, Hkv, Sc) f32
                m_old = m_scr[g]                          # (B, Hkv)
                m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
                corr = jnp.exp(m_old - m_new)
                e = jnp.exp(s - m_new[..., None])
                e = e.astype(jnp.bfloat16).astype(jnp.float32)  # XLA-style
                l_scr[g] = l_scr[g] * corr + jnp.sum(e, axis=-1)
                pv = jnp.sum(e[..., None] * vf.astype(jnp.float32), axis=2)
                acc_scr[g] = acc_scr[g] * corr[..., None] + pv
                m_scr[g] = m_new

    @pl.when(p == nS - 1)
    def _attn_final():
        # fold the fresh K/V slot into the online softmax (the current token
        # always attends itself, so this is unconditional), then project
        if mxu_attn:
            qb = q_scr[:].reshape(B * kv_heads, G, D).astype(jnp.float32)
            kn = k_scr[:].reshape(B * kv_heads, 1, D).astype(jnp.float32)
            vn = v_scr[:].reshape(B * kv_heads, 1, D).astype(jnp.float32)
            s_new = jnp.sum(qb * kn, axis=-1) * scale     # (BHkv, G)
            m_tot = jnp.maximum(m_scr[:], s_new)
            corr = jnp.exp(m_scr[:] - m_tot)
            e_new = jnp.exp(s_new - m_tot)
            e_new = e_new.astype(jnp.bfloat16).astype(jnp.float32)
            den = l_scr[:] * corr + e_new
            og = (acc_scr[:] * corr[..., None]
                  + e_new[..., None] * vn) / den[..., None]
            o = og.reshape(B, heads * D)                  # head order (kv, g)
        else:
            q4 = q_scr[:].reshape(B, kv_heads, G, D).astype(jnp.float32)
            kn = k_scr[:].astype(jnp.float32)             # (B, Hkv, D)
            vn = v_scr[:].astype(jnp.float32)
            o_groups = []
            for g in range(G):
                qg = q4[:, :, g, :]                       # (B, Hkv, D)
                s_new = jnp.sum(kn * qg, axis=-1) * scale  # (B, Hkv)
                m_tot = jnp.maximum(m_scr[g], s_new)
                corr = jnp.exp(m_scr[g] - m_tot)
                e_new = jnp.exp(s_new - m_tot)
                e_new = e_new.astype(jnp.bfloat16).astype(jnp.float32)
                den = l_scr[g] * corr + e_new
                og = (acc_scr[g] * corr[..., None]
                      + e_new[..., None] * vn) / den[..., None]
                o_groups.append(og.reshape(B, kv_heads, 1, D))
            o = jnp.concatenate(o_groups, axis=2).reshape(B, heads * D)
        o = o.astype(jnp.bfloat16)
        attn = _mm8(o, oq_ref[0], os_ref[0, 0])
        x = x_scr[:] + attn.astype(jnp.bfloat16)
        x_scr[:] = x
        xn2_scr[:] = _rms32(x.astype(jnp.float32), ln2_ref[0, 0], eps
                            ).astype(jnp.bfloat16)

    @pl.when(p >= nS)
    def _mlp_chunk():
        xn2 = xn2_scr[:]
        gate = _mm8(xn2, gug_ref[0], gs_ref[0, 0]).astype(jnp.bfloat16)
        up = _mm8(xn2, guu_ref[0], us_ref[0, 0]).astype(jnp.bfloat16)
        # silu in fp32 on the bf16-rounded gate (matches subtalker kernel)
        g32 = gate.astype(jnp.float32)
        prod = (g32 * jax.lax.logistic(g32)
                * up.astype(jnp.float32)).astype(jnp.bfloat16)
        part = _mm8(prod, dnq_ref[0], dns_ref[0, 0])      # (B, H) f32
        x_scr[:] = x_scr[:] + part.astype(jnp.bfloat16)

    @pl.when((l == pl.num_programs(0) - 1) & (p == nS + C - 1))
    def _final():
        h_out[:] = _rms32(x_scr[:].astype(jnp.float32), fn_ref[0], eps
                          ).astype(jnp.bfloat16)


def transpose_cache_in(k: jax.Array) -> jax.Array:
    """(L, B, S, Hkv, D) -> fused-mode (L, B, Hkv, S, D)."""
    return jnp.swapaxes(k, 2, 3)


def transpose_cache_out(k: jax.Array) -> jax.Array:
    """fused-mode (L, B, Hkv, S, D) -> (L, B, S, Hkv, D)."""
    return jnp.swapaxes(k, 2, 3)


def talker_step_fused_cache(params: Dict[str, Any], cfg, embed: jax.Array,
                            position: jax.Array, cache_index,
                            kv_valid: jax.Array,
                            k_cache: jax.Array, v_cache: jax.Array,
                            attend_len: Optional[int] = None,
                            mlp_chunks: int = 0,
                            kv_chunk: int = 0,
                            attn_impl: str = "mxu",
                            interpret: bool = False,
                            k_scale: Optional[jax.Array] = None,
                            v_scale: Optional[jax.Array] = None):
    """One fused decode step over a fused-layout cache.

    embed: (B, 1, H); position: (B,); kv_valid: (B, S) incl. the new slot;
    k_cache/v_cache: (L, B, Hkv, S_buf, D) bf16 (see transpose_cache_in).
    cache_index: scalar (whole-batch write slot, the generate path) or (B,)
    per-row write slots (the serving engine, where each slot's sequence is
    at a different depth — the fresh K/V then scatters per row).
    attn_impl: "mxu" computes chunk scores/PV as (B*Hkv)-batched dot_generals
    on the MXU; "vpu" uses elementwise mul + lane reductions (A/B'd in
    benchmarks/talker_step_ab.py — mxu measured faster).

    int8-KV mode: pass int8 k_cache/v_cache plus fp32 k_scale/v_scale of
    fused layout (L, B, Hkv, S_buf) — per-(slot, head) symmetric scales,
    exactly GenerationConfig.kv_quant's storage halved-DMA trade.  The K
    scale folds into the score matrix and the V scale into the
    probabilities (the same fold as ops/attention.attention_kv_quant); the
    fresh slot attends in bf16 and is quantized on the way into the cache.
    mxu attention only.

    Returns (logits (B, V) f32, hidden (B, 1, H) bf16, k_cache, v_cache)
    with the new slot written — the same contract as talker_decode_step —
    plus (k_scale, v_scale) appended in int8-KV mode (a 6-tuple).
    """
    from ...ops.rope import default_inv_freq, rope_tables
    from ...weights import matmul_t

    layers = params["layers"]
    attn, mlp = layers["self_attn"], layers["mlp"]
    wq = attn["qkv_proj"]["weight"]
    if not (isinstance(wq, dict) and "q" in wq):
        raise ValueError("fused talker step requires int8-quantized params")

    B, _, H = embed.shape
    L = wq["q"].shape[0]
    heads, kv_heads, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                          cfg.resolved_head_dim)
    G = heads // kv_heads
    inter = mlp["gate_up_proj"]["weight"]["q"].shape[1] // 2
    S_buf = k_cache.shape[3]
    S = S_buf if attend_len is None else attend_len
    if kv_chunk and kv_chunk % 128 != 0:
        # a non-128-multiple chunk that happens to divide S would surface
        # as an opaque Mosaic tiling failure — reject it with the contract
        raise ValueError(
            f"kv_chunk={kv_chunk} must be a multiple of 128 (KV chunks are "
            "streamed in native (…, 128)-lane tiles)")
    picked = _pick_chunk(S, S_buf, kv_chunk)
    if picked is None:
        raise ValueError(
            f"fused talker step cannot chunk attend window {S} (buffer "
            f"{S_buf}); use a multiple of 128 or the XLA path")
    Sc, nS = picked
    eps = cfg.rms_norm_eps
    C = mlp_chunks or _pick_mlp_chunks(inter)
    if inter % C:
        raise ValueError(f"mlp_chunks={C} does not divide "
                         f"intermediate size {inter}")

    inv_freq = default_inv_freq(D, cfg.rope_theta)
    cos, sin = rope_tables(position[:, None], inv_freq)   # (B, 1, D) f32
    cos, sin = cos[:, 0], sin[:, 0]

    # the current slot ci is masked OUT (its cached K/V is stale); the
    # kernel folds the fresh K/V into the softmax at finalize instead
    per_row = jnp.ndim(cache_index) == 1
    ci_col = (jnp.reshape(cache_index, (-1, 1)) if per_row
              else jnp.asarray(cache_index))
    slot = jnp.arange(S)[None, :]
    ok = (slot < ci_col) & kv_valid[:, :S]
    if cfg.sliding_window is not None:
        ok &= slot > (ci_col - cfg.sliding_window)
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)

    if attn_impl not in ("mxu", "vpu"):
        raise ValueError(f"unknown attn_impl {attn_impl!r}")
    quant_kv = k_scale is not None
    if quant_kv and attn_impl != "mxu":
        raise ValueError("int8-KV fused talker step supports attn_impl='mxu' "
                         "only")
    mxu_attn = attn_impl == "mxu"
    kernel = functools.partial(
        _kernel, B=B, H=H, heads=heads, kv_heads=kv_heads, D=D,
        inter=inter, C=C, Sc=Sc, nS=nS, eps=eps, mxu_attn=mxu_attn,
        quant_kv=quant_kv)

    Ic = inter // C
    vconst = pl.BlockSpec(memory_space=pltpu.VMEM)
    sconst = pl.BlockSpec(memory_space=pltpu.SMEM)

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    def cmap(p):
        # MLP column chunk for phase p (clamped during attention phases —
        # the block then sits resident until the MLP phases consume it)
        return jnp.clip(p - nS, 0, C - 1)

    def kvmap(l, p):
        # KV chunk p during attention phases; during MLP phases, flip to the
        # NEXT layer's chunk 0 so its DMA streams behind the MLP compute
        # instead of landing in the single phase boundary before the next
        # attention phase (the automatic pipeline has 1 phase of lookahead)
        nxt = p >= nS
        return (jnp.where(nxt, jnp.minimum(l + 1, L - 1), l), 0, 0,
                jnp.where(nxt, 0, jnp.minimum(p, nS - 1)), 0)

    # same early flip for the qkv weight block (read at phase 0 only):
    # fetch layer l+1's 8 MB during the last two MLP phases of layer l
    qkv_flip = max(1, nS + C - 2)

    def qmap(l, p):
        return (jnp.where(p >= qkv_flip, jnp.minimum(l + 1, L - 1), l), 0, 0)

    call = pl.pallas_call(
        kernel,
        grid=(L, nS + C),
        in_specs=[
            vconst, vconst, vconst,                       # x cos sin
            blk((B, Sc), lambda l, p: (0, jnp.minimum(p, nS - 1))),  # bias
            # per-layer vectors carry a singleton middle axis so the block's
            # last-two dims satisfy Mosaic's (8, 128)-or-full constraint
            blk((1, 1, H), lambda l, p: (l, 0, 0)),       # ln1
            blk((1, 1, H), lambda l, p: (l, 0, 0)),       # ln2
            blk((1, 1, D), lambda l, p: (l, 0, 0)),       # qn
            blk((1, 1, D), lambda l, p: (l, 0, 0)),       # kn
            vconst,                                       # fn
            blk((1, 1, heads * D + 2 * kv_heads * D),
                lambda l, p: (l, 0, 0)),                  # qkvs
            blk((1, 1, H), lambda l, p: (l, 0, 0)),       # os
            # gate / up scale chunks of the (L*2C, 1, Ic)-reshaped gus tensor
            # (flattened so the block's middle dim spans its full axis)
            blk((1, 1, Ic), lambda l, p: (2 * C * l + cmap(p), 0, 0)),
            blk((1, 1, Ic), lambda l, p: (2 * C * l + C + cmap(p), 0, 0)),
            blk((1, 1, H), lambda l, p: (l, 0, 0)),       # dns
            blk((1, heads * D + 2 * kv_heads * D, H), qmap),
            blk((1, H, heads * D), lambda l, p: (l, 0, 0)),
            # gate rows [c*Ic, (c+1)*Ic) and up rows [inter + c*Ic, ...) of
            # the same stacked gate_up tensor (two windows, no reordering)
            blk((1, Ic, H), lambda l, p: (l, cmap(p), 0)),
            blk((1, Ic, H), lambda l, p: (l, C + cmap(p), 0)),
            blk((1, H, Ic), lambda l, p: (l, 0, cmap(p))),
            blk((1, B, kv_heads, Sc, D), kvmap),          # kc chunk
            blk((1, B, kv_heads, Sc, D), kvmap),          # vc chunk
        ] + ([
            # int8-KV mode: per-(slot, head) fp32 scale chunks ride the same
            # early-flip schedule as the KV chunks (tiny: B*Hkv*Sc*4 bytes)
            blk((1, B, kv_heads, Sc), lambda l, p: kvmap(l, p)[:4]),
            blk((1, B, kv_heads, Sc), lambda l, p: kvmap(l, p)[:4]),
        ] if quant_kv else []),
        out_specs=(
            vconst,
            blk((1, B, kv_heads, D), lambda l, p: (l, 0, 0, 0)),
            blk((1, B, kv_heads, D), lambda l, p: (l, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, kv_heads, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, kv_heads, D), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.bfloat16),             # x
            pltpu.VMEM((B, H), jnp.bfloat16),             # xn2
            pltpu.VMEM((B, heads, D), jnp.bfloat16),      # q
            pltpu.VMEM((B, kv_heads, D), jnp.bfloat16),   # new k
            pltpu.VMEM((B, kv_heads, D), jnp.bfloat16),   # new v
            # online-softmax state: (B*Hkv, G[, D]) in mxu mode (matching
            # the batched-dot output layout), (G, B, Hkv[, D]) in vpu mode
            pltpu.VMEM((B * kv_heads, G) if mxu_attn
                       else (G, B, kv_heads), jnp.float32),     # running max
            pltpu.VMEM((B * kv_heads, G) if mxu_attn
                       else (G, B, kv_heads), jnp.float32),     # denom
            pltpu.VMEM((B * kv_heads, G, D) if mxu_attn
                       else (G, B, kv_heads, D), jnp.float32),  # PV acc
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    gus2 = mlp["gate_up_proj"]["weight"]["s"].reshape(L * 2 * C, 1, Ic)
    h, newk, newv = call(
      embed[:, 0, :].astype(jnp.bfloat16), cos, sin, bias,
      layers["input_layernorm"]["weight"][:, None, :],
      layers["post_attention_layernorm"]["weight"][:, None, :],
      attn["q_norm"]["weight"][:, None, :],
      attn["k_norm"]["weight"][:, None, :],
      params["norm"]["weight"][None, :],
      attn["qkv_proj"]["weight"]["s"][:, None, :],
      attn["o_proj"]["weight"]["s"][:, None, :],
      gus2, gus2,
      mlp["down_proj"]["weight"]["s"][:, None, :],
      attn["qkv_proj"]["weight"]["q"], attn["o_proj"]["weight"]["q"],
      mlp["gate_up_proj"]["weight"]["q"], mlp["gate_up_proj"]["weight"]["q"],
      mlp["down_proj"]["weight"]["q"],
      k_cache, v_cache,
      *((k_scale, v_scale) if quant_kv else ())
    )   # block specs read only the first S window slots

    if quant_kv:
        # quantize the fresh slot on the way into the cache (it attended
        # itself in bf16 this step; from the next step on it reads back
        # int8, matching the XLA kv_quant path's storage)
        from ...models.talker import kv_quantize

        newk_q, newk_s = kv_quantize(newk)   # (L, B, Hkv, D) -> + (L, B, Hkv)
        newv_q, newv_s = kv_quantize(newv)
    if per_row:
        rows = jnp.arange(B)
        # advanced indexing over axes 1 and 3 puts the broadcast (B,) index
        # dim first: value layout (B, L, Hkv, D)
        if quant_kv:
            k_cache = k_cache.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newk_q, 0, 1))
            v_cache = v_cache.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newv_q, 0, 1))
            k_scale = k_scale.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newk_s, 0, 1))
            v_scale = v_scale.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newv_s, 0, 1))
        else:
            k_cache = k_cache.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newk, 0, 1))
            v_cache = v_cache.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newv, 0, 1))
    else:
        if quant_kv:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk_q[:, :, :, None, :], (0, 0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv_q[:, :, :, None, :], (0, 0, 0, cache_index, 0))
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, newk_s[:, :, :, None], (0, 0, 0, cache_index))
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, newv_s[:, :, :, None], (0, 0, 0, cache_index))
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, newk[:, :, :, None, :], (0, 0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, newv[:, :, :, None, :], (0, 0, 0, cache_index, 0))
    logits = matmul_t(h.astype(jnp.float32), params["codec_head"])
    hidden = h[:, None, :].astype(embed.dtype)
    if quant_kv:
        return logits, hidden, k_cache, v_cache, k_scale, v_scale
    return logits, hidden, k_cache, v_cache


# ---------------------------------------------------------------------------
# Exact-math JAX reference (for kernel parity tests)
# ---------------------------------------------------------------------------


def talker_step_ref(params: Dict[str, Any], cfg, embed: jax.Array,
                    position: jax.Array, cache_index, kv_valid: jax.Array,
                    k_cache: jax.Array, v_cache: jax.Array,
                    attend_len: Optional[int] = None,
                    mlp_chunks: int = 0, kv_chunk: int = 0,
                    attn_impl: str = "mxu",
                    k_scale: Optional[jax.Array] = None,
                    v_scale: Optional[jax.Array] = None):
    """Plain-JAX implementation of the IDENTICAL W8A8 + online-softmax math
    (fused-layout cache), for parity tests against the kernel.  attn_impl
    mirrors the kernel's: "mxu" uses batched dot_generals for chunk
    scores/PV, "vpu" elementwise mul + reductions.  k_scale/v_scale mirror
    the kernel's int8-KV mode (fold-scale order identical)."""
    from ...ops.rope import default_inv_freq, rope_tables
    from ...weights import matmul_t

    layers = params["layers"]
    attn, mlp = layers["self_attn"], layers["mlp"]
    B, _, H = embed.shape
    heads, kv_heads, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                          cfg.resolved_head_dim)
    G = heads // kv_heads
    nq, nkv = heads * D, kv_heads * D
    inter = mlp["gate_up_proj"]["weight"]["q"].shape[1] // 2
    L = attn["qkv_proj"]["weight"]["q"].shape[0]
    S_buf = k_cache.shape[3]
    S = S_buf if attend_len is None else attend_len
    Sc, nS = _pick_chunk(S, S_buf, kv_chunk)
    eps = cfg.rms_norm_eps
    scale = D ** -0.5

    inv_freq = default_inv_freq(D, cfg.rope_theta)
    cos, sin = rope_tables(position[:, None], inv_freq)
    cos, sin = cos[:, 0], sin[:, 0]

    quant_kv = k_scale is not None
    if quant_kv and attn_impl != "mxu":
        raise ValueError("int8-KV ref supports attn_impl='mxu' only")
    per_row = jnp.ndim(cache_index) == 1
    ci_col = (jnp.reshape(cache_index, (-1, 1)) if per_row
              else jnp.asarray(cache_index))
    slot = jnp.arange(S)[None, :]
    ok = (slot < ci_col) & kv_valid[:, :S]
    if cfg.sliding_window is not None:
        ok &= slot > (ci_col - cfg.sliding_window)
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    x = embed[:, 0, :].astype(jnp.bfloat16)
    newks, newvs = [], []
    for li in range(L):
        xn = _rms32(x.astype(jnp.float32),
                    layers["input_layernorm"]["weight"][li], eps
                    ).astype(jnp.bfloat16)
        qkv = _mm8(xn, attn["qkv_proj"]["weight"]["q"][li],
                   attn["qkv_proj"]["weight"]["s"][li])
        q = qkv[:, :nq].reshape(B * heads, D)
        k = qkv[:, nq:nq + nkv].reshape(B * kv_heads, D)
        v = qkv[:, nq + nkv:].reshape(B * kv_heads, D)
        q = _rms32(q, attn["q_norm"]["weight"][li], eps)
        k = _rms32(k, attn["k_norm"]["weight"][li], eps)
        cq = jnp.repeat(cos, heads, axis=0)
        sq = jnp.repeat(sin, heads, axis=0)
        q = (q * cq + _rot_half(q) * sq).astype(jnp.bfloat16)
        ck = jnp.repeat(cos, kv_heads, axis=0)
        sk = jnp.repeat(sin, kv_heads, axis=0)
        k = (k * ck + _rot_half(k) * sk).astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        newks.append(k.reshape(B, kv_heads, D))
        newvs.append(v.reshape(B, kv_heads, D))

        if attn_impl == "mxu":
            qb = q.reshape(B * kv_heads, G, D)            # bf16
            m = jnp.full((B * kv_heads, G), NEG_INF, jnp.float32)
            den = jnp.zeros((B * kv_heads, G), jnp.float32)
            acc = jnp.zeros((B * kv_heads, G, D), jnp.float32)
            for c in range(nS):
                sl = slice(c * Sc, (c + 1) * Sc)
                kf = k_cache[li, :, :, sl].reshape(B * kv_heads, Sc, D)
                vf = v_cache[li, :, :, sl].reshape(B * kv_heads, Sc, D)
                if quant_kv:
                    kf = kf.astype(jnp.bfloat16)
                    vf = vf.astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qb, kf, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # (BHkv, G, Sc)
                if quant_kv:
                    s = s * k_scale[li, :, :, sl].reshape(
                        B * kv_heads, 1, Sc)
                bc = jnp.broadcast_to(
                    bias[:, :, sl].reshape(B, 1, 1, Sc),
                    (B, kv_heads, G, Sc)).reshape(B * kv_heads, G, Sc)
                s = s * scale + bc
                m_new = jnp.maximum(m, jnp.max(s, axis=-1))
                corr = jnp.exp(m - m_new)
                e = jnp.exp(s - m_new[..., None]).astype(jnp.bfloat16)
                den = den * corr + jnp.sum(e.astype(jnp.float32), axis=-1)
                if quant_kv:
                    ev = (e.astype(jnp.float32)
                          * v_scale[li, :, :, sl].reshape(B * kv_heads, 1, Sc)
                          ).astype(jnp.bfloat16)
                else:
                    ev = e
                pv = jax.lax.dot_general(
                    ev, vf, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)   # (BHkv, G, D)
                acc = acc * corr[..., None] + pv
                m = m_new
            qf = q.reshape(B * kv_heads, G, D).astype(jnp.float32)
            knf = newks[-1].reshape(B * kv_heads, 1, D).astype(jnp.float32)
            vnf = newvs[-1].reshape(B * kv_heads, 1, D).astype(jnp.float32)
            s_new = jnp.sum(qf * knf, axis=-1) * scale    # (BHkv, G)
            m_tot = jnp.maximum(m, s_new)
            corr = jnp.exp(m - m_tot)
            e_new = jnp.exp(s_new - m_tot)
            e_new = e_new.astype(jnp.bfloat16).astype(jnp.float32)
            dd = den * corr + e_new
            og = (acc * corr[..., None]
                  + e_new[..., None] * vnf) / dd[..., None]
            o = og.reshape(B, heads * D)
        else:
            q4 = q.reshape(B, kv_heads, G, D).astype(jnp.float32)
            m = jnp.full((G, B, kv_heads), NEG_INF, jnp.float32)
            den = jnp.zeros((G, B, kv_heads), jnp.float32)
            acc = jnp.zeros((G, B, kv_heads, D), jnp.float32)
            for c in range(nS):
                sl = slice(c * Sc, (c + 1) * Sc)
                kf = k_cache[li, :, :, sl].astype(jnp.float32)  # (B,Hkv,Sc,D)
                vf = v_cache[li, :, :, sl].astype(jnp.float32)
                bc = bias[:, :, sl]
                for g in range(G):
                    qg = q4[:, :, g, :].reshape(B, kv_heads, 1, D)
                    s = jnp.sum(kf * qg, axis=-1) * scale + bc
                    m_new = jnp.maximum(m[g], jnp.max(s, axis=-1))
                    corr = jnp.exp(m[g] - m_new)
                    e = jnp.exp(s - m_new[..., None])
                    e = e.astype(jnp.bfloat16).astype(jnp.float32)
                    den = den.at[g].set(den[g] * corr + jnp.sum(e, axis=-1))
                    pv = jnp.sum(e[..., None] * vf, axis=2)
                    acc = acc.at[g].set(acc[g] * corr[..., None] + pv)
                    m = m.at[g].set(m_new)
            # fold the fresh K/V slot (bias masks its stale cached value out)
            knf = newks[-1].astype(jnp.float32)           # (B, Hkv, D)
            vnf = newvs[-1].astype(jnp.float32)
            o_groups = []
            for g in range(G):
                qg = q4[:, :, g, :]
                s_new = jnp.sum(knf * qg, axis=-1) * scale  # (B, Hkv)
                m_tot = jnp.maximum(m[g], s_new)
                corr = jnp.exp(m[g] - m_tot)
                e_new = jnp.exp(s_new - m_tot)
                e_new = e_new.astype(jnp.bfloat16).astype(jnp.float32)
                dd = den[g] * corr + e_new
                og = (acc[g] * corr[..., None]
                      + e_new[..., None] * vnf) / dd[..., None]
                o_groups.append(og.reshape(B, kv_heads, 1, D))
            o = jnp.concatenate(o_groups, axis=2).reshape(B, heads * D)
        x = x + _mm8(o.astype(jnp.bfloat16), attn["o_proj"]["weight"]["q"][li],
                     attn["o_proj"]["weight"]["s"][li]).astype(jnp.bfloat16)

        xn2 = _rms32(x.astype(jnp.float32),
                     layers["post_attention_layernorm"]["weight"][li], eps
                     ).astype(jnp.bfloat16)
        C = mlp_chunks or _pick_mlp_chunks(inter)
        Ic = inter // C
        guq = mlp["gate_up_proj"]["weight"]["q"][li]
        gus = mlp["gate_up_proj"]["weight"]["s"][li]
        for c in range(C):
            gate = _mm8(xn2, guq[c * Ic:(c + 1) * Ic],
                        gus[c * Ic:(c + 1) * Ic]).astype(jnp.bfloat16)
            up = _mm8(xn2, guq[inter + c * Ic:inter + (c + 1) * Ic],
                      gus[inter + c * Ic:inter + (c + 1) * Ic]
                      ).astype(jnp.bfloat16)
            g32 = gate.astype(jnp.float32)
            prod = (g32 * jax.lax.logistic(g32)
                    * up.astype(jnp.float32)).astype(jnp.bfloat16)
            part = _mm8(prod, mlp["down_proj"]["weight"]["q"][li][:, c * Ic:(c + 1) * Ic],
                        mlp["down_proj"]["weight"]["s"][li])
            x = x + part.astype(jnp.bfloat16)

    h = _rms32(x.astype(jnp.float32), params["norm"]["weight"], eps
               ).astype(jnp.bfloat16)
    newk = jnp.stack(newks, axis=0)
    newv = jnp.stack(newvs, axis=0)
    if quant_kv:
        from ...models.talker import kv_quantize

        newk, newk_s = kv_quantize(newk)
        newv, newv_s = kv_quantize(newv)
    if per_row:
        rows = jnp.arange(B)
        k_cache = k_cache.at[:, rows, :, cache_index].set(
            jnp.swapaxes(newk, 0, 1))
        v_cache = v_cache.at[:, rows, :, cache_index].set(
            jnp.swapaxes(newv, 0, 1))
        if quant_kv:
            k_scale = k_scale.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newk_s, 0, 1))
            v_scale = v_scale.at[:, rows, :, cache_index].set(
                jnp.swapaxes(newv_s, 0, 1))
    else:
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, newk[:, :, :, None, :], (0, 0, 0, cache_index, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, newv[:, :, :, None, :], (0, 0, 0, cache_index, 0))
        if quant_kv:
            k_scale = jax.lax.dynamic_update_slice(
                k_scale, newk_s[:, :, :, None], (0, 0, 0, cache_index))
            v_scale = jax.lax.dynamic_update_slice(
                v_scale, newv_s[:, :, :, None], (0, 0, 0, cache_index))
    logits = matmul_t(h.astype(jnp.float32), params["codec_head"])
    hidden = h[:, None, :].astype(embed.dtype)
    if quant_kv:
        return logits, hidden, k_cache, v_cache, k_scale, v_scale
    return logits, hidden, k_cache, v_cache
