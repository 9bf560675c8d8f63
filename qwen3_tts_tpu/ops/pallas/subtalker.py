"""Pallas TPU megakernel: the ENTIRE per-frame sub-talker in one kernel.

The code predictor (reference: nested `code_predictor.generate`,
modeling_qwen3_tts.py:1671-1680 — 15 sequential HF generate sub-steps per
frame) is the half of the decode frame the XLA path cannot make fast: each of
the 15 autoregressive steps re-streams all ~78 MB of layer weights from HBM
and dequantizes them again, so the frame pays ~1.2 GB of weight traffic and
~2.4 G element converts (measured 4.9 ms at B=16 int8 — 3x the DMA floor).

This kernel runs ALL 16 positions (2 prefill + 14 generation steps) of a
frame in a single `pallas_call`:

- the five layers' int8 weights are loaded into VMEM ONCE per frame and
  consumed directly by the MXU as int8xint8->int32 (W8A8: activations are
  dynamically quantized per row) — no per-step HBM weight re-reads and no
  per-step dequantization;
- the whole KV cache (<= 16 positions) lives in VMEM scratch;
- per-step lm_heads stream HBM->VMEM with a double buffer, overlapped with
  the layer stack;
- sampled codebook embeddings are gathered row-wise from HBM by DMA using
  the freshly sampled ids (the sample->embed->next-step dependency never
  leaves the chip);
- sampling (temperature, top-k via an exact bit-level binary search for the
  k-th value, Gumbel-max categorical) runs inside the kernel; the Gumbel
  noise is drawn outside with jax.random and passed in, so the sampled path
  is bit-reproducible against the JAX reference. Greedy mode is exact
  argmax.

Numerics: W8A8 (per-row dynamic activation scales) differs from the XLA
W8A16 path; greedy codes can differ on near-ties. `subtalker_frame_ref`
implements the identical math in plain JAX for exact parity testing.

Requires weight-only int8 params (`quantize_talker_params`); the bf16 path
stays on the XLA implementation (weights would not fit VMEM).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# Shared W8A8 math (kernel and reference use the same formulas)
# ---------------------------------------------------------------------------


def _quant_rows(xf: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization of fp32 activations."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _mm8(x_bf: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """(R, IN) bf16 @ (OUT, IN) int8 -> (R, OUT) fp32 via int8 MXU."""
    xq, xs = _quant_rows(x_bf.astype(jnp.float32))
    acc = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws.astype(jnp.float32)[None, :]


def _rms32(xf: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)[None, :]


def _rot_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _kth_value_bits(logits: jax.Array, k) -> jax.Array:
    """Exact k-th largest value per row via binary search on the monotone
    int32 image of fp32 bits (32 iterations, no sort).  k: scalar int or
    per-row (B, 1) int32.

    Order-preserving map (radix-sort float trick, kept in signed int32):
    positive floats keep their bits; negative floats map to
    ~bits ^ 0x80000000, which is monotone increasing with the float value.
    """
    sign = jnp.int32(-(1 << 31))
    bits = jax.lax.bitcast_convert_type(logits.astype(jnp.float32), jnp.int32)
    keys = jnp.where(bits >= 0, bits, jnp.invert(bits) ^ sign)
    # binary search the LARGEST threshold t with count(keys >= t) >= k;
    # that t is exactly the k-th largest key (it is attained).
    lo = jnp.full(logits.shape[:-1] + (1,), jnp.iinfo(jnp.int32).min, jnp.int32)
    hi = jnp.full(logits.shape[:-1] + (1,), jnp.iinfo(jnp.int32).max, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        # overflow-safe ceil((lo + hi) / 2)
        mid = jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + ((lo | hi) & 1)
        cnt = jnp.sum((keys >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid - 1)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    bits_t = jnp.where(lo >= 0, lo, jnp.invert(lo ^ sign))
    return jax.lax.bitcast_convert_type(bits_t, jnp.float32)


def _process_logits(logits: jax.Array, do_sample: bool, temp, top_k
                    ) -> jax.Array:
    """Temperature + top-k filter (HF semantics: mask logits < kth).

    temp/top_k are per-ROW arrays ((B, 1) f32 / int32) so sampling knobs are
    DATA, not program constants: one compiled kernel serves every
    temperature/top_k (and the engine can carry them per slot).  Rows with
    top_k <= 0 or >= V keep the full distribution; `do_sample` stays a
    static switch so the greedy program carries none of this machinery."""
    if not do_sample:
        return logits
    lt = logits / temp
    V = lt.shape[-1]
    kth = _kth_value_bits(lt, jnp.clip(top_k, 1, V))
    kth = jnp.where((top_k > 0) & (top_k < V), kth, NEG_INF)
    return jnp.where(lt < kth, NEG_INF, lt)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _subtalker_kernel(x0_ref, cos_ref, sin_ref, gumbel_ref, temp_ref, k_ref,
                      projw_ref, projb_ref,
                      qkvq_ref, qkvs_ref, oq_ref, os_ref, guq_ref, gus_ref,
                      dnq_ref, dns_ref, ln1_ref, ln2_ref, qn_ref, kn_ref,
                      fnw_ref, heads_hbm, embeds_hbm,
                      codes_out, embsum_out,
                      kvk, kvv, headbuf, embbuf, headsem, embsem, *,
                      B: int, Ht: int, Hc: int, heads: int, kv_heads: int,
                      D: int, inter: int, V: int, Qm1: int, eps: float,
                      has_proj: bool, do_sample: bool, smax: int):
    G = heads // kv_heads
    nq, nkv = heads * D, kv_heads * D
    scale = D ** -0.5
    n_layers = qkvq_ref.shape[0]
    n_pos = Qm1 + 1          # positions 0..Qm1 (2 prefill + Qm1-1 steps)

    pltpu.make_async_copy(heads_hbm.at[0], headbuf.at[0], headsem.at[0]).start()
    kvk[:] = jnp.zeros(kvk.shape, kvk.dtype)
    kvv[:] = jnp.zeros(kvv.shape, kvv.dtype)

    def project(x_raw):
        if not has_proj:
            return x_raw
        y = jax.lax.dot_general(x_raw, projw_ref[:],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + projb_ref[0].astype(jnp.float32)[None, :]).astype(jnp.bfloat16)

    def forward(x_raw, i):
        """One position through all layers. x_raw (B, Ht) bf16; i scalar pos.
        Returns final-norm hidden (B, Hc) fp32."""
        x = project(x_raw)
        cos_i = cos_ref[pl.ds(i, 1), :]       # (1, D) fp32
        sin_i = sin_ref[pl.ds(i, 1), :]
        for li in range(n_layers):
            xn = _rms32(x.astype(jnp.float32), ln1_ref[li], eps).astype(jnp.bfloat16)
            qkv = _mm8(xn, qkvq_ref[li], qkvs_ref[li])        # (B, nq+2nkv) f32
            q = qkv[:, :nq].reshape(B * heads, D)
            k = qkv[:, nq:nq + nkv].reshape(B * kv_heads, D)
            v = qkv[:, nq + nkv:].reshape(B * kv_heads, D)
            q = _rms32(q, qn_ref[li], eps)
            k = _rms32(k, kn_ref[li], eps)
            q = (q * cos_i + _rot_half(q) * sin_i).astype(jnp.bfloat16)
            k = (k * cos_i + _rot_half(k) * sin_i).astype(jnp.bfloat16)
            kvk[li, i] = k
            kvv[li, i] = v.astype(jnp.bfloat16)

            # GQA without repeats: per query group g, attend the shared K/V
            # (head h = kv_head * G + g, matching ops/attention.py's grouping)
            kf = kvk[li].astype(jnp.float32)                   # (smax, B*Hkv, D)
            vf = kvv[li].astype(jnp.float32)
            q4 = q.reshape(B, kv_heads, G, D)
            o_groups = []
            for g in range(G):
                qg = q4[:, :, g, :].reshape(B * kv_heads, D).astype(jnp.float32)
                s = jnp.sum(kf * qg[None], axis=-1) * scale    # (smax, B*Hkv)
                pos_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                s = jnp.where(pos_ids <= i, s, NEG_INF)
                m = jnp.max(s, axis=0, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=0, keepdims=True)
                p = p.astype(jnp.bfloat16).astype(jnp.float32)  # XLA casts probs
                og = jnp.sum(p[:, :, None] * vf, axis=0)       # (B*Hkv, D)
                o_groups.append(og.reshape(B, kv_heads, 1, D))
            o = jnp.concatenate(o_groups, axis=2).reshape(B, heads * D)
            o = o.astype(jnp.bfloat16)
            attn = _mm8(o, oq_ref[li], os_ref[li])
            x = x + attn.astype(jnp.bfloat16)

            xn2 = _rms32(x.astype(jnp.float32), ln2_ref[li], eps).astype(jnp.bfloat16)
            gu = _mm8(xn2, guq_ref[li], gus_ref[li]).astype(jnp.bfloat16)
            # silu in fp32 on the bf16-rounded gate (Mosaic rejects bf16
            # logistic constants; fp32 matches the reference impl below)
            g32 = gu[:, :inter].astype(jnp.float32)
            prod = (g32 * jax.lax.logistic(g32) *
                    gu[:, inter:].astype(jnp.float32)).astype(jnp.bfloat16)
            down = _mm8(prod, dnq_ref[li], dns_ref[li])
            x = x + down.astype(jnp.bfloat16)
        return _rms32(x.astype(jnp.float32), fnw_ref[0], eps)

    # position 0: the talker hidden; output discarded (prefill)
    forward(x0_ref[:, 0, :], 0)

    def step(i, carry):
        """Positions 1..Qm1: forward, sample codebook i-1+1, gather its
        embedding row, accumulate."""
        x_raw, emb_sum, codes_mat = carry
        hn = forward(x_raw, i)                                 # (B, Hc) f32

        # overlap: prefetch next step's head while waiting on this one's
        @pl.when(i < Qm1)
        def _():
            pltpu.make_async_copy(heads_hbm.at[i], headbuf.at[i % 2],
                                  headsem.at[i % 2]).start()
        slot = (i - 1) % 2
        pltpu.make_async_copy(heads_hbm.at[i - 1], headbuf.at[slot],
                              headsem.at[slot]).wait()
        head = headbuf[slot].astype(jnp.float32)               # (V, Hc)
        logits = jax.lax.dot_general(hn, head, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        lt = _process_logits(logits, do_sample, temp_ref[:], k_ref[:])
        if do_sample:
            lt = lt + gumbel_ref[i - 1]
        codes = jnp.argmax(lt, axis=-1).astype(jnp.int32)      # (B,)

        # gather each sampled id's embedding row. HBM slices must be aligned
        # to the (8, 128) tile, so DMA the aligned 8-row slab containing the
        # row (tables pre-flattened to (Qm1*V, Ht)) and one-hot-select inside.
        flat = codes + (i - 1) * V                             # (B,)
        # the table is padded to a multiple of 8 rows at the call site, so
        # the aligned 8-row slab of any valid id is always in bounds
        slab = (flat // 8) * 8
        for b in range(B):
            pltpu.make_async_copy(
                embeds_hbm.at[pl.ds(pl.multiple_of(slab[b], 8), 8)],
                embbuf.at[b], embsem.at[b]).start()
        for b in range(B):
            pltpu.make_async_copy(
                embeds_hbm.at[pl.ds(pl.multiple_of(slab[b], 8), 8)],
                embbuf.at[b], embsem.at[b]).wait()
        off = flat % 8                                         # (B,)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (B, 8), 1)
                  == off[:, None]).astype(jnp.float32)
        row = jnp.sum(embbuf[:].astype(jnp.float32) * onehot[:, :, None],
                      axis=1).astype(jnp.bfloat16)             # (B, Ht)
        emb_sum = emb_sum + row
        col = jax.lax.broadcasted_iota(jnp.int32, (B, Qm1), 1)
        codes_mat = jnp.where(col == i - 1, codes[:, None], codes_mat)
        return row, emb_sum, codes_mat

    carry = (x0_ref[:, 1, :],
             jnp.zeros((B, Ht), jnp.bfloat16),
             jnp.zeros((B, Qm1), jnp.int32))
    _, emb_sum, codes_mat = jax.lax.fori_loop(1, n_pos, step, carry)
    codes_out[:] = codes_mat
    embsum_out[:] = emb_sum


def subtalker_frame_fused(cp: Dict[str, Any], cp_cfg, past_hidden: jax.Array,
                          code0_embed: jax.Array, key: jax.Array, sampling,
                          rope_theta: float | None = None,
                          rows: jax.Array | None = None,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for `code_predictor_frame`'s compute.

    cp: prepared code-predictor params with int8 layer weights
    (quantize_talker_params layout). past_hidden/code0_embed: (B, 1, Ht).
    Returns (codes (B, Q-1) int32, emb_sum (B, 1, Ht) bf16).

    Temperature and top_k enter the kernel as per-row DATA, so one compiled
    program serves every sampling config.  `rows` ((B, 5) f32,
    SamplingParams.as_row layout) overrides `sampling` per row for the
    serving engine; greedy rows (do_sample=0) get temp=1 / k=0 / zero
    gumbel, reproducing their solo argmax exactly.  Per-row top_p must be 1
    (validated by the engine at submit — rows is traced here); the uniform
    `sampling.top_p` is validated below.
    """
    from ...ops.rope import default_inv_freq, rope_tables

    layers = cp["layers"]
    wq = layers["self_attn"]["qkv_proj"]["weight"]
    if not (isinstance(wq, dict) and "q" in wq):
        raise ValueError("fused sub-talker requires int8-quantized params")
    if rows is None and sampling.top_p < 1.0:
        raise ValueError("fused sub-talker does not support top_p < 1")

    B = past_hidden.shape[0]
    Ht = past_hidden.shape[-1]
    Hc = cp_cfg.hidden_size
    heads, kv_heads, D = (cp_cfg.num_attention_heads,
                          cp_cfg.num_key_value_heads, cp_cfg.head_dim)
    inter = cp_cfg.intermediate_size
    Qm1 = cp["lm_heads"].shape[0]
    V = cp["lm_heads"].shape[1]
    smax = Qm1 + 1
    eps = cp_cfg.rms_norm_eps
    theta = rope_theta if rope_theta is not None else cp_cfg.rope_theta

    x0 = jnp.concatenate([past_hidden, code0_embed], axis=1).astype(jnp.bfloat16)
    inv_freq = default_inv_freq(D, theta)
    cos, sin = rope_tables(jnp.arange(smax)[None, :], inv_freq)
    cos, sin = cos[0], sin[0]                                  # (smax, D) fp32

    attn, mlp = layers["self_attn"], layers["mlp"]
    has_proj = cp.get("proj") is not None
    if has_proj:
        projw = cp["proj"]["weight"].astype(jnp.bfloat16)
        projb = cp["proj"]["bias"].astype(jnp.bfloat16)[None, :]
    else:
        projw = jnp.zeros((Hc, Ht), jnp.bfloat16)
        projb = jnp.zeros((1, Hc), jnp.bfloat16)

    if rows is not None:
        do_sample = True            # machinery on; greedy rows neutralized
        row_on = rows[:, 3] > 0.5
        temp = jnp.where(row_on, jnp.maximum(rows[:, 0], 1e-6), 1.0)
        kvec = jnp.where(row_on, rows[:, 4].astype(jnp.int32), 0)
        gumbel = jnp.where(
            row_on[None, :, None],
            jax.random.gumbel(key, (Qm1, B, V), jnp.float32), 0.0)
    else:
        do_sample = bool(sampling.do_sample)
        temp = jnp.full((B,), float(sampling.temperature) if do_sample
                        else 1.0, jnp.float32)
        kvec = jnp.full((B,), int(sampling.top_k), jnp.int32)
        gumbel = (jax.random.gumbel(key, (Qm1, B, V), jnp.float32)
                  if do_sample else jnp.zeros((1, 1, 1), jnp.float32))
    temp = temp.astype(jnp.float32)[:, None]    # (B, 1)
    kvec = kvec[:, None]                        # (B, 1)

    kernel = functools.partial(
        _subtalker_kernel, B=B, Ht=Ht, Hc=Hc, heads=heads, kv_heads=kv_heads,
        D=D, inter=inter, V=V, Qm1=Qm1, eps=eps, has_proj=has_proj,
        do_sample=do_sample, smax=smax)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbmspec = pl.BlockSpec(memory_space=pl.ANY)
    codes, emb_sum = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Qm1), jnp.int32),
                   jax.ShapeDtypeStruct((B, Ht), jnp.bfloat16)),
        in_specs=[vspec] * 21 + [hbmspec, hbmspec],
        out_specs=(vspec, vspec),
        scratch_shapes=[
            pltpu.VMEM((wq["q"].shape[0], smax, B * kv_heads, D), jnp.bfloat16),
            pltpu.VMEM((wq["q"].shape[0], smax, B * kv_heads, D), jnp.bfloat16),
            pltpu.VMEM((2, V, Hc), jnp.bfloat16),
            pltpu.VMEM((B, 8, Ht), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((B,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x0, cos, sin, gumbel, temp, kvec, projw, projb,
      attn["qkv_proj"]["weight"]["q"], attn["qkv_proj"]["weight"]["s"],
      attn["o_proj"]["weight"]["q"], attn["o_proj"]["weight"]["s"],
      mlp["gate_up_proj"]["weight"]["q"], mlp["gate_up_proj"]["weight"]["s"],
      mlp["down_proj"]["weight"]["q"], mlp["down_proj"]["weight"]["s"],
      layers["input_layernorm"]["weight"],
      layers["post_attention_layernorm"]["weight"],
      attn["q_norm"]["weight"], attn["k_norm"]["weight"],
      cp["norm"]["weight"][None, :],
      cp["lm_heads"].astype(jnp.bfloat16),
      _pad_rows_to_8(cp["embeddings"].astype(jnp.bfloat16)
                     .reshape(Qm1 * V, Ht)))
    return codes, emb_sum[:, None, :]


def _pad_rows_to_8(x):
    """Pad a (N, H) table to N % 8 == 0: the kernel's embedding gather DMAs
    the aligned 8-row slab containing each sampled row, which would read
    past the buffer end on tables whose row count is not tile-aligned."""
    import jax.numpy as _jnp

    pad = (-x.shape[0]) % 8
    return x if pad == 0 else _jnp.pad(x, ((0, pad), (0, 0)))


# ---------------------------------------------------------------------------
# Exact-math JAX reference (for kernel parity tests)
# ---------------------------------------------------------------------------


def subtalker_frame_ref(cp: Dict[str, Any], cp_cfg, past_hidden: jax.Array,
                        code0_embed: jax.Array, key: jax.Array, sampling,
                        rope_theta: float | None = None,
                        rows: jax.Array | None = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """Plain-JAX implementation of the IDENTICAL W8A8 math, including the
    sampled path (same externally-drawn Gumbel noise as the kernel) and the
    per-row `rows` override."""
    from ...ops.rope import default_inv_freq, rope_tables

    layers = cp["layers"]
    attn, mlp = layers["self_attn"], layers["mlp"]
    B = past_hidden.shape[0]
    Ht = past_hidden.shape[-1]
    heads, kv_heads, D = (cp_cfg.num_attention_heads,
                          cp_cfg.num_key_value_heads, cp_cfg.head_dim)
    G = heads // kv_heads
    inter = cp_cfg.intermediate_size
    Qm1 = cp["lm_heads"].shape[0]
    smax = Qm1 + 1
    eps = cp_cfg.rms_norm_eps
    nq, nkv = heads * D, kv_heads * D
    scale = D ** -0.5
    theta = rope_theta if rope_theta is not None else cp_cfg.rope_theta
    n_layers = attn["qkv_proj"]["weight"]["q"].shape[0]

    inv_freq = default_inv_freq(D, theta)
    cos, sin = rope_tables(jnp.arange(smax)[None, :], inv_freq)
    cos, sin = cos[0], sin[0]

    kvk = jnp.zeros((n_layers, smax, B * kv_heads, D), jnp.bfloat16)
    kvv = jnp.zeros((n_layers, smax, B * kv_heads, D), jnp.bfloat16)
    V = cp["lm_heads"].shape[1]
    if rows is not None:
        do_sample = True
        row_on = rows[:, 3] > 0.5
        temp = jnp.where(row_on, jnp.maximum(rows[:, 0], 1e-6), 1.0
                         ).astype(jnp.float32)[:, None]
        kvec = jnp.where(row_on, rows[:, 4].astype(jnp.int32), 0)[:, None]
        gumbel = jnp.where(
            row_on[None, :, None],
            jax.random.gumbel(key, (Qm1, B, V), jnp.float32), 0.0)
    else:
        do_sample = bool(sampling.do_sample)
        temp = jnp.full((B, 1), float(sampling.temperature) if do_sample
                        else 1.0, jnp.float32)
        kvec = jnp.full((B, 1), int(sampling.top_k), jnp.int32)
        if do_sample:
            gumbel = jax.random.gumbel(key, (Qm1, B, V), jnp.float32)

    def project(x_raw):
        if cp.get("proj") is None:
            return x_raw
        y = jax.lax.dot_general(x_raw, cp["proj"]["weight"].astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + cp["proj"]["bias"].astype(jnp.float32)[None, :]).astype(jnp.bfloat16)

    def forward(kv, x_raw, i):
        kvk, kvv = kv
        x = project(x_raw)
        cos_i, sin_i = cos[i:i + 1], sin[i:i + 1]
        for li in range(n_layers):
            xn = _rms32(x.astype(jnp.float32),
                        layers["input_layernorm"]["weight"][li], eps).astype(jnp.bfloat16)
            qkv = _mm8(xn, attn["qkv_proj"]["weight"]["q"][li],
                       attn["qkv_proj"]["weight"]["s"][li])
            q = qkv[:, :nq].reshape(B * heads, D)
            k = qkv[:, nq:nq + nkv].reshape(B * kv_heads, D)
            v = qkv[:, nq + nkv:].reshape(B * kv_heads, D)
            q = _rms32(q, attn["q_norm"]["weight"][li], eps)
            k = _rms32(k, attn["k_norm"]["weight"][li], eps)
            q = (q * cos_i + _rot_half(q) * sin_i).astype(jnp.bfloat16)
            k = (k * cos_i + _rot_half(k) * sin_i).astype(jnp.bfloat16)
            kvk = kvk.at[li, i].set(k)
            kvv = kvv.at[li, i].set(v.astype(jnp.bfloat16))

            kf = kvk[li].astype(jnp.float32)
            vf = kvv[li].astype(jnp.float32)
            q4 = q.reshape(B, kv_heads, G, D)
            o_groups = []
            for g in range(G):
                qg = q4[:, :, g, :].reshape(B * kv_heads, D).astype(jnp.float32)
                s = jnp.sum(kf * qg[None], axis=-1) * scale
                pos_ids = jnp.arange(smax)[:, None]
                s = jnp.where(pos_ids <= i, s, NEG_INF)
                m = jnp.max(s, axis=0, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=0, keepdims=True)
                p = p.astype(jnp.bfloat16).astype(jnp.float32)
                og = jnp.sum(p[:, :, None] * vf, axis=0)
                o_groups.append(og.reshape(B, kv_heads, 1, D))
            o = jnp.concatenate(o_groups, axis=2).reshape(B, heads * D)
            o = o.astype(jnp.bfloat16)
            x = x + _mm8(o, attn["o_proj"]["weight"]["q"][li],
                         attn["o_proj"]["weight"]["s"][li]).astype(jnp.bfloat16)

            xn2 = _rms32(x.astype(jnp.float32),
                         layers["post_attention_layernorm"]["weight"][li],
                         eps).astype(jnp.bfloat16)
            gu = _mm8(xn2, mlp["gate_up_proj"]["weight"]["q"][li],
                      mlp["gate_up_proj"]["weight"]["s"][li]).astype(jnp.bfloat16)
            g32 = gu[:, :inter].astype(jnp.float32)
            prod = (g32 * jax.lax.logistic(g32) *
                    gu[:, inter:].astype(jnp.float32)).astype(jnp.bfloat16)
            x = x + _mm8(prod, mlp["down_proj"]["weight"]["q"][li],
                         mlp["down_proj"]["weight"]["s"][li]).astype(jnp.bfloat16)
        hn = _rms32(x.astype(jnp.float32), cp["norm"]["weight"], eps)
        return (kvk, kvv), hn

    kv = (kvk, kvv)
    kv, _ = forward(kv, past_hidden[:, 0, :].astype(jnp.bfloat16), 0)

    x_raw = code0_embed[:, 0, :].astype(jnp.bfloat16)
    emb_sum = jnp.zeros((B, Ht), jnp.bfloat16)
    codes_all = []
    for i in range(1, smax):
        kv, hn = forward(kv, x_raw, i)
        head = cp["lm_heads"][i - 1].astype(jnp.bfloat16).astype(jnp.float32)
        logits = jax.lax.dot_general(hn, head, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        lt = _process_logits(logits, do_sample, temp, kvec)
        if do_sample:
            lt = lt + gumbel[i - 1]
        codes = jnp.argmax(lt, axis=-1).astype(jnp.int32)
        codes_all.append(codes)
        row = cp["embeddings"][i - 1].astype(jnp.bfloat16)[codes]
        emb_sum = emb_sum + row
        x_raw = row
    return jnp.stack(codes_all, axis=1), emb_sum[:, None, :]
