"""Talker LM + code predictor: TPU-native functional forward with static-shape
KV caches and lax.scan over stacked layers.

Reference behavior matched (qwen_tts/core/models/modeling_qwen3_tts.py):
- Qwen3TTSTalkerModel.forward (1427-1561): Qwen3-style decoder layers with
  GQA + per-head-dim QK-RMSNorm (727-805), SwiGLU MLP, RMSNorm pre-norms,
  3-axis mrope whose axes are identical for TTS (get_rope_index 1746-1800
  derives all three from the attention mask), so positions reduce to 1-D.
- Qwen3TTSTalkerCodePredictorModel (1015-1153): same layer structure, 5
  layers, per-codebook embedding tables and lm heads (1030-1032, 1167-1169).

TPU-first design decisions (SURVEY.md §7):
- Layers are stacked along a leading axis and scanned (one compiled layer
  body instead of 20 unrolled ones).
- KV caches are preallocated (L, B, S, Hkv, D) buffers written with
  dynamic_update_slice at the current offset; prefill masks padding with
  per-slot validity instead of ragged batches.
- The 15-step nested sub-talker generation is a lax.scan whose whole KV cache
  (<= 17 positions) lives on-chip for the life of the frame step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CodePredictorConfig, TalkerConfig
from ..ops.attention import attention, attention_kv_quant, mask_to_bias
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, default_inv_freq, rope_tables
from ..weights import matmul_t, numeric_children, stack_layers, weight_rows

Params = Dict[str, Any]


@dataclass(frozen=True)
class StackDims:
    """Shape info shared by the talker and code-predictor decoder stacks."""

    hidden: int
    heads: int
    kv_heads: int
    head_dim: int
    eps: float

    @classmethod
    def from_talker(cls, cfg: TalkerConfig) -> "StackDims":
        return cls(cfg.hidden_size, cfg.num_attention_heads,
                   cfg.num_key_value_heads, cfg.resolved_head_dim,
                   cfg.rms_norm_eps)

    @classmethod
    def from_code_predictor(cls, cfg: CodePredictorConfig) -> "StackDims":
        return cls(cfg.hidden_size, cfg.num_attention_heads,
                   cfg.num_key_value_heads, cfg.head_dim, cfg.rms_norm_eps)


class KVCache(NamedTuple):
    """Preallocated KV buffers. Plain mode stores k/v directly (bf16); int8
    mode (`quantized=True`) stores per-(slot, head) symmetric int8 with fp32
    scales — halving the HBM traffic of decode attention reads, the dominant
    bandwidth term at long context (VERDICT r1 item 7)."""

    k: jax.Array  # (L, B, S, Hkv, D) — compute dtype, or int8 when quantized
    v: jax.Array
    k_scale: Optional[jax.Array] = None  # (L, B, S, Hkv) fp32, int8 mode only
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def zeros(cls, n_layers: int, batch: int, max_len: int, kv_heads: int,
              head_dim: int, dtype=jnp.bfloat16,
              quantized: bool = False) -> "KVCache":
        shape = (n_layers, batch, max_len, kv_heads, head_dim)
        if not quantized:
            return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                   jnp.zeros(shape[:-1], jnp.float32),
                   jnp.zeros(shape[:-1], jnp.float32))


def kv_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 over the head_dim axis. x: (..., D) ->
    (int8 (..., D), fp32 scale (...,)) with x ~= q * scale[..., None]."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def kv_dequantize(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return q.astype(dtype) * scale[..., None].astype(dtype)


# ---------------------------------------------------------------------------
# Parameter preparation
# ---------------------------------------------------------------------------


def _stack_decoder_layers(layers_tree: Params) -> Params:
    stacked = stack_layers(numeric_children(layers_tree))
    return _fuse_layer_projections(stacked)


def _fuse_layer_projections(stacked: Params) -> Params:
    """Fuse q/k/v and gate/up weights into single matmuls (fewer dispatches
    per decode step; the math is identical — outputs are split after)."""
    attn = stacked["self_attn"]
    qkv = jnp.concatenate([attn["q_proj"]["weight"], attn["k_proj"]["weight"],
                           attn["v_proj"]["weight"]], axis=-2)
    mlp = stacked["mlp"]
    gate_up = jnp.concatenate([mlp["gate_proj"]["weight"],
                               mlp["up_proj"]["weight"]], axis=-2)
    return {
        "self_attn": {
            "qkv_proj": {"weight": qkv},
            "o_proj": attn["o_proj"],
            "q_norm": attn["q_norm"],
            "k_norm": attn["k_norm"],
        },
        "mlp": {
            "gate_up_proj": {"weight": gate_up},
            "down_proj": mlp["down_proj"],
        },
        "input_layernorm": stacked["input_layernorm"],
        "post_attention_layernorm": stacked["post_attention_layernorm"],
    }


def prepare_talker_params(params: Params, cfg: TalkerConfig) -> Params:
    """Reorganize a `talker.*` state-dict subtree for scanning.

    Input: unflattened checkpoint tree at the `talker` prefix
    (talker.model.layers..., talker.code_predictor...).
    """
    model = params["model"]
    cp = params["code_predictor"]
    cp_cfg = cfg.code_predictor_config

    out: Params = {
        "layers": _stack_decoder_layers(model["layers"]),
        "norm": model["norm"],
        "codec_embedding": model["codec_embedding"]["weight"],
        "text_embedding": model["text_embedding"]["weight"],
        "text_projection": params["text_projection"],
        "codec_head": params["codec_head"]["weight"],
    }
    cp_out: Params = {
        "layers": _stack_decoder_layers(cp["model"]["layers"]),
        "norm": cp["model"]["norm"],
        # (Q-1, cp_vocab, talker_hidden)
        "embeddings": jnp.stack(
            [t["weight"] for t in numeric_children(cp["model"]["codec_embedding"])],
            axis=0),
        # (Q-1, cp_vocab, cp_hidden)
        "lm_heads": jnp.stack(
            [t["weight"] for t in numeric_children(cp["lm_head"])], axis=0),
    }
    if cp_cfg.hidden_size != cfg.hidden_size:
        cp_out["proj"] = cp["small_to_mtp_projection"]
    else:
        cp_out["proj"] = None
    out["code_predictor"] = cp_out
    return out


# ---------------------------------------------------------------------------
# Decoder stack (shared by talker / code predictor)
# ---------------------------------------------------------------------------


# Prefill length from which the Pallas flash kernel replaces the dense XLA
# attention (measured crossover on v5e: dense wins at T<=1024, ties at 2048
# where it already materializes a multi-GB score tensor at B=16, flash wins
# 3.2x at 4096).  Tests lower this to exercise the kernel at small shapes.
FLASH_PREFILL_MIN_T = 2048


def decoder_stack(stacked: Params, norm: Params, dims: StackDims, h: jax.Array,
                  cos: jax.Array, sin: jax.Array, mask_bias: jax.Array,
                  cache: KVCache, offset,
                  attend_len: Optional[int] = None,
                  unroll: int = 1,
                  prefill_start: Optional[jax.Array] = None,
                  prefill_window: Optional[int] = None
                  ) -> Tuple[jax.Array, KVCache]:
    """Run all layers. h: (B, T, hidden); mask_bias: (B, 1, T, S') additive
    where S' = attend_len or the full cache size.

    Writes new K/V at [offset, offset+T) and attends over the first
    `attend_len` cache slots (a static host-chosen bucket covering the
    current sequence length — avoids streaming the whole preallocated buffer
    from HBM every decode step; invalid slots masked by mask_bias).

    Decode (T==1) attention stays on XLA deliberately: a per-layer Pallas
    flash-decode kernel was built and measured 31.6 vs 18.6 ms/frame against
    this bucketed path (28 serialized kernel launches break XLA's
    weight-stream/attention overlap, and GQA decode matmuls are G=2-row —
    near-empty MXU tiles), so the kernel was removed (docs/DESIGN.md §9).
    """
    B, T, _ = h.shape
    # long prefills stream K/V blocks through the flash kernel instead of
    # materializing the (B, Hkv, G, T, S) score tensor; `prefill_start` is
    # the first valid (non-left-pad) slot per row
    use_flash_prefill = (prefill_start is not None
                         and T >= FLASH_PREFILL_MIN_T)
    pallas_interpret = jax.devices()[0].platform != "tpu"

    nq = dims.heads * dims.head_dim
    nkv = dims.kv_heads * dims.head_dim
    S_att = cache.k.shape[2] if attend_len is None else attend_len

    quantized = cache.quantized

    # The caches ride in the scan CARRY (full (L, B, S, Hkv, D) buffers with
    # a per-layer dynamic_update_slice), not as scanned xs/ys: loop-carried
    # buffers stay in place across iterations, while xs->ys caches would be
    # copied wholesale every step (ruinous at long context).
    def body(carry, xs):
        hh, cc = carry
        lp, idx = xs
        attn = lp["self_attn"]
        x = rms_norm(hh, lp["input_layernorm"]["weight"], dims.eps)
        qkv = matmul_t(x, attn["qkv_proj"]["weight"])
        q = qkv[..., :nq].reshape(B, T, dims.heads, dims.head_dim)
        k = qkv[..., nq:nq + nkv].reshape(B, T, dims.kv_heads, dims.head_dim)
        v = qkv[..., nq + nkv:].reshape(B, T, dims.kv_heads, dims.head_dim)
        q = rms_norm(q, attn["q_norm"]["weight"], dims.eps)
        k = rms_norm(k, attn["k_norm"]["weight"], dims.eps)
        q, k = apply_rope(q, k, cos, sin)

        if quantized:
            kq, ks = kv_quantize(k)
            vq, vs = kv_quantize(v)
            cc = KVCache(
                jax.lax.dynamic_update_slice(cc.k, kq[None],
                                             (idx, 0, offset, 0, 0)),
                jax.lax.dynamic_update_slice(cc.v, vq[None],
                                             (idx, 0, offset, 0, 0)),
                jax.lax.dynamic_update_slice(cc.k_scale, ks[None],
                                             (idx, 0, offset, 0)),
                jax.lax.dynamic_update_slice(cc.v_scale, vs[None],
                                             (idx, 0, offset, 0)))
        else:
            cc = KVCache(
                jax.lax.dynamic_update_slice(cc.k, k.astype(cc.k.dtype)[None],
                                             (idx, 0, offset, 0, 0)),
                jax.lax.dynamic_update_slice(cc.v, v.astype(cc.v.dtype)[None],
                                             (idx, 0, offset, 0, 0)))
        k_att = jax.lax.dynamic_slice(
            cc.k, (idx, 0, 0, 0, 0),
            (1, B, S_att, dims.kv_heads, dims.head_dim))[0]
        v_att = jax.lax.dynamic_slice(
            cc.v, (idx, 0, 0, 0, 0),
            (1, B, S_att, dims.kv_heads, dims.head_dim))[0]
        if quantized:
            ks_att = jax.lax.dynamic_slice(
                cc.k_scale, (idx, 0, 0, 0), (1, B, S_att, dims.kv_heads))[0]
            vs_att = jax.lax.dynamic_slice(
                cc.v_scale, (idx, 0, 0, 0), (1, B, S_att, dims.kv_heads))[0]

        if use_flash_prefill:
            from ..ops.pallas.prefill_attention import flash_prefill

            # fresh K/V of this prefill == cache slots [0, T) (slots beyond
            # are invalid and masked on the dense path anyway); with a
            # quantized cache this path attends the UNquantized keys, which
            # only tightens prefill numerics
            o = flash_prefill(q, k, v, prefill_start,
                              sliding_window=prefill_window,
                              interpret=pallas_interpret)
        elif quantized:
            # int8 K/V stay int8 inside the attention matmuls — only the
            # int8 buffers + scale planes are read from HBM
            o = attention_kv_quant(q, k_att, ks_att, v_att, vs_att, mask_bias)
        else:
            o = attention(q, k_att.astype(x.dtype), v_att.astype(x.dtype),
                          mask_bias)
        o = matmul_t(o.reshape(B, T, dims.heads * dims.head_dim), attn["o_proj"]["weight"])
        hh = hh + o

        x = rms_norm(hh, lp["post_attention_layernorm"]["weight"], dims.eps)
        mlp = lp["mlp"]
        inter = weight_rows(mlp["gate_up_proj"]["weight"]) // 2
        gu = matmul_t(x, mlp["gate_up_proj"]["weight"])
        gate = jax.nn.silu(gu[..., :inter])
        up = gu[..., inter:]
        hh = hh + matmul_t(gate * up, mlp["down_proj"]["weight"])
        return (hh, cc), None

    n_layers = cache.k.shape[0]
    (h, cache), _ = jax.lax.scan(
        body, (h, cache),
        (stacked, jnp.arange(n_layers)), unroll=unroll)
    h = rms_norm(h, norm["weight"], dims.eps)
    return h, cache


# ---------------------------------------------------------------------------
# Talker forward passes
# ---------------------------------------------------------------------------


def text_project(params: Params, cfg: TalkerConfig, x: jax.Array) -> jax.Array:
    """text_projection resize MLP (reference: Qwen3TTSTalkerResizeMLP 808-816,
    act from config.hidden_act — silu)."""
    tp = params["text_projection"]
    h = x @ tp["linear_fc1"]["weight"].T.astype(x.dtype) + tp["linear_fc1"]["bias"].astype(x.dtype)
    h = jax.nn.silu(h)
    return h @ tp["linear_fc2"]["weight"].T.astype(x.dtype) + tp["linear_fc2"]["bias"].astype(x.dtype)


def talker_prefill(params: Params, cfg: TalkerConfig, inputs_embeds: jax.Array,
                   attn_mask: jax.Array, cache: KVCache,
                   allow_flash: bool = True
                   ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Prefill the talker. inputs_embeds: (B, T, H) left-padded; attn_mask:
    (B, T) 1 = real token.  Returns (logits_last (B, V), hidden (B, T, H) —
    full last-layer normed hiddens, cache).  Callers needing only the last
    position slice [:, -1:]."""
    B, T, _ = inputs_embeds.shape
    S = cache.k.shape[2]
    dims = StackDims.from_talker(cfg)

    # mrope with identical axes == 1-D rope on mask-cumsum positions
    positions = jnp.cumsum(attn_mask, axis=-1) - 1
    positions = jnp.where(attn_mask == 0, 1, positions)

    kv_valid = jnp.zeros((B, S), bool)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, attn_mask.astype(bool), (0, 0))
    # padding inside the prefill has position 1 which would break the <=
    # comparison; use slot indices for causality instead of positions.
    slot = jnp.arange(S)[None, :]
    qslot = jnp.arange(T)[None, :]
    ok = (slot <= qslot[:, :, None]) & kv_valid[:, None, :]
    if cfg.sliding_window is not None:
        # index-based sliding window, matching HF
        # create_sliding_window_causal_mask (reference 1510-1518)
        ok &= slot > (qslot[:, :, None] - cfg.sliding_window)
    bias = mask_to_bias(ok[:, None])

    inv_freq = default_inv_freq(dims.head_dim, cfg.rope_theta)
    cos, sin = rope_tables(positions, inv_freq)

    # first valid slot per row.  The flash kernel REQUIRES contiguous left
    # padding (inference prompt layout) and has no autodiff rule — callers
    # with right-padded batches or gradients (SFT) pass allow_flash=False.
    start = ((T - jnp.sum(attn_mask, axis=-1)).astype(jnp.int32)
             if allow_flash else None)
    h, cache = decoder_stack(params["layers"], params["norm"], dims,
                             inputs_embeds, cos, sin, bias, cache, 0,
                             prefill_start=start,
                             prefill_window=cfg.sliding_window)
    logits = matmul_t(h[:, -1].astype(jnp.float32), params["codec_head"])
    return logits, h, cache


def talker_decode_step(params: Params, cfg: TalkerConfig, embed: jax.Array,
                       position: jax.Array, cache_index, kv_valid: jax.Array,
                       cache: KVCache, attend_len: Optional[int] = None
                       ) -> Tuple[jax.Array, jax.Array, KVCache]:
    """One decode step. embed: (B, 1, H); position: (B,) rope position;
    cache_index: scalar slot to write; kv_valid: (B, S) valid slots incl. the
    new one; attend_len: optional static bucket bounding the attended window.
    Returns (logits (B, V), hidden (B,1,H), cache)."""
    B = embed.shape[0]
    S = cache.k.shape[2] if attend_len is None else attend_len
    dims = StackDims.from_talker(cfg)

    slot = jnp.arange(S)[None, :]
    ok = (slot <= cache_index) & kv_valid[:, :S]
    if cfg.sliding_window is not None:
        ok &= slot > (cache_index - cfg.sliding_window)
    bias = mask_to_bias(ok[:, None, None, :])

    inv_freq = default_inv_freq(dims.head_dim, cfg.rope_theta)
    cos, sin = rope_tables(position[:, None], inv_freq)

    h, cache = decoder_stack(params["layers"], params["norm"], dims, embed,
                             cos, sin, bias, cache, cache_index,
                             attend_len=attend_len)
    logits = matmul_t(h[:, 0].astype(jnp.float32), params["codec_head"])
    return logits, h, cache


# ---------------------------------------------------------------------------
# Code predictor (sub-talker): one frame = prefill(2) + scan of Q-2 steps
# ---------------------------------------------------------------------------


def _cp_project(cp: Params, x: jax.Array) -> jax.Array:
    proj = cp["proj"]
    if proj is None:
        return x
    return x @ proj["weight"].T.astype(x.dtype) + proj["bias"].astype(x.dtype)


def code_predictor_frame_dispatch(params: Params, cfg: TalkerConfig,
                                  past_hidden: jax.Array,
                                  code0_embed: jax.Array, key: jax.Array,
                                  sampling, fused: bool = False,
                                  rows: Optional[jax.Array] = None,
                                  rows_top_k: int = 0
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Route one sub-talker frame to the XLA scan or the fused Pallas
    megakernel (ops/pallas/subtalker.py — weights VMEM-resident, W8A8).

    `rows` ((B, 5) f32, SamplingParams.as_row layout) carries PER-SLOT
    sub-talker sampling for the serving engine; `sampling` is then ignored.
    On the XLA path `rows_top_k` is the static candidate width per-row k is
    masked within (0 = full-vocab path, any k).  The fused kernel takes
    temperature/top_k as data, so any per-row k works there.

    The fused path needs int8 params and a jit wrapped with
    `runtime.jit_options.decode_compiler_options()` (the kernel keeps ~94 MB
    of weights in VMEM, above XLA's default scoped-vmem limit)."""
    if not fused:
        return code_predictor_frame(params, cfg, past_hidden, code0_embed,
                                    key, sampling, rows=rows,
                                    rows_top_k=rows_top_k)
    from ..ops.pallas.subtalker import subtalker_frame_fused

    interpret = jax.devices()[0].platform != "tpu"
    return subtalker_frame_fused(params["code_predictor"],
                                 cfg.code_predictor_config, past_hidden,
                                 code0_embed, key, sampling, rows=rows,
                                 interpret=interpret)


def code_predictor_frame(params: Params, cfg: TalkerConfig,
                         past_hidden: jax.Array, code0_embed: jax.Array,
                         key: jax.Array, sampling,
                         rows: Optional[jax.Array] = None,
                         rows_top_k: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Generate codebooks 1..Q-1 for one frame.

    past_hidden/code0_embed: (B, 1, talker_hidden).  Returns
    (codes (B, Q-1) int32, frame_embed_sum (B, 1, talker_hidden) — the sum of
    the Q-1 sub-code embeddings in talker space).

    Mirrors the nested `code_predictor.generate` call
    (modeling_qwen3_tts.py:1671-1687) as prefill over 2 positions + a
    lax.scan of Q-2 single-position steps with per-step head/table selection
    (reference per-step indexing at 1277-1299).

    `rows`/`rows_top_k`: per-row sampling override (see
    code_predictor_frame_dispatch).
    """
    from ..ops.sampling import process_and_sample, process_and_sample_rows

    if rows is not None:
        def _sample(logits, sub):
            return process_and_sample_rows(logits, sub, rows, rows_top_k)
    else:
        def _sample(logits, sub):
            return process_and_sample(logits, sub, sampling)

    cp_cfg = cfg.code_predictor_config
    cp = params["code_predictor"]
    dims = StackDims.from_code_predictor(cp_cfg)
    B = past_hidden.shape[0]
    Qm1 = cfg.num_code_groups - 1
    S = Qm1 + 2  # max sub-sequence length (hidden, code0, codes 1..Q-2)

    cache = KVCache.zeros(cp_cfg.num_hidden_layers, B, S, dims.kv_heads,
                          dims.head_dim, dtype=past_hidden.dtype)
    inv_freq = default_inv_freq(dims.head_dim, cp_cfg.rope_theta)

    # ---- prefill: positions 0,1 ----
    pre = _cp_project(cp, jnp.concatenate([past_hidden, code0_embed], axis=1))
    pos = jnp.arange(2)[None, :]
    cos, sin = rope_tables(jnp.broadcast_to(pos, (B, 2)), inv_freq)
    ok = jnp.arange(S)[None, :] <= jnp.arange(2)[:, None]  # (2, S) causal
    bias = jnp.broadcast_to(mask_to_bias(ok)[None, None], (B, 1, 2, S))
    h, cache = decoder_stack(cp["layers"], cp["norm"], dims, pre, cos, sin,
                             bias, cache, 0)
    logits0 = (h[:, -1].astype(jnp.float32)
               @ cp["lm_heads"][0].T.astype(jnp.float32))
    key, sub = jax.random.split(key)
    code = _sample(logits0, sub)  # codebook 1

    emb_sum = jnp.take(cp["embeddings"][0], code, axis=0)[:, None, :].astype(past_hidden.dtype)

    def body(carry, step):
        cache, prev_code, emb_sum, key = carry
        # embed prev code with table[step-1], predict with head[step]
        table = jnp.take(cp["embeddings"], step - 1, axis=0)
        raw = jnp.take(table, prev_code, axis=0)[:, None, :].astype(past_hidden.dtype)
        x = _cp_project(cp, raw)
        position = jnp.full((B, 1), step + 1)
        cos, sin = rope_tables(position, inv_freq)
        bias = jnp.broadcast_to(mask_to_bias((jnp.arange(S) <= step + 1)[None, None, None, :]),
                                (B, 1, 1, S))
        h, cache = decoder_stack(cp["layers"], cp["norm"], dims, x, cos, sin,
                                 bias, cache, step + 1)
        logits = (h[:, 0].astype(jnp.float32)
                  @ jnp.take(cp["lm_heads"], step, axis=0).T.astype(jnp.float32))
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub)
        emb_sum = emb_sum + jnp.take(cp["embeddings"], step, axis=0)[nxt][:, None, :].astype(past_hidden.dtype)
        return (cache, nxt, emb_sum, key), prev_code

    steps = jnp.arange(1, Qm1)
    (cache, last_code, emb_sum, key), prev_codes = jax.lax.scan(
        body, (cache, code, emb_sum, key), steps)
    codes = jnp.concatenate([prev_codes.T, last_code[:, None]], axis=1)  # (B, Q-1)
    return codes, emb_sum
