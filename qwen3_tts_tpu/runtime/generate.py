"""Talker generation: batched frame-by-frame decode, fully on-device.

Re-implements the reference's HF-generate-driven loop
(modeling_qwen3_tts.py:2272-2291 driving Qwen3TTSTalkerForConditionalGeneration
.forward 1635-1744) as a resumable on-device state machine:

  init_decode_state: prefill -> sample first code0
  frame_step:        sub-talker scan -> frame embed sum -> dual-track text
                     merge -> talker step -> sample next code0
  generate_frames:   jitted while_loop over frame_step (batch API)
  decode_chunk:      jitted K-step scan over frame_step (streaming API —
                     the host interleaves talker chunks with vocoder chunks)

Per reference semantics:
- frames are recorded for every talker forward whose *input* is a sampled
  code0 (so max_new_tokens M yields at most M-1 frames, reference 2280-2291);
- generation stops at codebook-0 EOS per sample (2283-2287);
- repetition penalty sees only previously generated code0 ids;
- the suppress list bans the top-1024 control ids except EOS (2059-2063);
- min_new_tokens=2 bans EOS for the first two samples (2046);
- dual-track merge: frame embedding + trailing text hidden until exhausted,
  then tts_pad embed (1689-1692).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TalkerConfig
from ..models.talker import (KVCache, StackDims, code_predictor_frame_dispatch,
                             talker_decode_step, talker_prefill)
from ..ops.sampling import SamplingParams, process_and_sample_rows
from .jit_options import decode_jit

Params = Dict[str, Any]

# decode attention reads a dynamic_slice window rounded up to this bucket:
# one compiled program per bucket instead of per length (shared by the
# chunked generator, the streaming session and the serving engine)
ATTEND_BUCKET = 256


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 2048
    min_new_tokens: int = 2
    sampling: SamplingParams = field(default_factory=SamplingParams)
    subtalker: SamplingParams = field(default_factory=SamplingParams)
    # Route the 15-step sub-talker through the fused Pallas megakernel
    # (requires int8 params; W8A8 numerics -- see ops/pallas/subtalker.py).
    fused_subtalker: bool = False
    # Store the talker KV cache as per-(slot, head) symmetric int8 (halves
    # decode attention HBM reads; sub-frame-level numerics drift only).
    kv_quant: bool = False
    # Route the 28-layer talker decode step through the fused Pallas
    # megakernel (ops/pallas/talker_step.py: one pallas_call per frame,
    # W8A8, KV cache held in fused (L, B, Hkv, S, D) layout for the whole
    # generate call).  Requires int8 params and a bf16 KV cache
    # (incompatible with kv_quant); the KV buffer is rounded up to a
    # multiple of 128 slots.
    fused_talker_step: bool = False

    def canonical(self) -> "GenerationConfig":
        """This config with the DYNAMIC sampling knobs (temperature, top_p,
        repetition_penalty) reset to fixed sentinels.

        The decode jits take gen_cfg as a static argument; the actual knob
        values travel as (5,) rows in DecodeConst instead (see
        sampling_rows), so two calls differing only in those knobs share ONE
        compiled program — remote TPU compiles of the generation program
        cost minutes, and the reference surface invites per-call sweeps of
        exactly these kwargs (qwen3_tts_model.py:287-352).  Structural
        fields stay static: do_sample selects whether the sampling machinery
        is compiled in at all, and top_k is the program's candidate width
        (changing those recompiles, as does max/min_new_tokens)."""
        import dataclasses

        def canon(s: SamplingParams) -> SamplingParams:
            return SamplingParams(
                do_sample=s.do_sample, top_k=s.top_k,
                top_p=1.0, temperature=1.0, repetition_penalty=1.0)

        return dataclasses.replace(self, sampling=canon(self.sampling),
                                   subtalker=canon(self.subtalker))

    def sampling_rows(self) -> Tuple[np.ndarray, np.ndarray]:
        """The dynamic counterpart of canonical(): (talker_row, subtalker_row)
        in SamplingParams.as_row layout, fed to the jits as data."""
        return self.sampling.as_row(), self.subtalker.as_row()


def suppress_mask_for(cfg: TalkerConfig) -> jnp.ndarray:
    """(V,) bool — the reference suppresses ids [V-1024, V) except codec EOS
    (modeling_qwen3_tts.py:2059-2063)."""
    v = cfg.vocab_size
    ids = jnp.arange(v)
    mask = ids >= (v - 1024)
    return mask & (ids != cfg.codec_eos_token_id)


class DecodeConst(NamedTuple):
    """Loop-invariant tensors for the decode state machine."""

    trailing_text: jax.Array   # (B, Tt, H) pad-filled projected text hiddens
    tts_pad_embed: jax.Array   # (1, 1, H)
    valid_prefill: jax.Array   # (B, S) bool — prefill attention validity
    seq_lens: jax.Array        # (B,) real prefill length (rope base position)
    prefill_len: jax.Array     # scalar int — T (first decode cache slot)
    # dynamic sampling knobs (SamplingParams.as_row layout) — the static
    # gen_cfg the jits see is canonical()-ized, these carry the real values
    samp_row: jax.Array        # (5,) f32 talker sampling
    sub_row: jax.Array         # (5,) f32 sub-talker sampling


class DecodeState(NamedTuple):
    cache: KVCache
    code0: jax.Array         # (B,) next frame's codebook-0 id
    last_hidden: jax.Array   # (B, 1, H)
    presence: jax.Array      # (B, V) bool — generated-id history
    done: jax.Array          # (B,) bool
    lengths: jax.Array       # (B,) frames recorded
    t: jax.Array             # scalar int32 frame counter
    key: jax.Array


class GenerationResult(NamedTuple):
    codes: jax.Array    # (B, max_frames, Q) int32
    lengths: jax.Array  # (B,) valid frame count per sample
    # (B, max_frames, H) talker hidden per frame on the fused path;
    # generate_frames_chunked returns an EMPTY (B, 0, H) array instead
    # (per-frame hiddens of 1k+ frame generations would be GBs of HBM)
    hidden: jax.Array


def init_decode_state(params: Params, cfg: TalkerConfig,
                      gen_cfg: GenerationConfig, inputs_embeds: jax.Array,
                      attn_mask: jax.Array, trailing_text: jax.Array,
                      tts_pad_embed: jax.Array, key: jax.Array,
                      max_len: int) -> Tuple[DecodeState, DecodeConst]:
    """Prefill and sample the first code0. `max_len` is the KV capacity S.

    The jitted impl sees gen_cfg.canonical(); the dynamic sampling knobs
    ride in as rows (stored in DecodeConst for frame_step)."""
    samp_row, sub_row = gen_cfg.sampling_rows()
    return _init_decode_state(params, cfg, gen_cfg.canonical(),
                              inputs_embeds, attn_mask, trailing_text,
                              tts_pad_embed, key, max_len,
                              jnp.asarray(samp_row), jnp.asarray(sub_row))


def _sample_code0(logits, key, gen_cfg, cfg, samp_row, presence, ban):
    """Talker codebook-0 sampling through the rows path: the dynamic knobs
    (temperature/top_p/repetition_penalty) come from samp_row so they never
    enter the compile key; do_sample / candidate-width top_k are static via
    the canonical gen_cfg (all_greedy skips the warp work entirely)."""
    B = logits.shape[0]
    rows = jnp.broadcast_to(samp_row[None, :], (B, 5))
    return process_and_sample_rows(
        logits, key, rows, gen_cfg.sampling.top_k, presence=presence,
        suppress_mask=suppress_mask_for(cfg), ban_eos=ban,
        eos_id=cfg.codec_eos_token_id,
        all_greedy=not gen_cfg.sampling.do_sample)


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "max_len"))
def _init_decode_state(params: Params, cfg: TalkerConfig,
                       gen_cfg: GenerationConfig, inputs_embeds: jax.Array,
                       attn_mask: jax.Array, trailing_text: jax.Array,
                       tts_pad_embed: jax.Array, key: jax.Array,
                       max_len: int, samp_row: jax.Array, sub_row: jax.Array
                       ) -> Tuple[DecodeState, DecodeConst]:
    B, T, H = inputs_embeds.shape
    dims = StackDims.from_talker(cfg)
    dtype = inputs_embeds.dtype

    cache = KVCache.zeros(cfg.num_hidden_layers, B, max_len, dims.kv_heads,
                          dims.head_dim, dtype=dtype,
                          quantized=gen_cfg.kv_quant)
    logits, hidden_seq, cache = talker_prefill(params, cfg, inputs_embeds,
                                               attn_mask, cache)
    presence = jnp.zeros((B, cfg.vocab_size), bool)
    key, sub = jax.random.split(key)
    ban = jnp.full((B,), 0 < gen_cfg.min_new_tokens)
    code0 = _sample_code0(logits, sub, gen_cfg, cfg, samp_row, presence, ban)

    valid_prefill = jnp.zeros((B, max_len), bool)
    valid_prefill = jax.lax.dynamic_update_slice(
        valid_prefill, attn_mask.astype(bool), (0, 0))
    const = DecodeConst(
        trailing_text=trailing_text,
        tts_pad_embed=jnp.asarray(tts_pad_embed, dtype),
        valid_prefill=valid_prefill,
        seq_lens=jnp.sum(attn_mask, axis=-1).astype(jnp.int32),
        prefill_len=jnp.int32(T),
        samp_row=samp_row.astype(jnp.float32),
        sub_row=sub_row.astype(jnp.float32),
    )
    if gen_cfg.fused_talker_step:
        # one transpose to the kernel's (L, B, Hkv, S, D) layout (scales
        # (L, B, Hkv, S) in int8-KV mode), amortized over every decode step
        from ..ops.pallas.talker_step import transpose_cache_in

        cache = cache._replace(
            k=transpose_cache_in(cache.k),
            v=transpose_cache_in(cache.v),
            k_scale=(transpose_cache_in(cache.k_scale)
                     if cache.quantized else None),
            v_scale=(transpose_cache_in(cache.v_scale)
                     if cache.quantized else None))
    state = DecodeState(
        cache=cache, code0=code0, last_hidden=hidden_seq[:, -1:, :],
        presence=presence, done=jnp.zeros((B,), bool),
        lengths=jnp.zeros((B,), jnp.int32), t=jnp.int32(0), key=key)
    return state, const


def frame_step(params: Params, cfg: TalkerConfig, gen_cfg: GenerationConfig,
               const: DecodeConst, state: DecodeState,
               attend_len: Optional[int] = None
               ) -> Tuple[DecodeState, jax.Array, jax.Array, jax.Array]:
    """One frame: returns (state', frame (B, Q), hidden_row (B, H),
    active (B,) — whether the frame is valid output)."""
    eos = cfg.codec_eos_token_id
    B = state.code0.shape[0]
    # fused-talker-step caches hold (L, B, Hkv, S, D); standard (L, B, S,
    # Hkv, D)
    S = state.cache.k.shape[3 if gen_cfg.fused_talker_step else 2]
    dtype = state.last_hidden.dtype

    now_done = state.done | (state.code0 == eos)
    presence = state.presence.at[jnp.arange(B), state.code0].set(True)

    code0_embed = jnp.take(params["codec_embedding"], state.code0, axis=0
                           )[:, None, :].astype(dtype)
    key, k1, k2 = jax.random.split(state.key, 3)
    # sub-talker sampling knobs ride as data (const.sub_row) when sampling;
    # a greedy sub-talker compiles none of the machinery (gen_cfg canonical)
    sub_rows = (jnp.broadcast_to(const.sub_row[None, :], (B, 5))
                if gen_cfg.subtalker.do_sample else None)
    sub_codes, sub_emb_sum = code_predictor_frame_dispatch(
        params, cfg, state.last_hidden, code0_embed, k1, gen_cfg.subtalker,
        fused=gen_cfg.fused_subtalker, rows=sub_rows,
        rows_top_k=gen_cfg.subtalker.top_k)
    frame = jnp.concatenate([state.code0[:, None], sub_codes], axis=1)

    active = ~now_done
    lengths = state.lengths + active.astype(jnp.int32)

    # dual-track merge (reference 1682-1692)
    Tt = const.trailing_text.shape[1]
    text_idx = jnp.minimum(state.t, Tt - 1)
    text_h = jax.lax.dynamic_slice_in_dim(const.trailing_text, text_idx, 1, axis=1)
    text_h = jnp.where(state.t < Tt, text_h,
                       jnp.broadcast_to(const.tts_pad_embed, text_h.shape))
    embed = code0_embed + sub_emb_sum + text_h.astype(dtype)

    cache_index = const.prefill_len + state.t
    slot = jnp.arange(S)[None, :]
    kv_valid = const.valid_prefill | ((slot >= const.prefill_len) &
                                      (slot <= cache_index))
    position = const.seq_lens + state.t
    if gen_cfg.fused_talker_step:
        from ..ops.pallas.talker_step import talker_step_fused_cache

        interpret = jax.devices()[0].platform != "tpu"
        if state.cache.quantized:
            logits, last_hidden, kf, vf, ksf, vsf = talker_step_fused_cache(
                params, cfg, embed, position, cache_index, kv_valid,
                state.cache.k, state.cache.v, attend_len=attend_len,
                k_scale=state.cache.k_scale, v_scale=state.cache.v_scale,
                interpret=interpret)
            cache = state.cache._replace(k=kf, v=vf, k_scale=ksf, v_scale=vsf)
        else:
            logits, last_hidden, kf, vf = talker_step_fused_cache(
                params, cfg, embed, position, cache_index, kv_valid,
                state.cache.k, state.cache.v, attend_len=attend_len,
                interpret=interpret)
            cache = state.cache._replace(k=kf, v=vf)
    else:
        logits, last_hidden, cache = talker_decode_step(
            params, cfg, embed, position, cache_index, kv_valid, state.cache,
            attend_len=attend_len)

    ban = jnp.full((B,), state.t + 1 < gen_cfg.min_new_tokens)
    next_code0 = _sample_code0(logits, k2, gen_cfg, cfg, const.samp_row,
                               presence, ban)
    new_state = DecodeState(cache=cache, code0=next_code0,
                            last_hidden=last_hidden, presence=presence,
                            done=now_done, lengths=lengths,
                            t=state.t + 1, key=key)
    return new_state, frame, last_hidden[:, 0], active


def decode_chunk(params: Params, cfg: TalkerConfig, gen_cfg: GenerationConfig,
                 const: DecodeConst, state: DecodeState, num_frames: int,
                 attend_len: Optional[int] = None
                 ) -> Tuple[DecodeState, jax.Array, jax.Array]:
    """Run up to `num_frames` frame steps (streaming granule).

    `attend_len` is a static host-chosen bucket covering the sequence length
    reached by the end of this chunk — the attention window reads only that
    prefix of the KV buffer.

    Returns (state, frames (B, K, Q), active (B, K)).  Steps past EOS produce
    inactive rows.  Dynamic sampling knobs come from `const` (built by
    init_decode_state); gen_cfg is canonical()-ized here so knob changes
    reuse the compiled chunk program.
    """
    return _decode_chunk(params, cfg, gen_cfg.canonical(), const, state,
                         num_frames, attend_len)


@decode_jit(static_argnames=("cfg", "gen_cfg", "num_frames", "attend_len"),
            donate_argnums=(4,))
def _decode_chunk(params: Params, cfg: TalkerConfig,
                  gen_cfg: GenerationConfig,
                  const: DecodeConst, state: DecodeState, num_frames: int,
                  attend_len: Optional[int] = None
                  ) -> Tuple[DecodeState, jax.Array, jax.Array]:
    def body(state, _):
        state, frame, _, active = frame_step(
            params, cfg, gen_cfg, const, state, attend_len=attend_len)
        return state, (frame, active)

    state, (frames, active) = jax.lax.scan(body, state, None,
                                           length=num_frames)
    return state, jnp.swapaxes(frames, 0, 1), jnp.swapaxes(active, 0, 1)


def generate_frames_chunked(params: Params, cfg: TalkerConfig,
                            gen_cfg: GenerationConfig,
                            inputs_embeds: jax.Array, attn_mask: jax.Array,
                            trailing_text: jax.Array, tts_pad_embed: jax.Array,
                            key: jax.Array, chunk: int = 64,
                            attend_bucket: int = ATTEND_BUCKET
                            ) -> GenerationResult:
    """Host-chunked batch generation: same results as `generate_frames`, but
    each chunk attends only a length bucket of the KV buffer (the while_loop
    variant must read the full preallocated buffer every step, which at
    max_new_tokens=2048 roughly doubles decode cost) and generation stops at
    chunk granularity once every sample hit EOS."""
    B, T, H = inputs_embeds.shape
    Q = cfg.num_code_groups
    M = gen_cfg.max_new_tokens
    max_frames = M - 1
    S = T + M + 1
    if gen_cfg.fused_talker_step:
        S = -(-S // 128) * 128   # kernel KV chunks are 128 slots

    state, const = init_decode_state(params, cfg, gen_cfg, inputs_embeds,
                                     attn_mask, trailing_text, tts_pad_embed,
                                     key, S)
    frames_out = []
    active_out = []
    hidden = jnp.zeros((B, 0, H), inputs_embeds.dtype)
    emitted = 0
    while emitted < max_frames:
        k = min(chunk, max_frames - emitted)
        needed = T + emitted + k + 1
        attend = min(S, ((needed + attend_bucket - 1)
                         // attend_bucket) * attend_bucket)
        state, frames, active = decode_chunk(params, cfg, gen_cfg, const,
                                             state, k, attend_len=attend)
        frames_out.append(np.asarray(frames))
        active_out.append(np.asarray(active))
        emitted += k
        if bool(np.asarray(state.done).all()):
            break

    codes = np.concatenate(frames_out, axis=1)
    active = np.concatenate(active_out, axis=1)
    codes = np.where(active[..., None], codes, 0)
    lengths = active.sum(axis=1).astype(np.int32)
    pad_to = max_frames - codes.shape[1]
    if pad_to > 0:
        codes = np.pad(codes, ((0, 0), (0, pad_to), (0, 0)))
    return GenerationResult(jnp.asarray(codes), jnp.asarray(lengths), hidden)


def generate_frames(params: Params, cfg: TalkerConfig,
                    gen_cfg: GenerationConfig,
                    inputs_embeds: jax.Array, attn_mask: jax.Array,
                    trailing_text: jax.Array, tts_pad_embed: jax.Array,
                    key: jax.Array) -> GenerationResult:
    """Full batch generation (non-streaming API).

    inputs_embeds: (B, T, H) left-padded prefill embeddings.
    attn_mask: (B, T) 1 = real token.
    trailing_text: (B, Tt, H) projected trailing text hiddens, pad-filled.
    tts_pad_embed: (1, 1, H) or (B, 1, H).

    Sampling knob changes (temperature/top_p/repetition_penalty) reuse the
    compiled program: the jit sees gen_cfg.canonical() and the values ride
    as data.
    """
    samp_row, sub_row = gen_cfg.sampling_rows()
    return _generate_frames(params, cfg, gen_cfg.canonical(), inputs_embeds,
                            attn_mask, trailing_text, tts_pad_embed, key,
                            jnp.asarray(samp_row), jnp.asarray(sub_row))


@decode_jit(static_argnames=("cfg", "gen_cfg"))
def _generate_frames(params: Params, cfg: TalkerConfig,
                     gen_cfg: GenerationConfig,
                     inputs_embeds: jax.Array, attn_mask: jax.Array,
                     trailing_text: jax.Array, tts_pad_embed: jax.Array,
                     key: jax.Array, samp_row: jax.Array,
                     sub_row: jax.Array) -> GenerationResult:
    B, T, H = inputs_embeds.shape
    Q = cfg.num_code_groups
    M = gen_cfg.max_new_tokens
    max_frames = M - 1
    S = T + M + 1
    if gen_cfg.fused_talker_step:
        S = -(-S // 128) * 128   # kernel KV chunks are 128 slots
    eos = cfg.codec_eos_token_id

    state, const = _init_decode_state(params, cfg, gen_cfg, inputs_embeds,
                                      attn_mask, trailing_text, tts_pad_embed,
                                      key, S, samp_row, sub_row)
    codes_buf = jnp.zeros((B, max_frames, Q), jnp.int32)
    hidden_buf = jnp.zeros((B, max_frames, H), inputs_embeds.dtype)

    def cond(carry):
        state, _, _ = carry
        return (state.t < max_frames) & ~jnp.all(state.done |
                                                 (state.code0 == eos))

    def body(carry):
        state, codes_buf, hidden_buf = carry
        t = state.t
        state, frame, hidden_row, active = frame_step(params, cfg, gen_cfg,
                                                      const, state)
        codes_buf = codes_buf.at[:, t, :].set(
            jnp.where(active[:, None], frame, 0))
        hidden_buf = hidden_buf.at[:, t, :].set(
            jnp.where(active[:, None], hidden_row, 0))
        return state, codes_buf, hidden_buf

    state, codes_buf, hidden_buf = jax.lax.while_loop(
        cond, body, (state, codes_buf, hidden_buf))
    return GenerationResult(codes_buf, state.lengths, hidden_buf)
