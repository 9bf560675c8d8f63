"""Dual-track streaming synthesis: overlapped talker decode + chunked vocoder.

The reference's "Dual-Track" architecture claims ~97 ms end-to-end first
packet (README.md:54); its public code, however, only simulates streaming
text layout (qwen3_tts_model.py non_streaming_mode doc) and decodes the
vocoder after full generation.  Here streaming is real:

  host loop:  [talker chunk K_i on device] -> [vocoder chunk on device] ->
              emit packet, while the next talker chunk launches

- Talker chunks use `decode_chunk` (runtime/generate.py), a K-step scan over
  the resumable decode state — a small warmup schedule (2, 4, 8, ... frames)
  keeps the first packet latency low, then steady-state chunks amortize
  dispatch.
- The vocoder re-decodes `left_context` frames per chunk exactly like the
  reference chunked_decode (modeling...v2.py:886-896) — the same 25-frame
  left-context approximation the reference uses for long audio, applied at
  streaming granularity.
- Shapes are bucketed to a handful of (K, ctx) pairs -> a fixed set of
  compiled programs after warmup.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecV2DecoderConfig, TalkerConfig
from ..models.codec12.decoder import decode_frames as vocoder_decode
from .generate import (ATTEND_BUCKET, GenerationConfig, decode_chunk,
                       init_decode_state)

Params = Dict[str, Any]


@dataclass(frozen=True)
class StreamingConfig:
    warmup_schedule: Tuple[int, ...] = (1, 2, 4, 8, 16)
    steady_chunk: int = 25
    vocoder_left_context: int = 25


@dataclass
class StreamPacket:
    """One emitted audio chunk."""

    wav: np.ndarray            # (B, samples) float32
    frame_start: int           # first frame index covered
    frame_count: int           # frames covered
    active_frames: np.ndarray  # (B,) valid frames within this packet
    latency_s: float           # wall time since session start


@partial(jax.jit, static_argnames=("cfg", "k", "ctx_cap"))
def _vocode_slice(p, cfg, codes_buf, ctx_lens, emit_start, k, ctx_cap):
    """Decode the next `k` frames of every row with PER-ROW left context.

    codes_buf: (B, Q, T) device code history; row b's usable history is
    [emit_start - ctx_lens[b], emit_start + k).  Each row is gathered
    LEFT-ALIGNED as [c_b context | k new | causal-safe tail], vocoded in one
    rectangular program (width ctx_cap + k), then the k emitted frames are
    sliced per row at c_b — exact per-row chunked_decode semantics
    (reference modeling...v2.py:886-896) inside one batched call, so mixed
    voice-clone batches keep each row's own reference context.

    Module-level so the compiled (k, ctx_cap) programs are shared across
    sessions — a per-instance jit closure recompiled the whole warmup
    schedule on every request."""
    B, Q, T = codes_buf.shape
    up = cfg.total_upsample
    W = ctx_cap + k
    c = jnp.minimum(ctx_lens.astype(jnp.int32), ctx_cap)        # (B,)
    start = emit_start - c                                       # (B,)
    idx = jnp.clip(start[:, None] + jnp.arange(W)[None, :], 0, T - 1)
    chunk = jnp.take_along_axis(codes_buf, idx[:, None, :], axis=2)
    wav = vocoder_decode(p, cfg, jnp.clip(chunk, 0, None))[:, 0]  # (B, W*up)
    sidx = c[:, None] * up + jnp.arange(k * up)[None, :]
    return jnp.take_along_axis(wav, sidx, axis=1)                # (B, k*up)


class StreamingSession:
    """One batched streaming synthesis run."""

    def __init__(self, talker_params: Params, talker_cfg: TalkerConfig,
                 gen_cfg: GenerationConfig,
                 vocoder_params: Params, vocoder_cfg: CodecV2DecoderConfig,
                 stream_cfg: StreamingConfig = StreamingConfig()):
        self.talker_params = talker_params
        self.talker_cfg = talker_cfg
        self.gen_cfg = gen_cfg
        self.vocoder_params = vocoder_params
        self.vocoder_cfg = vocoder_cfg
        self.stream_cfg = stream_cfg

    def _chunk_schedule(self, max_frames: int) -> Iterator[int]:
        emitted = 0
        for k in self.stream_cfg.warmup_schedule:
            k = min(k, max_frames - emitted)
            if k <= 0:
                return
            yield k
            emitted += k
        while emitted < max_frames:
            k = min(self.stream_cfg.steady_chunk, max_frames - emitted)
            yield k
            emitted += k

    def run(self, inputs_embeds: jax.Array, attn_mask: jax.Array,
            trailing_text: jax.Array, tts_pad_embed: jax.Array,
            key: jax.Array, context_codes=None,
            context_lens=None) -> Iterator[StreamPacket]:
        """Generate and yield audio packets as they become available.

        `context_codes` (B, Q, T0) optional: pre-existing codec frames (e.g.
        a voice-clone reference) used as vocoder left context only — their
        audio is never emitted.  `context_lens` (B,) optional: per-row valid
        context length (rows right-aligned in context_codes); rows with 0
        run context-free, so MIXED clone batches (ICL + x-vector-only) keep
        per-row context instead of degrading to none."""
        cfg, gen_cfg = self.talker_cfg, self.gen_cfg
        B, T, _ = inputs_embeds.shape
        M = gen_cfg.max_new_tokens
        max_frames = M - 1
        S = T + M + 1
        if gen_cfg.fused_talker_step:
            S = -(-S // 128) * 128   # kernel KV chunks are 128 slots
        up = self.vocoder_cfg.total_upsample
        ctx_max = self.stream_cfg.vocoder_left_context
        Q = cfg.num_code_groups

        t_start = time.time()
        state, const = init_decode_state(
            self.talker_params, cfg, gen_cfg, inputs_embeds, attn_mask,
            trailing_text, tts_pad_embed, key, S)

        # device-resident code history: each talker chunk feeds the vocoder
        # without a host round-trip; only finished audio crosses to the host
        T0 = 0 if context_codes is None else context_codes.shape[-1]
        codes_buf = jnp.zeros((B, Q, T0 + max_frames), jnp.int32)
        if T0:
            codes_buf = codes_buf.at[:, :, :T0].set(
                jnp.asarray(context_codes, jnp.int32))
        if context_lens is None:
            ctx_lens0 = np.full((B,), T0, np.int32)
        else:
            ctx_lens0 = np.asarray(context_lens, np.int32)
        emitted = 0    # generated frames emitted (context excluded)

        for k in self._chunk_schedule(max_frames):
            # static attention bucket covering this chunk's final length
            needed = T + emitted + k + 1
            attend = min(S, ((needed + ATTEND_BUCKET - 1)
                             // ATTEND_BUCKET) * ATTEND_BUCKET)
            state, frames, active = decode_chunk(
                self.talker_params, cfg, gen_cfg, const, state, k,
                attend_len=attend)
            # zero post-EOS frames (matching generate_frames' masking) so the
            # vocoder never sees raw sampled control-range ids
            frames = frames * active[..., None].astype(frames.dtype)
            codes_buf = jax.lax.dynamic_update_slice(
                codes_buf, jnp.swapaxes(frames, 1, 2), (0, 0, T0 + emitted))

            ctx_cap = min(ctx_max, T0 + emitted)
            wav_dev = _vocode_slice(self.vocoder_params, self.vocoder_cfg,
                                    codes_buf,
                                    jnp.asarray(ctx_lens0 + emitted),
                                    jnp.int32(T0 + emitted), k, ctx_cap)
            wav = np.asarray(wav_dev)              # one D2H sync per packet
            active_np = np.asarray(active)

            latency = time.time() - t_start
            if emitted == 0:
                from ..utils.metrics import global_metrics

                global_metrics().observe("stream.first_packet_s", latency)
            yield StreamPacket(
                wav=wav.astype(np.float32),
                frame_start=emitted,
                frame_count=k,
                active_frames=active_np.sum(axis=1),
                latency_s=latency,
            )
            emitted += k
            if bool(np.asarray(state.done).all()):
                break

    def synthesize(self, inputs_embeds, attn_mask, trailing_text,
                   tts_pad_embed, key, context_codes=None,
                   context_lens=None) -> Tuple[List[np.ndarray], float]:
        """Run the stream to completion; returns (per-sample wavs trimmed to
        their generated lengths, first-packet latency in seconds)."""
        up = self.vocoder_cfg.total_upsample
        packets = []
        first_latency = None
        for pkt in self.run(inputs_embeds, attn_mask, trailing_text,
                            tts_pad_embed, key, context_codes=context_codes,
                            context_lens=context_lens):
            if first_latency is None:
                first_latency = pkt.latency_s
            packets.append(pkt)
        B = packets[0].wav.shape[0]
        full = np.concatenate([p.wav for p in packets], axis=-1)
        lengths = sum(p.active_frames for p in packets)
        wavs = [full[b, :int(lengths[b]) * up] for b in range(B)]
        return wavs, float(first_latency if first_latency is not None else 0.0)
