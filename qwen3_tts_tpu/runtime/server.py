"""Text-in → audio-out serving over the continuous-batching engine.

The reference outsources high-performance serving to external vLLM-Omni
(reference README.md:432-457); its own demo serializes requests through a
Gradio queue.  This module owns that layer: it bridges the public text API
(`Qwen3TTSModel` prompt assembly) into `ContinuousBatchingEngine` and turns
the engine's per-tick frames into per-request audio:

  text request ─ build_prompt ─► engine (staged prefill, slot decode)
       ─ frame_sink ─► per-request code history ─► batched chunk vocoder
       ─► AudioPacket stream / AudioResult

Egress design (TPU-shaped):
- ONE fixed-shape vocoder program per emission: every due request becomes a
  row of a (num_slots, Q, left_context + packet_frames) batch; per-row
  context length c_i = min(25, frames already decoded) occupies the row's
  prefix, the new k_i frames follow, the tail is zero (the vocoder stack is
  causal, so right padding never reaches the emitted samples
  [c_i*up, (c_i+k_i)*up)).  This keeps the per-request semantics of
  `StreamingSession` (reference chunked_decode left-context-25 semantics,
  modeling...v2.py:886-896) while paying one program launch + one D2H sync
  for the whole wave — per-request vocode calls would burn a ~32 ms host
  round trip each on tunnel-attached chips.
- Packets are cut on a global cadence (`packet_frames`, default 25 = 2 s of
  audio) with an immediate first packet per request for latency; completions
  flush the remainder.
- Voice-clone requests use their reference codes as per-request vocoder
  left context (so clone timbre survives into the first packet) — and since
  context is per row, mixed ICL / x-vector waves keep per-request context.

Non-streaming requests skip packet egress entirely: their codes decode once
at completion through `Qwen3TTSTokenizer.decode` (ref-code prepend and the
proportional wav-prefix cut for clones, reference qwen3_tts_model.py:612-632).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.codec12.decoder import decode_frames as vocoder_decode
from .batching import ContinuousBatchingEngine, Request
from .generate import GenerationConfig


@dataclass
class AudioPacket:
    """One streamed audio chunk for one request."""

    request_id: Any
    wav: np.ndarray        # (samples,) float32
    sample_rate: int
    frame_start: int       # first generated-frame index covered
    frame_count: int
    final: bool            # True on the request's last packet


@dataclass
class AudioResult:
    """Final synthesis of a non-streaming request."""

    request_id: Any
    wav: np.ndarray        # (samples,) float32
    sample_rate: int


@dataclass
class _ReqState:
    request_id: Any
    stream: bool
    # full code history (list of (Q,) frames): ctx0 pre-existing context
    # frames (clone refs) followed by generated frames
    history: List[np.ndarray] = field(default_factory=list)
    ctx0: int = 0
    emitted: int = 0          # generated frames already vocoded into packets
    ref_code: Optional[np.ndarray] = None   # full ref codes (clone decode)
    done: bool = False
    first_sent: bool = False


@partial(jax.jit, static_argnames=("L", "Tt"))
def _bucket_pad(prompt, trailing, L: int, Tt: int):
    T = prompt.shape[1]
    p = jnp.pad(prompt, ((0, 0), (L - T, 0), (0, 0)))        # left pad
    t = jnp.pad(trailing, ((0, 0), (0, Tt - trailing.shape[1]), (0, 0)))
    return p, t


def _bucket_request(prompt, trailing, bucket: int = 16):
    """Pad a (1, T, H) prompt / (1, Tt, H) trailing to length buckets with
    an explicit attention mask — the engine is mask-aware, so padded slots
    are never attended and rope positions follow the mask."""
    T, Tt = prompt.shape[1], trailing.shape[1]
    L = ((T + bucket - 1) // bucket) * bucket
    Tb = ((Tt + bucket - 1) // bucket) * bucket
    mask = np.zeros((1, L), np.int32)
    mask[0, L - T:] = 1
    p, t = _bucket_pad(prompt, trailing, L, Tb)
    return p, jnp.asarray(mask), t


@partial(jax.jit, static_argnames=("B", "ticks", "Q", "F", "T"))
def _first_packet_extract(aux, rids, B: int, ticks: int, Q: int, F: int,
                          T: int):
    """Pull each waiting request's first frames out of a chunk aux that is
    still ON DEVICE (runtime/batching.py serve_chunk's packed layout),
    without waiting for its device->host sync.

    aux: flat int32 chunk aux; rids: (N,) int32 engine request ids awaiting
    their first packet (-1 padding never matches).  A request occupies
    exactly one slot for a whole chunk (slot reuse installs a fresh rid)
    and emits contiguous ticks from its install, so its frames are
    frames[slot, t0:t0+count].  Returns (codes (N, Q, T) int32 — row
    content in [:count], zeros after, the exact layout `_emit_packets`
    builds for a first packet (ctx 0) — and counts (N,) int32 clamped to
    F; 0 = no frames for that rid in this chunk, emit nothing)."""
    n_bt = B * ticks
    frames = aux[:n_bt * Q].reshape(B, ticks, Q)
    emit = aux[n_bt * Q:n_bt * Q + n_bt].reshape(B, ticks) != 0
    req_id = aux[n_bt * Q + n_bt:n_bt * Q + 2 * n_bt].reshape(B, ticks)
    m = (req_id[None] == rids[:, None, None]) & emit[None]     # (N, B, ticks)
    per_slot = m.any(-1)                                       # (N, B)
    slot = jnp.argmax(per_slot, axis=1)                        # (N,)
    mt = jnp.take_along_axis(
        m, slot[:, None, None], axis=1)[:, 0]                  # (N, ticks)
    t0 = jnp.argmax(mt, axis=1)
    count = jnp.minimum(jnp.sum(mt, axis=1), F).astype(jnp.int32)
    rows = frames[slot]                                        # (N, ticks, Q)
    idx = jnp.clip(t0[:, None] + jnp.arange(F)[None], 0, ticks - 1)
    sel = jnp.take_along_axis(rows, idx[:, :, None], axis=1)   # (N, F, Q)
    sel = jnp.where(jnp.arange(F)[None, :, None] < count[:, None, None],
                    sel, 0)
    codes = jnp.zeros((rids.shape[0], Q, T), jnp.int32)
    codes = codes.at[:, :, :F].set(jnp.swapaxes(sel, 1, 2))
    return codes, count


@partial(jax.jit, static_argnames=("cfg", "F", "pcm16"))
def _vocode_rows_compact(dec_params, cfg, codes, ctx, F: int, pcm16=False):
    """codes (N, Q, C+F) int32; ctx (N,) int32 = context frames per row.

    Vocode the whole batch, then gather each row's EMITTED span
    [c_i*up, (c_i+F)*up) on device so only (N, F*up) samples cross the
    device->host link — shipping the full (N, (C+F)*up) wave (context and
    all) was 120-600 ms of tunnel transfer per packet wave and dominated
    multi-tenant first-packet latency.  Rows are shifted so the first new
    frame lands at sample 0; callers cut [0, k_i*up)."""
    wav = vocoder_decode(dec_params, cfg, jnp.clip(codes, 0, None))[:, 0, :]
    up = wav.shape[-1] // codes.shape[-1]

    def cut(row, c):
        return jax.lax.dynamic_slice_in_dim(row, c * up, F * up)

    out = jax.vmap(cut)(wav, ctx)
    if pcm16:
        from ..models.codec12.decoder import to_pcm16

        out = to_pcm16(out)
    return out


class TTSServer:
    """Single-threaded text-level server: submit_* then step()/drain().

    Construct via `TTSServer(model, ...)` from a loaded `Qwen3TTSModel`
    (the speech tokenizer must carry the 12 Hz vocoder).  All JAX work stays
    on the calling thread; wrap with `ThreadedTTSServer` for concurrent
    producers (HTTP handlers).

    `vocoder_device`: optional `jax.Device` to dedicate to the vocoder
    (packet egress + completion decode).  On a multi-device host this
    overlaps vocoding with the talker ticks (independent per-device dispatch
    queues) instead of taxing the serving chip; results are bit-identical.
    """

    def __init__(self, model, num_slots: int = 16,
                 max_new_tokens: Optional[int] = None,
                 prefill_bucket: int = 128,
                 max_trailing: int = 512,
                 packet_frames: int = 25,
                 left_context: int = 25,
                 ticks_per_sync: int = 8,
                 first_packet_ticks: int = 4,
                 seed: int = 0,
                 overrides: Optional[Dict[str, Any]] = None,
                 metrics=None,
                 output_dtype: str = "float32",
                 vocoder_device=None,
                 fast_first_packet: bool = True,
                 defer_bulk_egress: bool = True,
                 **engine_kwargs):
        tok = model.speech_tokenizer
        if tok is None or tok.dec_params is None:
            raise RuntimeError(
                "TTSServer requires a loaded 12Hz speech tokenizer (vocoder)")
        self.model = model
        kw = model._merge_generate_kwargs(**(overrides or {}))
        if max_new_tokens is not None:
            kw["max_new_tokens"] = max_new_tokens
        # The SERVER defaults the serve step to the XLA path, overriding
        # the model's int8-on-TPU fused_talker_step auto-default: on the
        # engine-only throughput row the two implementations trade wins
        # within window noise (fused/xla across r5 windows: 135/192,
        # 210/264, 161/167, 221/189), but on the server's latency surface
        # the fused path consistently costs ~+350 ms late-join first
        # packet (300 ms xla vs 665 ms fused, same-day windows) — the
        # latency-ordered step is what a server sells.  Pass
        # overrides={"fused_talker_step": True} to opt back in (e.g. a
        # pure-throughput batch deployment).
        if "fused_talker_step" not in (overrides or {}):
            kw["fused_talker_step"] = False
        self.gen_cfg: GenerationConfig = model._generation_config(kw)
        self.dec_params = tok.dec_params
        self._decode_tok = tok
        # On a multi-device host, pin ALL vocoder programs (packet egress +
        # completion decode) to a dedicated device: devices execute their
        # async dispatch queues independently, so vocoding overlaps the
        # talker ticks instead of competing for the serving chip
        # (single-chip serving pays the vocoder as a tick-time tax; see
        # ROADMAP "second-chip vocoder").  Weights are copied once at
        # construction; per-packet code batches are tiny (N*Q*T int32).
        self.vocoder_device = vocoder_device
        if vocoder_device is not None:
            import copy

            self.dec_params = jax.device_put(tok.dec_params, vocoder_device)
            self._decode_tok = copy.copy(tok)   # module-level jits: caches
            self._decode_tok.dec_params = self.dec_params   # are shared
        self.dec_cfg = tok.config.decoder_config
        self.sample_rate = tok.get_output_sample_rate()
        self.up = int(self.dec_cfg.total_upsample)
        self.packet_frames = int(packet_frames)
        self.left_context = int(left_context)
        # while any streaming request awaits its FIRST packet, cap engine
        # chunks at this many ticks so those frames reach the host in
        # ~first_packet_ticks tick-times instead of a full ticks_per_sync
        # chunk — the dual-track latency story under multi-tenant load.
        # Chunk length is dynamic data to the compiled serve program, so any
        # cap value reuses the warm executables.  0 disables
        # (pure-throughput serving); non-streaming requests never engage
        # the cap.
        self.first_packet_ticks = int(first_packet_ticks)
        # first packets vocode straight from the chunk's ON-DEVICE aux
        # (extract program + the same warm vocoder shape the host path
        # uses), so their wav device->host transfer overlaps the aux sync
        # instead of queueing behind it — one fewer serialized round trip
        # on the multi-tenant first-packet path.  Disabled when the vocoder
        # lives on another device (the aux is on the serving chip; a
        # device-to-device bounce would cost more than it saves).
        self.fast_first_packet = bool(fast_first_packet) and \
            vocoder_device is None
        # while any stream awaits its FIRST packet, steady-state streams'
        # packet vocodes are deferred (unless their backlog exceeds
        # 3*packet_frames): a bulk egress wave is ~num_slots*packet_frames
        # frames of synchronous vocoder time (hundreds of ms of device
        # queue) serialized onto the joiner's critical path, and steady
        # consumers hold >= packet_frames of buffered audio so an
        # occasionally late packet is jitter, not a stall.  This was the
        # dominant term in late-join first-packet latency (r4 bench:
        # staged->first_frame 754 ms of a 875 ms total).
        self.defer_bulk_egress = bool(defer_bulk_egress)
        self._defer_now = False
        self.num_slots = num_slots
        if output_dtype not in ("float32", "int16"):
            raise ValueError(f"unsupported output_dtype {output_dtype!r}")
        # "int16": PCM16 converted on device — halves/quarters the audio
        # device->host transfer (the delivery format for serving)
        self.output_dtype = output_dtype
        dtype = model.talker_params["codec_embedding"].dtype
        max_len = prefill_bucket + self.gen_cfg.max_new_tokens + 8
        self.engine = ContinuousBatchingEngine(
            model.talker_params, model.config.talker_config, self.gen_cfg,
            num_slots=num_slots, max_len=max_len, max_trailing=max_trailing,
            dtype=dtype, seed=seed, ticks_per_sync=ticks_per_sync,
            prefill_bucket=prefill_bucket, metrics=metrics, **engine_kwargs)
        self.engine.frame_sink = self._on_frames
        self.metrics = self.engine.metrics
        self._states: Dict[int, _ReqState] = {}
        self._by_user_id: Dict[Any, int] = {}
        self._next_rid = 0
        self._Q = model.config.talker_config.num_code_groups

    def warmup(self, verbose: bool = False) -> float:
        """Precompile the serving-critical program set: every serve-chunk
        attend bucket (engine AOT cache), the staging-prefill request-count
        buckets, and every packet-egress vocoder shape.  One-time startup
        cost; without it, live traffic pays multi-second program loads the
        first time each shape is hit (the late-joiner latency tail).
        Returns seconds spent."""
        import time as _time

        t0 = _time.time()
        self.engine.warmup_serve(verbose=verbose)
        self.engine.warmup_staging()
        n, combos = 1, []
        while n < self.num_slots:
            combos.append(n)
            n <<= 1
        combos.append(self.num_slots)
        fset = sorted({self._frame_bucket(1),
                       self._frame_bucket(self.packet_frames)})
        for N in sorted(set(combos)):
            for F in fset:
                T = self.left_context + F
                codes = (jnp.zeros((N, self._Q, T), jnp.int32)
                         if self.vocoder_device is None else
                         jax.device_put(np.zeros((N, self._Q, T), np.int32),
                                        self.vocoder_device))
                ctx = (jnp.zeros((N,), jnp.int32)
                       if self.vocoder_device is None else
                       jax.device_put(np.zeros((N,), np.int32),
                                      self.vocoder_device))
                jax.block_until_ready(_vocode_rows_compact(
                    self.dec_params, self.dec_cfg, codes, ctx, F=F,
                    pcm16=self.output_dtype == "int16"))
                if verbose:
                    print(f"[server.warmup] vocode N={N} F={F} done at "
                          f"{_time.time() - t0:.1f}s", flush=True)
        if self.fast_first_packet:
            # the on-device first-packet extract (its vocoder shape is
            # already covered by the sweep above)
            B, ticks = self.engine.num_slots, self.engine.ticks_per_sync
            K = self.engine.state.staged_valid.shape[0]
            n_bt = B * ticks
            aux = jnp.zeros((n_bt * self._Q + 3 * n_bt + 2 * K + B,),
                            jnp.int32)
            F = self._frame_bucket(1)
            for N in sorted(set(combos)):
                jax.block_until_ready(_first_packet_extract(
                    aux, jnp.full((N,), -1, jnp.int32), B=B, ticks=ticks,
                    Q=self._Q, F=F, T=self.left_context + F))
        return _time.time() - t0

    # -- submission ------------------------------------------------------

    @staticmethod
    def _override(base, temperature=None, top_p=None,
                  repetition_penalty=None, do_sample=None, top_k=None):
        import dataclasses

        if all(v is None for v in (temperature, top_p, repetition_penalty,
                                   do_sample, top_k)):
            return None
        return dataclasses.replace(
            base,
            temperature=base.temperature if temperature is None
            else float(temperature),
            top_p=base.top_p if top_p is None else float(top_p),
            repetition_penalty=base.repetition_penalty
            if repetition_penalty is None else float(repetition_penalty),
            do_sample=base.do_sample if do_sample is None else bool(do_sample),
            top_k=base.top_k if top_k is None else int(top_k))

    def _sampling_overrides(self, **kw):
        """Split per-request sampling kwargs into talker and sub-talker
        overrides (engine defaults where None), mirroring the reference's
        flat kwargs surface: temperature/top_p/top_k/do_sample/
        repetition_penalty for the talker, the same names prefixed
        `subtalker_` for the code predictor (qwen3_tts_model.py:287-352).
        Talker top_k must be <= the engine's compiled candidate width; the
        engine validates both at submit."""
        sub_kw = {k[len("subtalker_"):]: v for k, v in kw.items()
                  if k.startswith("subtalker_")}
        talker_kw = {k: v for k, v in kw.items()
                     if not k.startswith("subtalker_")}
        return (self._override(self.gen_cfg.sampling, **talker_kw),
                self._override(self.gen_cfg.subtalker, **sub_kw))

    def _submit_specs(self, request_id, specs, stream: bool,
                      ref_code: Optional[np.ndarray],
                      max_frames: Optional[int], sampling=None,
                      sub_sampling=None) -> None:
        with self.metrics.time("server.submit_s"):
            self._submit_specs_timed(request_id, specs, stream, ref_code,
                                     max_frames, sampling, sub_sampling)

    def _submit_specs_timed(self, request_id, specs, stream: bool,
                            ref_code: Optional[np.ndarray],
                            max_frames: Optional[int], sampling=None,
                            sub_sampling=None) -> None:
        from .prompts import build_prompt

        if request_id in self._by_user_id:
            raise ValueError(f"request id {request_id!r} already in flight")
        (spec,) = specs
        tc = self.model.config.talker_config
        prompt, trailing, pad = build_prompt(self.model.talker_params, tc,
                                             self.model.config, spec)
        # bucket lengths (left-pad prompt, right-pad trailing) so the
        # engine-side per-(T, Tt) padding programs stay a small warmable
        # set instead of one compile key per novel text length
        trailing_len = trailing.shape[1]
        if trailing_len > self.engine.max_trailing:
            # the engine would silently clamp (dual-track merge switches to
            # tts_pad after max_trailing positions) and the tail of the text
            # would never be spoken — reject like the prompt-length check
            raise ValueError(
                f"text trailing length {trailing_len} exceeds the server's "
                f"max_trailing {self.engine.max_trailing}; raise "
                f"max_trailing or split the text")
        prompt, attn_mask, trailing = _bucket_request(
            prompt, trailing, bucket=16)
        rid = self._next_rid
        self._next_rid += 1
        st = _ReqState(request_id=request_id, stream=stream,
                       ref_code=ref_code)
        if stream and ref_code is not None and len(ref_code):
            ctx = np.asarray(ref_code[-self.left_context:], np.int32)
            st.history = [f for f in ctx]
            st.ctx0 = len(st.history)
        mf = self.gen_cfg.max_new_tokens - 1
        if max_frames is not None:
            mf = min(mf, int(max_frames))
        # engine.submit may reject (prompt longer than the prefill bucket):
        # only record server-side state once the engine accepted the request
        self.engine.submit(Request(
            request_id=rid,
            inputs_embeds=prompt,
            attn_mask=attn_mask,
            trailing=trailing,
            trailing_len=trailing_len,
            tts_pad=pad,
            max_frames=mf,
            sampling=sampling,
            sub_sampling=sub_sampling))
        self._states[rid] = st
        self._by_user_id[request_id] = rid
        self.metrics.count("server.submits")

    def submit_custom_voice(self, request_id, text: str, speaker: str,
                            language: Optional[str] = None,
                            instruct: Optional[str] = None,
                            stream: bool = False,
                            max_frames: Optional[int] = None,
                            **sampling_kw) -> None:
        with self.metrics.time("server.specs_s"):
            specs = self.model._specs_custom_voice(
                text, speaker, language, instruct, non_streaming=False)
        self._submit_specs(request_id, specs, stream, None, max_frames,
                           *self._sampling_overrides(**sampling_kw))

    def submit_voice_design(self, request_id, text: str, instruct: str,
                            language: Optional[str] = None,
                            stream: bool = False,
                            max_frames: Optional[int] = None,
                            **sampling_kw) -> None:
        specs = self.model._specs_voice_design(
            text, instruct, language, non_streaming=False)
        self._submit_specs(request_id, specs, stream, None, max_frames,
                           *self._sampling_overrides(**sampling_kw))

    def submit_voice_clone(self, request_id, text: str,
                           language: Optional[str] = None,
                           ref_audio=None, ref_text: Optional[str] = None,
                           x_vector_only_mode: bool = False,
                           voice_clone_prompt=None,
                           stream: bool = False,
                           max_frames: Optional[int] = None,
                           **sampling_kw) -> None:
        specs, items = self.model._specs_voice_clone(
            text, language, ref_audio, ref_text, x_vector_only_mode,
            voice_clone_prompt, non_streaming=False)
        ref_code = items[0].ref_code
        self._submit_specs(request_id, specs, stream,
                           None if ref_code is None else np.asarray(ref_code),
                           max_frames,
                           *self._sampling_overrides(**sampling_kw))

    def abort_all(self) -> None:
        """Drop every in-flight request (engine + server bookkeeping).
        Used after a poisoned step(): the failed requests were already
        notified; without this, `busy` would stay True forever (and the
        threaded worker would spin instead of idling)."""
        for rid in list(self._states):
            try:
                self.engine.cancel(rid)
            except Exception:
                pass    # engine may itself be poisoned; state still clears
        self._states.clear()
        self._by_user_id.clear()

    def cancel(self, request_id) -> bool:
        """Cancel an in-flight request: it never yields further events and
        its engine slot / staging row frees at the next chunk boundary.
        Returns True if the request was known."""
        rid = self._by_user_id.pop(request_id, None)
        if rid is None:
            return False
        self.engine.cancel(rid)   # False if the engine already finished it
        self._states.pop(rid, None)
        self.metrics.count("server.cancels")
        return True

    # -- engine egress ---------------------------------------------------

    def _on_frames(self, rid: int, frames: np.ndarray) -> None:
        st = self._states.get(rid)
        if st is not None:
            st.history.extend(frames.astype(np.int32))

    def _pending(self, st: _ReqState) -> int:
        return len(st.history) - st.ctx0 - st.emitted

    def _due(self, st: _ReqState) -> bool:
        if not st.stream:
            return False
        if self._defer_now and st.first_sent:
            # first packets are in flight: steady streams wait unless their
            # backlog would outgrow the defer bound (see defer_bulk_egress).
            # DONE streams' end-of-stream drains defer too — a finished
            # stream's whole (deferred) backlog is several packet waves of
            # synchronous vocoder time, and its consumer already holds the
            # rest of the utterance; the drain resumes on the next
            # non-waiting step.  A done stream that never got a packet
            # (first_sent False) stays due: its final (possibly empty)
            # packet IS its first.
            return self._pending(st) >= 3 * self.packet_frames
        if st.done:
            return True     # drain remainder (possibly an empty final packet)
        p = self._pending(st)
        if p <= 0:
            return False
        if not st.first_sent:
            return True
        return p >= self.packet_frames

    def _row_bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b <<= 1
        return min(b, self.num_slots)

    def _frame_bucket(self, kmax: int) -> int:
        small = min(4, self.packet_frames)
        return small if kmax <= small else self.packet_frames

    def _emit_packets(self) -> List[AudioPacket]:
        """Vocode every due request as one fixed-shape batched program.

        Shapes are bucketed on BOTH axes — rows to a pow2 (≤ num_slots) and
        new frames to {4, packet_frames} — so a lone first packet runs a
        tiny (1, Q, ctx+4) program and ships ~15 KB instead of riding the
        full (num_slots, Q, ctx+packet) wave; `warmup()` precompiles the
        whole bucket set."""
        out: List[AudioPacket] = []
        while True:
            due = [st for st in self._states.values() if self._due(st)]
            if not due:
                return out
            due = due[:self.num_slots]
            N = self._row_bucket(len(due))
            due = due[:N]
            meta = []
            kmax = 1
            for st in due:
                c = min(self.left_context, st.ctx0 + st.emitted)
                k = min(self._pending(st), self.packet_frames)
                kmax = max(kmax, k)
                meta.append((st, c, k))
            F = self._frame_bucket(kmax)
            T = self.left_context + F
            batch = np.zeros((N, self._Q, T), np.int32)
            ctx = np.zeros((N,), np.int32)
            for i, (st, c, k) in enumerate(meta):
                lo = st.ctx0 + st.emitted - c
                if c + k > 0:
                    rows = np.stack(st.history[lo:lo + c + k])   # (c+k, Q)
                    batch[i, :, :c + k] = rows.T
                ctx[i] = c
            dev = self.vocoder_device
            codes_dev = (jnp.asarray(batch) if dev is None
                         else jax.device_put(batch, dev))
            ctx_dev = (jnp.asarray(ctx) if dev is None
                       else jax.device_put(ctx, dev))
            with self.metrics.time("server.vocode_s"):
                wav = np.asarray(_vocode_rows_compact(
                    self.dec_params, self.dec_cfg, codes_dev, ctx_dev, F=F,
                    pcm16=self.output_dtype == "int16"))
            if self.output_dtype == "float32":
                wav = wav.astype(np.float32)   # host upcast (bf16 vocoders)
            now = None
            for i, (st, c, k) in enumerate(meta):
                final = st.done and (self._pending(st) == k)
                out.append(AudioPacket(
                    request_id=st.request_id,
                    wav=wav[i, :k * self.up],
                    sample_rate=self.sample_rate,
                    frame_start=st.emitted, frame_count=k, final=final))
                st.emitted += k
                if not st.first_sent and self.engine.trace_enabled:
                    if now is None:
                        import time as _t
                        now = _t.time()
                    rid = self._by_user_id.get(st.request_id)
                    if rid is not None:
                        self.engine.trace.setdefault(rid, {}).setdefault(
                            "first_packet", now)
                st.first_sent = True
                self.metrics.count("server.packets")
            # drop fully drained finished requests
            for st, _, _ in meta:
                if st.done and self._pending(st) == 0:
                    rid = self._by_user_id.pop(st.request_id)
                    del self._states[rid]

    def _dispatch_fast_first(self, waiting_rids):
        """Launch the on-device first-packet pipeline (extract from the
        oldest in-flight chunk's aux -> warm vocoder shape) and return
        (rids, wav_dev, counts_dev) — all still on device; the caller syncs
        them AFTER the aux sync so the two transfers overlap."""
        aux, _ = self.engine._unprocessed[0]
        N = self._row_bucket(len(waiting_rids))
        rids = waiting_rids[:N]
        arr = np.full((N,), -1, np.int32)
        arr[:len(rids)] = rids
        F = self._frame_bucket(1)
        T = self.left_context + F
        codes, counts = _first_packet_extract(
            aux, jnp.asarray(arr), B=self.engine.num_slots,
            ticks=self.engine.ticks_per_sync, Q=self._Q, F=F, T=T)
        wav = _vocode_rows_compact(
            self.dec_params, self.dec_cfg, codes,
            jnp.zeros((N,), jnp.int32), F=F,
            pcm16=self.output_dtype == "int16")
        return rids, wav, counts

    def _emit_fast_first(self, rids, wav_dev, counts_dev
                         ) -> List[AudioPacket]:
        """Emit the fast-path first packets (after the aux sync, so state
        bookkeeping — done flags, histories — is current)."""
        out: List[AudioPacket] = []
        counts = np.asarray(counts_dev)
        wav = None
        for j, rid in enumerate(rids):
            st = self._states.get(rid)
            k = int(counts[j])
            if st is None or st.first_sent or k <= 0:
                continue
            if wav is None:
                wav = np.asarray(wav_dev)
                if self.output_dtype == "float32":
                    wav = wav.astype(np.float32)
            final = st.done and (self._pending(st) == k)
            out.append(AudioPacket(
                request_id=st.request_id, wav=wav[j, :k * self.up],
                sample_rate=self.sample_rate,
                frame_start=st.emitted, frame_count=k, final=final))
            st.emitted += k
            st.first_sent = True
            if self.engine.trace_enabled:
                import time as _t
                self.engine.trace.setdefault(rid, {}).setdefault(
                    "first_packet", _t.time())
            self.metrics.count("server.packets")
            self.metrics.count("server.fast_first_packets")
            if st.done and self._pending(st) == 0:
                del self._by_user_id[st.request_id]
                del self._states[rid]
        return out

    def _finish_results(self, completions) -> List[AudioResult]:
        """Decode non-streaming completions (batched) and flag streaming
        completions for the final packet flush."""
        results: List[AudioResult] = []
        decode_batch = []
        for c in completions:
            st = self._states.get(c.request_id)
            if st is None:
                continue
            st.done = True
            if st.stream:
                continue
            codes = np.asarray(c.codes, np.int64)
            ref_len = 0
            if st.ref_code is not None:
                ref = np.asarray(st.ref_code, np.int64)
                codes = np.concatenate([ref, codes], axis=0)
                ref_len = len(ref)
            decode_batch.append((st, codes, ref_len))
        if decode_batch:
            # pow2-bucket the decode batch (dummy 1-frame rows) so completion
            # waves of any size reuse a handful of compiled vocoder shapes
            nb = 1 << (len(decode_batch) - 1).bit_length()
            codes_in = [c for _, c, _ in decode_batch]
            codes_in += [np.zeros((1, self._Q), np.int64)
                         ] * (nb - len(codes_in))
            with self.metrics.time("server.decode_s"):
                wavs, sr = self._decode_tok.decode(
                    [{"audio_codes": c} for c in codes_in],
                    output_dtype=self.output_dtype)
            for (st, codes, ref_len), wav in zip(decode_batch, wavs):
                if ref_len:
                    # proportional ref-prefix cut (reference 612-632)
                    cut = int(ref_len / max(len(codes), 1) * wav.shape[0])
                    wav = wav[cut:]
                results.append(AudioResult(st.request_id, wav, sr))
                rid = self._by_user_id.pop(st.request_id)
                del self._states[rid]
                self.metrics.count("server.results")
        return results

    def first_packet_trace(self, request_id) -> Optional[Dict[str, float]]:
        """Per-request latency breakdown (host wall-clock timestamps) for a
        request submitted while `engine.trace_enabled` was True: submit,
        staged (staging prefill dispatched), first_frame (first frame
        attributed from a chunk aux), first_packet (first AudioPacket
        built).  Pops the trace entry; None if untraced.  The engine key
        survives request completion (the user-id map is dropped on the
        final packet), so this resolves by scanning trace entries too."""
        rid = self._by_user_id.get(request_id)
        if rid is not None:
            return self.engine.trace.pop(rid, None)
        # finished requests: their rid mapping is gone; find by insertion
        # order is impossible without the rid, so callers should read the
        # trace before the final packet — or we fall back to the newest
        # entry that has a first_packet stamp (latency harness pattern:
        # one traced join at a time)
        for rid in sorted(self.engine.trace, reverse=True):
            if "first_packet" in self.engine.trace[rid]:
                return self.engine.trace.pop(rid)
        return None

    # -- driving ---------------------------------------------------------

    def step(self) -> List[Union[AudioPacket, AudioResult]]:
        """One engine step + egress. Returns packets and results in order.

        While any stream awaits its FIRST packet, the step runs in latency
        order: stage pending requests now (their prefills execute behind
        the in-flight chunk), sync the in-flight aux, and vocode due
        packets into an otherwise-idle device queue BEFORE launching the
        next chunk — in throughput order the packet wave executes behind
        the next serve chunk (a whole chunk of queue delay on its wav)."""
        waiting_rids = []
        if self.first_packet_ticks:
            waiting_rids = [rid for rid, st in self._states.items()
                            if st.stream and not st.first_sent]
            self.engine.tick_cap = (self.first_packet_ticks if waiting_rids
                                    else None)
        waiting = bool(waiting_rids)
        self._defer_now = waiting and self.defer_bulk_egress
        events: List[Union[AudioPacket, AudioResult]] = []
        if waiting and self.engine._unprocessed:
            # on-device first-packet pipeline FIRST: its wav transfer then
            # overlaps the aux sync below instead of waiting for the host
            # to rebuild + reupload the same codes.  Gated to rids that
            # (a) need no reference context — clone streams with ctx0 > 0
            # must vocode their first packet WITH the ref-code left context
            # (the host path conditions the vocoder on it; ctx=0 would
            # produce divergent first-packet audio) — and (b) can actually
            # have frames in the oldest in-flight chunk (a chunk launched
            # before the request's staging prefill can only return counts
            # of 0: wasted extract+vocode work plus a serialized sync)
            fast = None
            if self.fast_first_packet:
                fast_rids = [rid for rid in waiting_rids
                             if self._states[rid].ctx0 == 0
                             and self.engine.oldest_chunk_may_contain(rid)]
                if fast_rids:
                    with self.metrics.time("server.fast_dispatch_s"):
                        fast = self._dispatch_fast_first(fast_rids)
            self.engine.stage_now()
            with self.metrics.time("server.latency_sync_s"):
                completions = self.engine.sync_in_flight()
            events.extend(self._finish_results(completions))
            if fast is not None:
                with self.metrics.time("server.emit_fast_s"):
                    events.extend(self._emit_fast_first(*fast))
            events.extend(self._emit_packets())
        with self.metrics.time("server.engine_step_s"):
            completions = self.engine.step()
        events.extend(self._finish_results(completions))
        events.extend(self._emit_packets())
        return events

    @property
    def busy(self) -> bool:
        return bool(self._states or self.engine.pending
                    or self.engine.frames_acc)

    def run_until_drained(self, max_steps: int = 100000
                          ) -> List[Union[AudioPacket, AudioResult]]:
        out: List[Union[AudioPacket, AudioResult]] = []
        for _ in range(max_steps):
            out.extend(self.step())
            if not self.busy:
                return out
        raise RuntimeError("server did not drain within max_steps")


class ThreadedTTSServer:
    """Thread-safe wrapper: producers submit from any thread; a dedicated
    worker thread owns all JAX/engine work and fans events out to
    per-request queues.

    Usage (blocking):      wav, sr = srv.synthesize(task, **kwargs)
    Usage (streaming):     for pkt in srv.synthesize_stream(task, **kwargs)
    """

    def __init__(self, server: TTSServer):
        import queue
        import threading

        self.server = server
        self._submit_q: "queue.Queue" = queue.Queue()
        self._sinks: Dict[Any, "queue.Queue"] = {}
        self._lock = threading.Lock()
        self._next_id = 0
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop = True
        self._thread.join(timeout=30)

    def _loop(self) -> None:
        import queue as _queue
        import time

        while not self._stop:
            worked = False
            while True:
                try:
                    task, rid, kwargs, sink = self._submit_q.get_nowait()
                except _queue.Empty:
                    break
                if task == "__cancel__":
                    # client went away: stop burning chip time on it
                    self.server.cancel(rid)
                    with self._lock:
                        self._sinks.pop(rid, None)
                    worked = True
                    continue
                try:
                    submit = getattr(self.server, f"submit_{task}")
                    submit(rid, **kwargs)
                    with self._lock:
                        self._sinks[rid] = sink
                except Exception as e:  # surface per request, server stays up
                    sink.put(e)
                worked = True
            if self.server.busy:
                try:
                    events = self.server.step()
                except Exception as e:
                    # a poisoned engine step fails every in-flight request;
                    # deliver the error instead of hanging their sinks, and
                    # clear server state so busy doesn't stay True forever
                    with self._lock:
                        sinks, self._sinks = self._sinks, {}
                    for sink in sinks.values():
                        sink.put(e)
                    self.server.abort_all()
                    events = []
                for ev in events:
                    with self._lock:
                        sink = self._sinks.get(ev.request_id)
                    if sink is not None:
                        sink.put(ev)
                        if isinstance(ev, AudioResult) or (
                                isinstance(ev, AudioPacket) and ev.final):
                            sink.put(None)        # end-of-stream marker
                            with self._lock:
                                self._sinks.pop(ev.request_id, None)
                worked = True
            if not worked:
                time.sleep(0.002)

    def _submit(self, task: str, stream: bool, kwargs) -> "Any":
        import queue

        with self._lock:
            rid = self._next_id
            self._next_id += 1
        sink: "queue.Queue" = queue.Queue()
        kwargs = dict(kwargs, stream=stream)
        self._submit_q.put((task, rid, kwargs, sink))
        return rid, sink

    def cancel(self, rid) -> None:
        """Enqueue a cancel for a request returned by _submit; processed on
        the worker thread (which owns all JAX work)."""
        self._submit_q.put(("__cancel__", rid, None, None))

    def synthesize(self, task: str, timeout: float = 600.0, **kwargs):
        """Blocking non-streaming synthesis -> (wav, sample_rate)."""
        _, sink = self._submit(task, stream=False, kwargs=kwargs)
        ev = sink.get(timeout=timeout)
        if isinstance(ev, Exception):
            raise ev
        assert isinstance(ev, AudioResult)
        sink.get(timeout=timeout)   # end-of-stream marker
        return ev.wav, ev.sample_rate

    def synthesize_stream(self, task: str, timeout: float = 600.0, **kwargs):
        """Generator of AudioPacket for one request.  Closing the generator
        early (e.g. the HTTP client disconnected) cancels the request."""
        rid, sink = self._submit(task, stream=True, kwargs=kwargs)
        done = False
        try:
            while True:
                ev = sink.get(timeout=timeout)
                if ev is None:
                    done = True
                    return
                if isinstance(ev, Exception):
                    done = True
                    raise ev
                yield ev
        finally:
            if not done:
                self.cancel(rid)
