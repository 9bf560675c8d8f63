"""Continuous batched serving: slot-based KV cache with per-slot progress.

The reference has no serving layer (SURVEY.md §1: static left-padded batches,
Gradio queue concurrency).  This engine is the TPU-native equivalent of a
mini inference server (SURVEY.md §7 north star):

- a fixed pool of `num_slots` sequences shares one preallocated KV cache;
- each slot carries its own prefill length, frame counter, rope position,
  presence set and done flag — all device-resident;
- `serve_step` advances EVERY active slot one frame in a single jitted
  program (inactive slots are masked, their compute is wasted but the shapes
  stay static);
- admission runs a per-request prefill (bucketed lengths) and scatters the
  new K/V block + metadata into the slot;
- the host loop drains finished slots and re-admits queued requests, so
  throughput tracks the number of concurrently active utterances instead of
  the slowest member of a static batch.
"""

from __future__ import annotations

import queue
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TalkerConfig
from ..models.talker import (KVCache, StackDims, code_predictor_frame,
                             decoder_stack)
from ..ops.attention import mask_to_bias
from ..ops.rope import default_inv_freq, rope_tables
from ..weights import matmul_t
from ..ops.sampling import process_and_sample
from .generate import GenerationConfig, suppress_mask_for

Params = Dict[str, Any]


class SlotState(NamedTuple):
    cache: KVCache            # (L, B, S, Hkv, D)
    kv_valid: jax.Array       # (B, S) bool — attendable slots
    active: jax.Array         # (B,) bool — slot holds a live request
    code0: jax.Array          # (B,) pending codebook-0 token
    last_hidden: jax.Array    # (B, 1, H)
    presence: jax.Array       # (B, V) bool
    done: jax.Array           # (B,) — reached EOS (slot still occupied)
    t: jax.Array              # (B,) frames generated
    prefill_len: jax.Array    # (B,)
    seq_lens: jax.Array       # (B,) real (unpadded) prefill length
    trailing: jax.Array       # (B, Tt, H)
    trailing_len: jax.Array   # (B,)
    tts_pad: jax.Array        # (1, 1, H)


def init_slot_state(cfg: TalkerConfig, num_slots: int, max_len: int,
                    max_trailing: int, dtype=jnp.bfloat16) -> SlotState:
    dims = StackDims.from_talker(cfg)
    B, S, H = num_slots, max_len, cfg.hidden_size
    return SlotState(
        cache=KVCache.zeros(cfg.num_hidden_layers, B, S, dims.kv_heads,
                            dims.head_dim, dtype=dtype),
        kv_valid=jnp.zeros((B, S), bool),
        active=jnp.zeros((B,), bool),
        code0=jnp.zeros((B,), jnp.int32),
        last_hidden=jnp.zeros((B, 1, H), dtype),
        presence=jnp.zeros((B, cfg.vocab_size), bool),
        done=jnp.zeros((B,), bool),
        t=jnp.zeros((B,), jnp.int32),
        prefill_len=jnp.zeros((B,), jnp.int32),
        seq_lens=jnp.zeros((B,), jnp.int32),
        trailing=jnp.zeros((B, max_trailing, H), dtype),
        trailing_len=jnp.zeros((B,), jnp.int32),
        tts_pad=jnp.zeros((1, 1, H), dtype),
    )


@partial(jax.jit, static_argnames=("cfg", "gen_cfg"), donate_argnums=(2,))
def admit_request(params: Params, cfg: TalkerConfig, state: SlotState,
                  gen_cfg: GenerationConfig, slot: jax.Array,
                  inputs_embeds: jax.Array, attn_mask: jax.Array,
                  trailing: jax.Array, trailing_len: jax.Array,
                  tts_pad: jax.Array, key: jax.Array) -> SlotState:
    """Prefill one request (batch 1) and install it into `slot`."""
    from ..models.talker import talker_prefill

    T = inputs_embeds.shape[1]
    S = state.cache.k.shape[2]
    dims = StackDims.from_talker(cfg)
    tmp = KVCache.zeros(cfg.num_hidden_layers, 1, T, dims.kv_heads,
                        dims.head_dim, dtype=inputs_embeds.dtype)
    logits, hidden_seq, tmp = talker_prefill(params, cfg, inputs_embeds,
                                             attn_mask, tmp)
    key, sub = jax.random.split(key)
    presence0 = jnp.zeros((cfg.vocab_size,), bool)
    code0 = process_and_sample(
        logits, sub, gen_cfg.sampling, presence=presence0[None],
        suppress_mask=suppress_mask_for(cfg),
        ban_eos=jnp.array([True]), eos_id=cfg.codec_eos_token_id)[0]

    k_new = jax.lax.dynamic_update_slice(
        state.cache.k, tmp.k.astype(state.cache.k.dtype)[:, :1],
        (0, slot, 0, 0, 0))
    v_new = jax.lax.dynamic_update_slice(
        state.cache.v, tmp.v.astype(state.cache.v.dtype)[:, :1],
        (0, slot, 0, 0, 0))

    kv_valid_row = jnp.zeros((S,), bool)
    kv_valid_row = jax.lax.dynamic_update_slice(
        kv_valid_row, attn_mask[0].astype(bool), (0,))
    Tt = state.trailing.shape[1]
    trail_row = jnp.zeros((Tt, state.trailing.shape[2]), state.trailing.dtype)
    trail_row = jax.lax.dynamic_update_slice(
        trail_row, trailing[0].astype(state.trailing.dtype), (0, 0))

    return state._replace(
        cache=KVCache(k_new, v_new),
        kv_valid=state.kv_valid.at[slot].set(kv_valid_row),
        active=state.active.at[slot].set(True),
        code0=state.code0.at[slot].set(code0),
        last_hidden=state.last_hidden.at[slot].set(
            hidden_seq[:, -1:, :][0].astype(state.last_hidden.dtype)),
        presence=state.presence.at[slot].set(False),
        done=state.done.at[slot].set(False),
        t=state.t.at[slot].set(0),
        prefill_len=state.prefill_len.at[slot].set(T),
        seq_lens=state.seq_lens.at[slot].set(
            jnp.sum(attn_mask[0]).astype(jnp.int32)),
        trailing=state.trailing.at[slot].set(trail_row),
        trailing_len=state.trailing_len.at[slot].set(trailing_len),
        tts_pad=jnp.asarray(tts_pad, state.tts_pad.dtype),
    )


def _decoder_stack_scatter(stacked: Params, norm: Params, dims: StackDims,
                           h: jax.Array, cos, sin, mask_bias: jax.Array,
                           cache: KVCache, slot_index: jax.Array,
                           attend_len: Optional[int] = None
                           ) -> Tuple[jax.Array, KVCache]:
    """decoder_stack variant for T=1 with a *per-slot* write index."""
    from ..ops.norms import rms_norm
    from ..ops.rope import apply_rope

    B = h.shape[0]
    rows = jnp.arange(B)
    nq = dims.heads * dims.head_dim
    nkv = dims.kv_heads * dims.head_dim
    S_att = cache.k.shape[2] if attend_len is None else attend_len

    # caches ride in the carry (in-place loop buffers) — see decoder_stack
    def body(carry, xs):
        hh, kfull, vfull = carry
        lp, idx = xs
        attn = lp["self_attn"]
        x = rms_norm(hh, lp["input_layernorm"]["weight"], dims.eps)
        qkv = matmul_t(x, attn["qkv_proj"]["weight"])
        q = qkv[..., :nq].reshape(B, 1, dims.heads, dims.head_dim)
        k = qkv[..., nq:nq + nkv].reshape(B, 1, dims.kv_heads, dims.head_dim)
        v = qkv[..., nq + nkv:].reshape(B, 1, dims.kv_heads, dims.head_dim)
        q = rms_norm(q, attn["q_norm"]["weight"], dims.eps)
        k = rms_norm(k, attn["k_norm"]["weight"], dims.eps)
        q, k = apply_rope(q, k, cos, sin)

        kfull = kfull.at[idx, rows, slot_index].set(k[:, 0].astype(kfull.dtype))
        vfull = vfull.at[idx, rows, slot_index].set(v[:, 0].astype(vfull.dtype))

        from ..ops.attention import attention

        k_att = jax.lax.dynamic_slice(
            kfull, (idx, 0, 0, 0, 0),
            (1, B, S_att, dims.kv_heads, dims.head_dim))[0]
        v_att = jax.lax.dynamic_slice(
            vfull, (idx, 0, 0, 0, 0),
            (1, B, S_att, dims.kv_heads, dims.head_dim))[0]
        o = attention(q, k_att.astype(x.dtype), v_att.astype(x.dtype), mask_bias)
        o = matmul_t(o.reshape(B, 1, dims.heads * dims.head_dim), attn["o_proj"]["weight"])
        hh = hh + o
        x = rms_norm(hh, lp["post_attention_layernorm"]["weight"], dims.eps)
        mlp = lp["mlp"]
        w_gu = mlp["gate_up_proj"]["weight"]
        inter = (w_gu["q"] if isinstance(w_gu, dict) else w_gu).shape[-2] // 2
        gu = matmul_t(x, w_gu)
        hh = hh + matmul_t(jax.nn.silu(gu[..., :inter]) * gu[..., inter:],
                           mlp["down_proj"]["weight"])
        return (hh, kfull, vfull), None

    n_layers = cache.k.shape[0]
    (h, k_new, v_new), _ = jax.lax.scan(
        body, (h, cache.k, cache.v), (stacked, jnp.arange(n_layers)))
    h = rms_norm(h, norm["weight"], dims.eps)
    return h, KVCache(k_new, v_new)


def _serve_step_core(params: Params, cfg: TalkerConfig, state: SlotState,
               gen_cfg: GenerationConfig, key: jax.Array,
               attend_len: Optional[int] = None
               ) -> Tuple[SlotState, jax.Array, jax.Array]:
    """Advance every slot one frame.

    `attend_len` is a static host-chosen bucket bounding the attended KV
    window (covers the longest live slot).

    Returns (state, frames (B, Q), emitted (B,) bool — frame rows valid for
    slots that were active and not done).
    """
    eos = cfg.codec_eos_token_id
    B = state.code0.shape[0]
    S = state.cache.k.shape[2] if attend_len is None else attend_len
    dims = StackDims.from_talker(cfg)
    dtype = state.last_hidden.dtype
    suppress = suppress_mask_for(cfg)

    now_done = state.done | (state.code0 == eos)
    emit = state.active & ~now_done
    presence = state.presence.at[jnp.arange(B), state.code0].set(
        state.presence[jnp.arange(B), state.code0] | emit)

    code0_embed = jnp.take(params["codec_embedding"], state.code0, axis=0
                           )[:, None, :].astype(dtype)
    key, k1, k2 = jax.random.split(key, 3)
    sub_codes, sub_emb_sum = code_predictor_frame(
        params, cfg, state.last_hidden, code0_embed, k1, gen_cfg.subtalker)
    frames = jnp.concatenate([state.code0[:, None], sub_codes], axis=1)

    # dual-track merge with per-slot trailing index
    Tt = state.trailing.shape[1]
    idx = jnp.minimum(state.t, Tt - 1)
    text_h = jnp.take_along_axis(state.trailing, idx[:, None, None], axis=1)
    use_pad = (state.t >= state.trailing_len)[:, None, None]
    text_h = jnp.where(use_pad, jnp.broadcast_to(state.tts_pad, text_h.shape),
                       text_h)
    embed = code0_embed + sub_emb_sum + text_h.astype(dtype)

    cache_index = state.prefill_len + state.t      # (B,)
    slot = jnp.arange(S)[None, :]
    kv_valid = state.kv_valid[:, :S] | (
        (slot >= state.prefill_len[:, None]) & (slot <= cache_index[:, None]))
    bias = mask_to_bias(kv_valid[:, None, None, :])
    position = state.seq_lens + state.t
    inv_freq = default_inv_freq(dims.head_dim, cfg.rope_theta)
    cos, sin = rope_tables(position[:, None], inv_freq)

    h, cache = _decoder_stack_scatter(params["layers"], params["norm"], dims,
                                      embed, cos, sin, bias, state.cache,
                                      cache_index, attend_len=attend_len)
    logits = matmul_t(h[:, 0].astype(jnp.float32), params["codec_head"])
    ban = state.t + 1 < gen_cfg.min_new_tokens
    next_code0 = process_and_sample(logits, k2, gen_cfg.sampling,
                                    presence=presence, suppress_mask=suppress,
                                    ban_eos=ban, eos_id=eos)
    state = state._replace(
        cache=cache,
        code0=jnp.where(emit, next_code0, state.code0),
        last_hidden=jnp.where(emit[:, None, None], h, state.last_hidden),
        presence=presence,
        done=now_done,
        t=state.t + emit.astype(jnp.int32),
    )
    return state, frames, emit


serve_step = partial(jax.jit, static_argnames=("cfg", "gen_cfg", "attend_len"),
                     donate_argnums=(2,))(_serve_step_core)


@partial(jax.jit, static_argnames=("cfg", "gen_cfg", "attend_len", "ticks"),
         donate_argnums=(2,))
def serve_chunk(params: Params, cfg: TalkerConfig, state: SlotState,
                gen_cfg: GenerationConfig, key: jax.Array, ticks: int,
                attend_len: Optional[int] = None
                ) -> Tuple[SlotState, jax.Array, jax.Array]:
    """Advance every slot `ticks` frames in one device program (the host
    syncs once per chunk instead of once per frame).

    Returns (state, frames (B, ticks, Q), emit (B, ticks))."""
    keys = jax.random.split(key, ticks)

    def body(state, k):
        state, frames, emit = _serve_step_core(params, cfg, state, gen_cfg,
                                               k, attend_len)
        return state, (frames, emit)

    state, (frames, emit) = jax.lax.scan(body, state, keys)
    return state, jnp.swapaxes(frames, 0, 1), jnp.swapaxes(emit, 0, 1)


@dataclass
class Request:
    request_id: int
    inputs_embeds: jax.Array     # (1, T, H)
    attn_mask: jax.Array         # (1, T)
    trailing: jax.Array          # (1, Tt, H)
    trailing_len: int
    tts_pad: jax.Array
    max_frames: int = 2047


@dataclass
class Completion:
    request_id: int
    codes: np.ndarray            # (frames, Q)


class ContinuousBatchingEngine:
    """Host scheduler around serve_step/admit_request."""

    def __init__(self, params: Params, cfg: TalkerConfig,
                 gen_cfg: GenerationConfig, num_slots: int = 8,
                 max_len: int = 3072, max_trailing: int = 512,
                 dtype=jnp.bfloat16, seed: int = 0,
                 ticks_per_sync: int = 8):
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        self.state = init_slot_state(cfg, num_slots, max_len, max_trailing,
                                     dtype)
        self.num_slots = num_slots
        self.key = jax.random.PRNGKey(seed)
        self.ticks_per_sync = ticks_per_sync
        self.slot_req: List[Optional[Request]] = [None] * num_slots
        self.slot_frames: List[List[np.ndarray]] = [[] for _ in range(num_slots)]
        self.pending: "queue.Queue[Request]" = queue.Queue()

    def submit(self, req: Request) -> None:
        self.pending.put(req)

    def _try_admit(self) -> None:
        for slot in range(self.num_slots):
            if self.slot_req[slot] is not None:
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            T = req.inputs_embeds.shape[1]
            S = self.state.cache.k.shape[2]
            if T >= S:
                raise ValueError(
                    f"prompt length {T} exceeds engine max_len {S}")
            # bound generation by the remaining cache capacity
            req.max_frames = min(req.max_frames, S - T - 1)
            self.key, sub = jax.random.split(self.key)
            self.state = admit_request(
                self.params, self.cfg, self.state, self.gen_cfg,
                jnp.int32(slot), req.inputs_embeds, req.attn_mask,
                req.trailing, jnp.int32(req.trailing_len), req.tts_pad, sub)
            self.slot_req[slot] = req
            self.slot_frames[slot] = []

    def step(self) -> List[Completion]:
        """One engine tick: admit, advance all slots `ticks_per_sync` frames
        on device, then drain finished slots (one host sync per chunk)."""
        self._try_admit()
        if not any(r is not None for r in self.slot_req):
            return []
        self.key, sub = jax.random.split(self.key)
        # static attention bucket covering the furthest live slot by chunk end
        S = self.state.cache.k.shape[2]
        ticks = self.ticks_per_sync
        max_idx = int(np.asarray(self.state.prefill_len + self.state.t).max())
        attend = min(S, ((max_idx + ticks + 1 + 255) // 256) * 256)
        self.state, frames, emit = serve_chunk(self.params, self.cfg,
                                               self.state, self.gen_cfg, sub,
                                               ticks, attend_len=attend)
        frames = np.asarray(frames)   # (B, ticks, Q)
        emit = np.asarray(emit)       # (B, ticks)
        done = np.asarray(self.state.done)
        completions: List[Completion] = []
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            for t in range(ticks):
                if emit[slot, t] and len(self.slot_frames[slot]) < req.max_frames:
                    self.slot_frames[slot].append(frames[slot, t])
            finished = done[slot] or len(self.slot_frames[slot]) >= req.max_frames
            if finished:
                codes = (np.stack(self.slot_frames[slot])
                         if self.slot_frames[slot]
                         else np.zeros((0, self.cfg.num_code_groups), np.int64))
                completions.append(Completion(req.request_id, codes))
                self.slot_req[slot] = None
                self.slot_frames[slot] = []
                self.state = self.state._replace(
                    active=self.state.active.at[slot].set(False))
        return completions

    def run_until_drained(self, max_ticks: int = 100000) -> List[Completion]:
        out: List[Completion] = []
        for _ in range(max_ticks):
            out.extend(self.step())
            if self.pending.empty() and all(r is None for r in self.slot_req):
                break
        return out
