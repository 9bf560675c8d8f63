"""Continuous batched serving: slot-based KV cache with on-device admission.

The reference has no serving layer (SURVEY.md §1: static left-padded batches,
Gradio queue concurrency).  This engine is the TPU-native equivalent of a
mini inference server (SURVEY.md §7 north star):

- a fixed pool of `num_slots` sequences shares one preallocated KV cache;
- each slot carries its own prefill length, frame counter, rope position,
  presence set, frame budget, request id and done flag — all device-resident;
- new requests are *staged* in batches: one jitted prefill over a
  (N, prefill_bucket) left-padded batch writes KV blocks + first-token state
  into a staging pool (one program launch per chunk boundary instead of one
  per request);
- `serve_chunk` advances EVERY active slot one frame per tick in a single
  jitted scan; at the top of each tick, staged requests are *installed* into
  free slots on device (a cheap KV block copy under `lax.cond`), so slots
  refill the moment a sequence finishes instead of idling until the next
  host sync;
- the host loop only attributes emitted frames to request ids and collects
  completions — admission no longer serializes on the host.
"""

from __future__ import annotations

import time as _time
from collections import deque
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TalkerConfig
from ..models.talker import (KVCache, StackDims, code_predictor_frame_dispatch,
                             kv_quantize, talker_prefill)
from ..ops.attention import attention, attention_kv_quant, mask_to_bias
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, default_inv_freq, rope_tables
from ..ops.sampling import (SamplingParams, process_and_sample_rows)
from ..weights import matmul_t, weight_rows
from .generate import (ATTEND_BUCKET, GenerationConfig,
                       suppress_mask_for)
from .jit_options import decode_jit

Params = Dict[str, Any]


class SlotState(NamedTuple):
    # ---- live slots ----
    cache: KVCache            # (L, B, S, Hkv, D)
    kv_valid: jax.Array       # (B, S) bool — attendable slots
    active: jax.Array         # (B,) bool — slot holds a live request
    code0: jax.Array          # (B,) pending codebook-0 token
    last_hidden: jax.Array    # (B, 1, H)
    presence: jax.Array       # (B, V) bool
    done: jax.Array           # (B,) — reached EOS / frame budget
    t: jax.Array              # (B,) frames generated
    prefill_len: jax.Array    # (B,) padded prefill length (= bucket)
    seq_lens: jax.Array       # (B,) real (unpadded) prefill length
    trailing: jax.Array       # (B, Tt, H)
    trailing_len: jax.Array   # (B,)
    tts_pad: jax.Array        # (1, 1, H)
    max_frames: jax.Array     # (B,) per-slot frame budget
    req_id: jax.Array         # (B,) request id (-1 = none)
    # per-slot talker sampling [temp, top_p, rep_pen, do_sample, top_k] —
    # requests carry their own sampling like the reference's per-call
    # generate kwargs.  Per-row top_k is a rank mask inside the engine's
    # static candidate width (gen_cfg.sampling.top_k), so it must be <= that
    # width
    sampling: jax.Array       # (B, 5) f32
    # per-slot SUB-talker sampling, same row layout (the reference's
    # subtalker_* generate kwargs, modeling_qwen3_tts.py:2044-2058).  The
    # fused megakernel takes temperature/top_k as data (any k); the XLA
    # path masks per-row k inside gen_cfg.subtalker.top_k's candidate width
    sub_sampling: jax.Array   # (B, 5) f32
    # ---- staging pool (prefilled requests awaiting a free slot) ----
    staged_k: jax.Array           # (L, K, Lp, Hkv, D)
    staged_v: jax.Array           # (L, K, Lp, Hkv, D)
    staged_kv_valid: jax.Array    # (K, Lp) bool
    staged_code0: jax.Array       # (K,)
    staged_hidden: jax.Array      # (K, H)
    staged_seq_len: jax.Array     # (K,)
    staged_trailing: jax.Array    # (K, Tt, H)
    staged_trailing_len: jax.Array  # (K,)
    staged_max_frames: jax.Array  # (K,)
    staged_req_id: jax.Array      # (K,)
    staged_valid: jax.Array       # (K,) bool
    staged_sampling: jax.Array    # (K, 5) f32
    staged_sub_sampling: jax.Array  # (K, 5) f32
    # int8 KV mode only (None otherwise): staging-pool scale buffers
    staged_k_scale: Optional[jax.Array] = None  # (L, K, Lp, Hkv) fp32
    staged_v_scale: Optional[jax.Array] = None


def init_slot_state(cfg: TalkerConfig, num_slots: int, max_len: int,
                    max_trailing: int, dtype=jnp.bfloat16,
                    prefill_bucket: int = 128,
                    staging_rows: Optional[int] = None,
                    kv_quant: bool = False,
                    fused_layout: bool = False) -> SlotState:
    """`fused_layout=True` holds the live cache and staging pools in the
    fused talker-step kernel's (L, B, Hkv, S, D) layout (ops/pallas/
    talker_step.py) for the engine's whole lifetime — the S axis moves from
    position 2 to 3, in both the live cache and the staged KV pools, so
    installs stay straight block copies."""
    dims = StackDims.from_talker(cfg)
    B, S, H = num_slots, max_len, cfg.hidden_size
    K = staging_rows or num_slots
    L, Lp = cfg.num_hidden_layers, prefill_bucket
    kv_dtype = jnp.int8 if kv_quant else dtype
    if fused_layout:
        shape = (L, B, dims.kv_heads, S, dims.head_dim)
        cache = KVCache(
            jnp.zeros(shape, kv_dtype), jnp.zeros(shape, kv_dtype),
            k_scale=(jnp.zeros(shape[:-1], jnp.float32) if kv_quant
                     else None),
            v_scale=(jnp.zeros(shape[:-1], jnp.float32) if kv_quant
                     else None))
        staged_kv_shape = (L, K, dims.kv_heads, Lp, dims.head_dim)
    else:
        cache = KVCache.zeros(L, B, S, dims.kv_heads, dims.head_dim,
                              dtype=dtype, quantized=kv_quant)
        staged_kv_shape = (L, K, Lp, dims.kv_heads, dims.head_dim)
    return SlotState(
        cache=cache,
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
        max_frames=jnp.zeros((B,), jnp.int32),
        req_id=jnp.full((B,), -1, jnp.int32),
        sampling=jnp.zeros((B, 5), jnp.float32),
        sub_sampling=jnp.zeros((B, 5), jnp.float32),
        staged_k=jnp.zeros(staged_kv_shape, kv_dtype),
        staged_v=jnp.zeros(staged_kv_shape, kv_dtype),
        staged_k_scale=(jnp.zeros(staged_kv_shape[:-1], jnp.float32)
                        if kv_quant else None),
        staged_v_scale=(jnp.zeros(staged_kv_shape[:-1], jnp.float32)
                        if kv_quant else None),
        staged_kv_valid=jnp.zeros((K, Lp), bool),
        staged_code0=jnp.zeros((K,), jnp.int32),
        staged_hidden=jnp.zeros((K, H), dtype),
        staged_seq_len=jnp.zeros((K,), jnp.int32),
        staged_trailing=jnp.zeros((K, max_trailing, H), dtype),
        staged_trailing_len=jnp.zeros((K,), jnp.int32),
        staged_max_frames=jnp.zeros((K,), jnp.int32),
        staged_req_id=jnp.full((K,), -1, jnp.int32),
        staged_valid=jnp.zeros((K,), bool),
        staged_sampling=jnp.zeros((K, 5), jnp.float32),
        staged_sub_sampling=jnp.zeros((K, 5), jnp.float32),
    )


@partial(jax.jit, static_argnames=("cfg", "gen_cfg"), donate_argnums=(2,))
def stage_requests(params: Params, cfg: TalkerConfig, state: SlotState,
                   gen_cfg: GenerationConfig, embeds_rows, mask_rows,
                   trailing_rows, meta: jax.Array, tts_pad: jax.Array,
                   key: jax.Array, sampling_rows: jax.Array,
                   sub_sampling_rows: jax.Array) -> SlotState:
    """Prefill a batch of N staged requests and write them into staging pool
    rows (meta[:, 3]; entries with meta[:, 4] == 0 are padding and ignored).

    `embeds_rows`/`mask_rows`/`trailing_rows` are tuples of N device-resident
    pre-padded rows ((Lp, H), (Lp,), (Tt, H)) — requests never round-trip
    through the host (H2D costs ~30 ms latency + ~8 MB/s on remote-tunnel
    backends), and `meta` (N, 5) int32 [req_id, max_frames, trailing_len,
    row, valid] is the single small host upload per staging call.

    One program per N-bucket replaces the former one-prefill-per-request
    admission path; installation into live slots happens inside
    `serve_chunk`'s ticks.
    """
    inputs_embeds = jnp.stack(embeds_rows)
    attn_mask = jnp.stack(mask_rows)
    trailing = jnp.stack(trailing_rows)
    req_ids = meta[:, 0]
    max_frames = meta[:, 1]
    trailing_len = meta[:, 2]
    rows = meta[:, 3]
    row_valid = meta[:, 4].astype(bool)
    N, Lp, H = inputs_embeds.shape
    dims = StackDims.from_talker(cfg)
    K = state.staged_valid.shape[0]

    tmp = KVCache.zeros(cfg.num_hidden_layers, N, Lp, dims.kv_heads,
                        dims.head_dim, dtype=state.last_hidden.dtype,
                        quantized=state.cache.quantized)
    logits, hidden_seq, tmp = talker_prefill(params, cfg, inputs_embeds,
                                             attn_mask, tmp)
    if gen_cfg.fused_talker_step:
        # staged pools mirror the live cache's fused (L, N, Hkv, Lp, D)
        # layout (one transpose per staging call, amortized over the
        # request's whole decode); scales (L, N, Hkv, Lp) in int8-KV mode
        from ..ops.pallas.talker_step import transpose_cache_in

        tmp = tmp._replace(
            k=transpose_cache_in(tmp.k),
            v=transpose_cache_in(tmp.v),
            k_scale=(transpose_cache_in(tmp.k_scale)
                     if tmp.quantized else None),
            v_scale=(transpose_cache_in(tmp.v_scale)
                     if tmp.quantized else None))
    key, sub = jax.random.split(key)
    ban = jnp.full((N,), 0 < gen_cfg.min_new_tokens)
    code0 = process_and_sample_rows(
        logits, sub, sampling_rows, gen_cfg.sampling.top_k,
        presence=jnp.zeros((N, cfg.vocab_size), bool),
        suppress_mask=suppress_mask_for(cfg),
        ban_eos=ban, eos_id=cfg.codec_eos_token_id)

    # order-safe scatter N -> K: per pool row, pick the (unique) source entry
    onehot = row_valid[:, None] & (rows[:, None] == jnp.arange(K)[None, :])
    hit = onehot.any(axis=0)                     # (K,)
    src = jnp.argmax(onehot, axis=0)             # (K,) source index per row

    def merge(pool, new, batch_axis):
        """pool: (..., K, ...); new: (..., N, ...) gathered by src."""
        gathered = jnp.take(new, src, axis=batch_axis)
        shape = [1] * pool.ndim
        shape[batch_axis] = hit.shape[0]
        return jnp.where(hit.reshape(shape), gathered.astype(pool.dtype), pool)

    trail = trailing.astype(state.staged_trailing.dtype)

    return state._replace(
        staged_k=merge(state.staged_k, tmp.k, 1),
        staged_v=merge(state.staged_v, tmp.v, 1),
        staged_k_scale=(merge(state.staged_k_scale, tmp.k_scale, 1)
                        if state.cache.quantized else None),
        staged_v_scale=(merge(state.staged_v_scale, tmp.v_scale, 1)
                        if state.cache.quantized else None),
        staged_kv_valid=merge(state.staged_kv_valid, attn_mask.astype(bool), 0),
        staged_code0=merge(state.staged_code0, code0.astype(jnp.int32), 0),
        staged_hidden=merge(state.staged_hidden, hidden_seq[:, -1, :], 0),
        staged_seq_len=merge(state.staged_seq_len,
                             jnp.sum(attn_mask, axis=-1).astype(jnp.int32), 0),
        staged_trailing=merge(state.staged_trailing, trail, 0),
        staged_trailing_len=merge(state.staged_trailing_len,
                                  trailing_len.astype(jnp.int32), 0),
        staged_max_frames=merge(state.staged_max_frames,
                                max_frames.astype(jnp.int32), 0),
        staged_req_id=merge(state.staged_req_id, req_ids.astype(jnp.int32), 0),
        staged_valid=jnp.where(hit, True, state.staged_valid),
        staged_sampling=merge(state.staged_sampling,
                              sampling_rows.astype(jnp.float32), 0),
        staged_sub_sampling=merge(state.staged_sub_sampling,
                                  sub_sampling_rows.astype(jnp.float32), 0),
        tts_pad=jnp.asarray(tts_pad, state.tts_pad.dtype),
    )


@partial(jax.jit, donate_argnums=(0,))
def _cancel_in_state(state: SlotState, rid: jax.Array) -> SlotState:
    """Kill any live slot holding `rid` and invalidate its staged row.

    Composes after all previously launched chunks (dispatch is in program
    order), so a cancel lands even when the chunk in flight installs the
    request mid-chunk: the install happened in an earlier program, this
    update sees the post-install state."""
    hit = state.req_id == rid
    return state._replace(
        active=state.active & ~hit,
        done=state.done | hit,
        staged_valid=state.staged_valid & (state.staged_req_id != rid))


def _install_all(state: SlotState) -> SlotState:
    """Install staged requests into free slots until either runs out
    (device-side admission). A while_loop, so idle ticks pay one predicate
    and busy ticks install every admissible request with no unroll cost."""

    def can_install(st: SlotState):
        return jnp.any(~st.active) & jnp.any(st.staged_valid)

    def do(st: SlotState) -> SlotState:
        slot = jnp.argmax(~st.active).astype(jnp.int32)
        ridx = jnp.argmax(st.staged_valid).astype(jnp.int32)
        L = st.staged_k.shape[0]
        # staged pools mirror the live cache's axis order past (L, row), so
        # the install is a straight block copy in BOTH layouts: standard
        # (L, K, Lp, Hkv, D) -> (L, B, S, ...) and fused (L, K, Hkv, Lp, D)
        # -> (L, B, Hkv, S, ...)
        blk_size = (L, 1) + st.staged_k.shape[2:]
        Lp = st.staged_kv_valid.shape[1]
        S = st.kv_valid.shape[1]

        kblk = jax.lax.dynamic_slice(st.staged_k, (0, ridx, 0, 0, 0),
                                     blk_size)
        vblk = jax.lax.dynamic_slice(st.staged_v, (0, ridx, 0, 0, 0),
                                     blk_size)
        k_new = jax.lax.dynamic_update_slice(st.cache.k, kblk,
                                             (0, slot, 0, 0, 0))
        v_new = jax.lax.dynamic_update_slice(st.cache.v, vblk,
                                             (0, slot, 0, 0, 0))
        if st.cache.quantized:
            sblk_size = (L, 1) + st.staged_k_scale.shape[2:]
            ks_blk = jax.lax.dynamic_slice(st.staged_k_scale, (0, ridx, 0, 0),
                                           sblk_size)
            vs_blk = jax.lax.dynamic_slice(st.staged_v_scale, (0, ridx, 0, 0),
                                           sblk_size)
            cache_new = KVCache(
                k_new, v_new,
                jax.lax.dynamic_update_slice(st.cache.k_scale, ks_blk,
                                             (0, slot, 0, 0)),
                jax.lax.dynamic_update_slice(st.cache.v_scale, vs_blk,
                                             (0, slot, 0, 0)))
        else:
            cache_new = KVCache(k_new, v_new)
        kv_row = jnp.zeros((S,), bool)
        kv_row = jax.lax.dynamic_update_slice(
            kv_row, st.staged_kv_valid[ridx], (0,))

        return st._replace(
            cache=cache_new,
            kv_valid=st.kv_valid.at[slot].set(kv_row),
            active=st.active.at[slot].set(True),
            code0=st.code0.at[slot].set(st.staged_code0[ridx]),
            last_hidden=st.last_hidden.at[slot].set(
                st.staged_hidden[ridx][None, :].astype(st.last_hidden.dtype)),
            presence=st.presence.at[slot].set(False),
            done=st.done.at[slot].set(False),
            t=st.t.at[slot].set(0),
            prefill_len=st.prefill_len.at[slot].set(Lp),
            seq_lens=st.seq_lens.at[slot].set(st.staged_seq_len[ridx]),
            trailing=st.trailing.at[slot].set(st.staged_trailing[ridx]),
            trailing_len=st.trailing_len.at[slot].set(
                st.staged_trailing_len[ridx]),
            max_frames=st.max_frames.at[slot].set(st.staged_max_frames[ridx]),
            req_id=st.req_id.at[slot].set(st.staged_req_id[ridx]),
            sampling=st.sampling.at[slot].set(st.staged_sampling[ridx]),
            sub_sampling=st.sub_sampling.at[slot].set(
                st.staged_sub_sampling[ridx]),
            staged_valid=st.staged_valid.at[ridx].set(False),
        )

    return jax.lax.while_loop(can_install, do, state)


def _decoder_stack_scatter(stacked: Params, norm: Params, dims: StackDims,
                           h: jax.Array, cos, sin, mask_bias: jax.Array,
                           cache: KVCache, slot_index: jax.Array,
                           attend_len: Optional[int] = None
                           ) -> Tuple[jax.Array, KVCache]:
    """decoder_stack variant for T=1 with a *per-slot* write index."""
    B = h.shape[0]
    rows = jnp.arange(B)
    nq = dims.heads * dims.head_dim
    nkv = dims.kv_heads * dims.head_dim
    S_att = cache.k.shape[2] if attend_len is None else attend_len

    quantized = cache.quantized

    # caches ride in the carry (in-place loop buffers) — see decoder_stack
    def body(carry, xs):
        hh, cc = carry
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

        if quantized:
            kq, ks = kv_quantize(k[:, 0])
            vq, vs = kv_quantize(v[:, 0])
            cc = KVCache(
                cc.k.at[idx, rows, slot_index].set(kq),
                cc.v.at[idx, rows, slot_index].set(vq),
                cc.k_scale.at[idx, rows, slot_index].set(ks),
                cc.v_scale.at[idx, rows, slot_index].set(vs))
        else:
            cc = KVCache(
                cc.k.at[idx, rows, slot_index].set(k[:, 0].astype(cc.k.dtype)),
                cc.v.at[idx, rows, slot_index].set(v[:, 0].astype(cc.v.dtype)))

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
            o = attention_kv_quant(q, k_att, ks_att, v_att, vs_att, mask_bias)
        else:
            o = attention(q, k_att.astype(x.dtype), v_att.astype(x.dtype),
                          mask_bias)
        o = matmul_t(o.reshape(B, 1, dims.heads * dims.head_dim), attn["o_proj"]["weight"])
        hh = hh + o
        x = rms_norm(hh, lp["post_attention_layernorm"]["weight"], dims.eps)
        mlp = lp["mlp"]
        inter = weight_rows(mlp["gate_up_proj"]["weight"]) // 2
        gu = matmul_t(x, mlp["gate_up_proj"]["weight"])
        hh = hh + matmul_t(jax.nn.silu(gu[..., :inter]) * gu[..., inter:],
                           mlp["down_proj"]["weight"])
        return (hh, cc), None

    n_layers = cache.k.shape[0]
    (h, cache), _ = jax.lax.scan(
        body, (h, cache), (stacked, jnp.arange(n_layers)))
    h = rms_norm(h, norm["weight"], dims.eps)
    return h, cache


def _serve_step_core(params: Params, cfg: TalkerConfig, state: SlotState,
                     gen_cfg: GenerationConfig, key: jax.Array,
                     attend_len: Optional[int] = None,
                     installs_per_tick: int = 1
                     ) -> Tuple[SlotState, jax.Array, jax.Array, jax.Array,
                                jax.Array]:
    """Advance every slot one frame, after installing every installable
    staged request into free slots (`installs_per_tick=0` disables installs
    for this step; any other value means "all").

    `attend_len` is a static host-chosen bucket bounding the attended KV
    window (covers the longest live slot).

    Returns (state, frames (B, Q), emit (B,) bool, req_id (B,), finished (B,)
    bool — slots that consumed their final tick this step).
    """
    if installs_per_tick != 0:
        state = _install_all(state)

    eos = cfg.codec_eos_token_id
    B = state.code0.shape[0]
    S_buf = state.kv_valid.shape[1]
    S = S_buf if attend_len is None else attend_len
    dims = StackDims.from_talker(cfg)
    dtype = state.last_hidden.dtype
    suppress = suppress_mask_for(cfg)

    now_done = state.done | (state.code0 == eos) | (state.t >= state.max_frames)
    emit = state.active & ~now_done
    presence = state.presence.at[jnp.arange(B), state.code0].set(
        state.presence[jnp.arange(B), state.code0] | emit)

    code0_embed = jnp.take(params["codec_embedding"], state.code0, axis=0
                           )[:, None, :].astype(dtype)
    key, k1, k2 = jax.random.split(key, 3)
    # per-slot sub-talker sampling rides the rows path only when the engine
    # is compiled with a sampling sub-talker (gen_cfg is static here): a
    # greedy engine keeps the sampling machinery out of its program entirely
    # (submit() rejects sampling sub_sampling overrides on such engines)
    sub_rows = state.sub_sampling if gen_cfg.subtalker.do_sample else None
    sub_codes, sub_emb_sum = code_predictor_frame_dispatch(
        params, cfg, state.last_hidden, code0_embed, k1, gen_cfg.subtalker,
        fused=gen_cfg.fused_subtalker, rows=sub_rows,
        rows_top_k=gen_cfg.subtalker.top_k)
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
    position = state.seq_lens + state.t
    if gen_cfg.fused_talker_step:
        # the whole 28-layer step in one pallas_call (ops/pallas/
        # talker_step.py); the kernel builds its own bias from the per-row
        # cache_index (masking the current slot out and folding the fresh
        # K/V at finalize) and applies the sliding-window clamp itself
        from ..ops.pallas.talker_step import talker_step_fused_cache

        slot = jnp.arange(S)[None, :]
        kv_valid = state.kv_valid[:, :S] | (
            (slot >= state.prefill_len[:, None])
            & (slot <= cache_index[:, None]))
        interpret = jax.devices()[0].platform != "tpu"
        if state.cache.quantized:
            logits, h, kf, vf, ksf, vsf = talker_step_fused_cache(
                params, cfg, embed, position, cache_index, kv_valid,
                state.cache.k, state.cache.v, attend_len=attend_len,
                k_scale=state.cache.k_scale, v_scale=state.cache.v_scale,
                interpret=interpret)
            cache = state.cache._replace(k=kf, v=vf, k_scale=ksf,
                                         v_scale=vsf)
        else:
            logits, h, kf, vf = talker_step_fused_cache(
                params, cfg, embed, position, cache_index, kv_valid,
                state.cache.k, state.cache.v, attend_len=attend_len,
                interpret=interpret)
            cache = state.cache._replace(k=kf, v=vf)
    else:
        slot = jnp.arange(S)[None, :]
        kv_valid = state.kv_valid[:, :S] | (
            (slot >= state.prefill_len[:, None])
            & (slot <= cache_index[:, None]))
        if cfg.sliding_window is not None:
            # index-based sliding window, exactly as talker_decode_step
            # clamps (models/talker.py:391-396) — without this, a
            # use_sliding_window checkpoint would diverge between
            # generate_frames and the engine
            kv_valid &= slot > (cache_index[:, None] - cfg.sliding_window)
        bias = mask_to_bias(kv_valid[:, None, None, :])
        inv_freq = default_inv_freq(dims.head_dim, cfg.rope_theta)
        cos, sin = rope_tables(position[:, None], inv_freq)

        h, cache = _decoder_stack_scatter(params["layers"], params["norm"],
                                          dims, embed, cos, sin, bias,
                                          state.cache, cache_index,
                                          attend_len=attend_len)
        logits = matmul_t(h[:, 0].astype(jnp.float32), params["codec_head"])
    ban = state.t + 1 < gen_cfg.min_new_tokens
    next_code0 = process_and_sample_rows(
        logits, k2, state.sampling, gen_cfg.sampling.top_k,
        presence=presence, suppress_mask=suppress, ban_eos=ban, eos_id=eos)
    req_id = state.req_id
    # finish detection at sampling time: a sampled EOS or an exhausted frame
    # budget means no further frames will ever be emitted, so the slot frees
    # THIS tick (no dead "notice EOS" tick, and installs reuse it a tick
    # earlier). The emitted-frame semantics are unchanged — the EOS frame
    # itself is never output (reference 2283-2291).
    t_new = state.t + emit.astype(jnp.int32)
    code0_new = jnp.where(emit, next_code0, state.code0)
    done_next = now_done | (code0_new == eos) | (t_new >= state.max_frames)
    finished = state.active & done_next
    state = state._replace(
        cache=cache,
        code0=code0_new,
        last_hidden=jnp.where(emit[:, None, None], h, state.last_hidden),
        presence=presence,
        done=done_next,
        t=t_new,
        active=state.active & ~done_next,   # finished slots free immediately
    )
    return state, frames, emit, req_id, finished


serve_step = partial(jax.jit,
                     static_argnames=("cfg", "gen_cfg", "attend_len",
                                      "installs_per_tick"),
                     donate_argnums=(2,))(_serve_step_core)


def unpack_chunk_aux(aux: np.ndarray, num_slots: int, ticks: int, Q: int,
                     staging_rows: int):
    """Inverse of serve_chunk's packed aux: -> (frames (B,ticks,Q),
    emit (B,ticks), req_id (B,ticks), finished (B,ticks), staged_valid (K,),
    staged_rid (K,), t (B,)).  `ticks` is the program's max_ticks — tick
    columns past the chunk's dynamic n_ticks are all-zero (emit False)."""
    B, K = num_slots, staging_rows
    n_bt = B * ticks
    off = 0
    frames = aux[off:off + n_bt * Q].reshape(B, ticks, Q); off += n_bt * Q
    emit = aux[off:off + n_bt].reshape(B, ticks).astype(bool); off += n_bt
    req_id = aux[off:off + n_bt].reshape(B, ticks); off += n_bt
    finished = aux[off:off + n_bt].reshape(B, ticks).astype(bool); off += n_bt
    staged_valid = aux[off:off + K].astype(bool); off += K
    staged_rid = aux[off:off + K]; off += K
    t = aux[off:off + B]
    return frames, emit, req_id, finished, staged_valid, staged_rid, t


def _serve_chunk_impl(params: Params, cfg: TalkerConfig, state: SlotState,
                      gen_cfg: GenerationConfig, key: jax.Array,
                      n_ticks: jax.Array, max_ticks: int,
                      attend_len: Optional[int] = None,
                      installs_per_tick: int = 1
                      ) -> Tuple[SlotState, jax.Array]:
    """Advance every slot up to `max_ticks` frames in one device program,
    executing only `n_ticks` of them (a DYNAMIC trip count: chunk length is
    runtime data, so the latency cap / cold-start ramp / drain tail all
    reuse ONE compiled program per attend bucket instead of one per
    (ticks, attend) pair — compiled-program loads cost ~10s+ on
    remote-compile backends and were the late-joiner latency tail).

    Staged requests are installed into freed slots at tick granularity, so
    a finishing sequence's slot is re-used within the same chunk.

    Returns (state, aux) where aux is ONE flat int32 array packing
    (frames, emit, req_id, finished, staged_valid, staged_rid, t) for all
    max_ticks tick columns (unexecuted ticks are zero / emit False) — a
    single device-to-host transfer per chunk (round trips dominate host
    cost on remote-tunnel backends); decode with `unpack_chunk_aux`."""
    B = state.code0.shape[0]
    Q = cfg.num_code_groups
    bufs = (jnp.zeros((max_ticks, B, Q), jnp.int32),
            jnp.zeros((max_ticks, B), jnp.int32),
            jnp.zeros((max_ticks, B), jnp.int32),
            jnp.zeros((max_ticks, B), jnp.int32))

    def cond(carry):
        i = carry[0]
        return i < jnp.minimum(n_ticks, max_ticks)

    def body(carry):
        i, state, (fb, eb, rb, db) = carry
        k = jax.random.fold_in(key, i)
        state, frames, emit, req_id, finished = _serve_step_core(
            params, cfg, state, gen_cfg, k, attend_len, installs_per_tick)
        fb = jax.lax.dynamic_update_slice(
            fb, frames.astype(jnp.int32)[None], (i, 0, 0))
        eb = jax.lax.dynamic_update_slice(
            eb, emit.astype(jnp.int32)[None], (i, 0))
        rb = jax.lax.dynamic_update_slice(
            rb, req_id.astype(jnp.int32)[None], (i, 0))
        db = jax.lax.dynamic_update_slice(
            db, finished.astype(jnp.int32)[None], (i, 0))
        return i + 1, state, (fb, eb, rb, db)

    _, state, (frames, emit, req_id, finished) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, bufs))
    swap = lambda x: jnp.swapaxes(x, 0, 1)  # (ticks, B, ...) -> (B, ticks, ...)
    aux = jnp.concatenate([
        swap(frames).reshape(-1),
        swap(emit).reshape(-1),
        swap(req_id).reshape(-1),
        swap(finished).reshape(-1),
        state.staged_valid.astype(jnp.int32),
        state.staged_req_id.astype(jnp.int32),
        state.t.astype(jnp.int32),
    ])
    return state, aux


serve_chunk = decode_jit(
    static_argnames=("cfg", "gen_cfg", "max_ticks", "attend_len",
                     "installs_per_tick"),
    donate_argnums=(2,))(_serve_chunk_impl)


@lru_cache(maxsize=None)
def _pad_request_fn(T: int, Tt_in: int, Lp: int, Tt: int, dtype):
    """(1, T, H)/(1, T)/(1, Tt_in, H) request tensors -> bucket-padded
    (Lp, H)/(Lp,)/(Tt, H) staging rows, on device (no host round-trip)."""

    @jax.jit
    def fn(embeds, mask, trailing):
        e = jnp.zeros((Lp, embeds.shape[2]), dtype)
        e = e.at[Lp - T:].set(embeds[0].astype(dtype))
        m = jnp.zeros((Lp,), jnp.int32)
        m = m.at[Lp - T:].set(mask[0].astype(jnp.int32))
        tr = jnp.zeros((Tt, trailing.shape[2]), dtype)
        tl = min(Tt_in, Tt)
        tr = tr.at[:tl].set(trailing[0, :tl].astype(dtype))
        return e, m, tr

    return fn


@dataclass
class Request:
    request_id: int
    inputs_embeds: jax.Array     # (1, T, H)
    attn_mask: jax.Array         # (1, T)
    trailing: jax.Array          # (1, Tt, H)
    trailing_len: int
    tts_pad: jax.Array
    max_frames: int = 2047
    # per-request talker sampling override (temperature / top_p /
    # repetition_penalty / do_sample); None = the engine's gen_cfg.sampling.
    # Per-request top_k must fit the engine's compiled candidate width
    # (gen_cfg.sampling.top_k).
    sampling: Optional[SamplingParams] = None
    # per-request SUB-talker sampling override (the reference's subtalker_*
    # generate kwargs); None = the engine's gen_cfg.subtalker.  With
    # fused_subtalker the kernel takes these as data (any top_k, top_p must
    # be 1); the XLA path masks top_k within gen_cfg.subtalker.top_k.
    sub_sampling: Optional[SamplingParams] = None


@dataclass
class Completion:
    request_id: int
    codes: np.ndarray            # (frames, Q)


class ContinuousBatchingEngine:
    """Host scheduler around stage_requests/serve_chunk.

    The host's only jobs are batching new requests into staging calls and
    attributing emitted frames to request ids; admission itself (prefill +
    slot install) is on-device.
    """

    def __init__(self, params: Params, cfg: TalkerConfig,
                 gen_cfg: GenerationConfig, num_slots: int = 8,
                 max_len: int = 3072, max_trailing: int = 512,
                 dtype=jnp.bfloat16, seed: int = 0,
                 ticks_per_sync: int = 8,
                 prefill_bucket: Optional[int] = None,
                 installs_per_tick: int = 4,
                 staging_rows: Optional[int] = None,
                 mesh=None, metrics=None,
                 chunk_ramp: Tuple[int, ...] = (2, 4, 8, 16)):
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        # the jitted programs see only the canonical config: engines built
        # with different default temperatures/top_p share compiled programs
        # (per-slot values come from the sampling rows)
        self._gen_cfg_exec = gen_cfg.canonical()
        self.num_slots = num_slots
        self.max_trailing = max_trailing
        self.dtype = dtype
        if gen_cfg.fused_talker_step:
            # the serve step runs the fused talker megakernel: int8 weights,
            # bf16 or int8 KV, single device (the kernel is not
            # shard_map-aware), KV buffer a multiple of the kernel's
            # 128-slot chunks
            if mesh is not None:
                raise ValueError(
                    "fused_talker_step is single-device; drop it for a "
                    "mesh-sharded engine")
            wq = params["layers"]["self_attn"]["qkv_proj"]["weight"]
            if not (isinstance(wq, dict) and "q" in wq):
                raise ValueError(
                    "fused_talker_step requires int8-quantized params")
            max_len = -(-max_len // 128) * 128
        self.max_len = max_len
        self.prefill_bucket = int(prefill_bucket if prefill_bucket is not None
                                  else max(8, min(128, max_len // 2)))
        if self.prefill_bucket >= max_len:
            raise ValueError(
                f"prefill_bucket {self.prefill_bucket} must be < max_len {max_len}")
        # staging pool deeper than the slot count: the NEXT generation of
        # requests prefills while slots are still busy and installs into
        # freed slots mid-chunk — whole request waves turn over without a
        # host sync in between
        self.staging_rows = int(staging_rows if staging_rows is not None
                                else 2 * num_slots)
        self.state = init_slot_state(cfg, num_slots, max_len, max_trailing,
                                     dtype, prefill_bucket=self.prefill_bucket,
                                     kv_quant=gen_cfg.kv_quant,
                                     staging_rows=self.staging_rows,
                                     fused_layout=gen_cfg.fused_talker_step)
        self.mesh = mesh
        if mesh is not None:
            # one engine spanning chips: slots/staging sharded over "dp"
            # (pass params already placed via shard_talker_params)
            from ..parallel.mesh import shard_slot_state

            self.state = shard_slot_state(self.state, mesh)
        self.key = jax.random.PRNGKey(seed)
        self.ticks_per_sync = ticks_per_sync
        self.installs_per_tick = installs_per_tick
        # serve-chunk programs are AOT-compiled (jit.lower().compile()) into
        # this cache, keyed by attend bucket (chunk length is dynamic data,
        # so the bucket is the ONLY shape axis).  AOT absorbs the whole
        # compile+executable-load cost (~10s+/program on remote-compile
        # backends) at warmup / in a background thread instead of stalling a
        # live tick when a stream's attend window rolls into a new bucket.
        # Sharded engines keep the plain jit path (their inputs carry
        # shardings the abstract lowering here doesn't describe).
        self._chunk_exe: Dict[int, Any] = {}
        self._exe_building: set = set()
        self._exe_lock = None   # created lazily (threading import)
        # cold-start chunk ramp: after an idle period the first chunks are
        # short (pow2 values reuse the tail-bucket compiled shapes), so a
        # fresh request's first frames reach the host in a few ticks instead
        # of a full ticks_per_sync chunk; steady-state throughput unchanged
        self.chunk_ramp = tuple(t for t in chunk_ramp if t < ticks_per_sync)
        self._ramp_i = len(self.chunk_ramp)
        # latency/throughput lever: while set, the next chunks are at most
        # this many ticks (rounded down to pow2) — see _next_ticks
        self.tick_cap: Optional[int] = None
        self.pending: deque = deque()
        self.frames_acc: Dict[int, List[np.ndarray]] = {}
        self.req_max_frames: Dict[int, int] = {}
        # staging rows occupied by a staged-but-not-yet-installed request
        # (row -> request id; the rid disambiguates chunk-aux invalidations
        # that refer to a PREVIOUS occupant of the row)
        self.staged_rows_busy: Dict[int, int] = {}
        # rid -> chunks launched when its staging prefill was dispatched.
        # A serve chunk can only contain a request's frames if it launched
        # AFTER that staging call, so chunk i (launch index i) can hold rid
        # iff staged_stamp[rid] <= i — the server's fast first-packet path
        # gates its extract dispatch on this instead of probing every chunk
        self._staged_stamp: Dict[int, int] = {}
        self.max_live_t = 0   # host mirror of max device t (exact per chunk)
        self._zero_rows = None   # device-resident padding entry for N-buckets
        self._tts_pad_dev = None
        # chunk pipelining: launched chunks whose packed aux is still on
        # device ((aux, ticks, rows-staged-at-launch) FIFO) — synced one
        # chunk behind under load
        self._unprocessed: deque = deque()
        self._ticks_in_flight = 0
        # cancelled request ids -> chunks-launched stamp at cancel time;
        # late aux from chunks launched BEFORE the cancel may still mention
        # the id, so frames/finishes for these are dropped until every such
        # chunk has synced (then the id becomes reusable again)
        self._cancelled: Dict[int, int] = {}
        self._chunks_launched = 0
        self._chunks_synced = 0
        # requests whose frame budget clamps to zero complete immediately
        # (they would otherwise stall run_until_drained: no chunk is ever
        # launched for an empty budget)
        self._instant: List[Completion] = []
        # ids of zero-budget requests completed without entering the engine
        # (kept until collected so the duplicate-id guard still sees them)
        self._instant_ids: set = set()
        # optional streaming egress hook: called as frame_sink(request_id,
        # frames (k, Q) int) with newly attributed frames, in generation
        # order, during each chunk-aux sync — the text-level server layers
        # per-request vocoder packets on top of this (runtime/server.py)
        self.frame_sink = None
        # per-request latency trace (host wall-clock): enable with
        # trace_enabled=True; submit/staged/first_frame timestamps plus the
        # chunk-launch stamp at staging (which in-flight chunks can contain
        # the request's frames — serving gates its fast first-packet
        # dispatch on this).  Entries are never auto-evicted; latency
        # harnesses read + clear them (`trace.pop(rid)`)
        self.trace_enabled = False
        self.trace: Dict[int, Dict[str, float]] = {}
        # per-engine registry injectable so multiple engines (or an engine +
        # StreamingSession) don't interleave counters in one namespace
        from ..utils.metrics import global_metrics
        self.metrics = metrics if metrics is not None else global_metrics()

    def _pad_fn(self, T: int, Tt_in: int):
        """Jitted per-(T, Tt_in) request padding — runs on device so request
        tensors never round-trip through the host.  Module-level cache: a
        per-instance jit would re-trace per engine (engines must share every
        compiled program)."""
        return _pad_request_fn(T, Tt_in, self.prefill_bucket,
                               self.max_trailing, self.dtype)

    def submit(self, req: Request) -> None:
        self.metrics.count("engine.submits")
        if (req.request_id in self.frames_acc
                or req.request_id in self._instant_ids
                or req.request_id in self._cancelled
                or any(p[0] == req.request_id for p in self.pending)):
            # ids key frame attribution and staging-row reclaim; a duplicate
            # would silently merge two requests' frames (a cancelled id is
            # reusable once every chunk launched before the cancel synced)
            raise ValueError(f"request id {req.request_id} already in flight")
        T = req.inputs_embeds.shape[1]
        if T > self.prefill_bucket:
            raise ValueError(
                f"prompt length {T} exceeds engine prefill_bucket "
                f"{self.prefill_bucket}")
        e, m, tr = self._pad_fn(T, req.trailing.shape[1])(
            req.inputs_embeds, req.attn_mask, req.trailing)
        if self._tts_pad_dev is None:
            self._tts_pad_dev = jnp.asarray(req.tts_pad, self.dtype)
        S = self.max_len
        mf = min(req.max_frames, S - self.prefill_bucket - 1)
        if mf <= 0:
            self._instant.append(Completion(
                req.request_id,
                np.zeros((0, self.cfg.num_code_groups), np.int64)))
            self._instant_ids.add(req.request_id)
            return
        if not self.frames_acc and not self._ticks_in_flight:
            self._ramp_i = 0    # engine was idle: restart the latency ramp
        sp = req.sampling if req.sampling is not None else self.gen_cfg.sampling
        K = self.gen_cfg.sampling.top_k
        if 0 < K < (sp.top_k if sp.top_k > 0 else self.cfg.vocab_size):
            # the compiled program's candidate set is the engine's static
            # top_k; a wider (or unfiltered) per-request k cannot be served
            # without a recompile — reject loudly instead of silently
            # narrowing the request's distribution
            raise ValueError(
                f"request top_k={sp.top_k} exceeds the engine's compiled "
                f"candidate width top_k={K}")
        ssp = (req.sub_sampling if req.sub_sampling is not None
               else self.gen_cfg.subtalker)
        if ssp.do_sample and not self.gen_cfg.subtalker.do_sample:
            # the engine's compiled program omits the sub-talker sampling
            # machinery when its gen_cfg sub-talker is greedy
            raise ValueError(
                "request asks for sampled sub-talker codes but the engine "
                "was built with a greedy gen_cfg.subtalker; construct the "
                "engine with subtalker do_sample=True to serve it")
        if self.gen_cfg.fused_subtalker:
            if ssp.do_sample and ssp.top_p < 1.0:
                raise ValueError(
                    "the fused sub-talker kernel does not support "
                    f"top_p < 1 (request sub_sampling.top_p={ssp.top_p})")
        else:
            Ks = self.gen_cfg.subtalker.top_k
            cp_v = self.cfg.code_predictor_config.vocab_size
            if ssp.do_sample and 0 < Ks < (ssp.top_k if ssp.top_k > 0
                                           else cp_v):
                raise ValueError(
                    f"request sub-talker top_k={ssp.top_k} exceeds the "
                    f"engine's compiled candidate width top_k={Ks}")
        srow = sp.as_row()
        if self.trace_enabled:
            self.trace[req.request_id] = {"submit": _time.time()}
        self.pending.append((req.request_id, e, m, tr,
                             min(req.trailing_len, self.max_trailing), mf,
                             srow, ssp.as_row()))

    def cancel(self, request_id) -> bool:
        """Best-effort cancel: the request never completes and its slot /
        staging row frees at the next chunk boundary (a client disconnect
        must not burn chip time to completion). Returns True if the request
        was known (pending, staged, live, or instant). The id stays
        unusable until every chunk launched before the cancel has synced
        (late aux may still attribute frames to it); then it can be
        resubmitted."""
        n = len(self.pending)
        self.pending = deque(p for p in self.pending if p[0] != request_id)
        if len(self.pending) < n:
            self.metrics.count("engine.cancels")
            return True
        if request_id in self._instant_ids:
            self._instant = [c for c in self._instant
                             if c.request_id != request_id]
            self._instant_ids.discard(request_id)
            self.metrics.count("engine.cancels")
            return True
        if request_id not in self.frames_acc:
            return False
        self.frames_acc.pop(request_id, None)
        self.req_max_frames.pop(request_id, None)
        self._staged_stamp.pop(request_id, None)
        if self._unprocessed:
            # chunks launched before this cancel may still mention the id;
            # quarantine it until they all sync (no in-flight chunks = no
            # late aux = the id is immediately reusable)
            self._cancelled[request_id] = self._chunks_launched
        self.state = _cancel_in_state(self.state, jnp.int32(request_id))
        for r in [r for r, rid in self.staged_rows_busy.items()
                  if rid == request_id]:
            del self.staged_rows_busy[r]
        self.metrics.count("engine.cancels")
        return True

    def _stage_pending(self) -> int:
        """Stage as many pending requests as there are free pool rows,
        in batches of at most 16 (pow2 buckets -> a small, warmable set of
        compiled staging-prefill shapes)."""
        total = 0
        while True:
            n = self._stage_batch()
            total += n
            if n == 0:
                return total

    def _stage_batch(self) -> int:
        free_rows = [k for k in range(self.staging_rows)
                     if k not in self.staged_rows_busy]
        n = min(len(self.pending), len(free_rows), 16)
        if n == 0:
            return 0
        Nb = 1 << (n - 1).bit_length()   # pow2 bucket => few compiled shapes
        if self._zero_rows is None:
            Lp, H, Tt = (self.prefill_bucket, self.cfg.hidden_size,
                         self.max_trailing)
            self._zero_rows = (jnp.zeros((Lp, H), self.dtype),
                               jnp.zeros((Lp,), jnp.int32),
                               jnp.zeros((Tt, H), self.dtype))
        embeds_rows, mask_rows, trailing_rows = [], [], []
        meta = np.zeros((Nb, 5), np.int32)
        srows = np.zeros((Nb, 5), np.float32)
        ssrows = np.zeros((Nb, 5), np.float32)
        now = _time.time() if self.trace_enabled else 0.0
        for i in range(Nb):
            if i < n:
                rid, e, m, tr, tlen, mf, srow, ssrow = self.pending.popleft()
                meta[i] = (rid, mf, tlen, free_rows[i], 1)
                srows[i] = srow
                ssrows[i] = ssrow
                self.frames_acc[rid] = []
                self.req_max_frames[rid] = mf
                self.staged_rows_busy[free_rows[i]] = rid
                self._staged_stamp[rid] = self._chunks_launched
                if self.trace_enabled:
                    self.trace.setdefault(rid, {})["staged"] = now
            else:
                e, m, tr = self._zero_rows
                meta[i] = (-1, 0, 0, 0, 0)
            embeds_rows.append(e)
            mask_rows.append(m)
            trailing_rows.append(tr)
        self.key, sub = jax.random.split(self.key)
        self.state = stage_requests(
            self.params, self.cfg, self.state, self._gen_cfg_exec,
            tuple(embeds_rows), tuple(mask_rows), tuple(trailing_rows),
            jnp.asarray(meta), self._tts_pad_dev, sub, jnp.asarray(srows),
            jnp.asarray(ssrows))
        return n

    def _next_ticks(self) -> int:
        """Chunk length: full `ticks_per_sync` under queue pressure (after
        the cold-start ramp); once the queue is drained, just enough ticks
        to cover the longest remaining request, so the tail doesn't burn
        empty ticks.  `tick_cap` (settable between steps, e.g. by TTSServer
        while a streaming request awaits its first packet) bounds the next
        chunk so fresh frames reach the host sooner.  Chunk length is
        DYNAMIC data to the compiled program (serve_chunk n_ticks), so any
        value here reuses the same executable."""
        ticks = self.ticks_per_sync
        if self._ramp_i < len(self.chunk_ramp):
            ticks = min(ticks, self.chunk_ramp[self._ramp_i])
        if self.tick_cap is not None and self.tick_cap > 0:
            ticks = min(ticks, int(self.tick_cap))
        if self.pending:
            return ticks
        remaining = 0
        for rid, acc in self.frames_acc.items():
            remaining = max(remaining,
                            self.req_max_frames.get(rid, ticks) - len(acc))
        need = remaining + 2   # + finish tick + install slack
        return min(ticks, max(1, need))

    # -- serve-chunk program cache (AOT) ---------------------------------

    def _attend_buckets(self):
        """Every attend bucket a live engine can request (ATTEND_BUCKET
        multiples clamped to the KV capacity)."""
        S = self.max_len
        out = []
        a = ATTEND_BUCKET
        while a < S:
            out.append(a)
            a += ATTEND_BUCKET
        out.append(S)
        return out

    def _compile_chunk_exe(self, attend: int):
        """AOT-compile the serve-chunk executable for one attend bucket
        (abstract inputs — no dummy state allocation, no device execution;
        the compile+load cost lands here, not on a live tick)."""
        from .jit_options import decode_compiler_options

        def absify(tree):
            return jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.asarray(x).dtype), tree)

        jfn = jax.jit(
            _serve_chunk_impl,
            static_argnames=("cfg", "gen_cfg", "max_ticks", "attend_len",
                             "installs_per_tick"),
            donate_argnums=(2,),
            compiler_options=decode_compiler_options())
        lowered = jfn.lower(
            absify(self.params), self.cfg, absify(self.state),
            self._gen_cfg_exec, absify(self.key),
            jax.ShapeDtypeStruct((), jnp.int32), self.ticks_per_sync,
            attend_len=attend, installs_per_tick=self.installs_per_tick)
        return lowered.compile()

    def _get_chunk_exe(self, attend: int):
        exe = self._chunk_exe.get(attend)
        if exe is None:
            with self.metrics.time("engine.chunk_compile_s"):
                exe = self._compile_chunk_exe(attend)
            self._chunk_exe[attend] = exe
        return exe

    def warmup_serve(self, verbose: bool = False) -> float:
        """Synchronously compile the serve-chunk executable for EVERY attend
        bucket (one program per bucket — chunk length is dynamic).  Call at
        server startup so live traffic never hits a compile stall when a
        long stream rolls the attend window into a new bucket (measured
        multi-second first-use loads on remote-compile backends).  Returns
        seconds spent."""
        import time as _time

        t0 = _time.time()
        for a in self._attend_buckets():
            if a not in self._chunk_exe:
                self._chunk_exe[a] = self._compile_chunk_exe(a)
                if verbose:
                    print(f"[engine.warmup] attend={a} "
                          f"compiled at {_time.time() - t0:.1f}s", flush=True)
        return _time.time() - t0

    def warmup_staging(self, buckets=(1, 2, 4, 8, 16)) -> None:
        """Compile the staging-prefill program for each request-count bucket
        by running it with ALL-INVALID meta rows (row_valid=0 merges
        nothing, so state is untouched — the program is the real one)."""
        if self._tts_pad_dev is None:
            self._tts_pad_dev = jnp.zeros((1, 1, self.cfg.hidden_size),
                                          self.dtype)
        if self._zero_rows is None:
            Lp, H, Tt = (self.prefill_bucket, self.cfg.hidden_size,
                         self.max_trailing)
            self._zero_rows = (jnp.zeros((Lp, H), self.dtype),
                               jnp.zeros((Lp,), jnp.int32),
                               jnp.zeros((Tt, H), self.dtype))
        for nb in buckets:
            if nb > self.staging_rows:
                continue
            meta = np.zeros((nb, 5), np.int32)
            meta[:, 0] = -1
            rows = np.zeros((nb, 5), np.float32)
            self.key, sub = jax.random.split(self.key)
            e, m, tr = self._zero_rows
            self.state = stage_requests(
                self.params, self.cfg, self.state, self._gen_cfg_exec,
                (e,) * nb, (m,) * nb, (tr,) * nb, jnp.asarray(meta),
                self._tts_pad_dev, sub, jnp.asarray(rows), jnp.asarray(rows))
        jax.block_until_ready(self.state.staged_valid)

    def _prewarm_next_bucket(self, attend: int, max_idx: int,
                             ticks: int) -> None:
        """Background safety net: when the live window approaches the next
        attend bucket, compile its executable on a worker thread so the
        rollover tick finds it ready (warmup_serve makes this a no-op)."""
        S = self.max_len
        nxt = min(S, attend + ATTEND_BUCKET)
        if (nxt <= attend or nxt in self._chunk_exe
                or nxt in self._exe_building):
            return
        if max_idx + ticks + 1 < attend - ATTEND_BUCKET // 2:
            return   # not close yet
        import threading

        if self._exe_lock is None:
            self._exe_lock = threading.Lock()

        def build():
            try:
                exe = self._compile_chunk_exe(nxt)
                self._chunk_exe[nxt] = exe
            finally:
                self._exe_building.discard(nxt)

        self._exe_building.add(nxt)
        threading.Thread(target=build, daemon=True).start()

    def _launch_chunk(self) -> None:
        """Dispatch one serve_chunk; its packed aux stays ON DEVICE (appended
        to the unprocessed queue) so the D2H round trip (~100 ms on
        remote-tunnel backends) can overlap the next chunk's execution."""
        self.key, sub = jax.random.split(self.key)
        # static attention bucket covering the furthest live slot by chunk
        # end; liveness is stale by the in-flight ticks, so over-cover
        S = self.max_len
        ticks = self._next_ticks()
        max_idx = (self.prefill_bucket + self.max_live_t
                   + self._ticks_in_flight)
        attend = min(S, ((max_idx + ticks + 1 + ATTEND_BUCKET - 1)
                         // ATTEND_BUCKET) * ATTEND_BUCKET)
        if self.mesh is None:
            exe = self._get_chunk_exe(attend)
            self._prewarm_next_bucket(attend, max_idx, ticks)
            self.state, aux = exe(self.params, self.state, sub,
                                  jnp.int32(ticks))
        else:
            self.state, aux = serve_chunk(
                self.params, self.cfg, self.state, self._gen_cfg_exec, sub,
                jnp.int32(ticks), self.ticks_per_sync,
                attend_len=attend, installs_per_tick=self.installs_per_tick)
        self._ramp_i = min(self._ramp_i + 1, len(self.chunk_ramp))
        self._chunks_launched += 1
        self._unprocessed.append((aux, ticks))
        self._ticks_in_flight += ticks
        self.metrics.count("engine.chunks")
        self.metrics.count("engine.ticks", ticks)
        self.metrics.gauge("engine.queue_depth", len(self.pending))
        self.metrics.gauge("engine.attend_len", attend)

    def _process_oldest(self) -> List[Completion]:
        """Sync the oldest in-flight chunk's aux and attribute its frames."""
        if not self._unprocessed:
            return []
        aux, ticks = self._unprocessed.popleft()
        self._ticks_in_flight -= ticks
        with self.metrics.time("engine.aux_sync_s"):
            aux_np = np.asarray(aux)
        (frames, emit, req_id, finished, staged_valid, staged_rid,
         t_dev) = unpack_chunk_aux(
            aux_np, self.num_slots, self.ticks_per_sync,
            self.cfg.num_code_groups, self.state.staged_valid.shape[0])
        completions: List[Completion] = []
        sink_frames: Dict[int, List[np.ndarray]] = {}
        now = _time.time() if self.trace_enabled else 0.0
        order = np.argwhere(emit | finished)
        # attribute in tick order so multi-request slot reuse stays coherent
        for slot, t in sorted(order.tolist(), key=lambda st: (st[1], st[0])):
            rid = int(req_id[slot, t])
            if rid in self._cancelled:   # late aux from pre-cancel chunks
                continue
            if emit[slot, t]:
                if self.trace_enabled and not self.frames_acc.get(rid):
                    self.trace.setdefault(rid, {}).setdefault(
                        "first_frame", now)
                self.frames_acc[rid].append(frames[slot, t])
                if self.frame_sink is not None:
                    sink_frames.setdefault(rid, []).append(frames[slot, t])
            if finished[slot, t]:
                acc = self.frames_acc.pop(rid, [])
                self.req_max_frames.pop(rid, None)
                self._staged_stamp.pop(rid, None)
                codes = (np.stack(acc) if acc
                         else np.zeros((0, self.cfg.num_code_groups), np.int64))
                completions.append(Completion(rid, codes))
        # reclaim staging rows whose request was installed during the
        # chunk.  A row is freed only when the chunk marks it invalid AND
        # names OUR occupant: an in-flight chunk launched before the row was
        # (re)staged reports the previous occupant's rid (or -1), so its
        # invalidation must not free the new request (it would be
        # overwritten by the next stage_requests and silently dropped).
        if self.frame_sink is not None:
            for rid, fl in sink_frames.items():
                self.frame_sink(rid, np.stack(fl))
        for r in [r for r, rid in self.staged_rows_busy.items()
                  if not staged_valid[r] and staged_rid[r] == rid]:
            del self.staged_rows_busy[r]
        self.max_live_t = int(t_dev.max()) if self.frames_acc else 0
        # this chunk's aux is fully attributed: cancelled ids whose
        # pre-cancel chunks have now ALL synced become reusable again
        self._chunks_synced += 1
        self._cancelled = {r: s for r, s in self._cancelled.items()
                           if s > self._chunks_synced}
        self.metrics.count("engine.frames", float(emit.sum()))
        self.metrics.count("engine.completions", len(completions))
        self.metrics.gauge("engine.slot_utilization",
                           float(emit.mean()) if emit.size else 0.0)
        return completions

    def oldest_chunk_may_contain(self, request_id) -> bool:
        """True if the OLDEST in-flight chunk can hold frames for this
        request: the chunk launched after the request's staging prefill was
        dispatched.  The server's fast first-packet path gates its extract
        dispatch on this — a chunk launched before the request existed can
        only return counts of 0 (wasted extract+vocode work plus one
        serialized sync per step, ADVICE r4)."""
        if not self._unprocessed:
            return False
        return self._staged_stamp.get(request_id,
                                      self._chunks_launched + 1
                                      ) <= self._chunks_synced

    def _remaining_upper(self) -> int:
        """Upper bound on frames still to generate across live requests
        (exact after a sync; stale-high while chunks are in flight)."""
        return sum(max(0, self.req_max_frames.get(r, 1) - len(a))
                   for r, a in self.frames_acc.items())

    def step(self) -> List[Completion]:
        """One engine step: stage pending requests (batched), dispatch one
        chunk, and collect finished requests from previously synced chunks.

        Under sustained load at most one chunk's aux is left un-synced, so
        its device-to-host transfer overlaps the next chunk's execution; at
        the tail every aux is synced immediately so drain decisions use
        fresh liveness."""
        completions: List[Completion] = list(self._instant)
        self._instant.clear()
        self._instant_ids.clear()
        if self._stage_pending() == 0 and self.pending and self._unprocessed:
            # staging blocked on rows whose release we have not observed yet
            completions += self._process_oldest()
            self._stage_pending()
        if not self.frames_acc:
            while self._unprocessed:
                completions += self._process_oldest()
            return completions
        if self._remaining_upper() > self._ticks_in_flight * self.num_slots:
            # the next chunk is guaranteed non-empty even with stale counts
            self._launch_chunk()
            while len(self._unprocessed) > 1:
                completions += self._process_oldest()
        else:
            # all known work is covered by in-flight chunks: sync them
            while self._unprocessed:
                completions += self._process_oldest()
        return completions

    def stage_now(self) -> int:
        """Dispatch staging prefills for pending requests immediately
        (normally step() does this).  A latency-sensitive caller about to
        block on in-flight aux calls this first so the staging program
        executes behind the in-flight chunk instead of after the block."""
        return self._stage_pending()

    def sync_in_flight(self) -> List[Completion]:
        """Sync EVERY in-flight chunk's aux now (blocks until the newest
        dispatched chunk finishes).  Collapses the one-chunk aux pipeline —
        a latency caller (first packet pending) uses it to reach fresh
        frames and leave the device queue idle for an egress program;
        throughput callers should let step() keep the pipeline depth."""
        out: List[Completion] = []
        while self._unprocessed:
            out.extend(self._process_oldest())
        return out

    def run_until_drained(self, max_ticks: int = 100000) -> List[Completion]:
        out: List[Completion] = []
        for _ in range(max_ticks):
            out.extend(self.step())
            if not self.pending and not self.frames_acc:
                break
        while self._unprocessed:
            out.extend(self._process_oldest())
        return out
