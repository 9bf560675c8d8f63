"""Talker generation loop: batched frame-by-frame decode, fully on-device.

Re-implements the reference's HF-generate-driven loop
(modeling_qwen3_tts.py:2272-2291 driving Qwen3TTSTalkerForConditionalGeneration
.forward 1635-1744) as one jitted program:

  prefill -> sample code0 -> [per frame: sub-talker scan -> frame embed sum ->
  dual-track text merge -> talker step -> sample next code0]

Per reference semantics:
- frames are recorded for every talker forward whose *input* is a sampled
  code0 (so max_new_tokens M yields at most M-1 frames, reference 2280-2291);
- generation stops at codebook-0 EOS per sample (2283-2287);
- repetition penalty sees only previously generated code0 ids (generation
  starts from inputs_embeds, so HF history is exactly the sampled ids);
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

from ..config import TalkerConfig
from ..models.talker import (KVCache, StackDims, code_predictor_frame,
                             talker_decode_step, talker_prefill)
from ..ops.sampling import SamplingParams, process_and_sample

Params = Dict[str, Any]


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 2048
    min_new_tokens: int = 2
    sampling: SamplingParams = field(default_factory=SamplingParams)
    subtalker: SamplingParams = field(default_factory=SamplingParams)


def suppress_mask_for(cfg: TalkerConfig) -> jnp.ndarray:
    """(V,) bool — the reference suppresses ids [V-1024, V) except codec EOS
    (modeling_qwen3_tts.py:2059-2063)."""
    v = cfg.vocab_size
    ids = jnp.arange(v)
    mask = ids >= (v - 1024)
    return mask & (ids != cfg.codec_eos_token_id)


class GenerationResult(NamedTuple):
    codes: jax.Array    # (B, max_frames, Q) int32
    lengths: jax.Array  # (B,) valid frame count per sample
    hidden: jax.Array   # (B, max_frames, H) talker last-layer hidden per frame


@partial(jax.jit, static_argnames=("cfg", "gen_cfg"))
def generate_frames(params: Params, cfg: TalkerConfig,
                    gen_cfg: GenerationConfig,
                    inputs_embeds: jax.Array, attn_mask: jax.Array,
                    trailing_text: jax.Array, tts_pad_embed: jax.Array,
                    key: jax.Array) -> GenerationResult:
    """Run the full generation.

    inputs_embeds: (B, T, H) left-padded prefill embeddings.
    attn_mask: (B, T) 1 = real token.
    trailing_text: (B, Tt, H) projected trailing text hiddens, pad-filled.
    tts_pad_embed: (1, 1, H) or (B, 1, H).
    """
    B, T, H = inputs_embeds.shape
    Q = cfg.num_code_groups
    M = gen_cfg.max_new_tokens
    max_frames = M - 1
    S = T + M + 1
    dims = StackDims.from_talker(cfg)
    dtype = inputs_embeds.dtype

    cache = KVCache.zeros(cfg.num_hidden_layers, B, S, dims.kv_heads,
                          dims.head_dim, dtype=dtype)
    logits, hidden_seq, cache = talker_prefill(params, cfg, inputs_embeds,
                                               attn_mask, cache)
    last_hidden = hidden_seq[:, -1:, :]

    suppress = suppress_mask_for(cfg)
    eos = cfg.codec_eos_token_id
    presence = jnp.zeros((B, cfg.vocab_size), bool)
    seq_lens = jnp.sum(attn_mask, axis=-1).astype(jnp.int32)  # (B,)

    key, sub = jax.random.split(key)
    ban = jnp.full((B,), 0 < gen_cfg.min_new_tokens)
    code0 = process_and_sample(logits, sub, gen_cfg.sampling,
                               presence=presence, suppress_mask=suppress,
                               ban_eos=ban, eos_id=eos)

    valid_prefill = jnp.zeros((B, S), bool)
    valid_prefill = jax.lax.dynamic_update_slice(
        valid_prefill, attn_mask.astype(bool), (0, 0))
    slot = jnp.arange(S)[None, :]

    codes_buf = jnp.zeros((B, max_frames, Q), jnp.int32)
    hidden_buf = jnp.zeros((B, max_frames, H), dtype)
    Tt = trailing_text.shape[1]

    def step(t, state):
        (cache, code0, last_hidden, presence, done, codes_buf, hidden_buf,
         lengths, key) = state
        # `code0` is generated token index t+1 (1-based); it becomes this
        # frame's codebook-0 id unless it is EOS.
        now_done = done | (code0 == eos)
        presence = presence.at[jnp.arange(B), code0].set(True)

        code0_embed = jnp.take(params["codec_embedding"], code0, axis=0
                               )[:, None, :].astype(dtype)
        key, k1, k2 = jax.random.split(key, 3)
        sub_codes, sub_emb_sum = code_predictor_frame(
            params, cfg, last_hidden, code0_embed, k1, gen_cfg.subtalker)
        frame = jnp.concatenate([code0[:, None], sub_codes], axis=1)

        active = ~now_done
        codes_buf = codes_buf.at[:, t, :].set(
            jnp.where(active[:, None], frame, 0))
        hidden_buf = hidden_buf.at[:, t, :].set(
            jnp.where(active[:, None], last_hidden[:, 0], 0))
        lengths = lengths + active.astype(jnp.int32)

        # dual-track merge (reference 1682-1692)
        text_idx = jnp.minimum(t, Tt - 1)
        text_h = jax.lax.dynamic_slice_in_dim(trailing_text, text_idx, 1, axis=1)
        text_h = jnp.where(t < Tt, text_h, jnp.broadcast_to(tts_pad_embed, text_h.shape))
        embed = code0_embed + sub_emb_sum + text_h.astype(dtype)

        cache_index = T + t
        kv_valid = valid_prefill | ((slot >= T) & (slot <= cache_index))
        position = seq_lens + t
        logits, last_hidden, cache = talker_decode_step(
            params, cfg, embed, position, cache_index, kv_valid, cache)

        ban = jnp.full((B,), t + 1 < gen_cfg.min_new_tokens)
        next_code0 = process_and_sample(logits, k2, gen_cfg.sampling,
                                        presence=presence,
                                        suppress_mask=suppress,
                                        ban_eos=ban, eos_id=eos)
        return (cache, next_code0, last_hidden, presence, now_done,
                codes_buf, hidden_buf, lengths, key)

    lengths = jnp.zeros((B,), jnp.int32)
    done = jnp.zeros((B,), bool)
    state = (cache, code0, last_hidden, presence, done, codes_buf, hidden_buf,
             lengths, key)

    def cond(carry):
        t, state = carry
        return (t < max_frames) & ~jnp.all(state[4] | (state[1] == eos))

    def body(carry):
        t, state = carry
        return t + 1, step(t, state)

    _, state = jax.lax.while_loop(cond, body, (0, state))
    (_, _, _, _, _, codes_buf, hidden_buf, lengths, _) = state
    return GenerationResult(codes_buf, lengths, hidden_buf)
