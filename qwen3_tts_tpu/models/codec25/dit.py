"""DiT flow-matching decoder (codes -> mel) for the 25 Hz tokenizer.

Rebuilds Qwen3TTSTokenizerV1DecoderDiTModel (reference
modeling_qwen3_tts_tokenizer_v1.py:1071-1226) in JAX:

- block-causal attention (block 24) with per-layer look-ahead/back masks
  (DiTDecoderLayer 663-695);
- AdaLN-Zero timestep conditioning (477-510), interleaved-pair RoPE
  (535-567, GPT-NeoX rotate over (even, odd) pairs);
- internal ECAPA speaker encoder over the reference mel (342-423, reuses the
  shared speaker-encoder blocks);
- classifier-free guidance Euler ODE sampler with sway time schedule
  (sample, 1171-1226) — the ODE loop is a lax.scan over a fixed number of
  steps, one compiled program per code length bucket.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...config import DiTConfig, SpeakerEncoderConfig
from ...ops.attention import attention, mask_to_bias
from ..speaker_encoder import speaker_encoder_forward

Params = Dict[str, Any]


def _linear(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["weight"].T.astype(x.dtype) + p["bias"].astype(x.dtype)


def _ln_no_affine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rotate_half_pairs(x: jax.Array) -> jax.Array:
    """(-x2, x1) over interleaved pairs (reference rotate_half_codec)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def _dit_rope_tables(seq_len: int, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    freqs = np.arange(seq_len)[:, None] * inv[None, :]
    freqs = np.stack([freqs, freqs], axis=-1).reshape(seq_len, -1)
    return jnp.asarray(np.cos(freqs), jnp.float32), jnp.asarray(np.sin(freqs), jnp.float32)


def _timestep_embed(p: Params, t: jax.Array, dim_freq: int = 256) -> jax.Array:
    """SinusPositionEmbedding + MLP (reference 634-660). t: (B,)."""
    half = dim_freq // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    emb = 1000.0 * t.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    h = _linear(p["time_mlp"]["0"], emb)
    h = jax.nn.silu(h)
    return _linear(p["time_mlp"]["2"], h)


def _dit_layer(lp: Params, cfg: DiTConfig, x: jax.Array, t_emb: jax.Array,
               cos: jax.Array, sin: jax.Array, mask_bias: jax.Array) -> jax.Array:
    B, T, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    ada = _linear(lp["attn_norm"]["linear"], jax.nn.silu(t_emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(ada, 6, axis=1)
    norm = _ln_no_affine(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]

    ap = lp["attn"]
    q = _linear(ap["to_q"], norm).reshape(B, T, H, hd)
    k = _linear(ap["to_k"], norm).reshape(B, T, H, hd)
    v = _linear(ap["to_v"], norm).reshape(B, T, H, hd)
    cosb = cos[None, :, None, :].astype(jnp.float32)
    sinb = sin[None, :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q = (qf * cosb + _rotate_half_pairs(qf) * sinb).astype(x.dtype)
    k = (kf * cosb + _rotate_half_pairs(kf) * sinb).astype(x.dtype)
    o = attention(q, k, v, mask_bias)
    o = _linear(ap["to_out"]["0"], o.reshape(B, T, H * hd))
    x = x + gate_msa[:, None] * o

    norm = _ln_no_affine(x) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff = lp["ff"]["ff"]
    h = _linear(ff["0"], norm)
    h = jax.nn.gelu(h, approximate=True)
    h = _linear(ff["3"], h)
    return x + gate_mlp[:, None] * h


def _block_bias(seq_len: int, block_size: int, look_back: int,
                look_ahead: int) -> jax.Array:
    blocks = jnp.arange(seq_len) // block_size
    diff = blocks[None, :] - blocks[:, None]
    ok = (diff >= -float(look_back)) & (diff <= float(look_ahead))
    return mask_to_bias(ok[None, None])


def dit_forward(params: Params, cfg: DiTConfig, x: jax.Array,
                spk_vec: jax.Array, ref_mel: jax.Array, code_embed: jax.Array,
                t: jax.Array) -> jax.Array:
    """One velocity evaluation.  x: (B, T, mel); spk_vec: (B, T, enc_emb);
    ref_mel: (B, Tr, mel); code_embed: (B, T, emb_dim); t: (B,).

    CFG batching (conditional/unconditional halves) is done by the caller.
    """
    B, T, _ = x.shape
    t_emb = _timestep_embed(params["time_embed"], t)

    # input embed (reference DiTInputEmbedding 426-456)
    se_cfg = SpeakerEncoderConfig(
        mel_dim=cfg.mel_dim, enc_dim=cfg.enc_dim,
        enc_channels=cfg.enc_channels, enc_kernel_sizes=cfg.enc_kernel_sizes,
        enc_dilations=cfg.enc_dilations,
        enc_attention_channels=cfg.enc_attention_channels,
        enc_res2net_scale=cfg.enc_res2net_scale,
        enc_se_channels=cfg.enc_se_channels)
    cond = speaker_encoder_forward(params["input_embed"]["spk_encoder"],
                                   se_cfg, ref_mel)          # (B, enc_dim)
    cond = jnp.repeat(cond[:, None, :], T, axis=1)
    h = _linear(params["input_embed"]["proj"],
                jnp.concatenate([x, cond, code_embed, spk_vec], axis=-1))

    cos, sin = _dit_rope_tables(T, cfg.head_dim, cfg.rope_theta)
    for i in range(cfg.num_hidden_layers):
        bias = _block_bias(T, cfg.block_size,
                           1 if i in cfg.look_backward_layers else 0,
                           1 if i in cfg.look_ahead_layers else 0)
        h = _dit_layer(params["transformer_blocks"][str(i)], cfg, h, t_emb,
                       cos, sin, bias)

    ada = _linear(params["norm_out"]["linear"], jax.nn.silu(t_emb))
    scale, shift = jnp.split(ada, 2, axis=1)
    h = _ln_no_affine(h) * (1 + scale)[:, None, :] + shift[:, None, :]
    return _linear(params["proj_out"], h)


def dit_sample(params: Params, cfg: DiTConfig, codes: jax.Array,
               xvector: jax.Array, ref_mel: jax.Array, noise: jax.Array,
               num_steps: int = 10, guidance_scale: float = 0.5,
               sway_coefficient: float = -1.0) -> jax.Array:
    """Euler ODE over the flow field -> mel (B, mel_dim, T*repeats).

    Reference: Qwen3TTSTokenizerV1DecoderDiTModel.sample (1171-1226).
    `noise` is supplied by the caller (B, T*repeats, mel) so sampling stays
    functional.
    """
    B, Tc = codes.shape
    T = Tc * cfg.repeats
    code_embed = jnp.take(params["text_embed"]["codec_embed"]["weight"],
                          codes, axis=0)
    code_embed = jnp.repeat(code_embed, cfg.repeats, axis=1)
    code_embed_uncond = jnp.take(params["text_embed"]["codec_embed"]["weight"],
                                 jnp.zeros_like(codes), axis=0)
    code_embed_uncond = jnp.repeat(code_embed_uncond, cfg.repeats, axis=1)

    spk = jnp.repeat(xvector[:, None, :], T, axis=1)

    ts = jnp.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        ts = ts + sway_coefficient * (jnp.cos(jnp.pi / 2 * ts) - 1 + ts)

    use_cfg = guidance_scale >= 1e-5

    def velocity(t_scalar, y):
        if use_cfg:
            x2 = jnp.concatenate([y, y], axis=0)
            spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
            ref2 = jnp.concatenate([ref_mel, jnp.zeros_like(ref_mel)], axis=0)
            code2 = jnp.concatenate([code_embed, code_embed_uncond], axis=0)
            t2 = jnp.full((2 * B,), t_scalar)
            out = dit_forward(params, cfg, x2, spk2, ref2, code2, t2)
            cond_out, uncond_out = jnp.split(out, 2, axis=0)
            return cond_out + (cond_out - uncond_out) * guidance_scale
        tb = jnp.full((B,), t_scalar)
        return dit_forward(params, cfg, y, spk, ref_mel, code_embed, tb)

    def body(y, pair):
        t0, t1 = pair
        v = velocity(t0, y)
        return y + v * (t1 - t0), None

    y, _ = jax.lax.scan(body, noise, (ts[:-1], ts[1:]))
    return jnp.transpose(y, (0, 2, 1))
