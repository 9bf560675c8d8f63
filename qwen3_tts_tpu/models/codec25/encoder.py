"""25 Hz tokenizer encoder: Whisper-style transformer with windowed attention
and a GRVQ bottleneck (speech -> 1 code / 40 ms).

Rebuilds WhisperEncoderVQ (reference vq/whisper_encoder.py:288-406 and
vq/speech_vq.py:162-357) TPU-first:

- the reference's flash-attn varlen windowed attention (cu_seqlens batching
  of 100-frame windows) becomes *batched dense attention over windows*: the
  conv stack processes fixed 2*n_window-mel-frame chunks, each of which maps
  to exactly one n_window attention window, so windows stack into a clean
  (num_windows, n_window, D) batch with validity masking — no ragged packing;
- the GRVQ nearest-neighbour search is a matmul argmin over the
  (32768, 1280) codebook on the MXU (single group, single quantizer at
  inference; reference core_vq.py:441-523).

Only the encode path (layers up to `audio_vq_layers` + VQ indices) is
implemented — the released pipeline never runs the remaining 26 layers for
TTS (quantize_speech, reference modeling...v1.py:1337-1340).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import WhisperVQEncoderConfig
from ...ops.attention import attention, mask_to_bias
from ...ops.conv import conv1d
from ...ops.norms import layer_norm
from .mel import get_T_after_cnn, get_mel_audio

Params = Dict[str, Any]


def sinusoid_positions(length: int, channels: int,
                       max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper sinusoid table (reference whisper_encoder.py:129-135)."""
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _attention_block(block: Params, x: jax.Array, mask_bias: jax.Array,
                     n_head: int) -> jax.Array:
    """ResidualAttentionBlock (reference 265-285): pre-LN MHA (k has no
    bias) + pre-LN GELU MLP."""
    B, T, D = x.shape
    hd = D // n_head
    a = layer_norm(x, block["attn_ln"]["weight"], block["attn_ln"]["bias"])
    attn_p = block["attn"]
    q = a @ attn_p["query"]["weight"].T.astype(a.dtype) + attn_p["query"]["bias"].astype(a.dtype)
    k = a @ attn_p["key"]["weight"].T.astype(a.dtype)
    v = a @ attn_p["value"]["weight"].T.astype(a.dtype) + attn_p["value"]["bias"].astype(a.dtype)
    q = q.reshape(B, T, n_head, hd)
    k = k.reshape(B, T, n_head, hd)
    v = v.reshape(B, T, n_head, hd)
    o = attention(q, k, v, mask_bias)
    o = o.reshape(B, T, D) @ attn_p["out"]["weight"].T.astype(a.dtype) + attn_p["out"]["bias"].astype(a.dtype)
    x = x + o

    m = layer_norm(x, block["mlp_ln"]["weight"], block["mlp_ln"]["bias"])
    mlp0, mlp2 = block["mlp"]["0"], block["mlp"]["2"]
    m = m @ mlp0["weight"].T.astype(m.dtype) + mlp0["bias"].astype(m.dtype)
    m = jax.nn.gelu(m, approximate=False)
    m = m @ mlp2["weight"].T.astype(m.dtype) + mlp2["bias"].astype(m.dtype)
    return x + m


@partial(jax.jit, static_argnames=("cfg",))
def encode_mel_to_codes(params: Params, cfg: WhisperVQEncoderConfig,
                        mel: jax.Array) -> jax.Array:
    """One sample. mel: (n_mels, T_mel) with T_mel a multiple of
    2*audio_vq_ds_rate -> codes (T_mel // (2*ds_rate),) int32.

    Mirrors WhisperEncoderVQ.forward with return_indices=True
    (speech_vq.py:278-323) + _do_quantize (239-276).
    """
    chunk = cfg.n_window * 2
    T_mel = mel.shape[-1]
    n_chunks = -(-T_mel // chunk)
    pad = n_chunks * chunk - T_mel
    mel_p = jnp.pad(mel, ((0, 0), (0, pad)))
    # (n_chunks, n_mels, chunk) — conv per chunk == conv on zero-padded chunk
    chunks = mel_p.reshape(mel.shape[0], n_chunks, chunk).transpose(1, 0, 2)

    h = conv1d(chunks, params["conv1"]["weight"], params["conv1"]["bias"],
               padding=((1, 1),))
    h = jax.nn.gelu(h, approximate=False)
    h = conv1d(h, params["conv2"]["weight"], params["conv2"]["bias"],
               stride=2, padding=((1, 1),))
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.transpose(h, (0, 2, 1))  # (n_chunks, n_window, D)

    W = cfg.n_window
    pe_table = params.get("positional_embedding")
    if pe_table is None:
        pe_table = jnp.asarray(sinusoid_positions(cfg.n_ctx, cfg.n_state))
    h = h + pe_table[:W][None, :, :].astype(h.dtype)

    # per-window valid lengths (last chunk may be partial)
    total_aftercnn = get_T_after_cnn(T_mel)
    win_lens = np.full((n_chunks,), W, np.int32)
    win_lens[-1] = total_aftercnn - W * (n_chunks - 1)
    valid = jnp.arange(W)[None, :] < jnp.asarray(win_lens)[:, None]
    bias = mask_to_bias(valid[:, None, None, :])

    for i in range(cfg.audio_vq_layers):
        h = _attention_block(params["blocks"][str(i)], h, bias, cfg.n_head)

    # pack valid positions back into one sequence (host-static slicing)
    parts = [h[c, :int(win_lens[c])] for c in range(n_chunks)]
    x = jnp.concatenate(parts, axis=0)  # (T_aftercnn, D)

    # VQ downsample conv (k=s=ds_rate), reference _do_quantize 247-250
    ds = params.get("audio_vq_downsample")
    if ds is not None:
        x = conv1d(x.T[None], ds["weight"], ds["bias"],
                   stride=cfg.audio_vq_ds_rate)[0].T

    # GRVQ encode: single group / single quantizer nearest neighbour
    embed = params["audio_quantizer"]["rvqs"]["0"]["embed"][0].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    scores = xf @ embed.T
    dist = jnp.sum(embed * embed, axis=-1)[None, :] - 2.0 * scores
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def quantize_speech(params: Params, cfg: WhisperVQEncoderConfig,
                    wavs: List[np.ndarray]) -> Tuple[List[np.ndarray], List[int]]:
    """16 kHz waveforms -> (codes list, lengths). Reference:
    Qwen3TTSTokenizerV1Encoder.quantize_speech (modeling...v1.py:1337-1340)."""
    codes, lens = [], []
    for wav in wavs:
        mel = get_mel_audio(np.asarray(wav), padding=True,
                            audio_vq_ds_rate=cfg.audio_vq_ds_rate,
                            n_mels=cfg.n_mels)
        idx = np.asarray(encode_mel_to_codes(params, cfg, mel))
        n = get_T_after_cnn(mel.shape[-1]) // cfg.audio_vq_ds_rate
        codes.append(idx[:n].astype(np.int64))
        lens.append(n)
    return codes, lens
