"""ECAPA-TDNN speaker encoder (3-second voice clone embedding).

JAX rebuild of Qwen3TTSSpeakerEncoder (modeling_qwen3_tts.py:95-393):
TDNN blocks with reflect 'same' padding, Res2Net channel-split residues,
squeeze-excitation, attentive statistics pooling, final 1x1 conv to enc_dim.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import SpeakerEncoderConfig
from ..ops.conv import conv1d
from ..weights import numeric_children

Params = Dict[str, Any]


def _same_reflect_conv(x: jax.Array, weight: jax.Array, bias: jax.Array,
                       dilation: int = 1) -> jax.Array:
    """Conv1d(padding='same', padding_mode='reflect') — torch splits the
    effective padding as (total//2, total - total//2)."""
    k = weight.shape[-1]
    total = dilation * (k - 1)
    left, right = total // 2, total - total // 2
    if total > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="reflect")
    return conv1d(x, weight, bias, dilation=dilation)


def _tdnn(block: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    h = _same_reflect_conv(x, block["conv"]["weight"], block["conv"]["bias"],
                           dilation)
    return jax.nn.relu(h)


def _res2net(block: Params, x: jax.Array, scale: int, dilation: int) -> jax.Array:
    """Res2NetBlock (reference 95-126)."""
    chunks = jnp.split(x, scale, axis=1)
    blocks = numeric_children(block["blocks"])
    outputs = []
    prev = None
    for i, part in enumerate(chunks):
        if i == 0:
            prev = part
        elif i == 1:
            prev = _tdnn(blocks[0], part, dilation)
        else:
            prev = _tdnn(blocks[i - 1], part + prev, dilation)
        outputs.append(prev)
    return jnp.concatenate(outputs, axis=1)


def _se_block(block: Params, x: jax.Array) -> jax.Array:
    """SqueezeExcitationBlock (reference 129-156)."""
    s = jnp.mean(x, axis=2, keepdims=True)
    s = jax.nn.relu(conv1d(s, block["conv1"]["weight"], block["conv1"]["bias"]))
    s = jax.nn.sigmoid(conv1d(s, block["conv2"]["weight"], block["conv2"]["bias"]))
    return x * s


def _se_res2net(block: Params, cfg: SpeakerEncoderConfig, x: jax.Array,
                kernel_size: int, dilation: int) -> jax.Array:
    """SqueezeExcitationRes2NetBlock (reference 269-308)."""
    residual = x
    h = _tdnn(block["tdnn1"], x)
    h = _res2net(block["res2net_block"], h, cfg.enc_res2net_scale, dilation)
    h = _tdnn(block["tdnn2"], h)
    h = _se_block(block["se_block"], h)
    return h + residual


def _attentive_stats_pool(block: Params, x: jax.Array) -> jax.Array:
    """AttentiveStatisticsPooling (reference 159-245), full-length mask."""
    eps = 1e-12
    B, C, T = x.shape
    total = float(T)

    def stats(x, m):
        mean = jnp.sum(m * x, axis=2)
        std = jnp.sqrt(jnp.clip(jnp.sum(m * (x - mean[..., None]) ** 2, axis=2),
                                min=eps))
        return mean, std

    uniform = jnp.full((B, 1, T), 1.0 / total, x.dtype)
    mean, std = stats(x, uniform)
    attn_in = jnp.concatenate(
        [x,
         jnp.repeat(mean[..., None], T, axis=2),
         jnp.repeat(std[..., None], T, axis=2)], axis=1)
    attn = _tdnn(block["tdnn"], attn_in)
    attn = jnp.tanh(attn)
    attn = _same_reflect_conv(attn, block["conv"]["weight"], block["conv"]["bias"])
    attn = jax.nn.softmax(attn, axis=2)
    mean, std = stats(x, attn)
    return jnp.concatenate([mean, std], axis=1)[..., None]  # (B, 2C, 1)


def speaker_encoder_forward(params: Params, cfg: SpeakerEncoderConfig,
                            mels: jax.Array) -> jax.Array:
    """mels: (B, T, mel_dim) -> (B, enc_dim).

    Reference: Qwen3TTSSpeakerEncoder.forward (373-393).
    """
    x = jnp.transpose(mels, (0, 2, 1))  # (B, mel, T)
    blocks = numeric_children(params["blocks"])
    feats = []
    h = _tdnn(blocks[0], x, cfg.enc_dilations[0])
    feats.append(h)
    for i in range(1, len(cfg.enc_channels) - 1):
        h = _se_res2net(blocks[i], cfg, h, cfg.enc_kernel_sizes[i],
                        cfg.enc_dilations[i])
        feats.append(h)
    h = jnp.concatenate(feats[1:], axis=1)
    h = _tdnn(params["mfa"], h, cfg.enc_dilations[-1])
    h = _attentive_stats_pool(params["asp"], h)
    h = _same_reflect_conv(h, params["fc"]["weight"], params["fc"]["bias"])
    return h[..., 0]


@partial(jax.jit, static_argnames=("cfg",))
def extract_speaker_embedding(params: Params, cfg: SpeakerEncoderConfig,
                              audio: jax.Array) -> jax.Array:
    """24 kHz mono waveform (T,) -> (enc_dim,) speaker embedding.

    Reference: extract_speaker_embedding (modeling_qwen3_tts.py:1940-1954):
    mel(n_fft 1024, 128 bins, hop 256, win 1024, fmax 12000) -> encoder.

    Jitted per audio length (the stats pooling is over exact frames, so
    padding/bucketing would change the embedding — reference semantics keep
    the exact length; eager dispatch of the ~50-op ECAPA stack is far worse
    than one compile per distinct reference-audio length).
    """
    from ..ops.stft import mel_spectrogram

    mels = mel_spectrogram(audio[None, :], n_fft=1024, num_mels=128,
                           sampling_rate=24000, hop_size=256, win_size=1024,
                           fmin=0, fmax=12000)
    mels = jnp.transpose(mels, (0, 2, 1))
    return speaker_encoder_forward(params, cfg, mels)[0]
