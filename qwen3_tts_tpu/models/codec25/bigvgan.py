"""BigVGAN vocoder (mel -> waveform) for the 25 Hz tokenizer.

Rebuilds Qwen3TTSTokenizerV1DecoderBigVGANModel (reference
modeling_qwen3_tts_tokenizer_v1.py:698-1067):

- mel pre-processing: exp -> amplitude-to-dB -> [-1, 1] normalization
  (1038-1050);
- transposed-conv upsampling chain with AMP residual blocks whose SnakeBeta
  activations are anti-aliased by kaiser-windowed sinc up/down sampling
  (UpSample1d/DownSample1d, 739-856);
- mixed causal/'same' conv layouts per block depth (AMPBlock causal_type,
  868-992).

Everything is static-shape XLA; the kaiser filters are computed once in
numpy at call time (cached by kernel size).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...config import BigVGANConfig
from ...ops.conv import conv1d, snake_beta

Params = Dict[str, Any]


@lru_cache(maxsize=32)
def _kaiser_sinc_filter(cutoff: float, half_width: float,
                        kernel_size: int) -> np.ndarray:
    """Reference kaiser_sinc_filter1d (739-782)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (attenuation - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)  # matches torch periodic=False
    if even:
        time_idx = np.arange(-half_size, half_size) + 0.5
    else:
        time_idx = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((1, 1, kernel_size), np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time_idx)
    filt = filt / filt.sum()
    return filt.reshape(1, 1, kernel_size).astype(np.float32)


def _upsample1d(x: jax.Array, ratio: int) -> jax.Array:
    """Anti-aliased 2x-style upsample (reference UpSample1d 785-807)."""
    kernel_size = int(6 * ratio // 2) * 2
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    filt = jnp.asarray(_kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size))

    C = x.shape[1]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)), mode="edge")
    w = jnp.broadcast_to(filt, (C, 1, kernel_size))
    # grouped transposed conv: zero-insert + correlate with flipped kernel
    wf = jnp.flip(w, axis=-1)
    out = jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype), window_strides=(1,),
        padding=((kernel_size - 1, kernel_size - 1),),
        lhs_dilation=(stride,), dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=C, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    out = ratio * out
    return out[..., pad_left:out.shape[-1] - pad_right]


def _downsample1d(x: jax.Array, ratio: int, kernel_size: int) -> jax.Array:
    """Reference DownSample1d (810-832)."""
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    filt = jnp.asarray(_kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size))
    C = x.shape[1]
    x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)), mode="edge")
    w = jnp.broadcast_to(filt, (C, 1, kernel_size))
    return conv1d(x, w, stride=ratio, groups=C)


def _aa_snake(act_params: Params, x: jax.Array, up_ratio: int = 2,
              down_ratio: int = 2, up_k: int = 12, down_k: int = 12) -> jax.Array:
    """TorchActivation1d(SnakeBeta): upsample -> snake -> downsample
    (reference 835-856)."""
    h = _upsample1d(x, up_ratio)
    h = snake_beta(h, act_params["act"]["alpha"], act_params["act"]["beta"])
    return _downsample1d(h, down_ratio, down_k)


def _causal_conv(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """CausalConv1d (859-865): left-pad dilation*(k-1)."""
    k = p["weight"].shape[-1]
    pad = dilation * (k - 1)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
    return conv1d(x, p["weight"], p.get("bias"), dilation=dilation)


def _same_conv(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    k = p["weight"].shape[-1]
    pad = (k * dilation - dilation) // 2
    return conv1d(x, p["weight"], p.get("bias"), dilation=dilation,
                  padding=((pad, pad),))


def _amp_block(bp: Params, x: jax.Array, kernel_size: int, dilations,
               causal_type: str) -> jax.Array:
    """AMPBlock (868-992)."""
    acts = bp["activations"]
    if causal_type == "2":
        h = _same_conv(bp["pre_conv"], x)
        h = _aa_snake(bp["pre_act"], h)
    else:
        h = x
    for i, dil in enumerate(dilations):
        a1 = acts[str(2 * i)]
        a2 = acts[str(2 * i + 1)]
        hh = _aa_snake(a1, h)
        hh = _causal_conv(bp["convs1"][str(i)], hh, dilation=dil)
        hh = _aa_snake(a2, hh)
        if causal_type == "1":
            hh = _same_conv(bp["convs2"][str(i)], hh)
        else:
            hh = _causal_conv(bp["convs2"][str(i)], hh)
        x = x + hh
        h = hh
    return x


def _process_mel(mel: jax.Array) -> jax.Array:
    """exp -> dB -> normalize to [-1, 1] (reference 1038-1050)."""
    amp = jnp.exp(mel.astype(jnp.float32))
    min_level = jnp.exp(-115 / 20.0 * jnp.log(10.0))
    db = 20.0 * jnp.log10(jnp.clip(amp, min=min_level)) - 20.0
    return jnp.clip((2.0) * ((db - (-115)) / 115.0) - 1.0, -1.0, 1.0).astype(mel.dtype)


def bigvgan_forward(params: Params, cfg: BigVGANConfig,
                    mel: jax.Array) -> jax.Array:
    """mel: (B, mel_dim, T) -> wav (B, T * prod(upsample_rates)).

    Reference: Qwen3TTSTokenizerV1DecoderBigVGANModel.forward (1052-1067).
    """
    h = _process_mel(mel)
    h = conv1d(h, params["conv_pre"]["weight"], params["conv_pre"]["bias"],
               padding=((2, 2),))

    n_res = len(cfg.resblock_kernel_sizes)
    for li, (stride, k) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernel_sizes)):
        up = params["ups"][str(li)]["0"]
        # torch ConvTranspose1d with padding p: crop p from both ends
        w = jnp.flip(up["weight"], axis=-1).swapaxes(0, 1)
        h = jax.lax.conv_general_dilated(
            h, w.astype(h.dtype), window_strides=(1,),
            padding=((k - 1, k - 1),), lhs_dilation=(stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32).astype(h.dtype)
        if up.get("bias") is not None:
            h = h + up["bias"].astype(h.dtype)[None, :, None]
        p = (k - stride) // 2
        if p > 0:
            h = h[..., p:-p]

        causal_type = "1" if li > 1 else "2"
        res = None
        for bi in range(n_res):
            block = params["resblocks"][str(li * n_res + bi)]
            out = _amp_block(block, h, cfg.resblock_kernel_sizes[bi],
                             cfg.resblock_dilation_sizes[bi], causal_type)
            res = out if res is None else res + out
        h = res / n_res

    h = _aa_snake(params["activation_post"], h)
    wav = conv1d(h, params["conv_post"]["weight"], None, padding=((3, 3),))
    return jnp.clip(wav, -1.0, 1.0)[:, 0, :]
