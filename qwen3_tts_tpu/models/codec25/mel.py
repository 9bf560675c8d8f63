"""Mel front ends for the 25 Hz tokenizer.

- Whisper log-mel (16 kHz, n_fft 400, hop 160, center=True reflect padding,
  log10 + dynamic-range floor): reference vq/whisper_encoder.py:62-107.
- BigVGAN-style mel (filter 1024, hop 160, win 640, fmax 8000, log
  compression): reference vq/speech_vq.py:42-115 (MelSpectrogramFeatures).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stft import hann_window, mel_filterbank

N_FFT = 400
HOP_LENGTH = 160


def whisper_log_mel(audio: np.ndarray, n_mels: int = 128,
                    padding: int = 0) -> jnp.ndarray:
    """audio: (T,) 16 kHz -> (n_mels, frames) log-mel.

    Matches torch.stft(center=True default) + magnitude^2 path of the
    reference log_mel_spectrogram.
    """
    x = jnp.asarray(audio, jnp.float32)
    if padding > 0:
        x = jnp.pad(x, (0, padding))
    # torch.stft center=True: reflect-pad n_fft//2 both sides
    x = jnp.pad(x, (N_FFT // 2, N_FFT // 2), mode="reflect")
    window = jnp.asarray(hann_window(N_FFT))
    n_frames = 1 + (x.shape[0] - N_FFT) // HOP_LENGTH
    idx = jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    frames = x[idx] * window[None, :]
    spec = jnp.fft.rfft(frames, n=N_FFT, axis=-1)
    mag = (jnp.abs(spec) ** 2)[:, :].T       # (freq, frames incl last)
    mag = mag[:, :-1]                        # reference drops last frame
    filters = jnp.asarray(mel_filterbank(16000, N_FFT, n_mels))
    mel = filters @ mag
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def get_T_after_cnn(L_in: int, dilation: int = 1) -> int:
    """Output length after the whisper conv stack (k3 p1 s1 then k3 p1 s2).
    Reference: whisper_encoder.py:110-115."""
    for padding, kernel_size, stride in [(1, 3, 1), (1, 3, 2)]:
        L_out = L_in + 2 * padding - dilation * (kernel_size - 1) - 1
        L_in = 1 + L_out // stride
    return L_in


def get_mel_audio(audio: np.ndarray, padding: bool = False,
                  audio_vq_ds_rate: int = 1, n_mels: int = 128) -> jnp.ndarray:
    """Reference: whisper_encoder.py:118-126 — pad so mel frames are a
    multiple of 2*ds_rate."""
    audio_len = len(audio)
    if padding:
        reduction = HOP_LENGTH * 2 * audio_vq_ds_rate
        pad = math.ceil(audio_len / reduction) * reduction - audio_len
        return whisper_log_mel(audio, n_mels=n_mels, padding=pad)
    return whisper_log_mel(audio, n_mels=n_mels)


def bigvgan_ref_mel(audio: jnp.ndarray, filter_length: int = 1024,
                    hop_length: int = 160, win_length: int = 640,
                    n_mels: int = 80, fmin: float = 0.0,
                    fmax: float = 8000.0, sr: int = 16000) -> jnp.ndarray:
    """audio: (B, T) 16 kHz -> (B, n_mels, frames) log-compressed mel.

    Matches MelSpectrogramFeatures.extract (speech_vq.py:92-115): reflect pad
    (filter-hop)/2, Hann(win) window zero-padded to filter_length,
    center=False, sqrt(|.|^2+1e-9), slaney mel, log(clamp 1e-5).
    """
    pad = (filter_length - hop_length) // 2
    y = jnp.pad(jnp.asarray(audio, jnp.float32), ((0, 0), (pad, pad)),
                mode="reflect")
    window = jnp.asarray(hann_window(win_length))
    lpad = (filter_length - win_length) // 2
    window = jnp.pad(window, (lpad, filter_length - win_length - lpad))
    n_frames = 1 + (y.shape[-1] - filter_length) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(filter_length)[None, :]
    frames = y[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=filter_length, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    mag = jnp.transpose(mag, (0, 2, 1))
    filters = jnp.asarray(mel_filterbank(sr, filter_length, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", filters, mag)
    return jnp.log(jnp.clip(mel, min=1e-5))
