"""Quality evaluation harness: reconstruction metrics, WER, speaker
similarity.

The reference publishes quality tables (Seed-TTS WER, speaker SIM,
tokenizer-reconstruction PESQ/STOI/UTMOS — README.md:465-1335) but ships no
evaluation code.  This module provides the measurable pieces:

- signal metrics computable without external models: SNR, SI-SDR,
  log-spectral distance, mel-cepstral distortion (MCD) — the standard
  objective proxies for codec reconstruction quality;
- WER/CER with the usual text normalization, against any ASR callable
  (`asr_fn(wav, sr) -> str`), so Whisper or a cloud ASR plugs in where
  available;
- speaker similarity as cosine over this framework's own speaker encoders
  (ECAPA for 12 Hz voice clone, CAM++ x-vector for 25 Hz).

Everything here is numpy/JAX; heavy externals stay injectable.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Reconstruction / signal metrics
# ---------------------------------------------------------------------------


def _align(ref: np.ndarray, deg: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n = min(ref.shape[-1], deg.shape[-1])
    return ref[..., :n].astype(np.float64), deg[..., :n].astype(np.float64)


def snr_db(ref: np.ndarray, deg: np.ndarray) -> float:
    """Plain signal-to-noise ratio in dB."""
    ref, deg = _align(ref, deg)
    noise = ref - deg
    return float(10 * np.log10(
        (np.sum(ref ** 2) + 1e-12) / (np.sum(noise ** 2) + 1e-12)))


def si_sdr_db(ref: np.ndarray, deg: np.ndarray) -> float:
    """Scale-invariant SDR (Le Roux et al. 2019)."""
    ref, deg = _align(ref, deg)
    ref = ref - ref.mean()
    deg = deg - deg.mean()
    alpha = np.dot(deg, ref) / (np.dot(ref, ref) + 1e-12)
    target = alpha * ref
    noise = deg - target
    return float(10 * np.log10(
        (np.sum(target ** 2) + 1e-12) / (np.sum(noise ** 2) + 1e-12)))


def _stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    if x.shape[-1] < n_fft:  # short signals: one zero-padded frame
        x = np.pad(x, (0, n_fft - x.shape[-1]))
    window = np.hanning(n_fft + 1)[:-1]
    n_frames = (x.shape[-1] - n_fft) // hop + 1
    frames = np.stack([x[i * hop:i * hop + n_fft] * window
                       for i in range(n_frames)], axis=0)
    return np.abs(np.fft.rfft(frames, axis=-1))


def log_spectral_distance_db(ref: np.ndarray, deg: np.ndarray,
                             n_fft: int = 1024, hop: int = 256) -> float:
    """RMS distance between log power spectra, in dB."""
    ref, deg = _align(ref, deg)
    R = _stft_mag(ref, n_fft, hop)
    D = _stft_mag(deg, n_fft, hop)
    lr = 10 * np.log10(R ** 2 + 1e-10)
    ld = 10 * np.log10(D ** 2 + 1e-10)
    return float(np.mean(np.sqrt(np.mean((lr - ld) ** 2, axis=-1))))


def _mel_filter(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    # HTK-style mel filterbank (triangular, amplitude 1 peaks)
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0), hz_to_mel(sr / 2), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        l, c, r = bins[i], bins[i + 1], bins[i + 2]
        for j in range(l, c):
            if c > l:
                fb[i, j] = (j - l) / (c - l)
        for j in range(c, r):
            if r > c:
                fb[i, j] = (r - j) / (r - c)
    return fb


def mcd_db(ref: np.ndarray, deg: np.ndarray, sr: int = 24000,
           n_fft: int = 1024, hop: int = 256, n_mels: int = 40,
           n_cep: int = 13) -> float:
    """Mel-cepstral distortion (dB), DCT of log-mel, c1..n_cep, standard
    10*sqrt(2)/ln(10) scaling."""
    ref, deg = _align(ref, deg)
    fb = _mel_filter(sr, n_fft, n_mels)
    def cep(x):
        m = np.log(fb @ _stft_mag(x, n_fft, hop).T ** 2 + 1e-10)  # (M, T)
        # DCT-II over mel axis
        M = m.shape[0]
        basis = np.cos(np.pi * np.arange(n_cep + 1)[:, None]
                       * (np.arange(M) + 0.5)[None, :] / M)
        return (basis @ m)[1:]  # drop c0 (energy)

    cr, cd = cep(ref), cep(deg)
    T = min(cr.shape[1], cd.shape[1])
    d = np.sqrt(np.sum((cr[:, :T] - cd[:, :T]) ** 2, axis=0))
    return float((10.0 * np.sqrt(2.0) / np.log(10.0)) * np.mean(d))


def reconstruction_report(ref: np.ndarray, deg: np.ndarray,
                          sr: int = 24000) -> Dict[str, float]:
    return {
        "snr_db": snr_db(ref, deg),
        "si_sdr_db": si_sdr_db(ref, deg),
        "lsd_db": log_spectral_distance_db(ref, deg),
        "mcd_db": mcd_db(ref, deg, sr=sr),
    }


# ---------------------------------------------------------------------------
# WER / CER
# ---------------------------------------------------------------------------


def normalize_text(text: str, lang: str = "en") -> str:
    """Whisper-style light normalization: casefold, strip punctuation,
    collapse whitespace; CJK splits into chars."""
    text = unicodedata.normalize("NFKC", text).casefold()
    text = re.sub(r"[^\w\s]|_", " ", text, flags=re.UNICODE)
    text = re.sub(r"\s+", " ", text).strip()
    return text


def _edit_distance(a: Sequence, b: Sequence) -> int:
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def wer(ref: str, hyp: str, lang: str = "en") -> float:
    """Word error rate (character error rate for zh/ja/ko/th)."""
    r, h = normalize_text(ref, lang), normalize_text(hyp, lang)
    if lang in ("zh", "ja", "ko", "th", "yue", "chinese", "japanese",
                "korean"):
        ru, hu = list(r.replace(" ", "")), list(h.replace(" ", ""))
    else:
        ru, hu = r.split(), h.split()
    if not ru:
        return 0.0 if not hu else 1.0
    return _edit_distance(ru, hu) / len(ru)


@dataclass
class WERResult:
    wer: float
    per_utterance: List[float]


def evaluate_wer(refs: Sequence[str], hyps: Sequence[str],
                 lang: str = "en") -> WERResult:
    per = [wer(r, h, lang) for r, h in zip(refs, hyps)]
    return WERResult(wer=float(np.mean(per)) if per else 0.0,
                     per_utterance=per)


# ---------------------------------------------------------------------------
# Speaker similarity
# ---------------------------------------------------------------------------


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) /
                 (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def speaker_similarity_ecapa(speaker_encoder_params, speaker_encoder_cfg,
                             wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    """Cosine similarity of ECAPA embeddings (both wavs 24 kHz mono) —
    the 12 Hz voice-clone speaker space."""
    from .models.speaker_encoder import extract_speaker_embedding

    ea = np.asarray(extract_speaker_embedding(
        speaker_encoder_params, speaker_encoder_cfg, np.asarray(wav_a)))
    eb = np.asarray(extract_speaker_embedding(
        speaker_encoder_params, speaker_encoder_cfg, np.asarray(wav_b)))
    return cosine_similarity(ea, eb)


# ---------------------------------------------------------------------------
# Harnesses
# ---------------------------------------------------------------------------


def evaluate_tokenizer_roundtrip(tokenizer, wavs: Sequence[np.ndarray],
                                 sr: int) -> Dict[str, float]:
    """Encode+decode each wav through a Qwen3TTSTokenizer and aggregate
    reconstruction metrics (mean over utterances)."""
    reports: List[Dict[str, float]] = []
    for wav in wavs:
        enc = tokenizer.encode(np.asarray(wav, np.float32), sr=sr)
        out, out_sr = tokenizer.decode(enc)
        deg = np.asarray(out[0]).reshape(-1)
        ref = np.asarray(wav, np.float32).reshape(-1)
        if out_sr != sr:
            from .utils.audio import resample

            ref = resample(ref, sr, out_sr)
        reports.append(reconstruction_report(ref, deg, sr=out_sr))
    return {k: float(np.mean([r[k] for r in reports]))
            for k in reports[0]} if reports else {}


def evaluate_tts_wer(model, texts: Sequence[str],
                     asr_fn: Callable[[np.ndarray, int], str],
                     lang: str = "en", speaker: Optional[str] = None,
                     **generate_kwargs) -> WERResult:
    """Synthesize `texts`, transcribe with `asr_fn`, report WER.

    `asr_fn(wav, sr) -> str` is injectable (Whisper, a cloud API, or a test
    fake) — no ASR model ships in-image."""
    wavs, sr = model.generate_custom_voice(
        text=list(texts), speaker=speaker or
        model.get_supported_speakers()[0], **generate_kwargs)
    hyps = [asr_fn(np.asarray(w), sr) for w in wavs]
    return evaluate_wer(list(texts), hyps, lang=lang)
