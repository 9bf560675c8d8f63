"""Evaluation harness: metric math on signals with known answers, WER
semantics, and the tokenizer-roundtrip / TTS->ASR harnesses end to end on
the tiny fabricated checkpoint."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _tone(T=24000, f=220.0, sr=24000):
    return (0.5 * np.sin(2 * np.pi * f * np.arange(T) / sr)).astype(np.float32)


def test_snr_and_si_sdr_known_values():
    from qwen3_tts_tpu.evaluation import si_sdr_db, snr_db

    x = _tone()
    assert snr_db(x, x) > 100          # identical -> huge SNR
    noisy = x + 0.05 * np.sin(2 * np.pi * 1000 * np.arange(x.size) / 24000)
    got = snr_db(x, noisy)
    want = 10 * np.log10(np.sum(x**2) / np.sum((x - noisy)**2))
    assert abs(got - want) < 1e-6
    # SI-SDR is scale invariant; plain SNR is not
    assert si_sdr_db(x, 0.5 * x) > 100
    assert snr_db(x, 0.5 * x) < 10


def test_spectral_metrics_order():
    from qwen3_tts_tpu.evaluation import (log_spectral_distance_db, mcd_db,
                                          reconstruction_report)

    rng = np.random.default_rng(0)
    x = _tone()
    slight = x + 0.01 * rng.normal(size=x.size).astype(np.float32)
    heavy = x + 0.3 * rng.normal(size=x.size).astype(np.float32)
    assert log_spectral_distance_db(x, slight) < log_spectral_distance_db(x, heavy)
    assert mcd_db(x, slight) < mcd_db(x, heavy)
    rep = reconstruction_report(x, slight)
    assert set(rep) == {"snr_db", "si_sdr_db", "lsd_db", "mcd_db"}


def test_wer_semantics():
    from qwen3_tts_tpu.evaluation import evaluate_wer, wer

    assert wer("hello world", "hello world") == 0.0
    assert wer("Hello, WORLD!", "hello world") == 0.0     # normalization
    assert wer("a b c d", "a x c d") == pytest.approx(0.25)
    assert wer("a b", "a b c") == pytest.approx(0.5)      # insertion
    assert wer("你好世界", "你好地界", lang="zh") == pytest.approx(0.25)
    res = evaluate_wer(["a b", "c d"], ["a b", "c x"])
    assert res.wer == pytest.approx(0.25)
    assert res.per_utterance == [0.0, 0.5]


def test_cosine_similarity():
    from qwen3_tts_tpu.evaluation import cosine_similarity

    v = np.array([1.0, 2.0, 3.0])
    assert cosine_similarity(v, 2 * v) == pytest.approx(1.0)
    assert cosine_similarity(v, -v) == pytest.approx(-1.0)


@requires_reference
def test_tokenizer_roundtrip_harness(tmp_path):
    from qwen3_tts_tpu import Qwen3TTSTokenizer
    from qwen3_tts_tpu.evaluation import evaluate_tokenizer_roundtrip
    from tests._fixtures import make_tiny_checkpoint

    import os

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    tok = Qwen3TTSTokenizer.from_pretrained(
        os.path.join(ckpt, "speech_tokenizer"))
    sr = tok.get_input_sample_rate()
    rng = np.random.default_rng(1)
    wavs = [(0.2 * rng.normal(size=(sr,))).astype(np.float32)
            for _ in range(2)]
    rep = evaluate_tokenizer_roundtrip(tok, wavs, sr)
    for k in ("snr_db", "si_sdr_db", "lsd_db", "mcd_db"):
        assert np.isfinite(rep[k])


@requires_reference
def test_tts_wer_harness(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.evaluation import evaluate_tts_wer
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    # a fake "perfect" ASR closes the loop without an ASR model in-image
    texts = ["hello there", "second utterance"]
    it = iter(texts)
    res = evaluate_tts_wer(model, texts, asr_fn=lambda wav, sr: next(it),
                           speaker="vivian", seed=0)
    assert res.wer == 0.0

    it2 = iter(["hello there", "wrong words entirely"])
    res2 = evaluate_tts_wer(model, texts, asr_fn=lambda wav, sr: next(it2),
                            speaker="vivian", seed=0)
    assert res2.wer > 0.0
