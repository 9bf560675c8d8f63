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


def test_runner_asset_missing_paths(tmp_path, capsys):
    """`python -m qwen3_tts_tpu.evaluation` with no assets: every suite
    SKIPS with a reason in the table and the command still exits 0."""
    from qwen3_tts_tpu.evaluation import main

    out_json = tmp_path / "report.json"
    rc = main(["--suite", "all", "--out", str(out_json)])
    assert rc == 0
    table = capsys.readouterr().out
    assert "skipped" in table
    import json

    rep = json.loads(out_json.read_text())
    assert rep["suites"] == {}
    assert "tokenizer_roundtrip" in rep["skipped"]
    assert "seed_tts" in rep["skipped"]
    # bogus checkpoint path: reported, not raised
    rc = main(["--ckpt", str(tmp_path / "nope"), "--suite", "seed-tts",
               "--out", str(out_json)])
    assert rc == 0
    rep = json.loads(out_json.read_text())
    assert "checkpoint" in rep["skipped"]


@requires_reference
def test_runner_tokenizer_suite_tiny_ckpt(tmp_path, capsys):
    """Tokenizer suite end to end on the tiny fabricated checkpoint and a
    tmp dir of wavs: real metric rows come out, PESQ/STOI degrade to
    'unavailable' markers (packages absent in-image)."""
    import json
    import os

    from qwen3_tts_tpu.evaluation import main
    from qwen3_tts_tpu.utils.audio import write_wav
    from tests._fixtures import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        write_wav(str(wav_dir / f"u{i}.wav"),
                  (0.2 * rng.normal(size=24000)).astype(np.float32), 24000)

    out_json = tmp_path / "report.json"
    rc = main(["--tokenizer-ckpt", os.path.join(ckpt, "speech_tokenizer"),
               "--suite", "tokenizer", "--wav-dir", str(wav_dir),
               "--out", str(out_json)])
    assert rc == 0
    rep = json.loads(out_json.read_text())
    agg = rep["suites"]["tokenizer_roundtrip"]
    assert agg["n_utterances"] == 2
    for k in ("snr_db", "si_sdr_db", "lsd_db", "mcd_db"):
        assert np.isfinite(agg[k])
    assert "unavailable" in str(agg["pesq_wb"])
    table = capsys.readouterr().out
    assert "tokenizer_roundtrip" in table


@requires_reference
def test_runner_seed_tts_suite_tiny_ckpt(tmp_path, monkeypatch):
    """seed-tts suite on the tiny checkpoint with --asr none: synthesis
    runs per manifest row; WER marked unavailable, SIM computed when a
    ref_audio row and speaker encoder exist."""
    import json

    from qwen3_tts_tpu import evaluation
    from qwen3_tts_tpu.evaluation import main
    from qwen3_tts_tpu.utils.audio import write_wav
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    # the tiny ckpt ships no AutoTokenizer asset; inject the fake one the
    # API tests use so synthesis can run
    from qwen3_tts_tpu.inference.model import Qwen3TTSModel

    orig = Qwen3TTSModel.from_pretrained.__func__

    def patched(cls, path, **kw):
        m = orig(cls, path, **kw)
        m.processor = FakeTokenizer()
        return m

    monkeypatch.setattr(Qwen3TTSModel, "from_pretrained",
                        classmethod(patched))

    ref = tmp_path / "ref.wav"
    rng = np.random.default_rng(4)
    write_wav(str(ref), (0.2 * rng.normal(size=24000)).astype(np.float32),
              24000)
    manifest = tmp_path / "eval.jsonl"
    manifest.write_text(
        json.dumps({"text": "hello world", "lang": "en",
                    "ref_audio": str(ref)}) + "\n")

    out_json = tmp_path / "report.json"
    rc = main(["--ckpt", ckpt, "--suite", "seed-tts",
               "--manifest", str(manifest), "--asr", "none",
               "--max-new-tokens", "8", "--out", str(out_json)])
    assert rc == 0
    rep = json.loads(out_json.read_text())
    suite = rep["suites"]["seed_tts"]
    assert suite["n_utterances"] == 1
    assert "unavailable" in str(suite["wer"])


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
