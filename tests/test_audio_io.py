"""Audio input robustness: FLAC decode (pure numpy), format dispatch,
and the load_audio surface across formats.

The FLAC decoder is validated by lossless round-trip through our own
encoder (verbatim and fixed-1+Rice frames exercise the constant/verbatim/
fixed subframe paths and Rice residual decode), plus — when soundfile is
installed — cross-checks against libsndfile-encoded files covering the LPC
and stereo-decorrelation paths.
"""

import os

import numpy as np
import pytest


def _speechlike(T, C=1, seed=0):
    """A correlated signal (so fixed/LPC predictors actually engage).
    Returns (T, C)."""
    rng = np.random.default_rng(seed)
    t = np.arange(T)[:, None] / 24000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.1 * np.sin(2 * np.pi * 440 * t + 0.7)
         + 0.02 * rng.normal(size=(T, C)))
    return np.clip(x, -1, 1)


def _quantized(x, bps=16):
    q = np.clip(np.round(np.asarray(x, np.float64) * (1 << (bps - 1))),
                -(1 << (bps - 1)), (1 << (bps - 1)) - 1)
    return (q / (1 << (bps - 1))).astype(np.float32)


@pytest.mark.parametrize("mode", ["verbatim", "fixed1"])
@pytest.mark.parametrize("channels", [1, 2])
def test_flac_roundtrip_lossless(tmp_path, mode, channels):
    from qwen3_tts_tpu.utils.flac import read_flac, write_flac

    T = 5000  # spans two 4096-blocks -> multi-frame path
    x = _speechlike(T, channels, seed=1)
    if channels == 1:
        x = x.reshape(T)
    path = str(tmp_path / "a.flac")
    write_flac(path, x, 24000, mode=mode)
    y, sr = read_flac(path)
    assert sr == 24000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, _quantized(x), atol=0)  # bit-exact


def test_flac_bytes_input(tmp_path):
    from qwen3_tts_tpu.utils.flac import read_flac, write_flac

    x = _speechlike(1000).reshape(-1)
    path = str(tmp_path / "b.flac")
    write_flac(path, x, 16000)
    with open(path, "rb") as f:
        payload = f.read()
    y, sr = read_flac(payload)
    assert sr == 16000
    np.testing.assert_array_equal(y, _quantized(x))


def test_read_audio_dispatch(tmp_path):
    from qwen3_tts_tpu.utils.audio import read_audio, write_wav
    from qwen3_tts_tpu.utils.flac import write_flac

    x = _speechlike(800).reshape(-1)
    wav_path = str(tmp_path / "c.wav")
    flac_path = str(tmp_path / "c.flac")
    write_wav(wav_path, x, 24000)
    write_flac(flac_path, x, 24000)

    yw, srw = read_audio(wav_path)
    yf, srf = read_audio(flac_path)
    assert srw == srf == 24000
    np.testing.assert_allclose(yw, yf, atol=1.0 / 32768)

    with pytest.raises(ValueError, match="unsupported audio format"):
        read_audio(b"\xff\xfb\x90\x00garbage-mp3-like")


def test_load_audio_flac_path_and_base64(tmp_path):
    import base64

    from qwen3_tts_tpu.utils.audio import load_audio
    from qwen3_tts_tpu.utils.flac import write_flac

    x = _speechlike(600).reshape(-1)
    path = str(tmp_path / "d.flac")
    write_flac(path, x, 24000)
    y, sr = load_audio(path)
    assert sr == 24000 and y.ndim == 1

    with open(path, "rb") as f:
        b64 = "data:audio/flac;base64," + base64.b64encode(f.read()).decode()
    y2, sr2 = load_audio(b64)
    np.testing.assert_array_equal(y, y2)


def test_flac_cross_check_soundfile(tmp_path):
    """When libsndfile is available, decode ITS encoder's output (exercises
    LPC subframes + left/side stereo, which our encoder never emits)."""
    sf = pytest.importorskip("soundfile")
    if not callable(getattr(sf, "write", None)):
        pytest.skip("soundfile is a test stub (tests/_reference.py)")
    from qwen3_tts_tpu.utils.flac import read_flac

    x = _speechlike(12000, 2, seed=3)
    path = str(tmp_path / "sf.flac")
    sf.write(path, x, 24000, format="FLAC", subtype="PCM_16")
    want, _ = sf.read(path, dtype="float32")
    got, sr = read_flac(path)
    assert sr == 24000
    np.testing.assert_allclose(got, want, atol=1.0 / 32768)


def test_flac_native_matches_python(tmp_path, monkeypatch):
    """The C hot loops (native/flac_fast.c) must be bit-identical to the
    pure-Python bitstream path on all subframe types we can emit."""
    from qwen3_tts_tpu.utils import flac as flac_mod
    from qwen3_tts_tpu.utils.native import flac_fast

    if flac_fast() is None:
        pytest.skip("no C compiler available")

    x = _speechlike(9000, 2, seed=7)
    for mode in ("verbatim", "fixed1"):
        path = str(tmp_path / f"n_{mode}.flac")
        flac_mod.write_flac(path, x, 24000, mode=mode)

        got_native, srn = flac_mod.read_flac(path)
        monkeypatch.setenv("QWEN3_TTS_NO_NATIVE", "1")
        got_python, srp = flac_mod.read_flac(path)
        monkeypatch.delenv("QWEN3_TTS_NO_NATIVE")
        assert srn == srp == 24000
        np.testing.assert_array_equal(got_native, got_python)


def test_wav_extensible_int32_pcm(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE must read the SubFormat GUID: 32-bit integer
    PCM was previously guessed as IEEE float (full-scale garbage)."""
    import struct

    from qwen3_tts_tpu.utils.audio import read_wav

    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.5, 0.5, size=(64,)) * (1 << 31)).astype("<i4")
    sr = 16000
    # KSDATAFORMAT_SUBTYPE_PCM GUID (leading tag 0x0001)
    guid = struct.pack("<HHHH", 1, 0, 0x10, 0x8000) + \
        bytes([0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71])
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt += struct.pack("<HHI", 22, 32, 0x4) + guid
    data = x.tobytes()
    riff = b"WAVE"
    riff += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    path = str(tmp_path / "ext.wav")
    with open(path, "wb") as f:
        f.write(payload)
    y, got_sr = read_wav(path)
    assert got_sr == sr
    np.testing.assert_allclose(y, x.astype(np.float64) / (1 << 31),
                               atol=1e-9)


def test_flac_truncated_raises(tmp_path):
    """A FLAC cut off mid-frame must raise, not return corrupt audio."""
    import pytest

    from qwen3_tts_tpu.utils.flac import read_flac, write_flac

    rng = np.random.default_rng(1)
    x = rng.uniform(-0.3, 0.3, size=(4000,)).astype(np.float32)
    path = str(tmp_path / "t.flac")
    write_flac(path, x, 16000)
    with open(path, "rb") as f:
        payload = f.read()
    with pytest.raises(ValueError):
        read_flac(payload[:len(payload) * 2 // 3])
