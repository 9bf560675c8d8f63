"""Peripheral subsystems: voice-clone prompt persistence, processor wrapper,
orbax train-state resume, audio I/O, profiling utils, CLI parser."""

import json
import os

import numpy as np
import pytest


def test_voice_clone_prompt_roundtrip(tmp_path):
    from qwen3_tts_tpu.inference.model import (VoiceClonePromptItem,
                                               load_voice_clone_prompts,
                                               save_voice_clone_prompts)

    rng = np.random.default_rng(0)
    items = [
        VoiceClonePromptItem(ref_code=rng.integers(0, 100, size=(7, 16)),
                             ref_spk_embedding=rng.normal(size=(32,)).astype(np.float32),
                             x_vector_only_mode=False, icl_mode=True,
                             ref_text="hello"),
        VoiceClonePromptItem(ref_code=None,
                             ref_spk_embedding=rng.normal(size=(32,)).astype(np.float32),
                             x_vector_only_mode=True, icl_mode=False,
                             ref_text=None),
    ]
    path = str(tmp_path / "prompt.npz")
    save_voice_clone_prompts(path, items)
    back = load_voice_clone_prompts(path)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0].ref_code, items[0].ref_code)
    np.testing.assert_allclose(back[0].ref_spk_embedding,
                               items[0].ref_spk_embedding)
    assert back[0].ref_text == "hello" and back[0].icl_mode
    assert back[1].ref_code is None and back[1].x_vector_only_mode


def test_voice_clone_prompt_pt_interop(tmp_path):
    """.pt prompts are interchangeable with the reference demo's torch
    payloads (qwen_tts/cli/demo.py:516-522 save, 533-563 load): a payload
    written exactly the reference's way loads here, and ours round-trips."""
    torch = pytest.importorskip("torch")
    from qwen3_tts_tpu.inference.model import (VoiceClonePromptItem,
                                               load_voice_clone_prompts,
                                               save_voice_clone_prompts)

    rng = np.random.default_rng(1)
    code = rng.integers(0, 100, size=(5, 16))
    spk = rng.normal(size=(32,)).astype(np.float32)

    # a payload as the reference demo writes it (torch tensors, asdict items)
    ref_path = str(tmp_path / "ref_prompt.pt")
    torch.save({"items": [{
        "ref_code": torch.from_numpy(code),
        "ref_spk_embedding": torch.from_numpy(spk),
        "x_vector_only_mode": False,
        "icl_mode": True,
        "ref_text": "ni hao",
    }]}, ref_path)
    back = load_voice_clone_prompts(ref_path)
    assert len(back) == 1 and back[0].icl_mode and back[0].ref_text == "ni hao"
    np.testing.assert_array_equal(back[0].ref_code, code)
    np.testing.assert_allclose(back[0].ref_spk_embedding, spk)

    # our .pt writer round-trips through our loader AND torch.load
    items = [VoiceClonePromptItem(ref_code=code, ref_spk_embedding=spk,
                                  x_vector_only_mode=False, icl_mode=True,
                                  ref_text="hello"),
             VoiceClonePromptItem(ref_code=None, ref_spk_embedding=spk,
                                  x_vector_only_mode=True, icl_mode=False)]
    our_path = str(tmp_path / "ours.pt")
    save_voice_clone_prompts(our_path, items)
    back2 = load_voice_clone_prompts(our_path)
    assert back2[1].ref_code is None and back2[1].x_vector_only_mode
    np.testing.assert_array_equal(back2[0].ref_code, code)
    # the reference loader's own checks (demo.py:536-547) hold
    payload = torch.load(our_path, map_location="cpu", weights_only=True)
    assert isinstance(payload, dict) and "items" in payload
    assert torch.is_tensor(payload["items"][0]["ref_spk_embedding"])


def test_wav_roundtrip(tmp_path):
    from qwen3_tts_tpu.utils.audio import read_wav, resample, write_wav

    rng = np.random.default_rng(0)
    wav = (0.5 * rng.normal(size=(2400,))).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, 24000)
    back, sr = read_wav(path)
    assert sr == 24000
    np.testing.assert_allclose(back, wav, atol=1.0 / 16384)

    down = resample(wav, 24000, 16000)
    assert abs(len(down) - 1600) <= 1


def test_train_state_resume(tmp_path):
    import jax.numpy as jnp

    from qwen3_tts_tpu.finetune.checkpoint import (latest_step,
                                                   restore_train_state,
                                                   save_train_state)

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    opt_state = {"m": jnp.ones(3)}
    d = str(tmp_path / "ts")
    os.makedirs(d)
    save_train_state(d, 10, params, opt_state)
    save_train_state(d, 20, params, opt_state)
    assert latest_step(d) == 20
    p, o, s = restore_train_state(d)
    assert s == 20
    np.testing.assert_array_equal(np.asarray(p["w"]), np.arange(6).reshape(2, 3))


def test_profiling_timers():
    from qwen3_tts_tpu.utils.profiling import FirstPacketMeter, StageTimers

    t = StageTimers()
    with t.stage("prefill"):
        pass
    t.add("decode", 0.01)
    t.add("decode", 0.02)
    s = t.summary()
    assert s["decode"]["count"] == 2
    assert "decode" in t.report()

    m = FirstPacketMeter()
    m.observe(0.08)
    m.observe(0.12)
    assert 80 <= m.p50() <= 120


def test_cli_parser_surface():
    from qwen3_tts_tpu.cli.demo import build_parser

    args = build_parser().parse_args(
        ["ckpt", "--port", "9000", "--dtype", "float32", "--top-k", "5",
         "--no-sample"])
    assert args.checkpoint == "ckpt"
    assert args.port == 9000
    from qwen3_tts_tpu.cli.demo import _gen_overrides

    ov = _gen_overrides(args)
    assert ov == {"top_k": 5, "do_sample": False}


def test_kaldi_fbank_shape():
    from qwen3_tts_tpu.utils.kaldi import fbank

    rng = np.random.default_rng(0)
    wav = rng.normal(0, 0.1, size=(16000,)).astype(np.float32)
    feats = fbank(wav, num_mel_bins=80)
    assert feats.shape == (1 + (16000 - 400) // 160, 80)
    assert np.isfinite(feats).all()


def test_http_demo_server_end_to_end(tmp_path):
    """Spin the stdlib HTTP fallback server on a tiny model and POST /tts."""
    import json
    import threading
    import urllib.request

    import pytest

    from tests._reference import reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")

    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.cli.demo import _HttpDemo
    from tests.test_inference_api import FakeTokenizer

    # fabricate checkpoint via the existing fixture machinery

    from tests._fixtures import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    demo = _HttpDemo(model, "custom_voice", {}, concurrency=1)
    import socket
    from http.server import ThreadingHTTPServer

    # find a free port
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    t = threading.Thread(target=demo.serve, args=("127.0.0.1", port),
                         daemon=True)
    t.start()
    import time as _t

    try:
        deadline = _t.time() + 10
        while _t.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                    assert json.loads(r.read())["ok"]
                break
            except Exception:
                _t.sleep(0.2)

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info") as r:
            info = json.loads(r.read())
        assert info["speakers"] == ["vivian"]

        payload = json.dumps({"task": "custom_voice",
                              "text": "hello over http",
                              "speaker": "vivian", "seed": 0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["sample_rate"] == 1000
        assert len(out["wavs_b64"]) == 1

        # probe: malformed request -> structured error, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts", data=b'{"task": "custom_voice"}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        # stop serve_forever so no server thread outlives this test
        demo._server.shutdown()
        t.join(timeout=10)


def test_warmup_model(tmp_path):
    import pytest

    from tests._reference import reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")

    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.warmup import warmup_model

    from tests._fixtures import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32)
    secs = warmup_model(model, prefill_buckets=(16,), batch_sizes=(1,),
                        max_new_tokens=4, verbose=False)
    assert secs > 0
