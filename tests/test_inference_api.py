"""Integration: Qwen3TTSModel/Qwen3TTSTokenizer public API over a fabricated
reference-format checkpoint directory (tiny random weights)."""

import json
import os

import numpy as np
import pytest

from tests._reference import reference_available
from tests.test_codec12_decoder import TINY as DEC_TINY
from tests.test_codec12_encoder import TINY as ENC_TINY
from tests.test_pipeline_parity import MODEL_TINY, SPK_ID

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


class FakeTokenizer:
    """Deterministic char-hash tokenizer standing in for Qwen2TokenizerFast."""

    def __call__(self, text, return_tensors=None, **kw):
        ids = [1 + (ord(c) * 7 + i) % 39 for i, c in enumerate(text)][:24]
        ids = ids + [1] * max(0, 9 - len(ids))
        return {"input_ids": np.asarray([ids], dtype=np.int64)}


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference repo not mounted")
    from tests._fixtures import make_tiny_checkpoint

    return make_tiny_checkpoint(tmp_path_factory.mktemp("ckpt"))


def test_from_pretrained_and_custom_voice(tiny_checkpoint):
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel

    model = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    assert model.get_supported_speakers() == ["vivian"]
    assert "english" in model.get_supported_languages()

    wavs, sr = model.generate_custom_voice(
        text=["hello world", "second sample"], speaker="vivian",
        language="english", seed=0)
    assert sr == 1000
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and w.size >= 0
        assert np.isfinite(w).all()


def test_custom_voice_validation_errors(tiny_checkpoint):
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel

    model = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    with pytest.raises(ValueError, match="Unsupported speakers"):
        model.generate_custom_voice(text="hi", speaker="nobody")
    with pytest.raises(ValueError, match="Unsupported languages"):
        model.generate_custom_voice(text="hi", speaker="vivian",
                                    language="klingon")
    with pytest.raises(ValueError, match="does not support"):
        model.generate_voice_clone(text="hi", ref_audio=("x", 1))


def test_tokenizer_roundtrip_api(tiny_checkpoint):
    from qwen3_tts_tpu import Qwen3TTSTokenizer

    tok = Qwen3TTSTokenizer.from_pretrained(
        os.path.join(tiny_checkpoint, "speech_tokenizer"))
    assert tok.get_model_type() == "qwen3_tts_tokenizer_12hz"
    assert tok.get_input_sample_rate() == ENC_TINY["sampling_rate"]

    rng = np.random.default_rng(0)
    wav_a = rng.uniform(-0.5, 0.5, size=(330,)).astype(np.float32)
    wav_b = rng.uniform(-0.5, 0.5, size=(170,)).astype(np.float32)
    enc = tok.encode([wav_a, wav_b], sr=ENC_TINY["sampling_rate"])
    assert len(enc.audio_codes) == 2
    t_a = -(-330 // tok.get_encode_downsample_rate())
    assert enc.audio_codes[0].shape == (t_a, DEC_TINY["num_quantizers"])

    wavs, sr = tok.decode(enc)
    assert sr == 1000
    assert wavs[0].shape[0] == t_a * tok.get_decode_upsample_rate()
    # dict and list[dict] input forms
    wavs2, _ = tok.decode({"audio_codes": enc.audio_codes})
    # a single (wav, sr) tuple is one input, not a sequence of two
    enc_t = tok.encode((wav_a, ENC_TINY["sampling_rate"]))
    assert len(enc_t.audio_codes) == 1
    np.testing.assert_array_equal(enc_t.audio_codes[0], enc.audio_codes[0])
    wavs3, _ = tok.decode([{"audio_codes": c} for c in enc.audio_codes])
    np.testing.assert_array_equal(wavs[0], wavs2[0])
    np.testing.assert_array_equal(wavs[0], wavs3[0])


def test_stream_custom_voice(tiny_checkpoint):
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel

    model = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    chunks = list(model.stream_custom_voice(
        text="streaming hello", speaker="vivian", language="english", seed=1))
    assert len(chunks) >= 1
    sr = chunks[0][1]
    assert sr == 1000
    total = sum(c[0].shape[-1] for c in chunks)
    assert total > 0
    assert all(np.isfinite(c[0]).all() for c in chunks)


def test_int8_quantized_generation(tiny_checkpoint):
    """Weight-only int8: loads, runs, and tracks the bf16 logits closely."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.models.talker import KVCache, StackDims, talker_prefill

    full = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32)
    quant = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32,
                                          quantize="int8")
    quant.processor = FakeTokenizer()

    cfg = full.config.talker_config
    rng = np.random.default_rng(0)
    embeds = rng.normal(0, 0.3, size=(1, 5, cfg.hidden_size)).astype(np.float32)
    mask = np.ones((1, 5), np.int32)
    dims = StackDims.from_talker(cfg)

    def logits_of(params):
        cache = KVCache.zeros(cfg.num_hidden_layers, 1, 8, dims.kv_heads,
                              dims.head_dim, dtype=np.float32)
        return np.asarray(talker_prefill(params, cfg, embeds, mask, cache)[0])

    lf = logits_of(full.talker_params)
    lq = logits_of(quant.talker_params)
    # int8 weight-only should track fp within a tight relative envelope
    denom = np.maximum(np.abs(lf).max(), 1e-6)
    assert np.abs(lf - lq).max() / denom < 0.05

    wavs, sr = quant.generate_custom_voice(text="quantized hello",
                                           speaker="vivian", seed=0)
    assert np.isfinite(wavs[0]).all()

    with pytest.raises(ValueError, match="unsupported quantize"):
        Qwen3TTSModel.from_pretrained(tiny_checkpoint, quantize="int4")


def test_stream_voice_clone_with_prompt(tmp_path):
    """Streaming clone with a prebuilt prompt (ICL ref codes as context)."""
    import json

    import jax.numpy as jnp
    import torch
    from safetensors.torch import save_file

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.inference.model import VoiceClonePromptItem
    from tests.test_pipeline_parity import _make_reference_model
    from tests.test_codec12_decoder import _make_reference_decoder
    from tests.test_codec12_encoder import _make_reference_encoder

    from tests._fixtures import make_tiny_checkpoint

    root = make_tiny_checkpoint(tmp_path / "base_ckpt", model_type="base")

    model = Qwen3TTSModel.from_pretrained(root, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    rng = np.random.default_rng(0)
    hidden = MODEL_TINY["talker_config"]["hidden_size"]
    item = VoiceClonePromptItem(
        ref_code=rng.integers(0, 30, size=(5, 4)),
        ref_spk_embedding=rng.normal(0, 0.1, size=(hidden,)).astype(np.float32),
        x_vector_only_mode=False, icl_mode=True, ref_text="ref words here")

    chunks = list(model.stream_voice_clone(
        text="clone me please", voice_clone_prompt=[item], seed=2))
    assert len(chunks) >= 1
    total = sum(c[0].shape[-1] for c in chunks)
    assert total > 0 and all(np.isfinite(c[0]).all() for c in chunks)


def test_stream_voice_design(tmp_path):
    import json

    import jax.numpy as jnp
    from safetensors.torch import save_file

    from qwen3_tts_tpu import Qwen3TTSModel
    from tests.test_pipeline_parity import _make_reference_model
    from tests.test_codec12_decoder import _make_reference_decoder
    from tests.test_codec12_encoder import _make_reference_encoder

    from tests._fixtures import make_tiny_checkpoint

    root = make_tiny_checkpoint(tmp_path / "vd_ckpt", model_type="voice_design")

    model = Qwen3TTSModel.from_pretrained(root, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    # batch API
    wavs, sr = model.generate_voice_design(
        text="designed voice text", instruct="a deep calm narrator", seed=0)
    assert np.isfinite(wavs[0]).all()

    # streaming API
    chunks = list(model.stream_voice_design(
        text="designed stream", instruct="a deep calm narrator", seed=1))
    assert len(chunks) >= 1
    assert all(np.isfinite(c[0]).all() for c in chunks)


def test_fast_path_defaults_and_overrides(tiny_checkpoint, monkeypatch):
    """int8 loads must route the public API onto the fused sub-talker path
    by default (the configuration bench.py measures), with generate-kwarg
    overrides for fused_subtalker / kv_quant (VERDICT r2 item 1)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel

    quant = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32,
                                          quantize="int8")
    full = Qwen3TTSModel.from_pretrained(tiny_checkpoint, dtype=jnp.float32)

    gc = quant._generation_config(quant._merge_generate_kwargs())
    assert gc.fused_subtalker and not gc.kv_quant

    gc = quant._generation_config(quant._merge_generate_kwargs(
        fused_subtalker=False, kv_quant=True))
    assert not gc.fused_subtalker and gc.kv_quant

    # top_p < 1 in the sub-talker is unsupported by the fused kernel:
    # default silently falls back, explicit request raises
    gc = quant._generation_config(quant._merge_generate_kwargs(
        subtalker_top_p=0.9))
    assert not gc.fused_subtalker
    with pytest.raises(ValueError, match="subtalker_top_p"):
        quant._generation_config(quant._merge_generate_kwargs(
            subtalker_top_p=0.9, fused_subtalker=True))

    # bf16 loads stay on the XLA scan; forcing fused without int8 raises
    gc = full._generation_config(full._merge_generate_kwargs())
    assert not gc.fused_subtalker
    with pytest.raises(ValueError, match="int8"):
        full._generation_config(full._merge_generate_kwargs(
            fused_subtalker=True))

    # fused_talker_step rides the generate kwargs the same way; its auto
    # default is ON for int8 + bf16-KV loads, but only on real TPU hardware
    # (interpret-mode Pallas elsewhere), so off in this CPU-backed test
    gc = quant._generation_config(quant._merge_generate_kwargs())
    assert not gc.fused_talker_step
    gc = quant._generation_config(quant._merge_generate_kwargs(
        fused_talker_step=True))
    assert gc.fused_talker_step
    with pytest.raises(ValueError, match="int8"):
        full._generation_config(full._merge_generate_kwargs(
            fused_talker_step=True))

    # on a TPU backend the int8 default flips on — for bf16 AND int8 KV
    # caches (the kernel has an int8-KV mode) — unless the user opted out
    import qwen3_tts_tpu.inference.model as model_mod
    monkeypatch.setattr(model_mod, "_default_backend_is_tpu", lambda: True)
    gc = quant._generation_config(quant._merge_generate_kwargs())
    assert gc.fused_talker_step
    gc = quant._generation_config(quant._merge_generate_kwargs(
        kv_quant=True))
    assert gc.fused_talker_step and gc.kv_quant
    gc = quant._generation_config(quant._merge_generate_kwargs(
        fused_talker_step=False))
    assert not gc.fused_talker_step
    gc = full._generation_config(full._merge_generate_kwargs())
    assert not gc.fused_talker_step   # bf16 weights: XLA path


def test_demo_cli_fast_path_flags():
    """--quantize/--kv-quant/--no-fused-subtalker reach the generate kwargs."""
    from qwen3_tts_tpu.cli.demo import _gen_overrides, build_parser

    args = build_parser().parse_args(
        ["ckpt", "--quantize", "int8", "--kv-quant", "--no-fused-subtalker",
         "--no-fused-talker-step"])
    assert args.quantize == "int8"
    ov = _gen_overrides(args)
    assert ov["kv_quant"] is True and ov["fused_subtalker"] is False
    assert ov["fused_talker_step"] is False

    args = build_parser().parse_args(["ckpt"])
    assert args.quantize is None
    ov = _gen_overrides(args)
    assert "kv_quant" not in ov and "fused_subtalker" not in ov
    assert "fused_talker_step" not in ov


def test_tokenizer_decode_pcm16(tiny_checkpoint):
    """output_dtype="int16" must return device-converted PCM16 matching the
    host conversion of the float32 output."""
    import os

    import numpy as np

    from qwen3_tts_tpu import Qwen3TTSTokenizer

    tok = Qwen3TTSTokenizer.from_pretrained(
        os.path.join(tiny_checkpoint, "speech_tokenizer"))
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 30, size=(7, 4))
    wav_f, sr = tok.decode({"audio_codes": [codes]})
    wav_i, sr2 = tok.decode({"audio_codes": [codes]}, output_dtype="int16")
    assert sr == sr2 and wav_i[0].dtype == np.int16
    want = np.round(np.clip(wav_f[0], -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_allclose(wav_i[0], want, atol=1)
    with pytest.raises(ValueError, match="output_dtype"):
        tok.decode({"audio_codes": [codes]}, output_dtype="f64")


def test_stream_voice_clone_mixed_batch_per_row_context(tmp_path):
    """One ICL + one x-vector-only item in a single streaming batch: the ICL
    row's audio must be IDENTICAL to its single-item run (per-row vocoder
    context; previously mixed batches silently dropped all context)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.inference.model import VoiceClonePromptItem
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_pipeline_parity import MODEL_TINY

    root = make_tiny_checkpoint(tmp_path / "mix_ckpt", model_type="base")
    model = Qwen3TTSModel.from_pretrained(root, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    rng = np.random.default_rng(0)
    hidden = MODEL_TINY["talker_config"]["hidden_size"]
    icl = VoiceClonePromptItem(
        ref_code=rng.integers(0, 30, size=(5, 4)),
        ref_spk_embedding=rng.normal(0, 0.1, size=(hidden,)).astype(np.float32),
        x_vector_only_mode=False, icl_mode=True, ref_text="ref words here")
    xvec = VoiceClonePromptItem(
        ref_code=None,
        ref_spk_embedding=rng.normal(0, 0.1, size=(hidden,)).astype(np.float32),
        x_vector_only_mode=True, icl_mode=False)

    def row_audio(prompt_items, texts, row):
        chunks = list(model.stream_voice_clone(
            text=texts, voice_clone_prompt=prompt_items,
            do_sample=False, subtalker_dosample=False, seed=0))
        wav = np.concatenate([c[0][row] for c in chunks])
        return wav

    alone = row_audio([icl], "clone me please", 0)
    mixed = row_audio([icl, xvec], ["clone me please", "other words"], 0)
    n = min(alone.shape[0], mixed.shape[0])
    assert n > 0
    np.testing.assert_array_equal(alone[:n], mixed[:n])
    # and the x-vector row must still produce audio
    xv = row_audio([icl, xvec], ["clone me please", "other words"], 1)
    assert np.isfinite(xv).all()
