"""Parity tests for the 25 Hz (V1) tokenizer stack: whisper mel, windowed
Whisper-VQ encoder codes, DiT velocity field + ODE sample, BigVGAN."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

ENC_TINY = dict(
    n_mels=80, n_ctx=64, n_state=32, n_head=4, n_layer=3, n_window=8,
    output_dim=48, audio_vq_type="GRVQ", audio_vq_layers=2,
    audio_vq_codebook_size=32, audio_vq_codebook_dim=32, audio_vq_pe=True,
    audio_vq_ds_rate=2,
)

DIT_TINY = dict(
    hidden_size=32, num_hidden_layers=2, num_attention_heads=4, ff_mult=2,
    emb_dim=12, head_dim=8, block_size=4, look_ahead_layers=[1],
    look_backward_layers=[0], repeats=2, num_embeds=32, mel_dim=8,
    dropout=0.0, enc_emb_dim=10, enc_dim=12, enc_channels=[8, 8, 8, 8, 24],
    enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
    enc_attention_channels=4, enc_res2net_scale=2, enc_se_channels=4,
)

BIGVGAN_TINY = dict(
    mel_dim=8, upsample_initial_channel=32, resblock_kernel_sizes=[3],
    resblock_dilation_sizes=[[1, 3, 5]], upsample_rates=[2, 2, 2],
    upsample_kernel_sizes=[4, 4, 4],
)


def _rand_params(model, seed=0, scale=0.1):
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.empty_like(p).uniform_(-scale, scale, generator=gen))
    model.eval()
    return model


@requires_reference
def test_whisper_mel_parity():
    import torch

    from tests._reference import load_tokenizer_v1

    load_tokenizer_v1()
    import ref_tok25.vq.whisper_encoder as ref_we
    from qwen3_tts_tpu.models.codec25.mel import whisper_log_mel

    rng = np.random.default_rng(0)
    wav = rng.uniform(-0.5, 0.5, size=(3200,)).astype(np.float32)
    want = ref_we.log_mel_spectrogram(torch.from_numpy(wav), n_mels=128,
                                      padding=160).numpy()
    got = np.asarray(whisper_log_mel(wav, n_mels=128, padding=160))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@requires_reference
def test_whisper_vq_encoder_codes_parity():
    import torch

    from tests._reference import load_tokenizer_v1

    ref = load_tokenizer_v1()
    from ref_tok25.vq.speech_vq import WhisperEncoderVQ

    from qwen3_tts_tpu.config import WhisperVQEncoderConfig
    from qwen3_tts_tpu.models.codec25.encoder import quantize_speech
    from qwen3_tts_tpu.weights import from_torch_state_dict

    torch.manual_seed(0)
    model = WhisperEncoderVQ(**{k: v for k, v in ENC_TINY.items()
                                if k not in ("output_dim",)},
                             output_dim=ENC_TINY["output_dim"])
    _rand_params(model)
    # make codebook distinctive
    with torch.no_grad():
        model.audio_quantizer.rvqs[0].embed.uniform_(-1, 1)

    cfg = WhisperVQEncoderConfig.from_dict(ENC_TINY)
    params = from_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(1)
    wavs = [rng.uniform(-0.5, 0.5, size=(n,)).astype(np.float32)
            for n in (3000, 5200)]

    with torch.no_grad():
        want_codes, want_lens = [], []
        from qwen3_tts_tpu.models.codec25.mel import get_T_after_cnn
        mels = [ref.get_mel_audio(w, padding=True,
                                  audio_vq_ds_rate=cfg.audio_vq_ds_rate,
                                  n_mels=cfg.n_mels)
                for w in wavs]
        for mel in mels:
            T = mel.shape[-1]
            aftercnn = get_T_after_cnn(T)
            _, idx = model(x_list=[mel], audio_mellens=[T],
                           audio_aftercnnlens=[aftercnn],
                           audio_seqlens=[aftercnn + 2], return_indices=True)
            n = aftercnn // cfg.audio_vq_ds_rate
            want_codes.append(idx.numpy()[:n])
            want_lens.append(n)

    got_codes, got_lens = quantize_speech(params, cfg, wavs)
    assert got_lens == want_lens
    for g, w in zip(got_codes, want_codes):
        assert (g == w).mean() > 0.98, f"mismatch rate {(g != w).mean()}"


@requires_reference
def test_dit_sample_parity():
    import torch
    from unittest import mock

    from tests._reference import load_tokenizer_v1

    ref = load_tokenizer_v1()
    from ref_tok25.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1DecoderDiTConfig)

    from qwen3_tts_tpu.config import DiTConfig
    from qwen3_tts_tpu.models.codec25.dit import dit_sample
    from qwen3_tts_tpu.weights import from_torch_state_dict

    rcfg = Qwen3TTSTokenizerV1DecoderDiTConfig(**DIT_TINY)
    rcfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = ref.Qwen3TTSTokenizerV1DecoderDiTModel(rcfg)
    _rand_params(model)

    cfg = DiTConfig.from_dict(DIT_TINY)
    params = from_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(2)
    B, Tc, Tr = 2, 6, 10
    codes = rng.integers(0, 30, size=(B, Tc))
    xvec = rng.normal(0, 0.5, size=(B, DIT_TINY["enc_emb_dim"])).astype(np.float32)
    ref_mel = rng.normal(0, 0.5, size=(B, Tr, DIT_TINY["mel_dim"])).astype(np.float32)
    noise = rng.normal(0, 1, size=(B, Tc * 2, DIT_TINY["mel_dim"])).astype(np.float32)

    fixed = torch.from_numpy(
        np.broadcast_to(noise[:, :1], (B, 30000, DIT_TINY["mel_dim"])).copy())
    fixed[:, :Tc * 2] = torch.from_numpy(noise)
    with mock.patch("torch.randn", lambda *a, **k: fixed.clone()):
        with torch.no_grad():
            want = model.sample(torch.from_numpy(xvec),
                                torch.from_numpy(ref_mel),
                                torch.from_numpy(codes),
                                num_steps=3).numpy()

    got = np.asarray(dit_sample(params, cfg, codes, xvec, ref_mel, noise,
                                num_steps=3))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@requires_reference
def test_bigvgan_parity():
    import torch

    from tests._reference import load_tokenizer_v1

    ref = load_tokenizer_v1()
    from ref_tok25.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1DecoderBigVGANConfig)

    from qwen3_tts_tpu.config import BigVGANConfig
    from qwen3_tts_tpu.models.codec25.bigvgan import bigvgan_forward
    from qwen3_tts_tpu.weights import from_torch_state_dict

    rcfg = Qwen3TTSTokenizerV1DecoderBigVGANConfig(**BIGVGAN_TINY)
    rcfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = ref.Qwen3TTSTokenizerV1DecoderBigVGANModel(rcfg)
    _rand_params(model)

    cfg = BigVGANConfig.from_dict(BIGVGAN_TINY)
    params = from_torch_state_dict(model.state_dict())

    rng = np.random.default_rng(3)
    mel = rng.normal(-1, 1, size=(2, BIGVGAN_TINY["mel_dim"], 20)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mel)).numpy()
    got = np.asarray(bigvgan_forward(params, cfg, mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@requires_reference
def test_v1_tokenizer_api(tmp_path):
    """from_pretrained on a fabricated 25Hz checkpoint; decode end-to-end
    with externally supplied x-vectors; encode without onnxruntime raises."""
    import json

    import torch
    from safetensors.torch import save_file

    from tests._reference import load_tokenizer_v1

    ref = load_tokenizer_v1()
    from ref_tok25.configuration_qwen3_tts_tokenizer_v1 import (
        Qwen3TTSTokenizerV1Config)

    rcfg = Qwen3TTSTokenizerV1Config(
        encoder_config=dict(ENC_TINY),
        decoder_config=dict(dit_config=dict(DIT_TINY),
                            bigvgan_config=dict(BIGVGAN_TINY)),
        decode_upsample_rate=2 * 8,  # repeats * prod(upsample_rates)
    )
    rcfg._attn_implementation = "sdpa"
    torch.manual_seed(0)
    model = ref.Qwen3TTSTokenizerV1Model(rcfg)
    _rand_params(model)

    ckpt = tmp_path / "v1"
    ckpt.mkdir()
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              str(ckpt / "model.safetensors"))
    with open(ckpt / "config.json", "w") as f:
        json.dump({
            "model_type": "qwen3_tts_tokenizer_25hz",
            "encoder_config": dict(ENC_TINY),
            "decoder_config": {"dit_config": dict(DIT_TINY),
                               "bigvgan_config": dict(BIGVGAN_TINY)},
            "input_sample_rate": 16000,
            "output_sample_rate": 16000,
            "decode_upsample_rate": 16,
            "encode_downsample_rate": 640,
        }, f)

    from qwen3_tts_tpu.inference.tokenizer import Qwen3TTSTokenizer

    tok = Qwen3TTSTokenizer.from_pretrained(str(ckpt))
    assert tok.get_model_type() == "qwen3_tts_tokenizer_25hz"

    rng = np.random.default_rng(0)
    codes = [rng.integers(0, 30, size=(6,)), rng.integers(0, 30, size=(4,))]
    xvecs = [rng.normal(0, 0.3, size=(DIT_TINY["enc_emb_dim"],)).astype(np.float32)
             for _ in range(2)]
    mels = [rng.normal(0, 0.3, size=(10, DIT_TINY["mel_dim"])).astype(np.float32)
            for _ in range(2)]
    wavs, sr = tok.decode({"audio_codes": codes, "xvectors": xvecs,
                           "ref_mels": mels})
    assert sr == 16000
    assert wavs[0].shape[0] == 6 * 16 and wavs[1].shape[0] == 4 * 16
    assert all(np.isfinite(w).all() for w in wavs)

    # output_dtype is honored (and validated) on the 25 Hz path too
    pcm, _ = tok.decode({"audio_codes": codes, "xvectors": xvecs,
                         "ref_mels": mels}, output_dtype="int16")
    assert pcm[0].dtype == np.int16
    np.testing.assert_array_equal(
        pcm[0], np.round(np.clip(wavs[0], -1.0, 1.0) * 32767.0).astype(np.int16))
    with pytest.raises(ValueError, match="output_dtype"):
        tok.decode({"audio_codes": codes, "xvectors": xvecs,
                    "ref_mels": mels}, output_dtype="f64")

    # probe: encode requires onnxruntime for CAM++ x-vectors
    wav = rng.uniform(-0.5, 0.5, size=(4000,)).astype(np.float32)
    with pytest.raises(RuntimeError, match="onnxruntime"):
        tok.encode([wav], sr=16000)
