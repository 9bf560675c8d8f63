"""Parity: ECAPA speaker encoder + mel front end vs reference torch."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

SE_TINY = dict(mel_dim=16, enc_dim=32,
               enc_channels=[16, 16, 16, 16, 48],
               enc_kernel_sizes=[5, 3, 3, 3, 1],
               enc_dilations=[1, 2, 3, 4, 1],
               enc_attention_channels=8,
               enc_res2net_scale=4, enc_se_channels=8)


def _make_reference(seed=0):
    import torch

    from tests._reference import load_talker

    ref = load_talker()
    from ref_models.configuration_qwen3_tts import Qwen3TTSSpeakerEncoderConfig

    cfg = Qwen3TTSSpeakerEncoderConfig(**SE_TINY)
    torch.manual_seed(seed)
    model = ref.Qwen3TTSSpeakerEncoder(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.1, generator=gen))
    model.eval()
    return ref, cfg, model


@requires_reference
def test_speaker_encoder_parity():
    import torch

    from qwen3_tts_tpu.config import SpeakerEncoderConfig
    from qwen3_tts_tpu.models.speaker_encoder import speaker_encoder_forward
    from qwen3_tts_tpu.weights import from_torch_state_dict

    ref, rcfg, model = _make_reference()
    params = from_torch_state_dict(model.state_dict())
    cfg = SpeakerEncoderConfig.from_dict(SE_TINY)

    rng = np.random.default_rng(0)
    mels = rng.normal(0, 1, size=(2, 40, SE_TINY["mel_dim"])).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(mels)).numpy()
    got = np.asarray(speaker_encoder_forward(params, cfg, mels))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@requires_reference
def test_mel_spectrogram_matches_reference_stft():
    """Our STFT path vs reference mel_spectrogram (torch.stft + librosa-mel
    stub which implements the same slaney algorithm)."""
    import torch

    from tests._reference import load_talker

    ref = load_talker()
    from qwen3_tts_tpu.ops.stft import mel_spectrogram

    rng = np.random.default_rng(1)
    y = (0.5 * rng.normal(0, 0.2, size=(4096,))).clip(-1, 1).astype(np.float32)
    with torch.no_grad():
        want = ref.mel_spectrogram(torch.from_numpy(y)[None], n_fft=1024,
                                   num_mels=32, sampling_rate=24000,
                                   hop_size=256, win_size=1024,
                                   fmin=0, fmax=12000).numpy()
    got = np.asarray(mel_spectrogram(y[None], n_fft=1024, num_mels=32,
                                     sampling_rate=24000, hop_size=256,
                                     win_size=1024, fmin=0, fmax=12000))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
