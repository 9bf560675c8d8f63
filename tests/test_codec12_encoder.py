"""Parity tests: JAX Mimi-style codec encoder vs installed HF MimiModel on a
tiny random-weight config (SURVEY.md §2.2, §4 item 2)."""

import numpy as np
import pytest

TINY = dict(
    sampling_rate=1000,
    frame_rate=62.5,
    audio_channels=1,
    hidden_size=32,
    num_filters=8,
    num_residual_layers=1,
    upsampling_ratios=[4, 2],
    kernel_size=7,
    last_kernel_size=3,
    residual_kernel_size=3,
    dilation_growth_rate=2,
    use_causal_conv=True,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
    head_dim=8,
    intermediate_size=64,
    norm_eps=1e-5,
    max_position_embeddings=1000,
    sliding_window=100,
    codebook_size=16,
    codebook_dim=8,
    num_quantizers=4,
    num_semantic_quantizers=1,
    vector_quantization_hidden_dimension=8,
    upsample_groups=32,
)


def _make_reference_encoder(seed=0):
    import torch
    from transformers import MimiConfig, MimiModel

    cfg = MimiConfig(**TINY)
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = MimiModel(cfg)
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    with torch.no_grad():
        for name, t in sd.items():
            if not torch.is_floating_point(t):
                continue
            if "cluster_usage" in name:
                t.copy_(torch.empty_like(t).uniform_(0.5, 1.5, generator=gen))
            elif "initialized" in name:
                continue
            else:
                t.copy_(torch.empty_like(t).uniform_(-0.3, 0.3, generator=gen))
    model.eval()
    return cfg, model


def _to_jax(model):
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import MimiEncoderConfig
    from qwen3_tts_tpu.models.codec12.encoder import prepare_encoder_params
    from qwen3_tts_tpu.weights import from_torch_state_dict

    params = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    cfg = MimiEncoderConfig.from_dict(TINY)
    params = prepare_encoder_params(params, cfg)
    return params, cfg


def test_seanet_and_transformer_parity():
    import torch

    from qwen3_tts_tpu.models.codec12.encoder import (encoder_transformer,
                                                      seanet_encode)

    rcfg, model = _make_reference_encoder()
    params, cfg = _to_jax(model)

    rng = np.random.default_rng(0)
    wav = rng.uniform(-1, 1, size=(2, 1, 240)).astype(np.float32)
    with torch.no_grad():
        feats_ref = model.encoder(torch.from_numpy(wav))
        trans_ref = model.encoder_transformer(feats_ref.transpose(1, 2))[0]

    feats = seanet_encode(params["encoder"], cfg, wav)
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(),
                               rtol=1e-4, atol=1e-4)
    trans = encoder_transformer(params["encoder_transformer"], cfg,
                                np.transpose(np.asarray(feats), (0, 2, 1)))
    np.testing.assert_allclose(np.asarray(trans), trans_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_encode_codes_exact_match():
    """Discrete codes must match the reference exactly (argmin stability)."""
    import torch

    from qwen3_tts_tpu.models.codec12.encoder import encode_waveform

    rcfg, model = _make_reference_encoder()
    params, cfg = _to_jax(model)

    rng = np.random.default_rng(1)
    wav = rng.uniform(-1, 1, size=(2, 400)).astype(np.float32)
    with torch.no_grad():
        out = model.encode(input_values=torch.from_numpy(wav)[:, None, :],
                           return_dict=True)
        want = out.audio_codes.numpy()

    got = np.asarray(encode_waveform(params, cfg, wav))
    assert got.shape == want.shape
    assert (got == want).mean() > 0.99, f"code mismatch rate {(got != want).mean()}"


def test_encode_frame_count():
    from qwen3_tts_tpu.models.codec12.encoder import encode_waveform

    rcfg, model = _make_reference_encoder()
    params, cfg = _to_jax(model)
    wav = np.zeros((1, 16 * 13), dtype=np.float32)  # 13 frames at 16x downsample
    codes = np.asarray(encode_waveform(params, cfg, wav))
    assert codes.shape == (1, TINY["num_quantizers"], 13)
