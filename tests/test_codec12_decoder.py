"""Parity tests: TPU codec-12Hz decoder vs the PyTorch reference on tiny
random-weight configs (SURVEY.md §4 test strategy, items 1/3)."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

TINY = dict(
    codebook_size=32,
    codebook_dim=16,
    hidden_size=32,
    latent_dim=24,
    num_attention_heads=4,
    num_key_value_heads=4,
    sliding_window=8,
    intermediate_size=48,
    num_hidden_layers=2,
    num_quantizers=4,
    upsample_rates=(2, 2, 2, 2),
    upsampling_ratios=(2, 2),
    decoder_dim=32,
)


def _make_reference_decoder(seed=0):
    import torch

    from tests._reference import load_tokenizer_v2

    ref = load_tokenizer_v2()
    cfg = ref.Qwen3TTSTokenizerV2DecoderConfig(**{k: list(v) if isinstance(v, tuple) else v
                                                  for k, v in TINY.items()})
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = ref.Qwen3TTSTokenizerV2Decoder(cfg)
    # randomize parameters deterministically (post_init zeros some of them)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "cluster_usage" in name:
                # keep the EMA usage well-conditioned: decode divides by it
                p.copy_(torch.empty_like(p).uniform_(0.5, 1.5, generator=gen))
            else:
                p.copy_(torch.empty_like(p).uniform_(-0.5, 0.5, generator=gen))
    model.eval()
    return ref, cfg, model


def _to_jax_params(model):
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.models.codec12.decoder import prepare_decoder_params
    from qwen3_tts_tpu.weights import from_torch_state_dict

    params = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    cfg = CodecV2DecoderConfig(**TINY)
    params = prepare_decoder_params(params, cfg)
    return params, cfg


@requires_reference
def test_rvq_dequantize_parity():
    import torch

    from qwen3_tts_tpu.models.codec12.decoder import rvq_dequantize

    ref, rcfg, model = _make_reference_decoder()
    params, cfg = _to_jax_params(model)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, TINY["codebook_size"], size=(2, TINY["num_quantizers"], 7))
    with torch.no_grad():
        want = model.quantizer.decode(torch.from_numpy(codes)).numpy()
    got = np.asarray(rvq_dequantize(params["_codebooks"], codes))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@requires_reference
def test_decoder_forward_parity():
    import torch

    from qwen3_tts_tpu.models.codec12.decoder import decode_frames

    ref, rcfg, model = _make_reference_decoder()
    params, cfg = _to_jax_params(model)

    rng = np.random.default_rng(1)
    codes = rng.integers(0, TINY["codebook_size"], size=(2, TINY["num_quantizers"], 11))
    with torch.no_grad():
        want = model(torch.from_numpy(codes)).numpy()
    got = np.asarray(decode_frames(params, cfg, codes))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-2)


@requires_reference
def test_chunked_decode_matches_reference_chunked():
    import torch

    from qwen3_tts_tpu.models.codec12.decoder import chunked_decode

    ref, rcfg, model = _make_reference_decoder()
    params, cfg = _to_jax_params(model)

    rng = np.random.default_rng(2)
    codes = rng.integers(0, TINY["codebook_size"], size=(1, TINY["num_quantizers"], 23))
    with torch.no_grad():
        want = model.chunked_decode(torch.from_numpy(codes), chunk_size=8,
                                    left_context_size=3).numpy()
    got = np.asarray(chunked_decode(params, cfg, codes, chunk_size=8,
                                    left_context_size=3))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-2)


def test_causal_conv_padding_math():
    """Unit check of the exact padding formula (no reference needed)."""
    from qwen3_tts_tpu.ops.conv import _causal_pad_amounts

    # stride 1: pad = eff_k - 1, no extra
    assert _causal_pad_amounts(10, 7, 1, 1) == (6, 0)
    assert _causal_pad_amounts(10, 7, 1, 3) == (18, 0)
    # strided conv pads up to a full frame
    left, extra = _causal_pad_amounts(10, 4, 2, 1)
    assert left == 2
    assert (10 + left + extra - 4) % 2 == 0


@requires_reference
def test_full_roundtrip_parity_vs_reference_model():
    """BASELINE config 1: encode->decode roundtrip, our public API vs the
    reference Qwen3TTSTokenizerV2Model, same waveforms in, waveforms compared."""
    import torch

    from tests._reference import load_tokenizer_v2
    from tests.test_codec12_encoder import TINY as ENC_TINY, _make_reference_encoder

    ref = load_tokenizer_v2()

    # reference top model wrapping the same tiny encoder+decoder weights
    rcfg = ref.Qwen3TTSTokenizerV2Config(
        encoder_config=dict(ENC_TINY),
        decoder_config={k: list(v) if isinstance(v, tuple) else v
                        for k, v in TINY.items()},
        encoder_valid_num_quantizers=TINY["num_quantizers"],
        input_sample_rate=ENC_TINY["sampling_rate"],
        output_sample_rate=ENC_TINY["sampling_rate"],
        decode_upsample_rate=64,
        encode_downsample_rate=16,
    )
    rcfg._attn_implementation = "eager"
    rcfg.encoder_config._attn_implementation = "eager"
    rcfg.decoder_config._attn_implementation = "eager"
    import torch as _t

    _t.manual_seed(0)
    top = ref.Qwen3TTSTokenizerV2Model(rcfg)
    _, enc_src = _make_reference_encoder()
    _, _, dec_src = _make_reference_decoder()
    top.encoder.load_state_dict(enc_src.state_dict(), strict=False)
    top.decoder.load_state_dict(dec_src.state_dict())
    top.eval()

    rng = np.random.default_rng(7)
    wav_a = rng.uniform(-0.5, 0.5, size=(400,)).astype(np.float32)
    wav_b = rng.uniform(-0.5, 0.5, size=(208,)).astype(np.float32)

    with torch.no_grad():
        batch = torch.zeros(2, 400)
        batch[0] = torch.from_numpy(wav_a)
        batch[1, :208] = torch.from_numpy(wav_b)
        mask = torch.zeros(2, 400, dtype=torch.long)
        mask[0] = 1
        mask[1, :208] = 1
        enc_ref = top.encode(batch, mask, return_dict=True)
        from torch.nn.utils.rnn import pad_sequence
        padded = pad_sequence([c for c in enc_ref.audio_codes],
                              batch_first=True, padding_value=-1)
        dec_ref = top.decode(padded, return_dict=True)
        want_wavs = [w.numpy() for w in dec_ref.audio_values]

    # ours, through the public API on in-memory params
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodecV2Config
    from qwen3_tts_tpu.inference.tokenizer import Qwen3TTSTokenizer
    from qwen3_tts_tpu.models.codec12.decoder import prepare_decoder_params
    from qwen3_tts_tpu.models.codec12.encoder import prepare_encoder_params
    from qwen3_tts_tpu.weights import from_torch_state_dict

    cfg = CodecV2Config.from_dict({
        "encoder_config": dict(ENC_TINY),
        "decoder_config": {k: list(v) if isinstance(v, tuple) else v
                           for k, v in TINY.items()},
        "encoder_valid_num_quantizers": TINY["num_quantizers"],
        "input_sample_rate": ENC_TINY["sampling_rate"],
        "output_sample_rate": ENC_TINY["sampling_rate"],
        "decode_upsample_rate": 64,
        "encode_downsample_rate": 16,
    })
    tree = from_torch_state_dict(top.state_dict(), dtype=jnp.float32)
    tok = Qwen3TTSTokenizer.from_params(
        cfg,
        enc_params=prepare_encoder_params(tree["encoder"], cfg.encoder_config),
        dec_params=prepare_decoder_params(tree["decoder"], cfg.decoder_config))

    enc = tok.encode([wav_a, wav_b], sr=ENC_TINY["sampling_rate"])
    for ours, theirs in zip(enc.audio_codes, enc_ref.audio_codes):
        np.testing.assert_array_equal(ours, theirs.numpy())
    wavs, _ = tok.decode(enc)
    for got, want in zip(wavs, want_wavs):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-2)


def test_to_pcm16_matches_host_wav_conversion():
    """Device-side PCM16 conversion == the WAV writer's host-side math."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.codec12.decoder import to_pcm16

    wav = np.linspace(-1.3, 1.3, 4097, dtype=np.float32)  # incl. clip range
    got = np.asarray(to_pcm16(jnp.asarray(wav)))
    want = np.round(np.clip(wav, -1.0, 1.0) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(got, want)
