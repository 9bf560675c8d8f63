"""Golden-value unit tests for core ops vs the reference torch math
(SURVEY.md §4 item 1)."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@requires_reference
def test_rms_norm_golden():
    import torch

    from tests._reference import load_talker
    from qwen3_tts_tpu.ops.norms import rms_norm

    ref = load_talker()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 2, size=(3, 5, 16)).astype(np.float32)
    w = rng.normal(1, 0.1, size=(16,)).astype(np.float32)

    mod = ref.Qwen3TTSRMSNorm(16, eps=1e-6)
    with torch.no_grad():
        mod.weight.copy_(torch.from_numpy(w))
        want = mod(torch.from_numpy(x)).numpy()
    got = np.asarray(rms_norm(x, w, eps=1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@requires_reference
def test_rope_tables_and_apply_golden():
    import torch

    from tests._reference import load_talker
    from qwen3_tts_tpu.ops.rope import (apply_rope, default_inv_freq,
                                        rope_tables)

    ref = load_talker()
    rng = np.random.default_rng(1)
    B, T, H, D = 2, 7, 4, 16
    q = rng.normal(0, 1, size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, T, H, D)).astype(np.float32)
    pos = np.stack([np.arange(T)] * B).astype(np.int64)

    inv = np.asarray(default_inv_freq(D, 10000.0))
    # reference 1-D rope (Qwen3TTSRotaryEmbedding math, 561-592)
    freqs = pos[..., None] * inv
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos_ref, sin_ref = np.cos(emb), np.sin(emb)

    tq = torch.from_numpy(q).permute(0, 2, 1, 3)
    tk = torch.from_numpy(k).permute(0, 2, 1, 3)
    want_q, want_k = ref.apply_rotary_pos_emb(
        tq, tk, torch.from_numpy(cos_ref.astype(np.float32)),
        torch.from_numpy(sin_ref.astype(np.float32)))
    want_q = want_q.permute(0, 2, 1, 3).numpy()

    cos, sin = rope_tables(pos, inv)
    np.testing.assert_allclose(np.asarray(cos), cos_ref, rtol=1e-5, atol=1e-5)
    got_q, got_k = apply_rope(q, k, cos, sin)
    np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=1e-5, atol=1e-5)


@requires_reference
def test_mrope_sectioned_golden():
    """apply_mrope with distinct per-axis positions vs reference
    apply_multimodal_rotary_pos_emb (sectioned + interleaved)."""
    import torch

    from tests._reference import load_talker
    from qwen3_tts_tpu.ops.rope import apply_mrope, default_inv_freq, rope_tables

    ref = load_talker()
    rng = np.random.default_rng(2)
    B, T, H, D = 2, 6, 4, 24
    section = [6, 3, 3]  # sums to D//2
    q = rng.normal(0, 1, size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, T, H, D)).astype(np.float32)
    pos3 = rng.integers(0, 20, size=(3, B, T)).astype(np.int64)

    inv = np.asarray(default_inv_freq(D, 10000.0))
    cos3, sin3 = rope_tables(pos3, inv)

    for interleaved in (False, True):
        tq = torch.from_numpy(q).permute(0, 2, 1, 3)
        tk = torch.from_numpy(k).permute(0, 2, 1, 3)
        want_q, _ = ref.apply_multimodal_rotary_pos_emb(
            tq, tk, torch.from_numpy(np.asarray(cos3)),
            torch.from_numpy(np.asarray(sin3)), section,
            mrope_interleaved=interleaved)
        want_q = want_q.permute(0, 2, 1, 3).numpy()
        got_q, _ = apply_mrope(q, k, cos3, sin3, section,
                               interleaved=interleaved)
        np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=1e-5,
                                   atol=1e-5, err_msg=f"interleaved={interleaved}")


@requires_reference
def test_snake_beta_golden():
    import torch

    from tests._reference import load_tokenizer_v2
    from qwen3_tts_tpu.ops.conv import snake_beta

    ref = load_tokenizer_v2()
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, size=(2, 8, 20)).astype(np.float32)
    alpha = rng.normal(0, 0.5, size=(8,)).astype(np.float32)
    beta = rng.normal(0, 0.5, size=(8,)).astype(np.float32)

    mod = ref.SnakeBeta(8)
    with torch.no_grad():
        mod.alpha.copy_(torch.from_numpy(alpha))
        mod.beta.copy_(torch.from_numpy(beta))
        want = mod(torch.from_numpy(x)).numpy()
    got = np.asarray(snake_beta(x, alpha, beta))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@requires_reference
def test_mel_filterbank_matches_librosa_asset():
    """Our slaney mel filterbank vs the reference's saved librosa filters."""
    from qwen3_tts_tpu.ops.stft import mel_filterbank

    asset = np.load(
        "/root/reference/qwen_tts/core/tokenizer_25hz/vq/assets/mel_filters.npz")
    for n_mels in (80, 128):
        want = asset[f"mel_{n_mels}"]
        got = mel_filterbank(16000, 400, n_mels)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
