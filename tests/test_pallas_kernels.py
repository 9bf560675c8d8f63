"""Pallas kernel correctness (interpret mode on CPU) vs the XLA reference
attention path."""

import numpy as np
import pytest


def _want(q, k, v, valid):
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.attention import attention

    return np.asarray(attention(
        jnp.asarray(q)[:, None], jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(valid)[:, None, None, :]))[:, 0]


def test_decode_attention_matches_xla():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.decode_attention import decode_attention

    rng = np.random.default_rng(0)
    B, S, Hq, Hkv, D = 2, 160, 8, 4, 128
    q = rng.normal(0, 1, size=(B, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, S, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, size=(B, S, Hkv, D)).astype(np.float32)
    start = np.array([0, 3], np.int32)
    end = np.array([97, 120], np.int32)
    valid = (np.arange(S)[None, :] >= start[:, None]) & \
            (np.arange(S)[None, :] < end[:, None])

    want = _want(q, k, v, valid)
    got = np.asarray(decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(start), jnp.asarray(end), block_size=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_decode_attention_single_block_and_bf16():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.decode_attention import decode_attention

    rng = np.random.default_rng(1)
    B, S, Hq, Hkv, D = 1, 48, 4, 2, 64
    q = rng.normal(0, 1, size=(B, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, S, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, size=(B, S, Hkv, D)).astype(np.float32)
    start = np.array([0], np.int32)
    end = np.array([40], np.int32)
    valid = (np.arange(S)[None, :] >= start[:, None]) & \
            (np.arange(S)[None, :] < end[:, None])

    want = _want(q, k, v, valid)
    got = np.asarray(decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(start), jnp.asarray(end),
        block_size=512, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_pallas_decode_path_matches_xla_generation():
    """Greedy chunked decode with use_pallas_attention (interpret mode on
    CPU) must equal the XLA attention path."""
    import pytest

    from tests._reference import reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")

    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig, decode_chunk,
                                                init_decode_state)
    from tests.test_talker import _make_reference_talker, _to_jax, _random_inputs

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    embeds, mask, trailing, pad = _random_inputs(13)
    gen_cfg = GenerationConfig(
        max_new_tokens=7,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False))
    key = jax.random.PRNGKey(3)
    S = embeds.shape[1] + 8

    outs = {}
    for use_pallas in (False, True):
        state, const = init_decode_state(params, cfg, gen_cfg, embeds, mask,
                                         trailing, pad, key, S)
        state, frames, active = decode_chunk(
            params, cfg, gen_cfg, const, state, 6,
            use_pallas_attention=use_pallas)
        outs[use_pallas] = (np.asarray(frames), np.asarray(active))

    np.testing.assert_array_equal(outs[True][1], outs[False][1])
    valid = outs[False][1]
    np.testing.assert_array_equal(outs[True][0][valid], outs[False][0][valid])
