"""Streaming: chunked decode must reproduce the one-shot generation exactly,
and the session must emit a first packet before completion."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _setup():
    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from tests.test_talker import _make_reference_talker, _to_jax, _random_inputs

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    embeds, mask, trailing, pad = _random_inputs(7)
    gen_cfg = GenerationConfig(
        max_new_tokens=12,
        sampling=SamplingParams(do_sample=True, top_k=20, temperature=1.0,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=20),
    )
    return params, cfg, gen_cfg, embeds, mask, trailing, pad


@requires_reference
def test_chunked_equals_oneshot():
    import jax

    from qwen3_tts_tpu.runtime.generate import (decode_chunk, generate_frames,
                                                init_decode_state)

    params, cfg, gen_cfg, embeds, mask, trailing, pad = _setup()
    key = jax.random.PRNGKey(11)

    base = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad, key)
    base_codes, base_lens = np.asarray(base.codes), np.asarray(base.lengths)

    M = gen_cfg.max_new_tokens
    S = embeds.shape[1] + M + 1
    state, const = init_decode_state(params, cfg, gen_cfg, embeds, mask,
                                     trailing, pad, key, S)
    collected, actives = [], []
    for k in (2, 4, 5):
        state, frames, active = decode_chunk(params, cfg, gen_cfg, const,
                                             state, k)
        collected.append(np.asarray(frames))
        actives.append(np.asarray(active))
    codes = np.concatenate(collected, axis=1)
    active = np.concatenate(actives, axis=1)
    lens = active.sum(axis=1)

    np.testing.assert_array_equal(lens, base_lens)
    for b in range(codes.shape[0]):
        np.testing.assert_array_equal(codes[b, :lens[b]],
                                      base_codes[b, :base_lens[b]])


@requires_reference
def test_streaming_session_end_to_end():
    import jax

    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)
    from tests.test_codec12_decoder import (TINY as DEC_TINY,
                                            _make_reference_decoder,
                                            _to_jax_params)

    params, cfg, gen_cfg, embeds, mask, trailing, pad = _setup()
    # vocoder with matching codebook count (4 groups in TALKER_TINY)
    _, _, dec_model = _make_reference_decoder()
    dec_params, dec_cfg = _to_jax_params(dec_model)

    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig(warmup_schedule=(2, 3),
                                               steady_chunk=4,
                                               vocoder_left_context=3))
    packets = list(session.run(embeds, mask, trailing, pad,
                               jax.random.PRNGKey(11)))
    assert len(packets) >= 2
    up = dec_cfg.total_upsample
    for pkt in packets:
        assert pkt.wav.shape[-1] == pkt.frame_count * up
        assert np.isfinite(pkt.wav).all()
    # first packet must arrive with only warmup frames decoded
    assert packets[0].frame_count == 2

    wavs, first_latency = session.synthesize(embeds, mask, trailing, pad,
                                             jax.random.PRNGKey(11))
    assert first_latency > 0
    lens = sum(np.asarray(p.active_frames) for p in packets)
    for b, w in enumerate(wavs):
        assert w.shape[0] == int(lens[b]) * up


@requires_reference
def test_streaming_masks_post_eos_frames():
    """Post-EOS frames must be zero-masked in the device code history
    (matching generate_frames), and packets' active_frames must expose the
    per-row valid counts so the API can silence the tail.  Regression: raw
    sampled post-EOS codes (control-range ids) were vocoded into the
    emitted packets."""
    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig, generate_frames
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession,
                                                 _vocode_slice)
    from tests.test_codec12_decoder import (_make_reference_decoder,
                                            _to_jax_params)
    from tests.test_talker import (_make_reference_talker, _random_inputs,
                                   _to_jax)

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    # seed 9: greedy lengths [2, 11] < M-1 — one sample EOSes early
    embeds, mask, trailing, pad = _random_inputs(9)
    # greedy so the one-shot oracle matches the chunked session exactly
    gen_cfg = GenerationConfig(
        max_new_tokens=12,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False))

    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(11))
    lens = np.asarray(out.lengths)
    M = gen_cfg.max_new_tokens - 1
    if (lens >= M).all():
        pytest.skip("no sample EOSed early at this seed; oracle mask empty")

    _, _, dec_model = _make_reference_decoder()
    dec_params, dec_cfg = _to_jax_params(dec_model)
    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig(warmup_schedule=(2, 3),
                                               steady_chunk=4,
                                               vocoder_left_context=3))
    packets = list(session.run(embeds, mask, trailing, pad,
                               jax.random.PRNGKey(11)))
    # the sum of active frames equals the one-shot valid lengths
    got_lens = sum(np.asarray(p.active_frames) for p in packets)
    np.testing.assert_array_equal(got_lens, lens)
    # per packet, active counts never exceed the emitted frame span
    for p in packets:
        assert (np.asarray(p.active_frames) <= p.frame_count).all()
