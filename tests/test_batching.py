"""Continuous batching engine: per-slot decode must reproduce the one-shot
generation (greedy), including requests admitted mid-stream."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _setup(M=8):
    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from tests.test_talker import _make_reference_talker, _to_jax, _random_inputs

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
    )
    return params, cfg, gen_cfg


def _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad):
    import jax

    from qwen3_tts_tpu.runtime.generate import generate_frames

    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(0))
    codes, lens = np.asarray(out.codes), np.asarray(out.lengths)
    return [codes[b, :lens[b]] for b in range(codes.shape[0])]


@requires_reference
def test_engine_matches_oneshot_greedy():
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(21)

    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=3,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)
    for b in range(2):
        # strip left padding: engine requests are unpadded
        n = int(mask[b].sum())
        engine.submit(Request(
            request_id=b,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, -n:] if n < embeds.shape[1]
                                      else embeds[b:b + 1]),
            attn_mask=jnp.asarray(mask[b:b + 1, -n:] if n < mask.shape[1]
                                  else mask[b:b + 1]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1,
        ))
    completions = engine.run_until_drained()
    got = {c.request_id: c.codes for c in completions}
    assert set(got) == {0, 1}
    for b in range(2):
        np.testing.assert_array_equal(got[b], want[b])


@requires_reference
def test_engine_ticks_per_sync_invariant():
    """Chunked host syncs must not change the generated codes: a non-divisor
    chunk size (3 ticks/sync vs 7 frames) and a one-tick engine must both
    reproduce the one-shot generation."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(55)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    for ticks in (1, 3):
        engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                          max_len=64, max_trailing=8,
                                          dtype=jnp.float32,
                                          ticks_per_sync=ticks)
        for b in range(2):
            n = int(mask[b].sum())
            L = embeds.shape[1]
            sl = slice(L - n, L)
            engine.submit(Request(
                request_id=b,
                inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
                attn_mask=jnp.asarray(mask[b:b + 1, sl]),
                trailing=jnp.asarray(trailing[b:b + 1]),
                trailing_len=trailing.shape[1],
                tts_pad=jnp.asarray(pad),
                max_frames=gen_cfg.max_new_tokens - 1))
        got = {c.request_id: c.codes
               for c in engine.run_until_drained()}
        assert set(got) == {0, 1}, f"ticks_per_sync={ticks}"
        for b in range(2):
            np.testing.assert_array_equal(got[b], want[b],
                                          err_msg=f"ticks_per_sync={ticks}")


@requires_reference
def test_engine_mid_stream_admission():
    """A request admitted while another is decoding must still match its
    standalone generation."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(33)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)

    def make_req(b):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(request_id=b,
                       inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
                       attn_mask=jnp.asarray(mask[b:b + 1, sl]),
                       trailing=jnp.asarray(trailing[b:b + 1]),
                       trailing_len=trailing.shape[1],
                       tts_pad=jnp.asarray(pad),
                       max_frames=gen_cfg.max_new_tokens - 1)

    engine.submit(make_req(0))
    completions = []
    completions.extend(engine.step())   # tick 1: only request 0
    completions.extend(engine.step())   # tick 2
    engine.submit(make_req(1))          # joins mid-stream
    for _ in range(40):
        completions.extend(engine.step())
        if len(completions) == 2:
            break
    got = {c.request_id: c.codes for c in completions}
    assert set(got) == {0, 1}
    for b in range(2):
        np.testing.assert_array_equal(got[b], want[b])


@requires_reference
def test_engine_matches_oneshot_int8():
    """Weight-only int8 params flow through both the fused one-shot loop and
    the engine's scatter decode path via the same matmul_t, so greedy outputs
    must agree exactly."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.weights import quantize_talker_params
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    params = quantize_talker_params(params)
    embeds, mask, trailing, pad = _random_inputs(91)

    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)
    for b in range(2):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        engine.submit(Request(
            request_id=b,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1))
    got = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(got) == {0, 1}
    for b in range(2):
        np.testing.assert_array_equal(got[b], want[b])


@requires_reference
def test_engine_burst_exceeding_staging_rows():
    """A burst larger than slots AND staging rows: requests queue, stage in
    waves, install mid-chunk, and every completion matches its one-shot
    generation (exercises row blocking + pipelined aux syncs + varied frame
    budgets)."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import generate_frames
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(44)
    B_avail = embeds.shape[0]

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32, ticks_per_sync=3,
                                      staging_rows=3)
    n_req = 7
    budgets = [7, 3, 5, 7, 2, 6, 4]
    for i in range(n_req):
        b = i % B_avail
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        engine.submit(Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=budgets[i]))
    done = engine.run_until_drained()
    assert len(done) == n_req

    # oracle: per-sample one-shot generation truncated to each budget
    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(0))
    codes, lens = np.asarray(out.codes), np.asarray(out.lengths)
    for c in done:
        b = c.request_id % B_avail
        want = codes[b, :min(lens[b], budgets[c.request_id])]
        np.testing.assert_array_equal(np.asarray(c.codes), want)


@requires_reference
def test_engine_incremental_load_no_dropped_requests():
    """Regression: staging-row reclaim used the in-flight chunk's (stale)
    staged_valid snapshot, freeing rows that were staged AFTER that chunk
    launched; a later stage_requests then overwrote a staged-but-not-
    installed request, which was silently dropped and the engine never
    drained.  Submitting between steps under slot pressure hits the race."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import generate_frames
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(45)
    B_avail = embeds.shape[0]

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32, ticks_per_sync=1,
                                      staging_rows=4)

    def make_req(i):
        b = i % B_avail
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=5)

    n_req = 8
    done = []
    i = 0
    for _ in range(4):            # 2 submits per engine step
        engine.submit(make_req(i)); i += 1
        engine.submit(make_req(i)); i += 1
        done.extend(engine.step())
    done.extend(engine.run_until_drained(max_ticks=500))
    assert sorted(c.request_id for c in done) == list(range(n_req)), \
        f"dropped requests: completed {sorted(c.request_id for c in done)}"

    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(0))
    codes, lens = np.asarray(out.codes), np.asarray(out.lengths)
    for c in done:
        b = c.request_id % B_avail
        want = codes[b, :min(lens[b], 5)]
        np.testing.assert_array_equal(np.asarray(c.codes), want)


@requires_reference
def test_engine_zero_frame_budget_completes_immediately():
    """A request whose frame budget clamps to zero (max_frames=0, or a
    prompt bucket leaving no cache room) completes with 0 frames instead of
    stalling run_until_drained."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=4)
    embeds, mask, trailing, pad = _random_inputs(46)
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)
    n = int(mask[0].sum())
    L = embeds.shape[1]
    sl = slice(L - n, L)
    engine.submit(Request(
        request_id=7,
        inputs_embeds=jnp.asarray(embeds[0:1, sl]),
        attn_mask=jnp.asarray(mask[0:1, sl]),
        trailing=jnp.asarray(trailing[0:1]),
        trailing_len=trailing.shape[1],
        tts_pad=jnp.asarray(pad),
        max_frames=0))
    done = engine.run_until_drained(max_ticks=50)
    assert len(done) == 1 and done[0].request_id == 7
    assert done[0].codes.shape == (0, cfg.num_code_groups)


def test_engine_sliding_window_matches_oneshot():
    """use_sliding_window=True: the engine's per-slot attention clamp must
    match talker_decode_step's (models/talker.py:391-396) so engine output
    equals generate_frames under a sliding-window config (greedy)."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import GenerationConfig, generate_frames
    from qwen3_tts_tpu.utils.testing import random_talker_params

    cfg = TalkerConfig(
        vocab_size=1056, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, text_hidden_size=32, num_code_groups=3,
        codec_eos_token_id=1050, codec_pad_id=1044, codec_bos_id=1045,
        use_sliding_window=True, sliding_window=4,
        code_predictor_config=CodePredictorConfig(
            vocab_size=32, hidden_size=32, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=3))
    assert cfg.sliding_window == 4
    params = random_talker_params(cfg, jax.random.PRNGKey(3),
                                  dtype=jnp.float32)
    gen_cfg = GenerationConfig(
        max_new_tokens=12,  # > sliding_window so the clamp matters
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False))

    rng = np.random.default_rng(9)
    B, T, Tt, H = 2, 6, 4, cfg.hidden_size
    embeds = rng.normal(0, 0.3, size=(B, T, H)).astype(np.float32)
    mask = np.ones((B, T), np.int32)
    trailing = rng.normal(0, 0.3, size=(B, Tt, H)).astype(np.float32)
    pad = rng.normal(0, 0.3, size=(1, 1, H)).astype(np.float32)

    want = _one_shot(params, cfg, gen_cfg, jnp.asarray(embeds),
                     jnp.asarray(mask), jnp.asarray(trailing),
                     jnp.asarray(pad))

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=Tt,
                                      dtype=jnp.float32, prefill_bucket=T)
    for b in range(B):
        engine.submit(Request(
            request_id=b,
            inputs_embeds=jnp.asarray(embeds[b:b + 1]),
            attn_mask=jnp.asarray(mask[b:b + 1]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=Tt,
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1))
    got = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(got) == set(range(B))
    for b in range(B):
        np.testing.assert_array_equal(got[b], want[b])


@requires_reference
def test_engine_per_request_sampling_isolated():
    """Per-request sampling: a greedy request must reproduce its solo
    one-shot generation exactly while a high-temperature sampled request
    decodes in the same slots (reference parity: per-call generate kwargs,
    which the engine carries per slot)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    # engine default sampling: SAMPLED at high temperature
    import dataclasses

    eng_cfg = dataclasses.replace(
        gen_cfg, sampling=SamplingParams(do_sample=True, temperature=3.0,
                                         top_k=50, repetition_penalty=1.0))
    embeds, mask, trailing, pad = _random_inputs(77)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, eng_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)

    def req(i, b, sampling=None):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1,
            sampling=sampling)

    # request 0: explicit greedy override; request 1: engine default sampled
    engine.submit(req(0, 0, sampling=gen_cfg.sampling))
    engine.submit(req(1, 1))
    got = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(got) == {0, 1}
    np.testing.assert_array_equal(got[0], want[0])


@requires_reference
def test_engine_cold_start_chunk_ramp():
    """After an idle period the first chunks are short (latency ramp), then
    grow to ticks_per_sync; output equality with one-shot is preserved
    (chunk sizes are output-invariant, see ticks_per_sync test)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(11)
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32, ticks_per_sync=8,
                                      chunk_ramp=(2, 4))
    n = int(mask[0].sum())
    L = embeds.shape[1]
    sl = slice(L - n, L)
    req = Request(request_id=0,
                  inputs_embeds=jnp.asarray(embeds[0:1, sl]),
                  attn_mask=jnp.asarray(mask[0:1, sl]),
                  trailing=jnp.asarray(trailing[0:1]),
                  trailing_len=trailing.shape[1],
                  tts_pad=jnp.asarray(pad), max_frames=7)
    engine.submit(req)
    engine._stage_pending()
    assert engine._next_ticks() == 2          # cold start: short chunk
    engine._launch_chunk()
    assert engine._next_ticks() == 4          # ramp advances
    engine._launch_chunk()
    done = engine.run_until_drained()
    assert len(done) == 1 and done[0].codes.shape[0] == 7

    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)
    np.testing.assert_array_equal(done[0].codes, want[0][:7])


def test_rows_per_request_top_k_property():
    """process_and_sample_rows honors a per-row top_k on BOTH branches:
    every sampled id falls inside that row's top-k_i set, k_i <= 0 keeps the
    full candidate set, and greedy rows ignore k entirely."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import process_and_sample_rows

    rng = np.random.default_rng(0)
    V = 64
    logits = jnp.asarray(rng.normal(size=(4, V)).astype(np.float32))
    order = np.argsort(-np.asarray(logits), axis=-1)
    #          temp  top_p rep  do_sample top_k
    rows = jnp.asarray(np.array([
        [3.0, 1.0, 1.0, 1.0, 1.0],     # k=1 -> always the argmax
        [3.0, 1.0, 1.0, 1.0, 3.0],     # k=3 -> within the top-3
        [3.0, 1.0, 1.0, 1.0, 0.0],     # k<=0 -> full candidate set
        [9.9, 1.0, 1.0, 0.0, 1.0],     # greedy row: k irrelevant
    ], np.float32))
    for static_k in (50, 0):           # static-top-K branch / full-sort branch
        seen2 = set()
        for i in range(64):
            got = np.asarray(process_and_sample_rows(
                logits, jax.random.PRNGKey(i), rows, static_k))
            assert got[0] == order[0, 0]
            assert got[1] in order[1, :3]
            assert got[3] == order[3, 0]
            seen2.add(int(got[2]))
        # the unfiltered high-temperature row must range beyond any small k
        assert len(seen2) > 8, f"static_k={static_k}: row 2 looks filtered"


@requires_reference
def test_engine_per_request_top_k():
    """A per-request top_k=1 sampled request is deterministic (categorical
    over one candidate == argmax) and must reproduce the request's greedy
    solo run even while a default wide-k sampled request shares the batch;
    a request wider than the engine's compiled candidate width is rejected."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    eng_cfg = dataclasses.replace(
        gen_cfg, sampling=SamplingParams(do_sample=True, temperature=3.0,
                                         top_k=50, repetition_penalty=1.05))
    embeds, mask, trailing, pad = _random_inputs(78)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, eng_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)

    def req(i, b, sampling=None):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1,
            sampling=sampling)

    # k=1 (sampled) == the greedy distribution; same rep penalty as gen_cfg
    k1 = dataclasses.replace(eng_cfg.sampling, top_k=1)
    engine.submit(req(0, 0, sampling=k1))
    engine.submit(req(1, 1))                   # default wide-k sampled
    got = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(got) == {0, 1}
    np.testing.assert_array_equal(got[0], want[0])

    with pytest.raises(ValueError, match="candidate width"):
        engine.submit(req(2, 0, sampling=dataclasses.replace(
            eng_cfg.sampling, top_k=51)))
    with pytest.raises(ValueError, match="candidate width"):
        # k<=0 = unfiltered: wider than a top-50 program can serve
        engine.submit(req(3, 0, sampling=dataclasses.replace(
            eng_cfg.sampling, top_k=0)))


@requires_reference
def test_engine_cancel():
    """Cancelling a live request frees its slot without completing it; the
    other request's output is unaffected; the slot serves a later request;
    a cancelled id is reusable after the in-flight chunks sync."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    embeds, mask, trailing, pad = _random_inputs(79)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    def req(i, b, mf=7):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(request_id=i,
                       inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
                       attn_mask=jnp.asarray(mask[b:b + 1, sl]),
                       trailing=jnp.asarray(trailing[b:b + 1]),
                       trailing_len=trailing.shape[1],
                       tts_pad=jnp.asarray(pad), max_frames=mf)

    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32, ticks_per_sync=2,
                                      chunk_ramp=())
    # cancel while still pending (never staged)
    engine.submit(req(9, 0))
    assert engine.cancel(9)
    assert engine.run_until_drained() == []

    # cancel mid-decode
    engine.submit(req(0, 0))
    engine.submit(req(1, 1))
    engine.step()                 # stage + first chunk in flight
    assert engine.cancel(0)
    assert not engine.cancel(42)  # unknown id
    done = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(done) == {1}
    np.testing.assert_array_equal(done[1], want[1])

    # the freed slot serves a later request; the cancelled id is reusable
    engine.submit(req(0, 0))
    done = {c.request_id: c.codes for c in engine.run_until_drained()}
    np.testing.assert_array_equal(done[0], want[0])

    # cancel with no chunks in flight (engine idle): id immediately reusable
    engine.submit(req(5, 0))
    engine._stage_pending()     # staged + live in frames_acc, nothing flying
    assert engine.cancel(5)
    engine.submit(req(5, 1))
    done = {c.request_id: c.codes for c in engine.run_until_drained()}
    np.testing.assert_array_equal(done[5], want[1])


@requires_reference
def test_engine_per_request_subtalker_sampling_isolated():
    """Per-request SUB-talker sampling: a request overriding the engine's
    sampled sub-talker back to greedy must reproduce its solo one-shot
    generation exactly while a high-temperature sub-sampled request decodes
    alongside (reference parity: per-call subtalker_* generate kwargs,
    modeling_qwen3_tts.py:2044-2058, carried per slot here)."""
    import dataclasses

    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=8)
    # engine default: greedy talker, SAMPLED sub-talker at high temperature
    eng_cfg = dataclasses.replace(
        gen_cfg, subtalker=SamplingParams(do_sample=True, temperature=3.0,
                                          top_k=0, repetition_penalty=1.0))
    embeds, mask, trailing, pad = _random_inputs(31)
    want = _one_shot(params, cfg, gen_cfg, embeds, mask, trailing, pad)

    engine = ContinuousBatchingEngine(params, cfg, eng_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)

    def req(i, b, sub_sampling=None):
        n = int(mask[b].sum())
        L = embeds.shape[1]
        sl = slice(L - n, L)
        return Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[b:b + 1, sl]),
            attn_mask=jnp.asarray(mask[b:b + 1, sl]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=gen_cfg.max_new_tokens - 1,
            sub_sampling=sub_sampling)

    # request 0: greedy sub-talker override; request 1: engine default
    engine.submit(req(0, 0, sub_sampling=gen_cfg.subtalker))
    engine.submit(req(1, 1))
    got = {c.request_id: c.codes for c in engine.run_until_drained()}
    assert set(got) == {0, 1}
    np.testing.assert_array_equal(got[0], want[0])
    # the sampled request's sub-codes (columns 1..Q-1) must differ from its
    # greedy run somewhere (temperature 3 on random weights)
    want1 = want[1][:len(got[1])]
    assert (got[1][:, 1:] != want1[:, 1:]).any()


@requires_reference
def test_engine_subtalker_submit_validation():
    """A greedy-sub-talker engine must reject sampled sub_sampling
    overrides loudly (its compiled program omits the sampling machinery),
    and a fused-sub-talker engine must reject sub top_p < 1."""
    import dataclasses

    import jax.numpy as jnp
    import pytest

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=4)
    embeds, mask, trailing, pad = _random_inputs(5)
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)

    def req(i, sub_sampling):
        return Request(
            request_id=i,
            inputs_embeds=jnp.asarray(embeds[:1]),
            attn_mask=jnp.asarray(mask[:1]),
            trailing=jnp.asarray(trailing[:1]),
            trailing_len=trailing.shape[1],
            tts_pad=jnp.asarray(pad),
            max_frames=2,
            sub_sampling=sub_sampling)

    with pytest.raises(ValueError, match="greedy gen_cfg.subtalker"):
        engine.submit(req(0, SamplingParams(do_sample=True)))

    eng2 = ContinuousBatchingEngine(
        params, cfg,
        dataclasses.replace(
            gen_cfg,
            subtalker=SamplingParams(do_sample=True, top_k=8)),
        num_slots=2, max_len=64, max_trailing=8, dtype=jnp.float32)
    with pytest.raises(ValueError, match="candidate width"):
        eng2.submit(req(1, SamplingParams(do_sample=True, top_k=32)))


@requires_reference
def test_engines_with_different_knobs_share_programs():
    """Two engines differing only in default temperature/top_p/rep-penalty
    must share every compiled program (the jits see gen_cfg.canonical(); the
    knobs ride per slot as data) — knob sweeps must never pay the
    minutes-long remote TPU compile twice."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import jax._src.test_util as jtu

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=6)
    gen_cfg = dataclasses.replace(
        gen_cfg,
        sampling=SamplingParams(do_sample=True, temperature=0.8, top_k=16,
                                top_p=0.9, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, temperature=0.7, top_k=8))
    embeds, mask, trailing, pad = _random_inputs(33)

    def drain(g):
        eng = ContinuousBatchingEngine(params, cfg, g, num_slots=2,
                                       max_len=64, max_trailing=8,
                                       dtype=jnp.float32)
        n = int(mask[0].sum())
        eng.submit(Request(
            request_id=0, inputs_embeds=jnp.asarray(embeds[:1, -n:]),
            attn_mask=jnp.asarray(mask[:1, -n:]),
            trailing=jnp.asarray(trailing[:1]),
            trailing_len=trailing.shape[1], tts_pad=jnp.asarray(pad),
            max_frames=g.max_new_tokens - 1))
        return eng.run_until_drained()

    drain(gen_cfg)  # compile
    hot = dataclasses.replace(
        gen_cfg,
        sampling=dataclasses.replace(gen_cfg.sampling, temperature=1.9,
                                     top_p=0.6, repetition_penalty=1.4),
        subtalker=dataclasses.replace(gen_cfg.subtalker, temperature=1.3))
    with jtu.count_pjit_cpp_cache_miss() as count:
        out = drain(hot)
    assert out and out[0].request_id == 0
    assert count() == 0, (
        f"default-knob change recompiled {count()} engine programs")


@pytest.mark.parametrize("kv_quant", [False, True])
def test_engine_fused_talker_step_matches_generate_and_is_sync_invariant(
        kv_quant):
    """The serving engine's fused-talker-step path (serve step = the whole-
    step Pallas megakernel, fused-layout cache/staging pools, per-slot write
    indices; int8-KV scale pools when kv_quant) must (a) be invariant to
    host sync granularity, (b) track the XLA-engine codes closely under
    greedy decoding (W8A8 vs W8A16 numerics flip near-ties only)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from tests.test_pallas_talker_step import _tiny_talker

    cfg, params = _tiny_talker()
    M = 6
    rng = np.random.default_rng(11)
    gen_fused = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
        fused_talker_step=True, kv_quant=kv_quant)

    def req(b, embeds, mask, trailing, pad):
        return Request(
            request_id=b, inputs_embeds=jnp.asarray(embeds[b:b + 1]),
            attn_mask=jnp.asarray(mask[b:b + 1]),
            trailing=jnp.asarray(trailing[b:b + 1]),
            trailing_len=trailing.shape[1], tts_pad=jnp.asarray(pad),
            max_frames=M - 1)

    B, T = 2, 8
    embeds = jnp.asarray(rng.normal(0, 0.3, (B, T, cfg.hidden_size)),
                         jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    trailing = jnp.asarray(rng.normal(0, 0.3, (B, 3, cfg.hidden_size)),
                           jnp.bfloat16)
    pad = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)

    def drain(g, ticks):
        eng = ContinuousBatchingEngine(params, cfg, g, num_slots=2,
                                       max_len=120, max_trailing=8,
                                       dtype=jnp.bfloat16,
                                       ticks_per_sync=ticks)
        if g.fused_talker_step:
            assert eng.max_len % 128 == 0   # kernel KV chunking
        for b in range(B):
            eng.submit(req(b, embeds, mask, trailing, pad))
        return {c.request_id: c.codes for c in eng.run_until_drained()}

    got1 = drain(gen_fused, 3)
    got2 = drain(gen_fused, 1)
    assert set(got1) == set(got2) == {0, 1}
    for b in range(B):  # (a) sync-granularity invariance, byte-exact
        np.testing.assert_array_equal(got1[b], got2[b])

    got_xla = drain(dataclasses.replace(gen_fused, fused_talker_step=False),
                    3)
    n = sum(min(len(got1[b]), len(got_xla[b])) for b in range(B))
    agree = sum((got1[b][:len(got_xla[b])] ==
                 got_xla[b][:len(got1[b])]).mean() * min(len(got1[b]),
                                                         len(got_xla[b]))
                for b in range(B) if min(len(got1[b]), len(got_xla[b])))
    if n:  # (b) numerics tracking
        assert agree / n >= 0.6, f"fused-engine vs xla-engine agreement {agree / n}"


def test_engine_fused_talker_step_validation():
    """fused_talker_step engines must reject non-int8 params loudly, and
    accept kv_quant (int8-KV kernel mode — fused-layout scale pools)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import ContinuousBatchingEngine
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.utils.testing import random_talker_params
    from tests.test_pallas_talker_step import _tiny_talker

    cfg, params = _tiny_talker()
    base = GenerationConfig(
        max_new_tokens=4, sampling=SamplingParams(do_sample=False),
        subtalker=SamplingParams(do_sample=False), fused_talker_step=True)

    import dataclasses
    eng = ContinuousBatchingEngine(
        params, cfg, dataclasses.replace(base, kv_quant=True),
        num_slots=2, max_len=128, max_trailing=8)
    assert eng.state.cache.quantized
    assert eng.state.cache.k_scale.shape[3] == eng.max_len   # fused layout
    bf16 = random_talker_params(cfg, jax.random.PRNGKey(0),
                                dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="int8"):
        ContinuousBatchingEngine(bf16, cfg, base, num_slots=2, max_len=128,
                                 max_trailing=8)
