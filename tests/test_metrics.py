"""Metrics/observability layer: registry semantics and engine integration."""

import json

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def test_registry_counters_gauges_timings():
    from qwen3_tts_tpu.utils.metrics import MetricsRegistry

    m = MetricsRegistry()
    m.count("a")
    m.count("a", 2)
    m.gauge("g", 7.5)
    for v in (0.1, 0.2, 0.3):
        m.observe("t", v)
    with m.time("t2"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["a"] == 3
    assert snap["gauges"]["g"] == 7.5
    assert snap["timings"]["t"]["count"] == 3
    assert abs(snap["timings"]["t"]["p50"] - 0.2) < 1e-9
    assert snap["timings"]["t2"]["count"] == 1

    line = m.emit(stream=open("/dev/null", "w"))
    parsed = json.loads(line)
    assert parsed["counters"]["a"] == 3 and "ts" in parsed

    # reservoir bounding keeps the tail
    m2 = MetricsRegistry(reservoir=8)
    for i in range(100):
        m2.observe("x", float(i))
    assert len(m2.timings["x"]) <= 8
    assert max(m2.timings["x"]) == 99.0

    m.reset()
    assert not m.counters and not m.gauges and not m.timings


def test_kv_logger_format(capsys):
    import logging

    from qwen3_tts_tpu.utils.metrics import get_logger

    log = get_logger("qwen3_tts_tpu.test", level=logging.INFO)
    log.info("chunk done", extra={"kv": {"ticks": 50, "rtf": 120.5}})
    err = capsys.readouterr().err
    assert "chunk done" in err and "ticks=50" in err and "rtf=120.5" in err


@requires_reference
def test_engine_emits_metrics():
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.utils.metrics import global_metrics
    from tests.test_batching import _setup
    from tests.test_talker import _random_inputs

    params, cfg, gen_cfg = _setup(M=6)
    embeds, mask, trailing, pad = _random_inputs(55)

    global_metrics().reset()
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=2,
                                      max_len=64, max_trailing=8,
                                      dtype=jnp.float32)
    n = int(mask[0].sum())
    engine.submit(Request(
        request_id=0, inputs_embeds=embeds[0:1, -n:],
        attn_mask=mask[0:1, -n:], trailing=trailing[0:1],
        trailing_len=trailing.shape[1], tts_pad=pad,
        max_frames=gen_cfg.max_new_tokens - 1))
    done = engine.run_until_drained()
    assert len(done) == 1

    snap = global_metrics().snapshot()
    c = snap["counters"]
    assert c["engine.submits"] == 1
    assert c["engine.completions"] == 1
    assert c["engine.chunks"] >= 1
    assert c["engine.frames"] == done[0].codes.shape[0]
    assert snap["timings"]["engine.aux_sync_s"]["count"] >= 1
    assert "engine.queue_depth" in snap["gauges"]
