"""Mesh-sharded execution: TP/DP-sharded inference must reproduce the
single-device results exactly (greedy), and the multichip training dryrun
must compile+run (SURVEY.md §4 item 5)."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _devices_ok(n):
    import jax

    return len(jax.devices()) >= n


@requires_reference
def test_sharded_generation_matches_unsharded():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.parallel.mesh import make_mesh, shard_talker_params
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)
    from tests.test_talker import _make_reference_talker, _to_jax, _random_inputs

    if not _devices_ok(4):
        pytest.skip("needs 4 devices")

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    embeds, mask, trailing, pad = _random_inputs(5)
    gen_cfg = GenerationConfig(
        max_new_tokens=5,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
    )
    key = jax.random.PRNGKey(0)

    base = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad, key)
    base_codes, base_lens = np.asarray(base.codes), np.asarray(base.lengths)

    mesh = make_mesh(dp=2, tp=2)
    sharded = shard_talker_params(params, mesh)
    bshard = NamedSharding(mesh, P("dp"))
    args = [jax.device_put(jnp.asarray(x), bshard)
            for x in (embeds, mask, trailing)]
    with mesh:
        out = generate_frames(sharded, cfg, gen_cfg, args[0], args[1], args[2],
                              jnp.asarray(pad), key)
        codes, lens = np.asarray(out.codes), np.asarray(out.lengths)

    np.testing.assert_array_equal(lens, base_lens)
    for b in range(codes.shape[0]):
        np.testing.assert_array_equal(codes[b, :lens[b]],
                                      base_codes[b, :base_lens[b]])


def test_dryrun_multichip_8():
    if not _devices_ok(8):
        pytest.skip("needs 8 devices")
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_param_specs_follow_tp_plan():
    from jax.sharding import PartitionSpec as P

    from qwen3_tts_tpu.parallel.mesh import talker_param_specs

    fake = {
        "layers": {"self_attn": {"qkv_proj": {"weight": 0},
                                 "o_proj": {"weight": 0}},
                   "mlp": {"gate_up_proj": {"weight": 0},
                           "down_proj": {"weight": 0}}},
        "codec_head": 0,
        "code_predictor": {"proj": None},
    }
    specs = talker_param_specs(fake)
    assert specs["layers"]["self_attn"]["qkv_proj"]["weight"] == P(None, "tp", None)
    assert specs["layers"]["self_attn"]["o_proj"]["weight"] == P(None, None, "tp")
    assert specs["layers"]["mlp"]["gate_up_proj"]["weight"] == P(None, "tp", None)
    assert specs["layers"]["mlp"]["down_proj"]["weight"] == P(None, None, "tp")
    assert specs["codec_head"] == P("tp", None)
    assert specs["code_predictor"]["proj"] is None

    # int8-quantized trees: q carries the weight spec, s drops the last axis
    quant = {
        "layers": {"self_attn": {"qkv_proj": {"weight": {"q": 0, "s": 0}}}},
        "codec_head": {"q": 0, "s": 0},
        "code_predictor": {"layers": {"mlp": {
            "down_proj": {"weight": {"q": 0, "s": 0}}}}},
    }
    qspecs = talker_param_specs(quant)
    qkv = qspecs["layers"]["self_attn"]["qkv_proj"]["weight"]
    assert qkv["q"] == P(None, "tp", None)
    assert qkv["s"] == P(None, "tp")
    assert qspecs["codec_head"]["q"] == P("tp", None)
    assert qspecs["codec_head"]["s"] == P("tp")
    down = qspecs["code_predictor"]["layers"]["mlp"]["down_proj"]["weight"]
    assert down["q"] == P(None, None, "tp")
    assert down["s"] == P(None, None)


@requires_reference
@pytest.mark.parametrize("dp,tp", [(4, 1), (2, 2)])
def test_sharded_engine_matches_unsharded(dp, tp):
    """One ContinuousBatchingEngine spanning a (dp, tp) mesh (slots +
    staging rows sharded over dp, params over the HF tp plan — the
    reference's declared-but-never-executed colwise/rowwise metadata,
    configuration_qwen3_tts.py:354-362) must produce exactly the unsharded
    engine's outputs; tp=2 executes the collectives inside every serve
    chunk and staging prefill."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.parallel.mesh import make_mesh, shard_talker_params
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from tests.test_batching import _setup
    from tests.test_talker import _random_inputs

    if not _devices_ok(4):
        pytest.skip("needs 4 devices")

    params, cfg, gen_cfg = _setup(M=6)
    embeds, mask, trailing, pad = _random_inputs(77)

    def run(engine):
        for b in range(2):
            n = int(mask[b].sum())
            engine.submit(Request(
                request_id=b,
                inputs_embeds=embeds[b:b + 1, -n:],
                attn_mask=mask[b:b + 1, -n:],
                trailing=trailing[b:b + 1],
                trailing_len=trailing.shape[1],
                tts_pad=pad,
                max_frames=gen_cfg.max_new_tokens - 1))
        done = engine.run_until_drained()
        return {c.request_id: np.asarray(c.codes) for c in done}

    base = run(ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=4,
                                        max_len=64, max_trailing=8,
                                        dtype=jnp.float32))

    mesh = make_mesh(dp=dp, tp=tp)
    sharded_params = shard_talker_params(params, mesh)
    with mesh:
        got = run(ContinuousBatchingEngine(sharded_params, cfg, gen_cfg,
                                           num_slots=4, max_len=64,
                                           max_trailing=8, dtype=jnp.float32,
                                           mesh=mesh))
    assert set(got) == set(base)
    for rid in base:
        np.testing.assert_array_equal(got[rid], base[rid])
