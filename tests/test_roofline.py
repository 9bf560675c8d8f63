"""Roofline arithmetic (utils/roofline.py): analytic weight-byte counts must
match the real parameter tree, and derived utilizations must be consistent."""

import numpy as np


def _tiny_cfg():
    from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig

    return TalkerConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, text_hidden_size=32, num_code_groups=3,
        code_predictor_config=CodePredictorConfig(
            vocab_size=32, hidden_size=24, intermediate_size=40,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=8, num_code_groups=3))


def test_weight_bytes_match_param_tree():
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.utils.roofline import talker_bytes_per_tick
    from qwen3_tts_tpu.utils.testing import random_talker_params
    from qwen3_tts_tpu.weights import quantize_talker_params

    cfg = _tiny_cfg()
    p = quantize_talker_params(
        random_talker_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))

    def layer_bytes(layers):
        n = 0
        for grp, names in (("self_attn", ("qkv_proj", "o_proj")),
                           ("mlp", ("gate_up_proj", "down_proj"))):
            for nm in names:
                n += layers[grp][nm]["weight"]["q"].nbytes
        return n

    actual = (layer_bytes(p["layers"]) + p["codec_head"]["q"].nbytes
              + layer_bytes(p["code_predictor"]["layers"])
              + p["code_predictor"]["lm_heads"].nbytes)
    got = talker_bytes_per_tick(cfg, batch=4, attend_len=16)["weights"]
    assert got == actual


def test_roofline_consistency():
    from qwen3_tts_tpu.utils.roofline import Peaks, decode_roofline

    cfg = _tiny_cfg()
    peaks = Peaks(bf16_flops=1e12, int8_ops=2e12, hbm_bytes=1e11)
    r = decode_roofline(cfg, batch=4, attend_len=16, tick_seconds=1e-3,
                        peaks=peaks)
    assert r["flops_per_tick"] > 0 and r["bytes_per_tick"] > 0
    # identities: util = floor/tick; mfu = flops / tick / peak
    np.testing.assert_allclose(r["pct_of_dma_floor"],
                               (r["dma_floor_ms"] / r["tick_ms"]))
    np.testing.assert_allclose(
        r["mfu"], r["flops_per_tick"] / 1e-3 / peaks.bf16_flops)
    # KV bytes scale linearly with attended length
    r2 = decode_roofline(cfg, batch=4, attend_len=32, tick_seconds=1e-3,
                         peaks=peaks)
    np.testing.assert_allclose(r2["kv_bytes_per_tick"],
                               2 * r["kv_bytes_per_tick"])
    # int8 KV halves element bytes (plus scales)
    r3 = decode_roofline(cfg, batch=4, attend_len=16, tick_seconds=1e-3,
                         kv_bytes=1, peaks=peaks)
    assert r3["kv_bytes_per_tick"] < r["kv_bytes_per_tick"]
