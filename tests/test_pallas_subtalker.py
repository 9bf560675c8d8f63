"""Fused sub-talker Pallas megakernel: parity against the exact-math JAX
reference (same W8A8 formulas), and behavioural checks vs the XLA path."""

import numpy as np
import pytest


def _tiny_cp(B=4, Ht=96, seed=0):
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.utils.testing import random_talker_params
    from qwen3_tts_tpu.weights import quantize_talker_params

    cfg = TalkerConfig(
        vocab_size=256, hidden_size=Ht, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, text_hidden_size=Ht, text_vocab_size=128,
        num_code_groups=5,
        codec_eos_token_id=250, codec_pad_id=251, codec_bos_id=252,
        codec_think_id=253, codec_nothink_id=254, codec_think_bos_id=255,
        codec_think_eos_id=249,
        code_predictor_config=CodePredictorConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_code_groups=5),
    )
    params = random_talker_params(cfg, jax.random.PRNGKey(seed),
                                  dtype=jnp.bfloat16)
    params = quantize_talker_params(params)
    cp = params["code_predictor"]
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(0, 0.5, (B, 1, Ht)), jnp.bfloat16)
    c0e = jnp.asarray(rng.normal(0, 0.5, (B, 1, Ht)), jnp.bfloat16)
    return cfg, cp, hidden, c0e


def test_fused_kernel_matches_reference_greedy():
    """Kernel (interpret) vs the same-math JAX reference. Sub-ULP backend
    differences can flip near-tie argmaxes and cascade through the AR chain,
    so assert high agreement across seeds rather than bit equality; rows
    whose codes fully agree must also agree on emb_sum."""
    import jax

    from qwen3_tts_tpu.ops.pallas.subtalker import (subtalker_frame_fused,
                                                    subtalker_frame_ref)
    from qwen3_tts_tpu.ops.sampling import SamplingParams

    sampling = SamplingParams(do_sample=False)
    agreements = []
    for seed in range(4):
        cfg, cp, hidden, c0e = _tiny_cp(seed=seed)
        key = jax.random.PRNGKey(7 + seed)
        codes_k, emb_k = subtalker_frame_fused(cp, cfg.code_predictor_config,
                                               hidden, c0e, key, sampling,
                                               interpret=True)
        codes_r, emb_r = subtalker_frame_ref(cp, cfg.code_predictor_config,
                                             hidden, c0e, key, sampling)
        codes_k, codes_r = np.asarray(codes_k), np.asarray(codes_r)
        agreements.append((codes_k == codes_r).mean())
        full_row = (codes_k == codes_r).all(axis=1)
        if full_row.any():
            np.testing.assert_allclose(
                np.asarray(emb_k, np.float32)[full_row],
                np.asarray(emb_r, np.float32)[full_row],
                rtol=0.05, atol=0.02)
    mean_agree = float(np.mean(agreements))
    assert mean_agree >= 0.8, f"kernel/ref greedy agreement {agreements}"


def test_fused_kernel_close_to_xla_path_logits():
    """The W8A8 kernel should track the W8A16 XLA path closely: codes mostly
    agree on random weights (quantization can flip near-ties)."""
    import jax

    from qwen3_tts_tpu.models.talker import code_predictor_frame
    from qwen3_tts_tpu.ops.pallas.subtalker import subtalker_frame_ref
    from qwen3_tts_tpu.ops.sampling import SamplingParams

    cfg, cp, hidden, c0e = _tiny_cp()
    sampling = SamplingParams(do_sample=False)
    key = jax.random.PRNGKey(3)
    params = {"code_predictor": cp}
    codes_x, _ = code_predictor_frame(params, cfg, hidden, c0e, key, sampling)
    codes_f, _ = subtalker_frame_ref(cp, cfg.code_predictor_config, hidden,
                                     c0e, key, sampling)
    agree = (np.asarray(codes_x) == np.asarray(codes_f)).mean()
    assert agree >= 0.75, f"W8A8 vs W8A16 greedy agreement too low: {agree}"


def test_fused_kernel_sampled_mode_runs():
    import jax

    from qwen3_tts_tpu.ops.pallas.subtalker import subtalker_frame_fused
    from qwen3_tts_tpu.ops.sampling import SamplingParams

    cfg, cp, hidden, c0e = _tiny_cp()
    sampling = SamplingParams(do_sample=True, top_k=8, temperature=0.9)
    codes, emb = subtalker_frame_fused(cp, cfg.code_predictor_config, hidden,
                                       c0e, jax.random.PRNGKey(11), sampling,
                                       interpret=True)
    codes = np.asarray(codes)
    assert codes.shape == (4, cfg.num_code_groups - 1)
    assert (codes >= 0).all() and (codes < 64).all()
    # different seed -> (almost surely) different samples
    codes2, _ = subtalker_frame_fused(cp, cfg.code_predictor_config, hidden,
                                      c0e, jax.random.PRNGKey(12), sampling,
                                      interpret=True)
    assert (np.asarray(codes2) != codes).any()


def test_topk_kth_value_exact():
    """Bit-level binary search must reproduce jax.lax.top_k's k-th value."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.subtalker import _kth_value_bits

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (8, 257)), jnp.float32)
    for k in (1, 2, 8, 50, 257):
        want = jax.lax.top_k(x, k)[0][:, -1:]
        got = _kth_value_bits(x, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"k={k}")


def test_generate_frames_fused_subtalker_end_to_end():
    """generate_frames with fused_subtalker=True must run (interpret mode on
    CPU) and track the XLA path closely under greedy decoding."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)

    cfg, cp, _, _ = _tiny_cp()
    from qwen3_tts_tpu.utils.testing import random_talker_params
    from qwen3_tts_tpu.weights import quantize_talker_params

    params = quantize_talker_params(
        random_talker_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16))
    B, L = 2, 8
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(0, 0.3, (B, L, cfg.hidden_size)),
                         jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = jnp.asarray(rng.normal(0, 0.3, (B, 3, cfg.hidden_size)),
                           jnp.bfloat16)
    pad = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)

    outs = {}
    for fused in (False, True):
        gen_cfg = GenerationConfig(
            max_new_tokens=6,
            sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
            subtalker=SamplingParams(do_sample=False),
            fused_subtalker=fused)
        out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                              pad, jax.random.PRNGKey(1))
        outs[fused] = (np.asarray(out.codes), np.asarray(out.lengths))

    codes_x, len_x = outs[False]
    codes_f, len_f = outs[True]
    assert codes_f.shape == codes_x.shape
    # codebook 0 comes from the talker (identical math in both paths) unless
    # W8A8 sub-codes diverge and feed back; expect strong agreement overall
    agree = (codes_x == codes_f).mean()
    assert agree >= 0.6, f"fused vs xla generate agreement {agree}"


def test_fused_kernel_per_row_sampling_rows():
    """Per-row `rows` override: the kernel (interpret) matches the ref twin
    with a mixed batch — row 0 greedy, rows 1-2 sampled at different
    temperatures/top_k, row 3 sampled with no top_k.  The greedy row must
    also reproduce the all-greedy uniform run exactly (its gumbel is zeroed
    and temp/k neutralized)."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.subtalker import (subtalker_frame_fused,
                                                    subtalker_frame_ref)
    from qwen3_tts_tpu.ops.sampling import SamplingParams

    cfg, cp, hidden, c0e = _tiny_cp()
    rows = jnp.asarray(np.stack([
        SamplingParams(do_sample=False).as_row(),
        SamplingParams(do_sample=True, temperature=0.7, top_k=4).as_row(),
        SamplingParams(do_sample=True, temperature=2.0, top_k=16).as_row(),
        SamplingParams(do_sample=True, temperature=1.1, top_k=0).as_row(),
    ]))
    key = jax.random.PRNGKey(21)
    ck, _ = subtalker_frame_fused(cp, cfg.code_predictor_config, hidden, c0e,
                                  key, None, rows=rows, interpret=True)
    cr, _ = subtalker_frame_ref(cp, cfg.code_predictor_config, hidden, c0e,
                                key, None, rows=rows)
    ck, cr = np.asarray(ck), np.asarray(cr)
    assert (ck == cr).mean() >= 0.8, (ck, cr)

    greedy, _ = subtalker_frame_ref(cp, cfg.code_predictor_config, hidden,
                                    c0e, key, SamplingParams(do_sample=False))
    np.testing.assert_array_equal(cr[0], np.asarray(greedy)[0])
    assert (cr >= 0).all() and (cr < 64).all()


def test_fused_kernel_sampling_knobs_are_data():
    """Temperature/top_k enter the kernel as arrays: two different sampling
    configs must reuse ONE compiled program (no recompile per knob change —
    remote TPU compiles cost minutes)."""
    import jax

    from qwen3_tts_tpu.ops.pallas.subtalker import subtalker_frame_fused
    from qwen3_tts_tpu.ops.sampling import SamplingParams

    import jax.numpy as jnp

    cfg, cp, hidden, c0e = _tiny_cp()

    def run_rows(rows, key):
        return subtalker_frame_fused(cp, cfg.code_predictor_config, hidden,
                                     c0e, key, None, rows=rows,
                                     interpret=True)

    jitted = jax.jit(run_rows)
    r1 = jnp.asarray(np.stack([SamplingParams(
        do_sample=True, temperature=0.9, top_k=8).as_row()] * 4))
    r2 = jnp.asarray(np.stack([SamplingParams(
        do_sample=True, temperature=1.7, top_k=32).as_row()] * 4))
    k = jax.random.PRNGKey(0)
    jitted(r1, k)
    n1 = jitted._cache_size()
    jitted(r2, k)
    assert jitted._cache_size() == n1, "sampling knobs caused a recompile"
