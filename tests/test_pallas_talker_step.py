"""Fused talker decode-step Pallas megakernel: parity against the
exact-math JAX reference (same W8A8 + chunked online-softmax formulas),
and behavioural closeness vs the XLA W8A16 decode step."""

import numpy as np
import pytest


def _tiny_talker(B=4, H=96, seed=0):
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.utils.testing import random_talker_params
    from qwen3_tts_tpu.weights import quantize_talker_params

    cfg = TalkerConfig(
        vocab_size=256, hidden_size=H, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, text_hidden_size=H, text_vocab_size=128,
        num_code_groups=5,
        codec_eos_token_id=250, codec_pad_id=251, codec_bos_id=252,
        codec_think_id=253, codec_nothink_id=254, codec_think_bos_id=255,
        codec_think_eos_id=249,
        code_predictor_config=CodePredictorConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_code_groups=5),
    )
    params = quantize_talker_params(
        random_talker_params(cfg, jax.random.PRNGKey(seed),
                             dtype=jnp.bfloat16))
    return cfg, params


def _decode_state(cfg, B, S_buf, ci, seed=0):
    """A mid-generation decode state: random bf16 KV history in slots < ci,
    per-row validity, one fresh embedding."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    L = cfg.num_hidden_layers
    Hkv, D = cfg.num_key_value_heads, cfg.resolved_head_dim
    k = jnp.asarray(rng.normal(0, 0.5, (L, B, S_buf, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 0.5, (L, B, S_buf, Hkv, D)), jnp.bfloat16)
    slot = np.arange(S_buf)[None, :]
    # ragged per-row starts exercise the kv_valid mask
    start = rng.integers(0, 4, size=(B, 1))
    kv_valid = jnp.asarray((slot >= start) & (slot <= ci), bool)
    embed = jnp.asarray(rng.normal(0, 0.3, (B, 1, cfg.hidden_size)),
                        jnp.bfloat16)
    position = jnp.asarray(rng.integers(ci, ci + 2, size=(B,)), jnp.int32)
    return k, v, kv_valid, embed, position


@pytest.mark.parametrize("attn_impl", ["vpu", "mxu"])
@pytest.mark.parametrize("S_buf,attend_len", [(256, 256), (512, 512),
                                              (512, 256)])
def test_kernel_matches_reference(S_buf, attend_len, attn_impl):
    """Kernel (interpret) vs the same-math JAX ref: identical chunking and
    reduction order, so logits/hidden agree tightly and the written KV slot
    is bit-identical."""
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      talker_step_ref,
                                                      transpose_cache_in,
                                                      transpose_cache_out)

    cfg, params = _tiny_talker()
    B, ci = 4, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    kf, vf = transpose_cache_in(k), transpose_cache_in(v)

    lg_k, h_k, kk, vk = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=attend_len, attn_impl=attn_impl, interpret=True)
    lg_r, h_r, kr, vr = talker_step_ref(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=attend_len, attn_impl=attn_impl)

    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_r),
                               rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_r, np.float32),
                               rtol=0.05, atol=0.02)
    # the new KV slot is the same phase-0 math in both; interpret-mode dot
    # reassociation can move bf16 values by one quantum
    np.testing.assert_allclose(
        np.asarray(transpose_cache_out(kk)[:, :, ci], np.float32),
        np.asarray(transpose_cache_out(kr)[:, :, ci], np.float32),
        rtol=0.05, atol=0.02)
    np.testing.assert_allclose(
        np.asarray(transpose_cache_out(vk)[:, :, ci], np.float32),
        np.asarray(transpose_cache_out(vr)[:, :, ci], np.float32),
        rtol=0.05, atol=0.02)
    # untouched slots stay untouched
    keep = np.arange(S_buf) != ci
    np.testing.assert_array_equal(
        np.asarray(transpose_cache_out(kk), np.float32)[:, :, keep],
        np.asarray(k, np.float32)[:, :, keep])


def test_reference_tracks_xla_decode_step():
    """W8A8 chunked-softmax ref vs the production W8A16 XLA step: same
    weights, same state — argmax codes mostly agree (quantization flips
    near-ties only)."""
    from qwen3_tts_tpu.models.talker import KVCache, talker_decode_step
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_ref,
                                                      transpose_cache_in)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 256, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)

    lg_r, h_r, _, _ = talker_step_ref(
        params, cfg, embed, position, ci, kv_valid,
        transpose_cache_in(k), transpose_cache_in(v))
    cache = KVCache(k=k, v=v)
    lg_x, h_x, _ = talker_decode_step(params, cfg, embed, position, ci,
                                      kv_valid, cache)
    agree = (np.asarray(lg_r).argmax(-1) == np.asarray(lg_x).argmax(-1)).mean()
    assert agree >= 0.75, f"W8A8 ref vs W8A16 XLA argmax agreement {agree}"
    # hidden states track closely in magnitude
    np.testing.assert_allclose(np.asarray(h_r, np.float32),
                               np.asarray(h_x, np.float32),
                               rtol=0.2, atol=0.15)


def test_generate_frames_fused_talker_step_end_to_end():
    """generate_frames with fused_talker_step=True must run (interpret mode
    on CPU) and track the XLA path closely under greedy decoding."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)

    cfg, params = _tiny_talker()
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
            fused_talker_step=fused)
        out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                              pad, jax.random.PRNGKey(1))
        outs[fused] = (np.asarray(out.codes), np.asarray(out.lengths))

    codes_x, _ = outs[False]
    codes_f, _ = outs[True]
    assert codes_f.shape == codes_x.shape
    agree = (codes_x == codes_f).mean()
    assert agree >= 0.6, f"fused vs xla generate agreement {agree}"


def test_generate_frames_fused_step_with_int8_kv():
    """fused_talker_step composes with kv_quant: the kernel reads int8 KV
    chunks with scales folded into scores/probabilities.  generate_frames
    must run the combo end-to-end (interpret mode on CPU) and track the
    bf16-KV fused path closely under greedy decoding."""
    import jax
    import jax.numpy as jnp

    import dataclasses

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)

    cfg, params = _tiny_talker()
    B, L = 2, 8
    rng = np.random.default_rng(7)
    embeds = jnp.asarray(rng.normal(0, 0.3, (B, L, cfg.hidden_size)),
                         jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = jnp.asarray(rng.normal(0, 0.3, (B, 3, cfg.hidden_size)),
                           jnp.bfloat16)
    pad = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)

    base = GenerationConfig(
        max_new_tokens=6,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
        fused_talker_step=True)
    outs = {}
    for kvq in (False, True):
        gen_cfg = dataclasses.replace(base, kv_quant=kvq)
        out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                              pad, jax.random.PRNGKey(1))
        outs[kvq] = np.asarray(out.codes)
    assert outs[True].shape == outs[False].shape
    agree = (outs[True] == outs[False]).mean()
    assert agree >= 0.6, f"int8-KV vs bf16-KV fused generate agreement {agree}"


def test_unchunkable_window_raises():
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      transpose_cache_in)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 512, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    with pytest.raises(ValueError, match="cannot chunk"):
        talker_step_fused_cache(params, cfg, embed, position, ci, kv_valid,
                                transpose_cache_in(k), transpose_cache_in(v),
                                attend_len=200, interpret=True)


def test_streaming_session_fused_step_rounds_kv_buffer():
    """StreamingSession must round its KV buffer up to the kernel's 128-slot
    chunks when fused_talker_step is on.  Regression: with T + M + 1 not a
    multiple of 128 (and > one kernel chunk), the tail attend bucket equaled
    the unrounded buffer and talker_step_fused_cache rejected it; a prefill
    of 400 tokens puts the very first chunk in that regime."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)
    from qwen3_tts_tpu.utils.testing import random_vocoder_params

    cfg, params = _tiny_talker()
    dec_cfg = CodecV2DecoderConfig(
        codebook_size=64, codebook_dim=16, hidden_size=32, latent_dim=16,
        num_attention_heads=2, num_key_value_heads=2, sliding_window=8,
        intermediate_size=48, num_hidden_layers=1,
        num_quantizers=cfg.num_code_groups, upsample_rates=(2, 2),
        upsampling_ratios=(1, 1), decoder_dim=16)
    dec_params = random_vocoder_params(dec_cfg, jax.random.PRNGKey(3))

    B, T, M = 2, 400, 5
    rng = np.random.default_rng(9)
    embeds = jnp.asarray(rng.normal(0, 0.3, (B, T, cfg.hidden_size)),
                         jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    trailing = jnp.asarray(rng.normal(0, 0.3, (B, 3, cfg.hidden_size)),
                           jnp.bfloat16)
    pad = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)
    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False),
        subtalker=SamplingParams(do_sample=False),
        fused_talker_step=True)
    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig(warmup_schedule=(2,),
                                               steady_chunk=2,
                                               vocoder_left_context=2))
    packets = list(session.run(embeds, mask, trailing, pad,
                               jax.random.PRNGKey(4)))
    assert packets, "fused streaming session produced no packets"
    for pkt in packets:
        assert np.isfinite(pkt.wav).all()


@pytest.mark.parametrize("kv_chunk,mlp_chunks", [(256, 2), (128, 4)])
def test_kernel_matches_reference_tuned_chunks(kv_chunk, mlp_chunks):
    """The (kv_chunk, mlp_chunks) tuning knobs change the chunk decomposition
    (and hence reduction order) identically in kernel and ref."""
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      talker_step_ref,
                                                      transpose_cache_in)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 256, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    kf, vf = transpose_cache_in(k), transpose_cache_in(v)

    lg_k, h_k, _, _ = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=S_buf, kv_chunk=kv_chunk, mlp_chunks=mlp_chunks,
        interpret=True)
    lg_r, h_r, _, _ = talker_step_ref(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=S_buf, kv_chunk=kv_chunk, mlp_chunks=mlp_chunks)
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_r),
                               rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_r, np.float32),
                               rtol=0.05, atol=0.02)


def test_kernel_per_row_cache_index_matches_scalar():
    """A (B,) cache_index with identical entries must produce exactly the
    same logits and cache writes as the scalar form (the serving engine
    passes per-slot indices); ragged per-row indices must scatter each row's
    fresh K/V to its own slot."""
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      transpose_cache_in,
                                                      transpose_cache_out)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 256, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    kf, vf = transpose_cache_in(k), transpose_cache_in(v)

    import jax.numpy as jnp
    lg_s, h_s, ks, vs = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=S_buf, interpret=True)
    lg_v, h_v, kv_, vv = talker_step_fused_cache(
        params, cfg, embed, position, jnp.full((B,), ci, jnp.int32),
        kv_valid, kf, vf, attend_len=S_buf, interpret=True)
    np.testing.assert_array_equal(np.asarray(lg_s), np.asarray(lg_v))
    np.testing.assert_array_equal(np.asarray(ks, np.float32),
                                  np.asarray(kv_, np.float32))

    # ragged: each row writes its own slot, other slots untouched
    idx = jnp.asarray([30, 41, 52, 63], jnp.int32)
    _, _, kr, vr = talker_step_fused_cache(
        params, cfg, embed, position, idx, kv_valid, kf, vf,
        attend_len=S_buf, interpret=True)
    kr_std = np.asarray(transpose_cache_out(kr), np.float32)
    k_std = np.asarray(k, np.float32)
    for b, s in enumerate([30, 41, 52, 63]):
        keep = np.arange(S_buf) != s
        np.testing.assert_array_equal(kr_std[:, b, keep], k_std[:, b, keep])
        assert not np.array_equal(kr_std[:, b, s], k_std[:, b, s])


def test_kernel_matches_reference_int8_kv():
    """int8-KV mode: kernel (interpret) vs the same-math ref — identical
    fold-scale order, quantized fresh-slot writes bit-equal, untouched
    slots (values AND scales) untouched."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.talker import kv_quantize
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      talker_step_ref,
                                                      transpose_cache_in)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 256, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    kf, vf = transpose_cache_in(k), transpose_cache_in(v)
    kq, ks = kv_quantize(kf)       # fused layout (L, B, Hkv, S) scales
    vq, vs = kv_quantize(vf)

    lg_k, h_k, kk, vk, ksk, vsk = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kq, vq,
        attend_len=S_buf, k_scale=ks, v_scale=vs, interpret=True)
    lg_r, h_r, kr, vr, ksr, vsr = talker_step_ref(
        params, cfg, embed, position, ci, kv_valid, kq, vq,
        attend_len=S_buf, k_scale=ks, v_scale=vs)

    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_r),
                               rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(h_k, np.float32),
                               np.asarray(h_r, np.float32),
                               rtol=0.05, atol=0.02)
    # fresh slot: quantized ints equal up to one quantum (bf16 K/V from the
    # kernel and ref can differ by one ulp before quantization)
    assert np.abs(np.asarray(kk[:, :, :, ci], np.int32)
                  - np.asarray(kr[:, :, :, ci], np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(ksk[:, :, :, ci]),
                               np.asarray(ksr[:, :, :, ci]),
                               rtol=0.02, atol=1e-6)
    # untouched slots stay untouched — values and scales
    keep = np.arange(S_buf) != ci
    np.testing.assert_array_equal(np.asarray(kk)[:, :, :, keep],
                                  np.asarray(kq)[:, :, :, keep])
    np.testing.assert_array_equal(np.asarray(ksk)[:, :, :, keep],
                                  np.asarray(ks)[:, :, :, keep])
    np.testing.assert_array_equal(np.asarray(vsk)[:, :, :, keep],
                                  np.asarray(vs)[:, :, :, keep])


def test_kernel_int8_kv_tracks_bf16_kv():
    """int8-KV fused step vs bf16-KV fused step on the same state: argmax
    codes mostly agree (per-(slot, head) int8 flips near-ties only)."""
    from qwen3_tts_tpu.models.talker import kv_quantize
    from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                      transpose_cache_in)

    cfg, params = _tiny_talker()
    B, S_buf, ci = 4, 256, 37
    k, v, kv_valid, embed, position = _decode_state(cfg, B, S_buf, ci)
    kf, vf = transpose_cache_in(k), transpose_cache_in(v)
    kq, ks = kv_quantize(kf)
    vq, vs = kv_quantize(vf)

    lg_b, h_b, _, _ = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kf, vf,
        attend_len=S_buf, interpret=True)
    lg_q, h_q, _, _, _, _ = talker_step_fused_cache(
        params, cfg, embed, position, ci, kv_valid, kq, vq,
        attend_len=S_buf, k_scale=ks, v_scale=vs, interpret=True)
    agree = (np.asarray(lg_b).argmax(-1) == np.asarray(lg_q).argmax(-1)).mean()
    assert agree >= 0.75, f"int8-KV vs bf16-KV argmax agreement {agree}"
    np.testing.assert_allclose(np.asarray(h_q, np.float32),
                               np.asarray(h_b, np.float32),
                               rtol=0.25, atol=0.2)
