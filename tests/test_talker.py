"""Greedy-decode equivalence: TPU talker generation loop vs reference
Qwen3TTSTalkerForConditionalGeneration.generate on a tiny random-weight config
(SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

VOCAB = 1056  # > 1024 so the suppress range [V-1024, V) is sane
EOS = 1050

TALKER_TINY = dict(
    vocab_size=VOCAB,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                  "interleaved": False},
    num_code_groups=4,
    text_hidden_size=48,
    text_vocab_size=50,
    codec_eos_token_id=EOS,
    codec_pad_id=1044,
    codec_bos_id=1045,
    codec_think_id=1046,
    codec_nothink_id=1047,
    codec_think_bos_id=1048,
    codec_think_eos_id=1049,
    code_predictor_config=dict(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        num_code_groups=4,
    ),
)


def _make_reference_talker(seed=0):
    import torch

    from tests._reference import load_talker

    ref = load_talker()
    from ref_models.configuration_qwen3_tts import Qwen3TTSTalkerConfig

    cfg = Qwen3TTSTalkerConfig(**TALKER_TINY)
    cfg._attn_implementation = "eager"
    cfg.code_predictor_config._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = ref.Qwen3TTSTalkerForConditionalGeneration(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.06, generator=gen))
    model.eval()
    return ref, cfg, model


def _to_jax(model):
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models.talker import prepare_talker_params
    from qwen3_tts_tpu.weights import from_torch_state_dict

    tree = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    cfg = TalkerConfig.from_dict(TALKER_TINY)
    params = prepare_talker_params(tree, cfg)
    return params, cfg


def _random_inputs(seed, B=2, T=6, Tt=3, H=64):
    rng = np.random.default_rng(seed)
    embeds = rng.normal(0, 0.3, size=(B, T, H)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.int64)
    mask[1, :2] = 0
    embeds[1, :2] = 0.0
    trailing = rng.normal(0, 0.3, size=(B, Tt, H)).astype(np.float32)
    pad = rng.normal(0, 0.3, size=(1, 1, H)).astype(np.float32)
    return embeds, mask, trailing, pad


@requires_reference
def test_prefill_logits_parity():
    import torch

    from qwen3_tts_tpu.models.talker import KVCache, StackDims, talker_prefill

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    embeds, mask, trailing, pad = _random_inputs(0)

    with torch.no_grad():
        out = model(inputs_embeds=torch.from_numpy(embeds),
                    attention_mask=torch.from_numpy(mask),
                    use_cache=True)
        want = out.logits.numpy()

    dims = StackDims.from_talker(cfg)
    cache = KVCache.zeros(cfg.num_hidden_layers, 2, 16, dims.kv_heads,
                          dims.head_dim, dtype=np.float32)
    logits, last_hidden, cache = talker_prefill(params, cfg, embeds, mask, cache)
    np.testing.assert_allclose(np.asarray(logits), want[:, -1], rtol=2e-4, atol=2e-4)


@requires_reference
def test_greedy_generation_equivalence():
    import torch

    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)

    ref, rcfg, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    embeds, mask, trailing, pad = _random_inputs(1)
    M = 6

    suppress = [i for i in range(VOCAB - 1024, VOCAB) if i != EOS]
    with torch.no_grad():
        result = model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            trailing_text_hidden=torch.from_numpy(trailing),
            tts_pad_embed=torch.from_numpy(pad),
            max_new_tokens=M,
            min_new_tokens=2,
            do_sample=False,
            top_k=50, top_p=1.0, temperature=0.9,
            subtalker_dosample=False,
            subtalker_top_k=50, subtalker_top_p=1.0, subtalker_temperature=0.9,
            eos_token_id=EOS,
            repetition_penalty=1.05,
            suppress_tokens=suppress,
            output_hidden_states=True,
            return_dict_in_generate=True,
        )
    # reference code collection (modeling_qwen3_tts.py:2280-2291)
    talker_codes = torch.stack(
        [hid[-1] for hid in result.hidden_states if hid[-1] is not None], dim=1)
    first = talker_codes[:, :, 0]
    is_stop = first == EOS
    stop_idx = torch.argmax(is_stop.int(), dim=1)
    has_stop = is_stop.any(dim=1)
    eff = torch.where(has_stop, stop_idx, torch.tensor(talker_codes.shape[1]))
    want_codes = talker_codes.numpy()
    want_lens = eff.numpy()

    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
    )
    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(0))
    got_codes = np.asarray(out.codes)
    got_lens = np.asarray(out.lengths)

    assert got_codes.shape[1] == want_codes.shape[1] == M - 1
    np.testing.assert_array_equal(got_lens, want_lens)
    for b in range(2):
        n = want_lens[b]
        np.testing.assert_array_equal(got_codes[b, :n], want_codes[b, :n])


def test_sampling_warpers_match_hf():
    """top-k/top-p filtering matches HF logits warpers on random logits."""
    import torch
    from transformers.generation.logits_process import (TopKLogitsWarper,
                                                        TopPLogitsWarper)

    from qwen3_tts_tpu.ops.sampling import NEG_INF, apply_top_k, apply_top_p

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, size=(3, 40)).astype(np.float32)
    tl = torch.from_numpy(logits)

    want = TopKLogitsWarper(5)(None, tl.clone()).numpy()
    got = np.asarray(apply_top_k(logits, 5))
    np.testing.assert_array_equal(np.isinf(want), got <= NEG_INF / 2)

    want = TopPLogitsWarper(0.7)(None, tl.clone()).numpy()
    got = np.asarray(apply_top_p(logits, 0.7))
    np.testing.assert_array_equal(np.isinf(want), got <= NEG_INF / 2)


def test_sample_topk_fast_path_distribution():
    """The top-k subset sampler (sampling.py fast path) draws from exactly
    the masked-softmax distribution of the slow warper path."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import (SamplingParams, apply_top_k,
                                            apply_top_p, process_and_sample)

    rng = np.random.default_rng(1)
    V, k, p, temp = 64, 8, 0.8, 0.9
    logits = jnp.asarray(rng.normal(0, 2, size=(1, V)).astype(np.float32))
    params = SamplingParams(do_sample=True, top_k=k, top_p=p,
                            temperature=temp, repetition_penalty=1.0)

    # exact target distribution via the slow warpers
    masked = apply_top_p(apply_top_k(logits / temp, k), p)
    want = np.asarray(jax.nn.softmax(masked, axis=-1))[0]

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    draws = jax.jit(jax.vmap(lambda key: process_and_sample(
        logits, key, params)))(keys)
    freq = np.bincount(np.asarray(draws).ravel(), minlength=V) / n

    assert freq[want == 0].sum() == 0.0  # never samples a filtered token
    np.testing.assert_allclose(freq, want, atol=0.015)


@requires_reference
def test_sliding_window_talker_parity():
    """use_sliding_window=True talker (optional config path, reference
    modeling_qwen3_tts.py:1510-1518)."""
    import torch

    import jax

    from qwen3_tts_tpu.config import TalkerConfig
    from qwen3_tts_tpu.models.talker import prepare_talker_params
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames)
    from qwen3_tts_tpu.weights import from_torch_state_dict
    from tests._reference import load_talker

    ref = load_talker()
    from ref_models.configuration_qwen3_tts import Qwen3TTSTalkerConfig

    cfg_kwargs = dict(TALKER_TINY)
    cfg_kwargs.update(use_sliding_window=True, sliding_window=4)
    rcfg = Qwen3TTSTalkerConfig(**cfg_kwargs)
    rcfg._attn_implementation = "eager"
    rcfg.code_predictor_config._attn_implementation = "eager"
    torch.manual_seed(0)
    model = ref.Qwen3TTSTalkerForConditionalGeneration(rcfg)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.06, generator=gen))
    model.eval()

    tree = from_torch_state_dict(model.state_dict())
    cfg = TalkerConfig.from_dict(cfg_kwargs)
    assert cfg.sliding_window == 4
    params = prepare_talker_params(tree, cfg)

    embeds, mask, trailing, pad = _random_inputs(9, T=8)
    M = 6
    suppress = [i for i in range(VOCAB - 1024, VOCAB) if i != EOS]
    with torch.no_grad():
        result = model.generate(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
            trailing_text_hidden=torch.from_numpy(trailing),
            tts_pad_embed=torch.from_numpy(pad),
            max_new_tokens=M, min_new_tokens=2, do_sample=False,
            subtalker_dosample=False, eos_token_id=EOS,
            repetition_penalty=1.05, suppress_tokens=suppress,
            output_hidden_states=True, return_dict_in_generate=True)
    talker_codes = torch.stack(
        [hid[-1] for hid in result.hidden_states if hid[-1] is not None], dim=1)
    want = talker_codes.numpy()

    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False))
    out = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                          jax.random.PRNGKey(0))
    got = np.asarray(out.codes)
    lens = np.asarray(out.lengths)
    for b in range(2):
        np.testing.assert_array_equal(got[b, :lens[b]], want[b, :lens[b]])


@requires_reference
def test_chunked_generation_matches_while_loop():
    """generate_frames_chunked (the >1024-frame API path) must reproduce the
    fused while_loop generation exactly, including odd chunk sizes that don't
    divide max_new_tokens and per-sample EOS inside a chunk."""
    import jax

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                                generate_frames,
                                                generate_frames_chunked)

    _, _, model = _make_reference_talker()
    params, cfg = _to_jax(model)
    gen_cfg = GenerationConfig(
        max_new_tokens=9,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False))
    embeds, mask, trailing, pad = _random_inputs(77)

    want = generate_frames(params, cfg, gen_cfg, embeds, mask, trailing, pad,
                           jax.random.PRNGKey(0))
    want_codes, want_lens = np.asarray(want.codes), np.asarray(want.lengths)

    for chunk in (3, 8, 64):
        got = generate_frames_chunked(params, cfg, gen_cfg, embeds, mask,
                                      trailing, pad, jax.random.PRNGKey(0),
                                      chunk=chunk, attend_bucket=4)
        np.testing.assert_array_equal(np.asarray(got.lengths), want_lens,
                                      err_msg=f"chunk={chunk}")
        np.testing.assert_array_equal(np.asarray(got.codes), want_codes,
                                      err_msg=f"chunk={chunk}")


def test_sample_top_p_zero_degrades_to_argmax():
    """top_p<=0 keeps the single most probable token (HF
    min_tokens_to_keep=1), on both the top-k fast path and the full-row
    path — previously every candidate was masked and sampling went
    uniform."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams, process_and_sample

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(0, 2, size=(3, 32)).astype(np.float32))
    want = np.asarray(jnp.argmax(logits, axis=-1))
    for k in (5, 0):   # fast path (0<k<V) and full-row path
        params = SamplingParams(do_sample=True, top_k=k, top_p=0.0,
                                temperature=0.9, repetition_penalty=1.0)
        for seed in range(5):
            got = np.asarray(process_and_sample(
                logits, jax.random.PRNGKey(seed), params))
            np.testing.assert_array_equal(got, want)


def test_generate_sampling_knobs_share_compiled_program():
    """temperature / top_p / repetition_penalty changes must NOT recompile
    the generation program (the jit sees gen_cfg.canonical(); the values
    ride as data) — remote TPU compiles cost minutes per program.  do_sample
    and top_k are structural (program shape) and may recompile."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime import generate as G

    from tests.test_pallas_talker_step import _tiny_talker

    cfg, params = _tiny_talker()
    B, L = 2, 8
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(0, 0.3, (B, L, cfg.hidden_size)),
                         jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = jnp.asarray(rng.normal(0, 0.3, (B, 3, cfg.hidden_size)),
                           jnp.bfloat16)
    pad = jnp.zeros((1, 1, cfg.hidden_size), jnp.bfloat16)

    def run(gen_cfg):
        out = G.generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                                pad, jax.random.PRNGKey(0))
        return np.asarray(out.codes)

    base = G.GenerationConfig(
        max_new_tokens=5,
        sampling=SamplingParams(do_sample=True, temperature=0.9, top_k=16,
                                top_p=0.95, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, temperature=0.9, top_k=8))
    run(base)  # compile once
    import jax._src.test_util as jtu

    swept = [
        dataclasses.replace(base, sampling=dataclasses.replace(
            base.sampling, temperature=2.0)),
        dataclasses.replace(base, sampling=dataclasses.replace(
            base.sampling, top_p=0.7, repetition_penalty=1.3)),
        dataclasses.replace(base, subtalker=dataclasses.replace(
            base.subtalker, temperature=1.7)),
    ]
    with jtu.count_pjit_cpp_cache_miss() as count:
        for g in swept:
            run(g)
    assert count() == 0, (
        f"sampling knob sweep caused {count()} recompiles/cache misses")
