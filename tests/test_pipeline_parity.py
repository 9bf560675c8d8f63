"""End-to-end greedy parity: prompt assembly + generation vs the reference
Qwen3TTSForConditionalGeneration.generate across all three task modes
(custom voice, voice design instruct, ICL voice clone)."""

import numpy as np
import pytest

from tests._reference import reference_available
from tests.test_talker import TALKER_TINY, EOS, VOCAB

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

SPK_ID = 1040
MODEL_TINY = dict(
    talker_config=dict(
        **{k: v for k, v in TALKER_TINY.items()},
        spk_id={"vivian": SPK_ID},
        spk_is_dialect={"vivian": False},
        codec_language_id={"english": 1041, "chinese": 1042},
    ),
    speaker_encoder_config=dict(mel_dim=16, enc_dim=64,
                                enc_channels=[16, 16, 16, 16, 48],
                                enc_kernel_sizes=[5, 3, 3, 3, 1],
                                enc_dilations=[1, 2, 3, 4, 1],
                                enc_attention_channels=8,
                                enc_res2net_scale=4, enc_se_channels=8),
    tts_model_type="custom_voice",
    tts_model_size="0b6",
    im_start_token_id=45,
    im_end_token_id=46,
    tts_pad_token_id=41,
    tts_bos_token_id=42,
    tts_eos_token_id=43,
)


def _make_reference_model(seed=0, model_type="custom_voice"):
    import torch

    from tests._reference import load_talker

    ref = load_talker()
    from ref_models.configuration_qwen3_tts import Qwen3TTSConfig

    d = dict(MODEL_TINY)
    d["tts_model_type"] = model_type
    cfg = Qwen3TTSConfig(**d)
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = ref.Qwen3TTSForConditionalGeneration(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.06, generator=gen))
    model.eval()
    return ref, cfg, model


def _to_jax(model):
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import TTSModelConfig
    from qwen3_tts_tpu.models.talker import prepare_talker_params
    from qwen3_tts_tpu.weights import from_torch_state_dict

    tree = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    d = dict(MODEL_TINY)
    cfg = TTSModelConfig.from_dict(d)
    params = prepare_talker_params(tree["talker"], cfg.talker_config)
    return params, cfg


def _gen_cfg(M):
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig

    return GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=False),
    )


def _ref_generate(model, input_ids, M, **kw):
    import torch

    with torch.no_grad():
        codes, hiddens = model.generate(
            input_ids=[torch.from_numpy(i).reshape(1, -1) for i in input_ids],
            languages=kw.pop("languages", ["auto"] * len(input_ids)),
            max_new_tokens=M,
            do_sample=False,
            subtalker_dosample=False,
            repetition_penalty=1.05,
            **kw,
        )
    return [c.numpy() for c in codes]


def _our_generate(params, cfg, specs, M, seed=0):
    import jax

    from qwen3_tts_tpu.runtime.generate import generate_frames
    from qwen3_tts_tpu.runtime.prompts import batch_prompts, build_prompt

    prompts = [build_prompt(params, cfg.talker_config, cfg, s) for s in specs]
    embeds, mask, trailing, pad = batch_prompts(prompts)
    out = generate_frames(params, cfg.talker_config, _gen_cfg(M), embeds, mask,
                          trailing, pad, jax.random.PRNGKey(seed))
    codes = np.asarray(out.codes)
    lens = np.asarray(out.lengths)
    return [codes[b, :lens[b]] for b in range(len(specs))]


def _fake_tokens(rng, n):
    return rng.integers(1, 40, size=(n,)).astype(np.int64)


@requires_reference
def test_custom_voice_streaming_parity():
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    ref, rcfg, model = _make_reference_model()
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(0)
    ids = [_fake_tokens(rng, 12), _fake_tokens(rng, 10)]
    M = 6

    want = _ref_generate(model, ids, M, speakers=["vivian", "vivian"],
                         non_streaming_mode=False)

    spk = params["codec_embedding"][SPK_ID]
    specs = [PromptSpec(input_id=i, speaker_embed=spk, non_streaming=False)
             for i in ids]
    got = _our_generate(params, cfg, specs, M)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@requires_reference
def test_custom_voice_non_streaming_with_language_parity():
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    ref, rcfg, model = _make_reference_model()
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(1)
    ids = [_fake_tokens(rng, 11)]
    M = 5

    want = _ref_generate(model, ids, M, speakers=["vivian"],
                         languages=["english"], non_streaming_mode=True)
    spk = params["codec_embedding"][SPK_ID]
    specs = [PromptSpec(input_id=ids[0], speaker_embed=spk, language_id=1041,
                        non_streaming=True)]
    got = _our_generate(params, cfg, specs, M)
    np.testing.assert_array_equal(got[0], want[0])


@requires_reference
def test_voice_design_instruct_parity():
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    ref, rcfg, model = _make_reference_model(model_type="voice_design")
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(2)
    ids = [_fake_tokens(rng, 12)]
    instruct = _fake_tokens(rng, 7)
    M = 5

    import torch
    want = _ref_generate(model, ids, M,
                         instruct_ids=[torch.from_numpy(instruct).reshape(1, -1)],
                         speakers=[""], non_streaming_mode=True)
    specs = [PromptSpec(input_id=ids[0], instruct_id=instruct,
                        non_streaming=True)]
    got = _our_generate(params, cfg, specs, M)
    np.testing.assert_array_equal(got[0], want[0])


@requires_reference
@pytest.mark.parametrize("non_streaming", [False, True])
def test_voice_clone_icl_parity(non_streaming):
    """ICL voice clone, both streaming (reference 2015-2019) and
    non-streaming (2002-2013) prompt layouts."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    import torch

    ref, rcfg, model = _make_reference_model(model_type="base")
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(3)
    ids = [_fake_tokens(rng, 12)]
    ref_id = _fake_tokens(rng, 9)
    Q = cfg.talker_config.num_code_groups
    ref_code = rng.integers(0, 60, size=(4, Q)).astype(np.int64)
    spk_embed = rng.normal(0, 0.1, size=(64,)).astype(np.float32)
    M = 5

    vcp = dict(ref_code=[torch.from_numpy(ref_code)],
               ref_spk_embedding=[torch.from_numpy(spk_embed)],
               x_vector_only_mode=[False], icl_mode=[True])
    want = _ref_generate(model, ids, M,
                         ref_ids=[torch.from_numpy(ref_id).reshape(1, -1)],
                         voice_clone_prompt=vcp,
                         non_streaming_mode=non_streaming)

    specs = [PromptSpec(input_id=ids[0], speaker_embed=spk_embed,
                        ref_id=ref_id, ref_code=ref_code,
                        non_streaming=non_streaming)]
    got = _our_generate(params, cfg, specs, M)
    np.testing.assert_array_equal(got[0], want[0])


@requires_reference
@pytest.mark.parametrize("non_streaming", [False, True])
def test_voice_clone_x_vector_only_parity(non_streaming):
    """x_vector_only clone: speaker embedding in the spk slot, no ICL block
    (reference qwen3_tts_model.py:478-520 -> modeling 2103-2106: icl_mode
    False skips generate_icl_prompt, ref_code entry is None)."""
    from qwen3_tts_tpu.runtime.prompts import PromptSpec

    import torch

    ref, rcfg, model = _make_reference_model(model_type="base")
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(4)
    ids = [_fake_tokens(rng, 12), _fake_tokens(rng, 8)]
    spk = [rng.normal(0, 0.1, size=(64,)).astype(np.float32)
           for _ in ids]
    M = 5

    vcp = dict(ref_code=[None, None],
               ref_spk_embedding=[torch.from_numpy(s) for s in spk],
               x_vector_only_mode=[True, True], icl_mode=[False, False])
    want = _ref_generate(model, ids, M, voice_clone_prompt=vcp,
                         non_streaming_mode=non_streaming)

    specs = [PromptSpec(input_id=i, speaker_embed=s,
                        non_streaming=non_streaming)
             for i, s in zip(ids, spk)]
    got = _our_generate(params, cfg, specs, M)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@requires_reference
def test_instruct_prefill_embedding_parity():
    """The assembled prefill EMBEDDINGS with an instruct block must match the
    reference's talker inputs_embeds position-for-position.  (Greedy-code
    parity cannot catch prompt-prefix bugs on tiny random weights: the
    init-scale model's outputs are dominated by the final prefill token, and
    the reference itself produces identical codes with and without instruct
    — regression: the instruct embeds were built but dropped from the
    concatenation in build_prompt.)"""
    import torch

    from qwen3_tts_tpu.runtime.prompts import PromptSpec, build_prompt

    ref, rcfg, model = _make_reference_model(model_type="voice_design")
    params, cfg = _to_jax(model)
    rng = np.random.default_rng(5)
    ids = _fake_tokens(rng, 12)
    instruct = _fake_tokens(rng, 7)

    captured = {}
    orig = model.talker.generate

    def spy(*a, **k):
        captured["embeds"] = k["inputs_embeds"].detach().clone()
        return orig(*a, **k)

    model.talker.generate = spy
    with torch.no_grad():
        model.generate(
            input_ids=[torch.from_numpy(ids).reshape(1, -1)],
            instruct_ids=[torch.from_numpy(instruct).reshape(1, -1)],
            languages=["auto"], speakers=[""], non_streaming_mode=True,
            max_new_tokens=2, do_sample=False, subtalker_dosample=False)
    model.talker.generate = orig
    want = captured["embeds"].float().numpy()[0]

    spec = PromptSpec(input_id=ids, instruct_id=instruct, non_streaming=True)
    got = np.asarray(
        build_prompt(params, cfg.talker_config, cfg, spec)[0],
        np.float32)[0]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
