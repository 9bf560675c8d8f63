"""Finetuning: collate layout parity vs reference TTSDataset.collate_fn and
an end-to-end SFT smoke (train steps + checkpoint save + reload)."""

import json
import os

import numpy as np
import pytest

from tests._reference import reference_available
from tests.test_pipeline_parity import MODEL_TINY

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def _synthetic_items(rng, n, q=16):
    items = []
    for _ in range(n):
        tl = int(rng.integers(9, 14))
        cl = int(rng.integers(3, 7))
        items.append({
            "text_ids": rng.integers(1, 40, size=(1, tl)),
            "audio_codes": rng.integers(0, 60, size=(cl, q)),
            "ref_mel": rng.normal(0, 1, size=(1, 12, 16)).astype(np.float32),
        })
    return items


@requires_reference
def test_collate_layout_parity():
    import torch

    from tests._reference import load_finetune_dataset

    ref_mod_pre = load_finetune_dataset()  # also loads ref_models modules
    from ref_models.configuration_qwen3_tts import Qwen3TTSConfig

    from qwen3_tts_tpu.config import TTSModelConfig
    from qwen3_tts_tpu.finetune.data import TTSDataset

    ref_mod = ref_mod_pre
    d = dict(MODEL_TINY)
    ref_cfg = Qwen3TTSConfig(**d)
    our_cfg = TTSModelConfig.from_dict(d)

    rng = np.random.default_rng(0)
    items = _synthetic_items(rng, 3)

    ref_ds = ref_mod.TTSDataset([], None, ref_cfg)
    ref_batch = ref_ds.collate_fn([
        {"text_ids": torch.from_numpy(it["text_ids"]),
         "audio_codes": torch.from_numpy(it["audio_codes"]),
         "ref_mel": torch.from_numpy(it["ref_mel"])}
        for it in items])

    ours = TTSDataset([], lambda t: np.zeros(9, np.int64), our_cfg,
                      num_code_groups=16)
    our_batch = ours.collate(items)

    for key in ("input_ids", "attention_mask", "codec_0_labels", "codec_ids"):
        np.testing.assert_array_equal(np.asarray(our_batch[key]),
                                      ref_batch[key].numpy(), err_msg=key)
    for key in ("text_embedding_mask", "codec_embedding_mask", "codec_mask"):
        np.testing.assert_array_equal(
            np.asarray(our_batch[key]).astype(bool),
            ref_batch[key].numpy().astype(bool), err_msg=key)


@requires_reference
def test_sft_train_steps_and_loss(tmp_path):
    """Two jitted train steps on the tiny talker: loss finite and decreasing
    on a repeated batch."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import TTSModelConfig
    from qwen3_tts_tpu.finetune.train import default_optimizer, make_train_step
    from qwen3_tts_tpu.models.talker import prepare_talker_params
    from qwen3_tts_tpu.weights import from_torch_state_dict
    from tests.test_pipeline_parity import _make_reference_model

    _, rcfg, model = _make_reference_model()
    tree = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    cfg = TTSModelConfig.from_dict(dict(MODEL_TINY))
    tc = cfg.talker_config
    params = prepare_talker_params(tree["talker"], tc)

    rng = np.random.default_rng(0)
    B, T, Q = 2, 24, tc.num_code_groups
    batch = {
        "input_ids": rng.integers(1, 40, size=(B, T, 2)),
        "codec_ids": rng.integers(0, 60, size=(B, T, Q)),
        "text_embedding_mask": np.ones((B, T, 1), np.float32),
        "codec_embedding_mask": np.ones((B, T, 1), np.float32),
        "attention_mask": np.ones((B, T), np.int64),
        "codec_0_labels": np.where(np.arange(T)[None, :] >= 8,
                                   rng.integers(0, 60, size=(B, T)), -100),
        "codec_mask": np.arange(T)[None, :].repeat(B, 0) >= 8,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    spk = jnp.zeros((B, tc.hidden_size), jnp.float32)

    opt = default_optimizer(lr=1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(tc, opt))

    params, opt_state, m1 = step(params, opt_state, batch, spk)
    params, opt_state, m2 = step(params, opt_state, batch, spk)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1


@requires_reference
def test_state_dict_roundtrip():
    """prepare_talker_params -> talker_params_to_state_dict is lossless."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.config import TTSModelConfig
    from qwen3_tts_tpu.models.talker import prepare_talker_params
    from qwen3_tts_tpu.weights import (from_torch_state_dict,
                                       talker_params_to_state_dict)
    from tests.test_pipeline_parity import _make_reference_model

    _, rcfg, model = _make_reference_model()
    cfg = TTSModelConfig.from_dict(dict(MODEL_TINY))
    tree = from_torch_state_dict(model.state_dict(), dtype=jnp.float32)
    params = prepare_talker_params(tree["talker"], cfg.talker_config)
    sd = talker_params_to_state_dict(params, cfg.talker_config)

    want = {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()
            if k.startswith("talker.")}
    assert set(sd.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k], err_msg=k)


@requires_reference
def test_sft_checkpoint_rewrite_and_reload(tmp_path):
    """The per-epoch save path: rewrite config to custom_voice with the new
    speaker at row 3000, bake the speaker embedding, reload via the public
    API and synthesize with the learned speaker."""
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.weights import save_safetensors, talker_params_to_state_dict
    from tests.test_inference_api import FakeTokenizer, tiny_checkpoint  # noqa: F401

    # build the base checkpoint via the shared fixture machinery
    import json
    import shutil

    base = tmp_path / "base"
    # reuse fixture logic manually (fixture is module-scoped elsewhere)
    from safetensors.torch import save_file
    from tests.test_pipeline_parity import MODEL_TINY, _make_reference_model
    from tests.test_codec12_decoder import _make_reference_decoder
    from tests.test_codec12_encoder import _make_reference_encoder
    import torch, os

    _, rcfg, model_t = _make_reference_model(model_type="custom_voice")
    base.mkdir()
    save_file({k: v.contiguous() for k, v in model_t.state_dict().items()},
              str(base / "model.safetensors"))
    cfg_json = dict(MODEL_TINY); cfg_json["model_type"] = "qwen3_tts"
    json.dump(cfg_json, open(base / "config.json", "w"))
    json.dump({"do_sample": False, "subtalker_dosample": False,
               "max_new_tokens": 5}, open(base / "generation_config.json", "w"))
    tok_dir = base / "speech_tokenizer"; os.makedirs(tok_dir)
    _, enc_model = _make_reference_encoder()
    _, _, dec_model = _make_reference_decoder()
    tok_sd = {f"encoder.{k}": v.contiguous() for k, v in enc_model.state_dict().items()}
    tok_sd.update({f"decoder.{k}": v.contiguous() for k, v in dec_model.state_dict().items()})
    save_file(tok_sd, str(tok_dir / "model.safetensors"))
    from tests.test_codec12_decoder import TINY as DEC_TINY
    from tests.test_codec12_encoder import TINY as ENC_TINY
    json.dump({"model_type": "qwen3_tts_tokenizer_12hz",
               "encoder_config": dict(ENC_TINY),
               "decoder_config": {k: list(v) if isinstance(v, tuple) else v
                                  for k, v in DEC_TINY.items()},
               "encoder_valid_num_quantizers": DEC_TINY["num_quantizers"],
               "input_sample_rate": ENC_TINY["sampling_rate"],
               "output_sample_rate": 1000, "decode_upsample_rate": 64,
               "encode_downsample_rate": 16},
              open(tok_dir / "config.json", "w"))

    model = Qwen3TTSModel.from_pretrained(str(base), dtype=jnp.float32)

    # ---- emulate finetune/sft.py per-epoch save (reference sft_12hz.py:126-158)
    out_dir = tmp_path / "epoch0"
    shutil.copytree(base, out_dir)
    cfg_dict = json.load(open(base / "config.json"))
    cfg_dict["tts_model_type"] = "custom_voice"
    cfg_dict["talker_config"]["spk_id"] = {"newspeaker": 1030}
    cfg_dict["talker_config"]["spk_is_dialect"] = {"newspeaker": False}
    json.dump(cfg_dict, open(out_dir / "config.json", "w"))

    sd = talker_params_to_state_dict(model.talker_params, model.config.talker_config)
    spk_vec = np.full((MODEL_TINY["talker_config"]["hidden_size"],), 0.05,
                      np.float32)
    emb = sd["talker.model.codec_embedding.weight"].copy()
    emb[1030] = spk_vec
    sd["talker.model.codec_embedding.weight"] = emb
    save_safetensors(str(out_dir / "model.safetensors"),
                     {k: np.asarray(v, np.float32) for k, v in sd.items()})

    tuned = Qwen3TTSModel.from_pretrained(str(out_dir), dtype=jnp.float32)
    tuned.processor = FakeTokenizer()
    assert tuned.get_supported_speakers() == ["newspeaker"]
    np.testing.assert_allclose(
        np.asarray(tuned.talker_params["codec_embedding"][1030]), spk_vec)
    wavs, sr = tuned.generate_custom_voice(text="hi there friend",
                                           speaker="newspeaker", seed=0)
    assert np.isfinite(wavs[0]).all()


@requires_reference
def test_prepare_data_jsonl(tmp_path):
    """prepare_data: wav files -> JSONL rows with audio_codes."""
    import json as _json

    from qwen3_tts_tpu import Qwen3TTSTokenizer
    from qwen3_tts_tpu.finetune.data import prepare_data
    from qwen3_tts_tpu.utils.audio import write_wav

    from tests._fixtures import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    tok = Qwen3TTSTokenizer.from_pretrained(os.path.join(ckpt, "speech_tokenizer"))

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        wav = rng.uniform(-0.5, 0.5, size=(300 + 40 * i,)).astype(np.float32)
        path = str(tmp_path / f"a{i}.wav")
        write_wav(path, wav, tok.get_input_sample_rate())
        rows.append({"audio": path, "text": f"sample {i}",
                     "ref_audio": path})
    src = tmp_path / "in.jsonl"
    with open(src, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    out = tmp_path / "out.jsonl"
    n = prepare_data(str(src), str(out), tok, batch_size=2)
    assert n == 3
    got = [_json.loads(l) for l in open(out)]
    for r in got:
        codes = np.asarray(r["audio_codes"])
        assert codes.ndim == 2 and codes.shape[1] == 4
        assert codes.shape[0] >= 1


@requires_reference
def test_sft_driver_end_to_end(tmp_path):
    """Run the actual finetune driver for one epoch on a tiny checkpoint:
    trains, saves a reloadable custom_voice checkpoint with the new speaker."""
    import json as _json

    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.finetune import sft
    from qwen3_tts_tpu.utils.audio import write_wav
    from tests.test_inference_api import FakeTokenizer

    # base-type checkpoint (has the speaker encoder the SFT loop needs)
    from tests._fixtures import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(tmp_path / "base_ckpt", model_type="base")

    # training data: tiny synthetic wavs (dataset resamples ref audio to 24k)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        wav = rng.uniform(-0.4, 0.4, size=(2000,)).astype(np.float32)
        path = str(tmp_path / f"train{i}.wav")
        write_wav(path, wav, 24000)
        rows.append({"audio": path, "text": f"training sample {i}",
                     "ref_audio": path,
                     "audio_codes": rng.integers(0, 60, size=(4, 4)).tolist()})
    jsonl = tmp_path / "train.jsonl"
    with open(jsonl, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")

    out_dir = tmp_path / "sft_out"
    sft.main([
        "--init_model_path", ckpt,
        "--train_jsonl", str(jsonl),
        "--output_model_path", str(out_dir),
        "--batch_size", "2", "--num_epochs", "1", "--grad_accum", "1",
        "--speaker_name", "tuned", "--speaker_row", "1030",
    ], processor=FakeTokenizer())

    tuned_dir = out_dir / "checkpoint-epoch-0"
    assert (tuned_dir / "model.safetensors").exists()
    tuned = Qwen3TTSModel.from_pretrained(str(tuned_dir), dtype=jnp.float32)
    tuned.processor = FakeTokenizer()
    assert tuned.get_supported_speakers() == ["tuned"]
    wavs, sr = tuned.generate_custom_voice(text="post finetune",
                                           speaker="tuned", seed=0)
    assert np.isfinite(wavs[0]).all()
