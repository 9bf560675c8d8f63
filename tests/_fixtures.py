"""Shared fabrication of tiny reference-format checkpoints for tests."""

import json
import os


def make_tiny_checkpoint(root, model_type: str = "custom_voice") -> str:
    """Build a full checkpoint dir (talker + speaker encoder + 12Hz speech
    tokenizer) with tiny random reference weights. `root` is a pathlib dir."""
    from safetensors.torch import save_file

    from tests.test_codec12_decoder import TINY as DEC_TINY, _make_reference_decoder
    from tests.test_codec12_encoder import TINY as ENC_TINY, _make_reference_encoder
    from tests.test_pipeline_parity import MODEL_TINY, _make_reference_model

    root = str(root)
    os.makedirs(root, exist_ok=True)
    _, rcfg, model = _make_reference_model(model_type=model_type)
    save_file({k: v.contiguous() for k, v in model.state_dict().items()},
              os.path.join(root, "model.safetensors"))

    cfg_json = dict(MODEL_TINY)
    cfg_json["model_type"] = "qwen3_tts"
    cfg_json["tts_model_type"] = model_type
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump(cfg_json, f)
    with open(os.path.join(root, "generation_config.json"), "w") as f:
        json.dump({"do_sample": False, "subtalker_dosample": False,
                   "max_new_tokens": 6}, f)

    tok_dir = os.path.join(root, "speech_tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    _, enc_model = _make_reference_encoder()
    _, _, dec_model = _make_reference_decoder()
    tok_sd = {f"encoder.{k}": v.contiguous()
              for k, v in enc_model.state_dict().items()}
    tok_sd.update({f"decoder.{k}": v.contiguous()
                   for k, v in dec_model.state_dict().items()})
    save_file(tok_sd, os.path.join(tok_dir, "model.safetensors"))
    with open(os.path.join(tok_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "qwen3_tts_tokenizer_12hz",
            "encoder_config": dict(ENC_TINY),
            "decoder_config": {k: list(v) if isinstance(v, tuple) else v
                               for k, v in DEC_TINY.items()},
            "encoder_valid_num_quantizers": DEC_TINY["num_quantizers"],
            "input_sample_rate": ENC_TINY["sampling_rate"],
            "output_sample_rate": 1000,
            "decode_upsample_rate": 64,
            "encode_downsample_rate": 16,
        }, f)
    return root
