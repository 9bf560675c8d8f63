"""Single-speaker SFT driver: TPU rebuild of finetuning/sft_12hz.py.

Usage:
    python -m qwen3_tts_tpu.finetune.sft --init_model_path ... \
        --train_jsonl data.jsonl --output_model_path out [--dp N --tp M]

Differences from the reference accelerate loop, by design:
- jit-compiled train step over a ("dp","tp") mesh (parallel/mesh.py) instead
  of DDP; gradient accumulation via optax.MultiSteps;
- per-epoch checkpoint save mirrors the reference exactly
  (sft_12hz.py:126-158): copy checkpoint dir, rewrite config to custom_voice
  with spk_id {name: 3000}, bake the learned speaker embedding into
  codec_embedding row 3000, drop speaker_encoder weights.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None, processor=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--init_model_path", type=str, required=True)
    parser.add_argument("--output_model_path", type=str, default="output")
    parser.add_argument("--train_jsonl", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--num_epochs", type=int, default=3)
    parser.add_argument("--speaker_name", type=str, default="speaker_test")
    parser.add_argument("--speaker_row", type=int, default=3000,
                        help="codec_embedding row that stores the learned "
                             "speaker (reference uses 3000)")
    parser.add_argument("--grad_accum", type=int, default=4)
    parser.add_argument("--dp", type=int, default=1)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import optax

    from ..inference.model import Qwen3TTSModel
    from ..models.speaker_encoder import speaker_encoder_forward
    from ..finetune.data import TTSDataset
    from ..finetune.train import default_optimizer, make_train_step
    from ..parallel.mesh import make_mesh, shard_talker_params
    from ..weights import save_safetensors, talker_params_to_state_dict

    model = Qwen3TTSModel.from_pretrained(args.init_model_path,
                                          dtype=jnp.bfloat16)
    if processor is not None:
        model.processor = processor
    cfg = model.config
    tc = cfg.talker_config

    with open(args.train_jsonl) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    dataset = TTSDataset(rows, model._tokenize, cfg,
                         num_code_groups=tc.num_code_groups)

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    params = shard_talker_params(model.talker_params, mesh)

    base_opt = default_optimizer(lr=args.lr)
    optimizer = optax.MultiSteps(base_opt, every_k_schedule=args.grad_accum)
    opt_state = optimizer.init(params)
    train_step = jax.jit(make_train_step(tc, optimizer))

    target_speaker_embedding: Optional[np.ndarray] = None
    rng = np.random.default_rng(args.seed)
    order = np.arange(len(dataset))

    for epoch in range(args.num_epochs):
        rng.shuffle(order)
        for start in range(0, len(order) - args.batch_size + 1, args.batch_size):
            idxs = order[start:start + args.batch_size]
            batch = dataset.collate([dataset[i] for i in idxs],
                                    pad_to_multiple=64)
            ref_mels = jnp.asarray(batch.pop("ref_mels"), jnp.bfloat16)
            spk = speaker_encoder_forward(
                model.speaker_encoder_params, cfg.speaker_encoder_config,
                ref_mels)
            spk = jax.lax.stop_gradient(spk)
            if target_speaker_embedding is None:
                target_speaker_embedding = np.asarray(spk)[0]
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            with mesh:
                params, opt_state, metrics = train_step(params, opt_state,
                                                        jbatch, spk)
            step = start // args.batch_size
            if step % 10 == 0:
                print(f"Epoch {epoch} | Step {step} | "
                      f"Loss: {float(metrics['loss']):.4f}")

        # ---- per-epoch checkpoint (reference sft_12hz.py:126-158) ----
        out_dir = os.path.join(args.output_model_path,
                               f"checkpoint-epoch-{epoch}")
        shutil.copytree(args.init_model_path, out_dir, dirs_exist_ok=True)
        # drop any sharded-checkpoint remnants copied from the init model:
        # load_safetensors_dir prefers the index file, which would silently
        # shadow the consolidated finetuned model.safetensors written below
        import glob
        for stale in ([os.path.join(out_dir, "model.safetensors.index.json")]
                      + glob.glob(os.path.join(out_dir,
                                               "model-*-of-*.safetensors"))):
            if os.path.exists(stale):
                os.remove(stale)
        with open(os.path.join(args.init_model_path, "config.json")) as f:
            config_dict = json.load(f)
        config_dict["tts_model_type"] = "custom_voice"
        talker_cfg = config_dict.get("talker_config", {})
        talker_cfg["spk_id"] = {args.speaker_name: args.speaker_row}
        talker_cfg["spk_is_dialect"] = {args.speaker_name: False}
        config_dict["talker_config"] = talker_cfg
        with open(os.path.join(out_dir, "config.json"), "w",
                  encoding="utf-8") as f:
            json.dump(config_dict, f, indent=2, ensure_ascii=False)

        if target_speaker_embedding is None:
            raise ValueError(
                f"no training step ran: dataset has {len(dataset)} rows, "
                f"batch_size={args.batch_size} (full batches only, matching "
                "the reference loop) — reduce batch_size or add data")
        sd = talker_params_to_state_dict(jax.device_get(params), tc)
        emb = sd["talker.model.codec_embedding.weight"].copy()
        emb[args.speaker_row] = target_speaker_embedding.astype(emb.dtype)
        sd["talker.model.codec_embedding.weight"] = emb
        save_safetensors(os.path.join(out_dir, "model.safetensors"),
                         {k: v.astype(np.float32) for k, v in sd.items()})
        print(f"saved {out_dir}")


if __name__ == "__main__":
    main()
