"""Single-speaker SFT: TPU-native rebuild of finetuning/sft_12hz.py.

Loss math replicated exactly (sft_12hz.py:69-124):
- embedding fusion: text_embedding * text_mask + codec_embedding * codec_mask
  with the speaker embedding injected at slot 6, plus the per-codebook
  sub-code embeddings over codec frames (85-98);
- talker CE on codec_0_labels shifted by one (100-105);
- sub-talker CE over frame positions, conditioning each frame's codes on the
  talker hidden at the frame's own position (107-111 ->
  forward_sub_talker_finetune, modeling_qwen3_tts.py:1612-1633 and
  code_predictor.forward_finetune 1197-1247);
- total = talker + 0.3 * sub-talker (113); AdamW, grad-clip 1.0.

TPU-first: the reference's ragged boolean gather (`hidden[codec_mask]`)
becomes a dense masked loss — every position runs through the sub-talker and
the mask zeroes non-frame positions, keeping shapes static for pjit.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import TalkerConfig
from ..models.talker import (KVCache, StackDims, _cp_project, decoder_stack,
                             talker_prefill)
from ..ops.attention import mask_to_bias
from ..ops.rope import default_inv_freq, rope_tables

Params = Dict[str, Any]


def _cross_entropy(logits: jax.Array, labels: jax.Array,
                   ignore_index: int = -100) -> jax.Array:
    """Mean CE over non-ignored labels (HF loss semantics)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def fuse_embeddings(params: Params, cfg: TalkerConfig, batch: Dict[str, jax.Array],
                    speaker_embedding: jax.Array) -> jax.Array:
    """sft_12hz.py:86-98 embedding fusion. Returns (B, T, H)."""
    input_ids = batch["input_ids"]            # (B, T, 2)
    text_emb = jnp.take(params["text_embedding"], input_ids[..., 0], axis=0)
    if text_emb.shape[-1] != cfg.hidden_size:
        # the reference SFT adds raw text embeddings (sft_12hz.py:88) which
        # assumes text_hidden == hidden; project when a config has them differ
        from ..models.talker import text_project

        text_emb = text_project(params, cfg, text_emb)
    text_emb = text_emb * batch["text_embedding_mask"].astype(text_emb.dtype)
    codec_emb = jnp.take(params["codec_embedding"], input_ids[..., 1], axis=0)
    codec_emb = codec_emb * batch["codec_embedding_mask"].astype(codec_emb.dtype)
    codec_emb = codec_emb.at[:, 6, :].set(speaker_embedding.astype(codec_emb.dtype))
    emb = text_emb + codec_emb
    cp_tables = params["code_predictor"]["embeddings"]
    cmask = batch["codec_mask"][..., None].astype(emb.dtype)
    for i in range(1, cfg.num_code_groups):
        e = jnp.take(cp_tables[i - 1], batch["codec_ids"][..., i], axis=0)
        emb = emb + e * cmask
    return emb


def _sub_talker_dense(params: Params, cfg: TalkerConfig, hidden: jax.Array,
                      codec_ids: jax.Array) -> jax.Array:
    """Dense code-predictor teacher forcing.

    hidden: (N, H_talker) conditioning vectors; codec_ids: (N, Q).
    Returns logits (N, Q-1, V) for codes 1..Q-1.
    """
    cp_cfg = cfg.code_predictor_config
    cp = params["code_predictor"]
    dims = StackDims.from_code_predictor(cp_cfg)
    N = hidden.shape[0]
    Q = cfg.num_code_groups
    dtype = hidden.dtype

    seq = [hidden[:, None, :]]
    seq.append(jnp.take(params["codec_embedding"], codec_ids[:, 0], axis=0)[:, None, :].astype(dtype))
    for i in range(1, Q - 1):
        seq.append(jnp.take(cp["embeddings"][i - 1], codec_ids[:, i], axis=0)[:, None, :].astype(dtype))
    x = _cp_project(cp, jnp.concatenate(seq, axis=1))  # (N, Q, Hc)

    T = Q
    cache = KVCache.zeros(cp_cfg.num_hidden_layers, N, T, dims.kv_heads,
                          dims.head_dim, dtype=dtype)
    pos = jnp.broadcast_to(jnp.arange(T)[None, :], (N, T))
    cos, sin = rope_tables(pos, default_inv_freq(dims.head_dim, cp_cfg.rope_theta))
    ok = jnp.arange(T)[None, :] <= jnp.arange(T)[:, None]
    bias = jnp.broadcast_to(mask_to_bias(ok)[None, None], (N, 1, T, T))
    h, _ = decoder_stack(cp["layers"], cp["norm"], dims, x, cos, sin, bias,
                         cache, 0)
    # logits for code i from position i via lm_head[i-1] (reference 1235-1238)
    logits = jnp.einsum("nqh,qvh->nqv", h[:, 1:].astype(jnp.float32),
                        cp["lm_heads"].astype(jnp.float32))
    return logits


def sft_loss(params: Params, cfg: TalkerConfig, batch: Dict[str, jax.Array],
             speaker_embedding: jax.Array) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    emb = fuse_embeddings(params, cfg, batch, speaker_embedding)
    attn = batch["attention_mask"]
    B, T, H = emb.shape

    dims = StackDims.from_talker(cfg)
    cache = KVCache.zeros(cfg.num_hidden_layers, B, T - 1, dims.kv_heads,
                          dims.head_dim, dtype=emb.dtype)
    # allow_flash=False: SFT batches are right-padded and the loss is
    # differentiated — both outside the flash kernel's contract
    _, hidden, _ = talker_prefill(params, cfg, emb[:, :-1],
                                  attn[:, :-1], cache,
                                  allow_flash=False)
    logits = jnp.einsum("bth,vh->btv", hidden.astype(jnp.float32),
                        params["codec_head"].astype(jnp.float32))
    talker_loss = _cross_entropy(logits, batch["codec_0_labels"][:, 1:])

    # dense sub-talker over all positions, masked to frame positions
    cmask = batch["codec_mask"][:, :T - 1]
    flat_hidden = hidden.reshape(B * (T - 1), H)
    flat_codes = batch["codec_ids"][:, :T - 1].reshape(B * (T - 1), -1)
    sub_logits = _sub_talker_dense(params, cfg, flat_hidden, flat_codes)
    sub_labels = jnp.where(cmask.reshape(-1, 1), flat_codes[:, 1:], -100)
    sub_loss = _cross_entropy(sub_logits, sub_labels)

    loss = talker_loss + 0.3 * sub_loss
    return loss, {"talker_loss": talker_loss, "sub_talker_loss": sub_loss}


def make_train_step(cfg: TalkerConfig, optimizer):
    """Build a jittable (params, opt_state, batch, spk_emb) -> updated step."""

    def train_step(params, opt_state, batch, speaker_embedding):
        (loss, metrics), grads = jax.value_and_grad(sft_loss, has_aux=True)(
            params, cfg, batch, speaker_embedding)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        metrics["loss"] = loss
        return params, opt_state, metrics

    return train_step


def default_optimizer(lr: float = 2e-5, weight_decay: float = 0.01,
                      clip_norm: float = 1.0):
    """AdamW + global-norm clipping (sft_12hz.py:60, 117-118)."""
    import optax

    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
