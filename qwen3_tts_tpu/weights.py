"""Checkpoint loading: HF safetensors -> JAX pytrees.

The reference loads checkpoints with HF `from_pretrained` (safetensors state
dicts, reference: modeling_qwen3_tts.py:1855-1938).  We read the same files
directly with `safetensors.numpy` and organize them as nested dicts keyed by
the torch state-dict path components, so every parameter keeps its checkpoint
identity and tests can round-trip against torch modules.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def unflatten_state_dict(flat: Dict[str, Any]) -> Dict[str, Any]:
    """'a.b.0.weight': x  ->  {'a': {'b': {'0': {'weight': x}}}}"""
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def flatten_state_dict(nested: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in nested.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_state_dict(v, key))
        else:
            out[key] = v
    return out


def subtree(params: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = params
    for p in path.split("."):
        node = node[p]
    return node


def numeric_children(d: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Return children with integer-string keys, in numeric order."""
    keys = sorted((k for k in d.keys() if k.isdigit()), key=int)
    return [d[k] for k in keys]


def stack_layers(layers: Iterable[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a homogeneous list of per-layer pytrees along a new leading axis
    (for lax.scan over layers)."""
    layers = list(layers)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def from_torch_state_dict(sd, dtype=None) -> Dict[str, Any]:
    """torch state_dict -> nested dict of jnp arrays (test/import bridge)."""
    flat = {}
    for k, v in sd.items():
        arr = np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)
        a = jnp.asarray(arr)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        flat[k] = a
    return unflatten_state_dict(flat)


def _load_safetensors_file(path: str) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_numpy

    return st_numpy.load_file(path)


def resolve_checkpoint_dir(name_or_path: str,
                           allow_patterns=None) -> str:
    """Return a local checkpoint directory; download an HF repo id via
    huggingface_hub when the path does not exist locally (reference:
    download_weights_from_hf_specific, modeling_qwen3_tts.py:55-92)."""
    if os.path.isdir(name_or_path):
        return name_or_path
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise FileNotFoundError(
            f"{name_or_path} is not a local directory and huggingface_hub "
            "is unavailable to download it") from e
    return snapshot_download(name_or_path, allow_patterns=allow_patterns)


def load_safetensors_dir(model_dir: str, dtype=None,
                         key_filter: Optional[str] = None) -> Dict[str, Any]:
    """Load all *.safetensors in a checkpoint dir into a nested jnp pytree.

    Supports the sharded-index layout (`model.safetensors.index.json`) as well
    as single-file checkpoints.  `key_filter` is an optional regex applied to
    state-dict keys.
    """
    files: List[str] = []
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted({os.path.join(model_dir, v) for v in index["weight_map"].values()})
    else:
        files = sorted(
            os.path.join(model_dir, f) for f in os.listdir(model_dir)
            if f.endswith(".safetensors")
        )
    if not files:
        raise FileNotFoundError(f"no safetensors files under {model_dir}")

    pat = re.compile(key_filter) if key_filter else None
    flat: Dict[str, Any] = {}
    for path in files:
        for k, v in _load_safetensors_file(path).items():
            if pat and not pat.search(k):
                continue
            a = jnp.asarray(v)
            if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
                a = a.astype(dtype)
            flat[k] = a
    return unflatten_state_dict(flat)


def _unfuse_layers(stacked: Dict[str, Any], heads: int, kv_heads: int,
                   head_dim: int) -> Dict[str, Any]:
    """Split fused qkv/gate_up stacks back into reference-format weights."""
    attn = stacked["self_attn"]
    qkv = attn["qkv_proj"]["weight"]
    nq, nkv = heads * head_dim, kv_heads * head_dim
    gu = stacked["mlp"]["gate_up_proj"]["weight"]
    inter = gu.shape[-2] // 2
    return {
        "self_attn": {
            "q_proj": {"weight": qkv[..., :nq, :]},
            "k_proj": {"weight": qkv[..., nq:nq + nkv, :]},
            "v_proj": {"weight": qkv[..., nq + nkv:, :]},
            "o_proj": attn["o_proj"],
            "q_norm": attn["q_norm"],
            "k_norm": attn["k_norm"],
        },
        "mlp": {
            "gate_proj": {"weight": gu[..., :inter, :]},
            "up_proj": {"weight": gu[..., inter:, :]},
            "down_proj": stacked["mlp"]["down_proj"],
        },
        "input_layernorm": stacked["input_layernorm"],
        "post_attention_layernorm": stacked["post_attention_layernorm"],
    }


def talker_params_to_state_dict(prepared: Dict[str, Any], cfg,
                                prefix: str = "talker") -> Dict[str, np.ndarray]:
    """Invert `prepare_talker_params`: stacked pytree -> reference-format
    state-dict names (for checkpoint save after finetuning)."""
    out: Dict[str, np.ndarray] = {}

    def unstack(tree: Dict[str, Any], base: str):
        flat = flatten_state_dict(tree)
        n_layers = None
        for k, v in flat.items():
            if n_layers is None:
                n_layers = v.shape[0]
            for i in range(v.shape[0]):
                out[f"{base}.{i}.{k}"] = np.asarray(v[i])

    cp_cfg = cfg.code_predictor_config
    unstack(_unfuse_layers(prepared["layers"], cfg.num_attention_heads,
                           cfg.num_key_value_heads, cfg.resolved_head_dim),
            f"{prefix}.model.layers")
    out[f"{prefix}.model.norm.weight"] = np.asarray(prepared["norm"]["weight"])
    out[f"{prefix}.model.codec_embedding.weight"] = np.asarray(prepared["codec_embedding"])
    out[f"{prefix}.model.text_embedding.weight"] = np.asarray(prepared["text_embedding"])
    for k, v in flatten_state_dict(prepared["text_projection"]).items():
        out[f"{prefix}.text_projection.{k}"] = np.asarray(v)
    out[f"{prefix}.codec_head.weight"] = np.asarray(prepared["codec_head"])

    cp = prepared["code_predictor"]
    unstack(_unfuse_layers(cp["layers"], cp_cfg.num_attention_heads,
                           cp_cfg.num_key_value_heads, cp_cfg.head_dim),
            f"{prefix}.code_predictor.model.layers")
    out[f"{prefix}.code_predictor.model.norm.weight"] = np.asarray(cp["norm"]["weight"])
    for i in range(cp["embeddings"].shape[0]):
        out[f"{prefix}.code_predictor.model.codec_embedding.{i}.weight"] = \
            np.asarray(cp["embeddings"][i])
    for i in range(cp["lm_heads"].shape[0]):
        out[f"{prefix}.code_predictor.lm_head.{i}.weight"] = \
            np.asarray(cp["lm_heads"][i])
    if cp.get("proj") is not None:
        out[f"{prefix}.code_predictor.small_to_mtp_projection.weight"] = \
            np.asarray(cp["proj"]["weight"])
        out[f"{prefix}.code_predictor.small_to_mtp_projection.bias"] = \
            np.asarray(cp["proj"]["bias"])
    return out


def save_safetensors(path: str, state_dict: Dict[str, np.ndarray]) -> None:
    from safetensors import numpy as st_numpy

    st_numpy.save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()},
                       path)


def quantize_weight_int8(w, axis: int = -1):
    """Per-output-channel symmetric int8 weight quantization.

    w: (..., O, I) torch-layout matmul weight. Returns {"q": int8 array,
    "s": per-row fp32 scales} such that w ~= q * s[..., None].
    Weight-only: the matmul consumes int8 straight from HBM and converts
    on-chip, halving decode's weight bandwidth (the decode bottleneck).
    """
    import numpy as _np

    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(axis).astype(jnp.float32)}


def quantize_talker_params(prepared: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8 for the decode-bandwidth-dominant tensors: talker and
    code-predictor layer matmuls + the codec head. Embedding tables and
    norms stay in the original dtype."""
    import copy

    out = dict(prepared)

    def quantize_layers(layers):
        layers = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in layers.items()}
        attn = dict(layers["self_attn"])
        for name in ("qkv_proj", "o_proj"):
            attn[name] = {"weight": quantize_weight_int8(attn[name]["weight"])}
        layers["self_attn"] = attn
        mlp = dict(layers["mlp"])
        for name in ("gate_up_proj", "down_proj"):
            mlp[name] = {"weight": quantize_weight_int8(mlp[name]["weight"])}
        layers["mlp"] = mlp
        return layers

    out["layers"] = quantize_layers(prepared["layers"])
    out["codec_head"] = quantize_weight_int8(prepared["codec_head"])
    cp = dict(prepared["code_predictor"])
    cp["layers"] = quantize_layers(cp["layers"])
    out["code_predictor"] = cp
    return out


def matmul_t(x, w):
    """x @ w.T supporting raw arrays and weight-only int8 dicts."""
    if isinstance(w, dict) and "q" in w:
        y = x @ w["q"].T.astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w.T.astype(x.dtype)


def weight_rows(w) -> int:
    """Output-row count of a matmul_t weight (raw array or int8 dict)."""
    return (w["q"] if isinstance(w, dict) else w).shape[-2]


def cast_floats(tree, dtype):
    """Cast all floating leaves of a pytree to dtype."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
