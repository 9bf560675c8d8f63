"""CAM++ (D-TDNN with context-aware masking) speaker embedding in pure JAX.

The reference runs the CAM++ x-vector through a bundled `campplus.onnx` via
onnxruntime (qwen_tts/core/tokenizer_25hz/vq/speech_vq.py:118-159) — a C++
runtime dependency on the V1 encode path.  This module re-implements the
network (the public modelscope `speakerlab` CAMPPlus: FCM 2-D front end,
D-TDNN blocks with CAM layers, stats pooling) so the default path is JAX,
with onnxruntime demoted to an optional cross-check.

Weights are a flat {torch-state-dict-name: array} mapping — loadable from
the reference's campplus.onnx initializers (utils/onnx_weights.py) or from a
safetensors export.  All normalization layers run in inference mode
(running statistics), matching the exported graph.

Architecture constants (campplus-common checkpoint): feat 80-d kaldi fbank,
FCM m_channels 32, D-TDNN init 128 channels, growth 32, bn_size 4, blocks
(12, 24, 16) layers with kernel 3 and dilations (1, 2, 2), embedding 192.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    m_channels: int = 32
    num_blocks: Tuple[int, ...] = (12, 24, 16)
    kernels: Tuple[int, ...] = (3, 3, 3)
    dilations: Tuple[int, ...] = (1, 2, 2)
    seg_len: int = 100
    bn_eps: float = 1e-5


def _bn(p: Params, prefix: str, x: jax.Array, eps: float,
        channel_axis: int = 1) -> jax.Array:
    """Inference-mode batch norm over the channel axis. Affine params are
    optional (`batchnorm_` layers are affine-free)."""
    shape = [1] * x.ndim
    shape[channel_axis] = -1

    def g(name):
        a = p.get(f"{prefix}.{name}")
        return None if a is None else jnp.reshape(a, shape).astype(x.dtype)

    mean, var = g("running_mean"), g("running_var")
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    w, b = g("weight"), g("bias")
    if w is not None:
        y = y * w
    if b is not None:
        y = y + b
    return y


def _bn_relu(p: Params, prefix: str, x: jax.Array, eps: float) -> jax.Array:
    """config_str='batchnorm-relu' nonlinearity (Sequential[batchnorm, relu])."""
    return jax.nn.relu(_bn(p, f"{prefix}.batchnorm", x, eps))


def _conv1d(p: Params, prefix: str, x: jax.Array, stride: int = 1,
            padding: int = 0, dilation: int = 1) -> jax.Array:
    """x: (B, C, T) -> (B, O, T')."""
    w = p[f"{prefix}.weight"].astype(x.dtype)  # (O, C, K)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NCH", "OIH", "NCH"))
    b = p.get(f"{prefix}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None]
    return y


def _conv2d(p: Params, prefix: str, x: jax.Array,
            stride: Tuple[int, int] = (1, 1), padding: int = 0) -> jax.Array:
    """x: (B, C, F, T) -> (B, O, F', T')."""
    w = p[f"{prefix}.weight"].astype(x.dtype)  # (O, C, Kf, Kt)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    b = p.get(f"{prefix}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)[None, :, None, None]
    return y


def _res_block(p: Params, prefix: str, x: jax.Array, stride: int,
               in_planes: int, planes: int, eps: float) -> jax.Array:
    """FCM BasicResBlock: 3x3 conv (freq-strided) -> BN -> relu -> 3x3 conv
    -> BN, plus a 1x1 strided shortcut when shape changes."""
    h = _conv2d(p, f"{prefix}.conv1", x, stride=(stride, 1), padding=1)
    h = jax.nn.relu(_bn(p, f"{prefix}.bn1", h, eps))
    h = _conv2d(p, f"{prefix}.conv2", h, stride=(1, 1), padding=1)
    h = _bn(p, f"{prefix}.bn2", h, eps)
    if stride != 1 or in_planes != planes:
        s = _conv2d(p, f"{prefix}.shortcut.0", x, stride=(stride, 1))
        s = _bn(p, f"{prefix}.shortcut.1", s, eps)
    else:
        s = x
    return jax.nn.relu(h + s)


def _fcm(p: Params, cfg: CAMPPlusConfig, x: jax.Array) -> jax.Array:
    """Front-end conv module: (B, F, T) fbank -> (B, m*(F//8), T)."""
    eps, m = cfg.bn_eps, cfg.m_channels
    h = x[:, None]  # (B, 1, F, T)
    h = jax.nn.relu(_bn(p, "head.bn1", _conv2d(p, "head.conv1", h, padding=1),
                        eps))
    # layer1 / layer2: two BasicResBlocks each, first strided on freq
    for li, layer in enumerate(("layer1", "layer2")):
        for bi, stride in enumerate((2, 1)):
            h = _res_block(p, f"head.{layer}.{bi}", h, stride,
                           in_planes=m, planes=m, eps=eps)
    h = jax.nn.relu(_bn(p, "head.bn2",
                        _conv2d(p, "head.conv2", h, stride=(2, 1), padding=1),
                        eps))
    B, C, F, T = h.shape
    return h.reshape(B, C * F, T)


def _seg_pooling(x: jax.Array, seg_len: int) -> jax.Array:
    """Average-pool (kernel=stride=seg_len, ceil mode) then nearest-unpool
    back to T (CAMLayer.seg_pooling)."""
    B, C, T = x.shape
    nseg = -(-T // seg_len)
    pad = nseg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    cnt = jnp.pad(jnp.ones((T,), x.dtype), (0, pad))
    seg = xp.reshape(B, C, nseg, seg_len).sum(-1) / \
        cnt.reshape(nseg, seg_len).sum(-1)
    up = jnp.repeat(seg, seg_len, axis=-1)
    return up[..., :T]


def _cam_layer(p: Params, prefix: str, x: jax.Array, kernel: int,
               dilation: int, cfg: CAMPPlusConfig) -> jax.Array:
    """Context-aware mask: local conv output gated by sigmoid(MLP(global
    mean + segment pooling))."""
    pad = (kernel - 1) // 2 * dilation
    y = _conv1d(p, f"{prefix}.linear_local", x, padding=pad,
                dilation=dilation)
    context = x.mean(-1, keepdims=True) + _seg_pooling(x, cfg.seg_len)
    context = jax.nn.relu(_conv1d(p, f"{prefix}.linear1", context))
    m = jax.nn.sigmoid(_conv1d(p, f"{prefix}.linear2", context))
    return y * m


def _dense_tdnn_layer(p: Params, prefix: str, x: jax.Array, kernel: int,
                      dilation: int, cfg: CAMPPlusConfig) -> jax.Array:
    h = _bn_relu(p, f"{prefix}.nonlinear1", x, cfg.bn_eps)
    h = _conv1d(p, f"{prefix}.linear1", h)
    h = _bn_relu(p, f"{prefix}.nonlinear2", h, cfg.bn_eps)
    return _cam_layer(p, f"{prefix}.cam_layer", h, kernel, dilation, cfg)


def campplus_forward(p: Params, cfg: CAMPPlusConfig,
                     feats: jax.Array) -> jax.Array:
    """feats: (B, T, feat_dim) mean-normalized kaldi fbank -> (B, emb)."""
    eps = cfg.bn_eps
    x = jnp.transpose(feats, (0, 2, 1))  # (B, F, T)
    x = _fcm(p, cfg, x)

    # D-TDNN trunk ('xvector.' prefix)
    x = _conv1d(p, "xvector.tdnn.linear", x, stride=2, padding=2)
    x = _bn_relu(p, "xvector.tdnn.nonlinear", x, eps)
    for i, (nl, k, d) in enumerate(zip(cfg.num_blocks, cfg.kernels,
                                       cfg.dilations)):
        for j in range(nl):
            y = _dense_tdnn_layer(p, f"xvector.block{i+1}.tdnnd{j+1}", x, k,
                                  d, cfg)
            x = jnp.concatenate([x, y], axis=1)
        x = _bn_relu(p, f"xvector.transit{i+1}.nonlinear", x, eps)
        x = _conv1d(p, f"xvector.transit{i+1}.linear", x)
    x = _bn_relu(p, "xvector.out_nonlinear", x, eps)

    # stats pooling: mean + std (unbiased, matching torch.std)
    mean = x.mean(-1)
    var = x.var(-1) * (x.shape[-1] / max(1, x.shape[-1] - 1))
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=1)

    emb = stats[:, :, None]
    emb = _conv1d(p, "xvector.dense.linear", emb)
    emb = _bn(p, "xvector.dense.nonlinear.batchnorm", emb, eps)
    return emb[:, :, 0]


@partial(jax.jit, static_argnames=("cfg",))
def campplus_embed(p: Params, cfg: CAMPPlusConfig,
                   feats: jax.Array) -> jax.Array:
    return campplus_forward(p, cfg, feats)


def load_campplus_params(path: str) -> Params:
    """Load CAM++ weights from the reference's campplus.onnx (initializer
    names follow the torch state dict) or from a .safetensors export."""
    if path.endswith(".onnx"):
        from ...utils.onnx_weights import read_onnx_initializers

        flat = read_onnx_initializers(path)
    else:
        from safetensors import numpy as st_numpy

        flat = st_numpy.load_file(path)
    required = "xvector.tdnn.linear.weight"
    if required not in flat:
        names = ", ".join(sorted(flat)[:8])
        raise ValueError(
            f"{path}: no CAM++ state-dict-style initializers found "
            f"(expected '{required}'; first names: {names} ...). If the "
            "graph was exported with renamed/folded weights, fall back to "
            "onnxruntime.")
    return {k: jnp.asarray(np.asarray(v)) for k, v in flat.items()}
