"""CAM++ pure-JAX port: numerics vs a torch twin, ONNX initializer reader,
and the XVectorExtractor JAX path end-to-end.

The reference ships CAM++ only as `campplus.onnx` (no torch source in-repo),
so the oracle here is a torch reimplementation of the public modelscope
architecture (FCM front end + D-TDNN/CAM blocks + stats pooling) with random
weights.  The ONNX loader is tested against a ModelProto we hand-encode
(same wire format torch's exporter writes for initializers).
"""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# ---------------------------------------------------------------------------
# torch twin (modelscope speakerlab CAMPPlus, inference-relevant subset)
# ---------------------------------------------------------------------------


def get_nonlinear(config_str, channels):
    seq = nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            seq.add_module("relu", nn.ReLU(inplace=True))
        elif name == "batchnorm":
            seq.add_module("batchnorm", nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            seq.add_module("batchnorm", nn.BatchNorm1d(channels, affine=False))
    return seq


class TDNNLayer(nn.Module):
    def __init__(self, in_c, out_c, k, stride=1, padding=0, dilation=1,
                 bias=False, config_str="batchnorm-relu"):
        super().__init__()
        if padding < 0:
            padding = (k - 1) // 2 * dilation
        self.linear = nn.Conv1d(in_c, out_c, k, stride=stride,
                                padding=padding, dilation=dilation, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_c)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(nn.Module):
    def __init__(self, bn_c, out_c, k, stride, padding, dilation, bias,
                 reduction=2):
        super().__init__()
        self.linear_local = nn.Conv1d(bn_c, out_c, k, stride=stride,
                                      padding=padding, dilation=dilation,
                                      bias=bias)
        self.linear1 = nn.Conv1d(bn_c, bn_c // reduction, 1)
        self.relu = nn.ReLU(inplace=True)
        self.linear2 = nn.Conv1d(bn_c // reduction, out_c, 1)
        self.sigmoid = nn.Sigmoid()

    def seg_pooling(self, x, seg_len=100):
        seg = F.avg_pool1d(x, kernel_size=seg_len, stride=seg_len,
                           ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, seg_len).reshape(*shape[:-1], -1)
        return seg[..., :x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = self.relu(self.linear1(context))
        m = self.sigmoid(self.linear2(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, in_c, out_c, bn_c, k, stride=1, dilation=1, bias=False,
                 config_str="batchnorm-relu"):
        super().__init__()
        padding = (k - 1) // 2 * dilation
        self.nonlinear1 = get_nonlinear(config_str, in_c)
        self.linear1 = nn.Conv1d(in_c, bn_c, 1, bias=False)
        self.nonlinear2 = get_nonlinear(config_str, bn_c)
        self.cam_layer = CAMLayer(bn_c, out_c, k, stride, padding, dilation,
                                  bias)

    def forward(self, x):
        return self.cam_layer(self.nonlinear2(self.linear1(self.nonlinear1(x))))


class CAMDenseTDNNBlock(nn.ModuleList):
    def __init__(self, num_layers, in_c, out_c, bn_c, k, dilation,
                 config_str="batchnorm-relu"):
        super().__init__()
        for i in range(num_layers):
            self.add_module(f"tdnnd{i+1}",
                            CAMDenseTDNNLayer(in_c + i * out_c, out_c, bn_c,
                                              k, dilation=dilation,
                                              config_str=config_str))

    def forward(self, x):
        for layer in self:
            x = torch.cat([x, layer(x)], dim=1)
        return x


class TransitLayer(nn.Module):
    def __init__(self, in_c, out_c, bias=True, config_str="batchnorm-relu"):
        super().__init__()
        self.nonlinear = get_nonlinear(config_str, in_c)
        self.linear = nn.Conv1d(in_c, out_c, 1, bias=bias)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(nn.Module):
    def __init__(self, in_c, out_c, bias=False, config_str="batchnorm_"):
        super().__init__()
        self.linear = nn.Conv1d(in_c, out_c, 1, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_c)

    def forward(self, x):
        if x.dim() == 2:
            x = self.linear(x.unsqueeze(-1)).squeeze(-1)
        else:
            x = self.linear(x)
        return self.nonlinear(x)


class StatsPool(nn.Module):
    def forward(self, x):
        return torch.cat([x.mean(-1), x.std(-1, unbiased=True)], dim=-1)


class BasicResBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=(stride, 1),
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = nn.Sequential()
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=(stride, 1),
                          bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class FCM(nn.Module):
    def __init__(self, m_channels=32, feat_dim=80):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.layer2 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.conv2 = nn.Conv2d(m_channels, m_channels, 3, stride=(2, 1),
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def forward(self, x):
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        s = out.shape
        return out.reshape(s[0], s[1] * s[2], s[3])


class CAMPPlusTwin(nn.Module):
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                 bn_size=4, init_channels=128, m_channels=32,
                 num_blocks=(12, 24, 16), dilations=(1, 2, 2)):
        super().__init__()
        from collections import OrderedDict

        self.head = FCM(m_channels=m_channels, feat_dim=feat_dim)
        channels = self.head.out_channels
        self.xvector = nn.Sequential(OrderedDict([
            ("tdnn", TDNNLayer(channels, init_channels, 5, stride=2,
                               padding=-1)),
        ]))
        channels = init_channels
        for i, (nl, k, d) in enumerate(zip(num_blocks, (3, 3, 3), dilations)):
            self.xvector.add_module(
                f"block{i+1}",
                CAMDenseTDNNBlock(nl, channels, growth_rate,
                                  bn_size * growth_rate, k, d))
            channels += nl * growth_rate
            self.xvector.add_module(
                f"transit{i+1}", TransitLayer(channels, channels // 2,
                                              bias=False))
            channels //= 2
        self.xvector.add_module("out_nonlinear",
                                get_nonlinear("batchnorm-relu", channels))
        self.xvector.add_module("stats", StatsPool())
        self.xvector.add_module("dense",
                                DenseLayer(channels * 2, embedding_size))

    def forward(self, x):
        x = x.permute(0, 2, 1)
        return self.xvector(self.head(x))


TINY = dict(feat_dim=16, embedding_size=12, growth_rate=4, bn_size=2,
            init_channels=8, m_channels=4, num_blocks=(2, 2), dilations=(1, 2))


def _twin_with_random_stats(seed=0, **kw):
    torch.manual_seed(seed)
    model = CAMPPlusTwin(**kw)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.empty_like(p).normal_(0, 0.3, generator=gen))
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.empty_like(b).normal_(0, 0.2, generator=gen))
            elif name.endswith("running_var"):
                b.copy_(torch.empty_like(b).uniform_(0.5, 2.0, generator=gen))
    model.eval()
    return model


def _to_flat(model):
    return {k: v.detach().numpy()
            for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


@pytest.mark.parametrize("T", [37, 120, 200])
def test_campplus_jax_matches_torch_twin(T):
    import jax.numpy as jnp

    from qwen3_tts_tpu.models.codec25.campplus import (CAMPPlusConfig,
                                                       campplus_forward)

    model = _twin_with_random_stats(seed=1, **TINY)
    cfg = CAMPPlusConfig(feat_dim=TINY["feat_dim"],
                         embedding_size=TINY["embedding_size"],
                         growth_rate=TINY["growth_rate"],
                         bn_size=TINY["bn_size"],
                         init_channels=TINY["init_channels"],
                         m_channels=TINY["m_channels"],
                         num_blocks=TINY["num_blocks"],
                         kernels=(3,) * len(TINY["num_blocks"]),
                         dilations=TINY["dilations"], seg_len=100)

    rng = np.random.default_rng(T)
    feats = rng.normal(0, 1, size=(2, T, TINY["feat_dim"])).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(feats)).numpy()
    params = {k: jnp.asarray(v) for k, v in _to_flat(model).items()}
    got = np.asarray(campplus_forward(params, cfg, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# ONNX initializer reader
# ---------------------------------------------------------------------------


def _pb_varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _pb_field(num, wire, payload):
    key = _pb_varint((num << 3) | wire)
    if wire == 2:
        return key + _pb_varint(len(payload)) + payload
    return key + payload


def _encode_tensor(name, arr, use_raw=True):
    body = b""
    for d in arr.shape:
        body += _pb_field(1, 0, _pb_varint(d))
    body += _pb_field(2, 0, _pb_varint(1))  # float32
    body += _pb_field(8, 2, name.encode())
    if use_raw:
        body += _pb_field(9, 2, arr.astype("<f4").tobytes())
    else:
        body += _pb_field(4, 2, arr.astype("<f4").tobytes())  # packed floats
    return body


def _encode_model(tensors, use_raw=True):
    graph = b""
    for name, arr in tensors.items():
        graph += _pb_field(5, 2, _encode_tensor(name, arr, use_raw))
    # unrelated leading fields exercise the skipping path
    model = _pb_field(1, 0, _pb_varint(8))           # ir_version
    model += _pb_field(2, 2, b"pytorch")             # producer_name
    model += _pb_field(7, 2, graph)
    return model


@pytest.mark.parametrize("use_raw", [True, False])
def test_onnx_initializer_reader(tmp_path, use_raw):
    from qwen3_tts_tpu.utils.onnx_weights import read_onnx_initializers

    rng = np.random.default_rng(0)
    tensors = {
        "xvector.tdnn.linear.weight": rng.normal(size=(8, 4, 5)).astype(np.float32),
        "head.bn1.running_var": rng.uniform(0.5, 2, size=(4,)).astype(np.float32),
        "scalarish": np.asarray([3.25], np.float32),
    }
    path = str(tmp_path / "m.onnx")
    with open(path, "wb") as f:
        f.write(_encode_model(tensors, use_raw))
    got = read_onnx_initializers(path)
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_onnx_initializer_reader_negative_int64(tmp_path):
    """Regression: int64_data varints decoded as unsigned turned -1 into
    2**64-1 and crashed np.asarray with OverflowError (protobuf encodes
    negative int64 as a 10-byte two's-complement varint)."""
    from qwen3_tts_tpu.utils.onnx_weights import read_onnx_initializers

    vals = np.asarray([-1, -2048, 0, 7, -(1 << 40)], np.int64)
    body = _pb_field(1, 0, _pb_varint(len(vals)))
    body += _pb_field(2, 0, _pb_varint(7))            # int64
    body += _pb_field(8, 2, b"shape_tensor")
    packed = b"".join(_pb_varint(int(v) & ((1 << 64) - 1)) for v in vals)
    body += _pb_field(7, 2, packed)                   # packed int64_data
    model = _pb_field(7, 2, _pb_field(5, 2, body))
    path = str(tmp_path / "neg.onnx")
    with open(path, "wb") as f:
        f.write(model)
    got = read_onnx_initializers(path)
    np.testing.assert_array_equal(got["shape_tensor"], vals)


def test_xvector_extractor_jax_path(tmp_path):
    """End-to-end: a campplus.onnx-shaped file (twin weights as initializers)
    -> XVectorExtractor -> embedding matches the torch twin on kaldi fbank
    features."""
    import jax

    from qwen3_tts_tpu.models.codec25 import campplus as cp
    from qwen3_tts_tpu.models.codec25.model import XVectorExtractor
    from qwen3_tts_tpu.utils.kaldi import fbank as kaldi_fbank

    model = _twin_with_random_stats(seed=2, **TINY)
    flat = {k: np.ascontiguousarray(v) for k, v in _to_flat(model).items()}
    path = str(tmp_path / "campplus.onnx")
    with open(path, "wb") as f:
        f.write(_encode_model(flat))

    cfg = cp.CAMPPlusConfig(feat_dim=TINY["feat_dim"],
                            embedding_size=TINY["embedding_size"],
                            growth_rate=TINY["growth_rate"],
                            bn_size=TINY["bn_size"],
                            init_channels=TINY["init_channels"],
                            m_channels=TINY["m_channels"],
                            num_blocks=TINY["num_blocks"],
                            kernels=(3,) * len(TINY["num_blocks"]),
                            dilations=TINY["dilations"])

    xv = XVectorExtractor(path)
    assert xv.jax_params is not None, "JAX CAM++ path did not engage"
    xv.jax_cfg = cfg  # tiny dims for the test

    rng = np.random.default_rng(3)
    audio = (0.3 * rng.normal(size=(4000,))).astype(np.float32)
    norm = XVectorExtractor._peak_norm(audio)
    feat = kaldi_fbank(norm, num_mel_bins=TINY["feat_dim"])
    feat = feat - feat.mean(axis=0, keepdims=True)
    with torch.no_grad():
        want = model(torch.from_numpy(feat[None])).numpy().flatten()
    want = want / max(np.linalg.norm(want), 1e-12)

    emb = np.asarray(cp.campplus_embed(xv.jax_params, cfg,
                                       np.asarray(feat[None]))).flatten()
    emb = emb / max(np.linalg.norm(emb), 1e-12)
    np.testing.assert_allclose(emb, want, rtol=1e-3, atol=1e-4)
