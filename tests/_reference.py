"""Helpers to load the read-only PyTorch reference for parity testing.

The reference lives at /root/reference (absent in some CI environments: every
parity test must be skipped via `requires_reference`).  Some reference modules
import librosa/soundfile which are not installed; we stub just enough for the
modeling code paths we compare against (none of which touch audio I/O).
"""

import importlib.machinery
import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "qwen_tts"))


def _install_stub(name: str, attrs=None):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in (attrs or {}).items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _stub_audio_deps():
    """Stub librosa/soundfile enough for reference imports (never executed in
    the numeric paths we test)."""
    if "librosa" not in sys.modules:
        librosa = _install_stub("librosa")
        filters = _install_stub("librosa.filters")

        def _mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None):
            # Slaney-style mel filterbank (same formula librosa implements).
            import numpy as np

            def hz_to_mel(f):
                f = np.atleast_1d(np.asarray(f, dtype=float))
                mels = f / (200.0 / 3)
                min_log_hz = 1000.0
                min_log_mel = min_log_hz / (200.0 / 3)
                logstep = np.log(6.4) / 27.0
                log_t = f >= min_log_hz
                mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
                return mels

            def mel_to_hz(m):
                m = np.atleast_1d(np.asarray(m, dtype=float))
                freqs = m * (200.0 / 3)
                min_log_hz = 1000.0
                min_log_mel = min_log_hz / (200.0 / 3)
                logstep = np.log(6.4) / 27.0
                log_t = m >= min_log_mel
                freqs[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
                return freqs

            if fmax is None:
                fmax = float(sr) / 2
            n_freqs = 1 + n_fft // 2
            fftfreqs = np.linspace(0, float(sr) / 2, n_freqs)
            mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2))
            fdiff = np.diff(mel_f)
            ramps = mel_f[:, None] - fftfreqs[None, :]
            weights = np.zeros((n_mels, n_freqs))
            for i in range(n_mels):
                lower = -ramps[i] / fdiff[i]
                upper = ramps[i + 2] / fdiff[i + 1]
                weights[i] = np.maximum(0, np.minimum(lower, upper))
            enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
            weights *= enorm[:, None]
            return weights

        filters.mel = _mel
        librosa.filters = filters
        librosa.load = None
        librosa.resample = None
    _install_stub("soundfile")
    _install_stub("sox")


_PKG_CACHE = {}


def load_reference_module(rel_dir: str, module_name: str, package_alias: str):
    """Load a reference module file as `package_alias.module_name`, creating a
    synthetic package so its relative imports resolve."""
    _stub_audio_deps()
    key = (package_alias, module_name)
    if key in _PKG_CACHE:
        return _PKG_CACHE[key]
    if package_alias not in sys.modules:
        pkg = types.ModuleType(package_alias)
        pkg.__path__ = [os.path.join(REFERENCE_ROOT, rel_dir)]
        sys.modules[package_alias] = pkg
    path = os.path.join(REFERENCE_ROOT, rel_dir, module_name + ".py")
    spec = importlib.util.spec_from_file_location(f"{package_alias}.{module_name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{package_alias}.{module_name}"] = mod
    spec.loader.exec_module(mod)
    _PKG_CACHE[key] = mod
    return mod


def load_tokenizer_v2():
    """Reference 12Hz tokenizer modeling + config modules."""
    load_reference_module("qwen_tts/core/tokenizer_12hz",
                          "configuration_qwen3_tts_tokenizer_v2", "ref_tok12")
    return load_reference_module("qwen_tts/core/tokenizer_12hz",
                                 "modeling_qwen3_tts_tokenizer_v2", "ref_tok12")


def load_tokenizer_v2_config():
    return load_reference_module("qwen_tts/core/tokenizer_12hz",
                                 "configuration_qwen3_tts_tokenizer_v2", "ref_tok12")


def load_talker():
    """Reference talker modeling module (stubs its tokenizer import)."""
    _stub_audio_deps()
    # modeling_qwen3_tts does `from ...inference.qwen3_tts_tokenizer import
    # Qwen3TTSTokenizer` — stub the whole inference package chain.
    if "ref_qwen_tts" not in sys.modules:
        for name in ("ref_qwen_tts", "ref_qwen_tts.inference"):
            _install_stub(name)
        tok = _install_stub("ref_qwen_tts.inference.qwen3_tts_tokenizer",
                            {"Qwen3TTSTokenizer": object})
        sys.modules["ref_qwen_tts.inference"].qwen3_tts_tokenizer = tok

    # Build package alias "ref_models" for qwen_tts/core/models with a parent
    # chain deep enough for the `...inference` relative import: emulate by
    # rewriting the import through sys.modules aliasing.
    import re

    path = os.path.join(REFERENCE_ROOT, "qwen_tts/core/models/modeling_qwen3_tts.py")
    key = ("ref_models", "modeling_qwen3_tts")
    if key in _PKG_CACHE:
        return _PKG_CACHE[key]

    load_reference_module("qwen_tts/core/models", "configuration_qwen3_tts", "ref_models")

    with open(path, "r", encoding="utf-8") as f:
        src = f.read()
    src = src.replace(
        "from ...inference.qwen3_tts_tokenizer import Qwen3TTSTokenizer",
        "from ref_qwen_tts.inference.qwen3_tts_tokenizer import Qwen3TTSTokenizer",
    )
    src = src.replace(
        "from .configuration_qwen3_tts import",
        "from ref_models.configuration_qwen3_tts import",
    )
    mod = types.ModuleType("ref_models.modeling_qwen3_tts")
    mod.__file__ = path
    sys.modules["ref_models.modeling_qwen3_tts"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    _PKG_CACHE[key] = mod
    return mod


def load_talker_config():
    return load_reference_module("qwen_tts/core/models", "configuration_qwen3_tts",
                                 "ref_models")


def load_tokenizer_v1():
    """Reference 25Hz tokenizer modeling module (stubs sox/onnxruntime/
    torchaudio which its vq deps import)."""
    _stub_audio_deps()
    _install_stub("onnxruntime", {
        "SessionOptions": object, "InferenceSession": object,
        "GraphOptimizationLevel": type("G", (), {"ORT_ENABLE_ALL": 0})})
    _install_stub("torchaudio")
    _install_stub("torchaudio.compliance")
    kaldi = _install_stub("torchaudio.compliance.kaldi", {"fbank": None})
    sys.modules["torchaudio.compliance"].kaldi = kaldi
    load_reference_module("qwen_tts/core/tokenizer_25hz",
                          "configuration_qwen3_tts_tokenizer_v1", "ref_tok25")
    return load_reference_module("qwen_tts/core/tokenizer_25hz",
                                 "modeling_qwen3_tts_tokenizer_v1", "ref_tok25")


def load_finetune_dataset():
    """Load finetuning/dataset.py with its `qwen_tts.core.models` imports
    aliased to the already-loaded ref_models modules."""
    load_talker()  # ensures ref_models.{configuration,modeling}_qwen3_tts
    for name in ("qwen_tts", "qwen_tts.core", "qwen_tts.core.models"):
        _install_stub(name)
    sys.modules["qwen_tts.core.models.configuration_qwen3_tts"] = \
        sys.modules["ref_models.configuration_qwen3_tts"]
    sys.modules["qwen_tts.core.models.modeling_qwen3_tts"] = \
        sys.modules["ref_models.modeling_qwen3_tts"]
    path = os.path.join(REFERENCE_ROOT, "finetuning/dataset.py")
    spec = importlib.util.spec_from_file_location("ref_finetune_dataset", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_finetune_dataset"] = mod
    spec.loader.exec_module(mod)
    return mod
