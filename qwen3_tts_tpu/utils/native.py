"""Build-on-first-use loader for the framework's native (C) helpers.

Compiles `qwen3_tts_tpu/native/*.c` with the system C compiler into a
content-addressed shared object under the user cache dir and binds it via
ctypes — no pybind11, no build step at install time, and a pure-Python
fallback always exists (callers treat `load_library() is None` as
"fall back").
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_CACHE: dict = {}


def _cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    path = os.path.join(base, "qwen3_tts_tpu", "native")
    os.makedirs(path, exist_ok=True)
    return path


def _compiler() -> Optional[str]:
    for cand in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cand:
            continue
        try:
            subprocess.run([cand, "--version"], capture_output=True,
                           timeout=30)
            return cand
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load native/<name>.c. Returns None when no
    compiler is available or compilation fails — callers must fall back."""
    if name in _CACHE:
        return _CACHE[name]
    src = os.path.join(_NATIVE_DIR, f"{name}.c")
    lib = None
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_cache_dir(), f"{name}-{digest}.so")
        if not os.path.exists(so):
            cc = _compiler()
            if cc is None:
                _CACHE[name] = None
                return None
            tmp = so + f".tmp{os.getpid()}"
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)  # atomic for concurrent builders
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        lib = None
    _CACHE[name] = lib
    return lib


def flac_fast() -> Optional[ctypes.CDLL]:
    """The FLAC bitstream hot loops (native/flac_fast.c), with argtypes
    bound. None -> use the Python path."""
    lib = load_library("flac_fast")
    if lib is None:
        return None
    if not getattr(lib, "_bound", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        szp = ctypes.POINTER(ctypes.c_size_t)
        lib.flac_rice_decode.argtypes = [u8p, ctypes.c_size_t, szp,
                                         ctypes.c_int64, ctypes.c_int32, i64p]
        lib.flac_rice_decode.restype = ctypes.c_int
        lib.flac_lpc_restore.argtypes = [i64p, ctypes.c_int64,
                                         ctypes.c_int32, i32p,
                                         ctypes.c_int32]
        lib.flac_lpc_restore.restype = None
        lib.flac_read_signed.argtypes = [u8p, ctypes.c_size_t, szp,
                                         ctypes.c_int64, ctypes.c_int32, i64p]
        lib.flac_read_signed.restype = ctypes.c_int
        lib._bound = True
    return lib
