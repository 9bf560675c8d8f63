"""Compiler options for decode-path jits.

The fused sub-talker megakernel (ops/pallas/subtalker.py) keeps ~94 MB of
int8 weights resident in VMEM. When the kernel is embedded in a scan /
while_loop, XLA allocates its VMEM on the scoped stack, whose default limit
is 16 MB — raising `xla_tpu_scoped_vmem_limit_kib` per-computation lifts it.
(The global XLA_FLAGS route doesn't work here: client-side flag parsing in a
CPU-only jaxlib rejects TPU-backend flags, and env vars are frozen before
user code runs anyway.)

The limit is an upper bound, not a demand — programs that don't use the
kernel are unaffected.

The backend probe is deliberately LAZY (first jitted call, not import):
`jax.default_backend()` initializes and pins the platform, so probing at
import time would freeze the TPU-or-not decision before the embedder had a
chance to call `jax.config.update("jax_platforms", ...)` — and a process
whose platform is configured after import would get options for the wrong
backend (the CPU compiler rejects TPU options outright; a TPU process
without the vmem limit fails to compile the megakernel inside scans).
"""

from __future__ import annotations

import functools

_UNSET = object()
_cached = _UNSET


def decode_compiler_options():
    """Compiler options for the decode-path programs, probed on first use."""
    global _cached
    if _cached is _UNSET:
        import jax

        _cached = ({"xla_tpu_scoped_vmem_limit_kib": "110592"}
                   if jax.default_backend() == "tpu" else None)
    return _cached


def decode_jit(**jit_kwargs):
    """`jax.jit` with `decode_compiler_options()`, both applied lazily on
    the first call so importing this package never initializes a backend."""

    def wrap(fn):
        jitted = None

        @functools.wraps(fn)
        def call(*args, **kwargs):
            nonlocal jitted
            if jitted is None:
                import jax

                jitted = jax.jit(
                    fn, compiler_options=decode_compiler_options(),
                    **jit_kwargs)
            return jitted(*args, **kwargs)

        return call

    return wrap
