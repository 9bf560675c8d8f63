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
"""

import jax

# TPU-only: the CPU compiler rejects unknown options outright. Evaluated at
# import; the test conftest (and any embedder) must pick the platform first.
DECODE_COMPILER_OPTIONS = (
    {"xla_tpu_scoped_vmem_limit_kib": "110592"}
    if jax.default_backend() == "tpu" else None)
