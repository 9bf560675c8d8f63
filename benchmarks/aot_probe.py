"""Probe: does AOT lower().compile() absorb the per-program first-use cost
that the jit path pays on this backend (remote compile + executable load)?

Run on the TPU.  Prints timings for:
  jit path:   first call (compile+load+run), second call (run)
  aot path:   lower(), compile(), first exe call, second exe call
for a mid-size matmul chain at a shape not seen before (distinct per run via
a size nudge), plus whether a background-thread compile works.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def big_fn(x, w):
    def body(h, wi):
        h = jnp.tanh(h @ wi)
        return h, None
    h, _ = jax.lax.scan(body, x, w)
    return h


def make_args(n):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (256, n), jnp.bfloat16)
    w = jax.random.normal(k, (24, n, n), jnp.bfloat16)
    return x, w


def t(label, fn):
    t0 = time.time()
    out = fn()
    if out is not None:
        jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"{label}: {dt*1e3:.0f} ms", flush=True)
    return out


# distinct shapes per mode so neither benefits from the other's program
x1, w1 = make_args(1024 + 128 * int(os.environ.get("PROBE_NUDGE", "0")))
x2, w2 = make_args(1152 + 128 * int(os.environ.get("PROBE_NUDGE", "0")))

print("== jit path ==", flush=True)
jf = jax.jit(big_fn)
t("jit first call", lambda: jf(x1, w1))
t("jit second call", lambda: jf(x1, w1))

print("== aot path ==", flush=True)
jf2 = jax.jit(big_fn, donate_argnums=(0,))
lowered = None
lowered = t("lower", lambda: jf2.lower(
    jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    jax.ShapeDtypeStruct(w2.shape, w2.dtype)) or 1) and jf2.lower(
    jax.ShapeDtypeStruct(x2.shape, x2.dtype),
    jax.ShapeDtypeStruct(w2.shape, w2.dtype))
exe = [None]
t("compile", lambda: exe.__setitem__(0, lowered.compile()) or 1)
t("aot first exe call", lambda: exe[0](x2, w2))
x2, w2 = make_args(1152 + 128 * int(os.environ.get("PROBE_NUDGE", "0")))
t("aot second exe call", lambda: exe[0](x2, w2))

print("== background-thread compile ==", flush=True)
x3, w3 = make_args(1280 + 128 * int(os.environ.get("PROBE_NUDGE", "0")))
jf3 = jax.jit(big_fn)
done = {}


def bg():
    lo = jf3.lower(jax.ShapeDtypeStruct(x3.shape, x3.dtype),
                   jax.ShapeDtypeStruct(w3.shape, w3.dtype))
    done["exe"] = lo.compile()


t0 = time.time()
th = threading.Thread(target=bg)
th.start()
# main thread keeps executing existing programs while bg compiles
while th.is_alive():
    jax.block_until_ready(jf(x1, w1))
th.join()
print(f"bg compile total {time.time()-t0:.1f}s (main thread kept running)",
      flush=True)
t("bg-compiled first exe call", lambda: done["exe"](x3, w3))
