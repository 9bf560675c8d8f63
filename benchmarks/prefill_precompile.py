"""Bake bench.py's section-(h) prefill programs into .jax_cache off the
bench clock.

Replicates bench.py's exact program construction (same fabrication, same
`prefill_run` body and name, same shapes) so the persistent-cache keys
match; a later bench run then loads the executables in ~20 s instead of
paying the >25 min Mosaic compile of the flash kernel inside the 28-layer
program — which this image's remote-compile transport intermittently drops
partway (broken pipe ~30 min in at T=4096).

Env: PRE_T (default 2048), PRE_B (default 4), PRE_DENSE=0 to skip the
dense variant.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from qwen3_tts_tpu.models.talker import KVCache, StackDims, talker_prefill
from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params
from qwen3_tts_tpu.weights import quantize_talker_params

T0 = time.time()


def log(msg):
    print(f"[pre +{time.time() - T0:6.1f}s] {msg}", flush=True)


cfg = TALKER_1B7
dtype = jnp.bfloat16


@jax.jit
def _fabricate(key):
    p = random_talker_params(cfg, key, dtype=dtype)
    return quantize_talker_params(p)


params = _fabricate(jax.random.PRNGKey(0))
log("params made")

Bp = int(os.environ.get("PRE_B", "4"))
Tp = int(os.environ.get("PRE_T", "2048"))
dims = StackDims.from_talker(cfg)


@partial(jax.jit, static_argnames=("allow_flash",))
def prefill_run(e, m, allow_flash=True):
    cache = KVCache.zeros(cfg.num_hidden_layers, Bp, Tp + 8,
                          dims.kv_heads, dims.head_dim, dtype=dtype)
    logits, _, _ = talker_prefill(params, cfg, e, m, cache,
                                  allow_flash=allow_flash)
    return jnp.sum(logits.astype(jnp.float32))


rng = jax.random.PRNGKey(1)
p_embeds = (0.02 * jax.random.normal(
    rng, (Bp, Tp, cfg.hidden_size))).astype(dtype)
p_mask = jnp.ones((Bp, Tp), jnp.int32)

# stage 1: the standalone flash-vs-dense attention pair (bench.py's
# fallback prefill row) — ~4-5 min, far more likely to survive the flaky
# remote transport than the 28-layer program below; its marker lands first
from bench import prefill_kernel_marker, prefill_kernel_pair  # noqa: E402

if os.environ.get("PRE_KERNEL", "1") == "1":
    kmarker = prefill_kernel_marker(cfg, Bp, Tp)
    if not os.path.exists(kmarker):
        log(f"compiling standalone flash/dense attention pair T={Tp}")
        flash_fn, dense_fn = prefill_kernel_pair(cfg, Bp, Tp)
        kq = (0.02 * jax.random.normal(
            rng, (Bp, Tp, cfg.num_attention_heads,
                  cfg.resolved_head_dim))).astype(dtype)
        kk = (0.02 * jax.random.normal(
            jax.random.PRNGKey(21),
            (Bp, Tp, cfg.num_key_value_heads,
             cfg.resolved_head_dim))).astype(dtype)
        np.asarray(flash_fn(kq, kk, kk))
        np.asarray(dense_fn(kq, kk, kk))
        with open(kmarker, "w") as f:
            f.write('{"by": "prefill_precompile"}')
        log(f"kernel pair compiled; marker written: {kmarker}")

log(f"compiling flash prefill B={Bp} T={Tp}")
np.asarray(prefill_run(p_embeds, p_mask))
log("flash compiled + ran")
if os.environ.get("PRE_DENSE", "1") == "1":
    log("compiling dense prefill")
    np.asarray(prefill_run(p_embeds, p_mask, allow_flash=False))
    log("dense compiled + ran")

# record cache warmth: bench.py's prefill section only runs when this
# marker exists (a cold Mosaic compile of the flash program killed round
# 4's artifact at the driver's time budget)
from bench import prefill_warm_marker  # noqa: E402

marker = prefill_warm_marker(cfg, "int8", Bp, Tp)
with open(marker, "w") as f:
    import json

    f.write(json.dumps({"at": time.time(), "by": "prefill_precompile"}))
log(f"marker written: {marker}")
log("DONE")
