"""A/B: fused talker decode-step Pallas megakernel vs the XLA int8 path.

Run on real TPU (one process at a time on this image):

    python benchmarks/talker_step_ab.py [B] [ATTEND] [K]

Both paths attend the same window (ATTEND slots, a multiple of 128 —
matching the engine's attend buckets) so weight+KV traffic is identical;
the delta is pure schedule/overlap quality.  Prints ms/step for each.
"""

import os
import sys
import time

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

from qwen3_tts_tpu.models.talker import KVCache, talker_decode_step
from qwen3_tts_tpu.ops.pallas.talker_step import (talker_step_fused_cache,
                                                  transpose_cache_in)
from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params
from qwen3_tts_tpu.weights import quantize_talker_params


def _sync(tree):
    for x in jax.tree_util.tree_leaves(tree):
        np.asarray(x)


def timeit(name, fn, *args, reps=3):
    _sync(fn(*args))            # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _sync(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name:12s} {best / K * 1e3:7.3f} ms/step "
          f"({best * 1e3:.1f} ms / {K} steps)", flush=True)
    return best / K


B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
S = int(sys.argv[2]) if len(sys.argv) > 2 else 256   # attended window
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64    # steps per program
cfg = TALKER_1B7
dims = (cfg.num_hidden_layers, B, S, cfg.num_key_value_heads,
        cfg.resolved_head_dim)

print(f"platform={jax.devices()[0].platform} B={B} S={S} K={K}", flush=True)

params = jax.jit(lambda key: quantize_talker_params(
    random_talker_params(cfg, key, dtype=jnp.bfloat16)))(jax.random.PRNGKey(0))

key = jax.random.PRNGKey(1)
k0 = (0.5 * jax.random.normal(key, dims)).astype(jnp.bfloat16)
v0 = (0.5 * jax.random.normal(key, dims)).astype(jnp.bfloat16)
embed = (0.3 * jax.random.normal(key, (B, 1, cfg.hidden_size))
         ).astype(jnp.bfloat16)
kv_valid = jnp.ones((B, S), bool)
ci = S // 2


@jax.jit
def run_xla(params, k, v, embed):
    cache = KVCache(k=k, v=v)

    def step(carry, _):
        cache, h = carry
        logits, h, cache = talker_decode_step(
            params, cfg, h, jnp.full((B,), ci, jnp.int32), ci, kv_valid,
            cache, attend_len=S)
        return (cache, h), logits[:, 0]

    (cache, h), ls = jax.lax.scan(step, (cache, embed), None, length=K)
    return ls[-1], h


def make_fused(impl, kv_chunk=0, mlp_chunks=0):
    @jax.jit
    def run_fused(params, k, v, embed):
        kf, vf = transpose_cache_in(k), transpose_cache_in(v)

        def step(carry, _):
            kf, vf, h = carry
            logits, h, kf, vf = talker_step_fused_cache(
                params, cfg, h, jnp.full((B,), ci, jnp.int32), ci, kv_valid,
                kf, vf, attend_len=S, attn_impl=impl,
                kv_chunk=kv_chunk, mlp_chunks=mlp_chunks)
            return (kf, vf, h), logits[:, 0]

        (kf, vf, h), ls = jax.lax.scan(step, (kf, vf, embed), None, length=K)
        return ls[-1], h
    return run_fused


t_x = timeit("xla", run_xla, params, k0, v0, embed)
results = {"xla": t_x}
if os.environ.get("AB_SWEEP", "0") == "1":
    # grid-step-count sweep: fewer, larger phases amortize per-grid-step
    # overhead; larger blocks cost VMEM (Mosaic rejects over-budget combos)
    kv_opts = [c for c in (128, 256, 512) if S % c == 0 or c == 128]
    mlp_opts = (6, 4, 3, 2)
    combos = [("mxu", kc, mc) for kc in kv_opts for mc in mlp_opts]
else:
    combos = [("vpu", 0, 0), ("mxu", 0, 0)]
for impl, kc, mc in combos:
    name = f"{impl}-kc{kc or 'd'}-mc{mc or 'd'}"
    try:
        results[name] = timeit(name, make_fused(impl, kc, mc),
                               params, k0, v0, embed)
    except Exception as e:  # noqa: BLE001 — Mosaic may reject an impl
        print(f"{name} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
best = min(results, key=results.get)
for name, t in sorted(results.items(), key=lambda kv: kv[1]):
    print(f"{name:16s} {t * 1e3:7.3f} ms/step  ({t / t_x:.3f}x xla)",
          flush=True)
print(f"best: {best}", flush=True)
