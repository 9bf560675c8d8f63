"""Long-generation A/B: which (kv_quant, fused_talker_step) config is
fastest at B=8, M=1024?  (VERDICT r3 item 4: the fastest kernel and int8 KV
used to be mutually exclusive; the kernel now has an int8-KV mode, so all
four combos are reachable — measure them in ONE window and let
`_generation_config` / bench defaults follow the winner.)

    python benchmarks/long_gen_ab.py [B] [M]

Prints ms/frame + RTF per config, best first.
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

from qwen3_tts_tpu.ops.sampling import SamplingParams
from qwen3_tts_tpu.runtime.generate import (GenerationConfig,
                                            generate_frames_chunked)
from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params
from qwen3_tts_tpu.weights import quantize_talker_params

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
M = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
L = 64
cfg = TALKER_1B7
dtype = jnp.bfloat16
print(f"platform={jax.devices()[0].platform} B={B} M={M}", flush=True)

params = jax.jit(lambda key: quantize_talker_params(
    random_talker_params(cfg, key, dtype=dtype)))(jax.random.PRNGKey(0))

rng = jax.random.PRNGKey(1)
embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
mask = jnp.ones((B, L), jnp.int32)
trailing = (0.02 * jax.random.normal(rng, (B, 32, cfg.hidden_size))
            ).astype(dtype)
pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)


def run(kv_quant, fused_step, key):
    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
        fused_subtalker=True, kv_quant=kv_quant,
        fused_talker_step=fused_step)
    return generate_frames_chunked(params, cfg, gen_cfg, embeds, mask,
                                   trailing, pad, key)


results = {}
combos = [(False, True), (True, True), (True, False), (False, False)]
only = os.environ.get("AB_ONLY", "")
if only:   # e.g. AB_ONLY=int8kv-fused,bf16kv-fused
    names = set(only.split(","))
    combos = [(kv, fs) for kv, fs in combos
              if f"{'int8' if kv else 'bf16'}kv-{'fused' if fs else 'xla'}"
              in names]
for kv_quant, fused_step in combos:
    name = f"{'int8' if kv_quant else 'bf16'}kv-{'fused' if fused_step else 'xla'}"
    try:
        t0 = time.time()
        out = run(kv_quant, fused_step, jax.random.PRNGKey(7))
        np.asarray(out.codes)
        print(f"{name}: warmup/compile {time.time() - t0:.1f}s", flush=True)
        best = float("inf")
        frames = 0
        for rep in range(int(os.environ.get("AB_REPS", "2"))):
            t0 = time.time()
            out = run(kv_quant, fused_step, jax.random.PRNGKey(8))
            lens = np.asarray(out.lengths)
            np.asarray(out.codes)
            wall = time.time() - t0
            if wall < best:
                best, frames = wall, int(lens.sum())
        results[name] = (best, frames)
        print(f"{name}: {best:.2f}s, {frames} frames, "
              f"rtf={frames * 0.08 / best:.1f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

print("\n== ranked ==", flush=True)
for name, (wall, frames) in sorted(results.items(), key=lambda kv: kv[1][0]):
    print(f"{name:16s} {wall:7.2f}s  rtf={frames * 0.08 / wall:7.1f}",
          flush=True)
