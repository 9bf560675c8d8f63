"""A/B: bf16 vs int8 KV cache decode cost at long context.

Times `decode_chunk` ms/frame at the production long-generation buffer
(S = 64 prefill + 2048 frames + 1 = 2113 slots, the size VERDICT r1 item 7
names) across attention buckets.  The attended window is what decode
attention streams from HBM every frame, so the int8 cache should approach a
2x reduction of that term as the bucket grows.

Run on the TPU chip:  python benchmarks/kv_cache_ab.py
Env: AB_BATCH (16), AB_TICKS (32), AB_QUANT=both|bf16|int8, AB_WEIGHTS
(int8|bf16 weight quantization; int8 default, matching production serving).
"""

import dataclasses
import json
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

from qwen3_tts_tpu.ops.sampling import SamplingParams
from qwen3_tts_tpu.runtime.generate import (GenerationConfig, decode_chunk,
                                            init_decode_state)
from qwen3_tts_tpu.utils.cache import enable_persistent_cache
from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params
from qwen3_tts_tpu.weights import quantize_talker_params

enable_persistent_cache()


def _sync(tree):
    for x in jax.tree_util.tree_leaves(tree):
        np.asarray(x)


def measure(params, cfg, gen_cfg, B, L, S, ticks, attend):
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = (0.02 * jax.random.normal(rng, (B, 16, cfg.hidden_size))).astype(dtype)
    pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)

    state, const = init_decode_state(params, cfg, gen_cfg, embeds, mask,
                                     trailing, pad, jax.random.PRNGKey(1), S)
    # warmup/compile
    state2, frames, active = decode_chunk(params, cfg, gen_cfg, const, state,
                                          ticks, attend_len=attend)
    _sync(frames)
    t0 = time.time()
    state2, frames, active = decode_chunk(params, cfg, gen_cfg, const, state2,
                                          ticks, attend_len=attend)
    _sync(frames)
    wall = time.time() - t0
    return wall * 1000.0 / ticks


def main():
    B = int(os.environ.get("AB_BATCH", "16"))
    ticks = int(os.environ.get("AB_TICKS", "32"))
    which = os.environ.get("AB_QUANT", "both")
    cfg = TALKER_1B7
    L, M = 64, 2048
    S = L + M + 1  # 2113

    params = random_talker_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.bfloat16)
    if os.environ.get("AB_WEIGHTS", "int8") == "int8":
        params = quantize_talker_params(params)
    base = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
        fused_subtalker=os.environ.get("AB_FUSED", "0") == "1",
    )

    results = {}
    for attend in (512, 1024, 2048):
        for mode in ("bf16", "int8"):
            if which != "both" and mode != which:
                continue
            gc = dataclasses.replace(base, kv_quant=(mode == "int8"))
            ms = measure(params, cfg, gc, B, L, S, ticks, attend)
            results[f"attend{attend}_{mode}"] = round(ms, 2)
            print(f"attend={attend:5d} kv={mode}: {ms:.2f} ms/frame",
                  file=sys.stderr)

    print(json.dumps({"metric": "kv_cache_ab_ms_per_frame", "batch": B,
                      "buffer_slots": S, "results": results}))


if __name__ == "__main__":
    main()
