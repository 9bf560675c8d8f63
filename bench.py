"""Benchmark: batched talker decode real-time factor on one chip.

Runs the full flagship-scale (1.7B) generation loop — prefill + per-frame
talker decode step + nested 15-step sub-talker + sampling — with random
weights, and reports audio-seconds-generated per wall-second (RTF) at the
bench batch size.  One frame = 80 ms of audio (12.5 Hz codec,
configuration...v2.py:148-151).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 10 — the BASELINE.json target of >=10x realtime
batched synthesis per v5e chip (the reference publishes no RTF numbers).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# reuse compiled programs across runs (first compile of the generation
# program takes minutes on remote-compile TPU services)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig, generate_frames
    from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params

    cfg = TALKER_1B7
    B = int(os.environ.get("BENCH_BATCH", "16"))
    M = int(os.environ.get("BENCH_FRAMES", "64"))  # max_new_tokens
    L = 64                                          # prefill length
    dtype = jnp.bfloat16

    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    # default to the production serving configuration: weight-only int8
    # (quantize="int8" in the public API); BENCH_QUANT=bf16 for the
    # unquantized path.
    quant = os.environ.get("BENCH_QUANT", "int8")
    if quant == "int8":
        from qwen3_tts_tpu.weights import quantize_talker_params

        params = quantize_talker_params(params)
    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
    )

    rng = jax.random.PRNGKey(1)
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = (0.02 * jax.random.normal(rng, (B, 32, cfg.hidden_size))).astype(dtype)
    pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)

    def run(key):
        return generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                               pad, key)

    # warmup / compile (np.asarray forces D2H; on the axon backend
    # block_until_ready can return before execution completes)
    np.asarray(run(jax.random.PRNGKey(2)).codes)

    t0 = time.time()
    out = run(jax.random.PRNGKey(3))
    lengths = np.asarray(out.lengths)
    np.asarray(out.codes)
    wall = time.time() - t0

    frames = int(lengths.sum())
    audio_seconds = frames * 0.08
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": "talker_decode_rtf_1b7_batch%d%s" % (
            B, "_int8" if quant == "int8" else ""),
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
