"""Continuous-batching serving benchmark: staggered requests through the
slot engine at 1.7B; reports aggregate realtime factor and per-request frame
throughput.

Prints JSON: {"serving_rtf", "frames_per_s", "requests", "slots"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params

    cfg = TALKER_1B7
    dtype = jnp.bfloat16
    slots = int(os.environ.get("BENCH_SLOTS", "8"))
    n_requests = int(os.environ.get("BENCH_REQUESTS", "16"))
    frames_per_req = int(os.environ.get("BENCH_FRAMES", "50"))
    L = 64

    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    quant = os.environ.get("BENCH_QUANT", "")
    if quant == "int8":
        from qwen3_tts_tpu.weights import quantize_talker_params

        params = quantize_talker_params(params)
    fused = os.environ.get("BENCH_FUSED", "1" if quant == "int8" else "0") == "1"
    # serve step through the whole-step talker megakernel (int8-only; the
    # engine runs a fused-layout KV cache; A/B lever vs the XLA serve step)
    fused_step = os.environ.get(
        "BENCH_FUSED_STEP",
        "1" if quant == "int8"
        and jax.devices()[0].platform == "tpu" else "0") == "1"
    gen_cfg = GenerationConfig(
        max_new_tokens=frames_per_req + 1,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
        fused_subtalker=fused, fused_talker_step=fused_step)

    ticks = int(os.environ.get("BENCH_TICKS", "8"))
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=slots,
                                      max_len=L + frames_per_req + 8,
                                      max_trailing=32, dtype=dtype,
                                      ticks_per_sync=ticks,
                                      prefill_bucket=L)

    rng = jax.random.PRNGKey(1)

    def make_req(i):
        return Request(
            request_id=i,
            inputs_embeds=(0.02 * jax.random.normal(
                jax.random.fold_in(rng, i), (1, L, cfg.hidden_size))).astype(dtype),
            attn_mask=jnp.ones((1, L), jnp.int32),
            trailing=jnp.zeros((1, 16, cfg.hidden_size), dtype),
            trailing_len=16,
            tts_pad=jnp.zeros((1, 1, cfg.hidden_size), dtype),
            max_frames=frames_per_req)

    # warmup: compile/fetch staging (full Nb bucket), serve chunks and the
    # drain-tail tick buckets by running a full slot count end-to-end
    for i in range(slots):
        engine.submit(make_req(10_000 + i))
    engine.run_until_drained()

    for i in range(n_requests):
        engine.submit(make_req(i))
    t0 = time.time()
    completions = engine.run_until_drained()
    wall = time.time() - t0

    frames = sum(c.codes.shape[0] for c in completions)
    audio_s = frames * 0.08
    print(json.dumps({
        "serving_rtf": round(audio_s / wall, 2),
        "frames_per_s": round(frames / wall, 1),
        "requests": len(completions),
        "slots": slots,
        "ticks_per_sync": ticks,
        "quant": quant or "bf16",
        "fused_step": fused_step,
    }))


if __name__ == "__main__":
    main()
