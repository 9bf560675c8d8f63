"""First-packet latency benchmark: streaming session at 1.7B talker +
full-size 12Hz vocoder, batch 1.

Prints JSON: {"p50_first_packet_ms", "packets", "rtf"}.
Target (BASELINE.json): < 100 ms p50 first packet.
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
    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)
    from qwen3_tts_tpu.utils.testing import (TALKER_1B7, random_talker_params,
                                              random_vocoder_params)

    cfg = TALKER_1B7
    dtype = jnp.bfloat16
    B = int(os.environ.get("BENCH_BATCH", "1"))
    M = int(os.environ.get("BENCH_FRAMES", "64"))

    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if os.environ.get("BENCH_QUANT", "") == "int8":
        from qwen3_tts_tpu.weights import quantize_talker_params

        params = quantize_talker_params(params)
    dec_cfg = CodecV2DecoderConfig(num_quantizers=cfg.num_code_groups)
    dec_params = random_vocoder_params(dec_cfg, jax.random.PRNGKey(1), jnp.float32)

    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
    )
    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig())

    rng = jax.random.PRNGKey(2)
    L = 48
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = (0.02 * jax.random.normal(rng, (B, 24, cfg.hidden_size))).astype(dtype)
    pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)

    latencies = []
    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    wall0 = audio0 = None
    for i in range(n_iters + 1):  # iter 0 = compile warmup
        t0 = time.time()
        wavs, first = session.synthesize(embeds, mask, trailing, pad,
                                         jax.random.PRNGKey(3 + i))
        wall = time.time() - t0
        if i == 0:
            continue
        latencies.append(first * 1000)
        wall0, audio0 = wall, sum(w.shape[0] for w in wavs) / 24000.0

    print(json.dumps({
        "p50_first_packet_ms": round(float(np.median(latencies)), 1),
        "packets_rtf": round(audio0 / wall0, 2),
        "latencies_ms": [round(l, 1) for l in latencies],
    }))


if __name__ == "__main__":
    main()
