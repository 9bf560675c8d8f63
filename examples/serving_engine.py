"""Continuous-batching serving example (a layer the reference does not
have): a fixed pool of slots shares one KV cache; requests prefill into a
staging pool and install into freed slots mid-chunk, all on device.

Runs with random weights in-image; with a real checkpoint, build prompts via
`runtime.prompts.build_prompt` instead of the random embeddings below.
Multi-chip: pass a mesh (`parallel.mesh.make_mesh`) plus
`shard_talker_params`-placed params to spread slots over the dp axis.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                Request)
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.utils.metrics import global_metrics
    from qwen3_tts_tpu.utils.testing import TALKER_0B6, random_talker_params

    cfg = TALKER_0B6
    dtype = jnp.bfloat16
    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    gen_cfg = GenerationConfig(
        max_new_tokens=33,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9))

    L = 32
    engine = ContinuousBatchingEngine(params, cfg, gen_cfg, num_slots=4,
                                      max_len=L + 40, max_trailing=8,
                                      dtype=dtype, ticks_per_sync=16,
                                      prefill_bucket=L)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(8):
        engine.submit(Request(
            request_id=i,
            inputs_embeds=(0.02 * jax.random.normal(
                jax.random.fold_in(rng, i), (1, L, cfg.hidden_size))).astype(dtype),
            attn_mask=jnp.ones((1, L), jnp.int32),
            trailing=jnp.zeros((1, 8, cfg.hidden_size), dtype),
            trailing_len=8,
            tts_pad=jnp.zeros((1, 1, cfg.hidden_size), dtype),
            max_frames=32))
    for c in engine.run_until_drained():
        print(f"request {c.request_id}: {c.codes.shape[0]} frames "
              f"({c.codes.shape[0] * 0.08:.2f} s audio)")
    wall = time.time() - t0
    print(f"wall {wall:.2f} s; metrics:")
    global_metrics().emit()


if __name__ == "__main__":
    main()
