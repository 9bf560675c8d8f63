"""Slot-count scaling probe (VERDICT r3 item 6): engine-only serving rate
at slots ∈ {32, 48, 64} in ONE window, fused serve step on/off selectable.

Round-3 finding: 48 slots ran 0.64x the 32-slot rate (non-pow2 matmul
tiling) and the 64-slot XLA program failed this image's remote compiler
(HTTP 500).  The fused serve step replaces those XLA matmuls with the
megakernel's own W8A8 tiling, so both regimes deserve a re-measure.

    SLOTS="32,48,64" FUSED_STEP=1 python benchmarks/slot_scaling.py
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
from qwen3_tts_tpu.runtime.batching import ContinuousBatchingEngine, Request
from qwen3_tts_tpu.runtime.generate import GenerationConfig
from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params
from qwen3_tts_tpu.weights import quantize_talker_params

cfg = TALKER_1B7
dtype = jnp.bfloat16
L = 64
frames_per = 50
fused_step = os.environ.get("FUSED_STEP", "1") == "1"
slot_list = [int(s) for s in os.environ.get("SLOTS", "32,48,64").split(",")]
print(f"platform={jax.devices()[0].platform} fused_step={fused_step} "
      f"slots={slot_list}", flush=True)

params = jax.jit(lambda key: quantize_talker_params(
    random_talker_params(cfg, key, dtype=dtype)))(jax.random.PRNGKey(0))

gen_cfg = GenerationConfig(
    max_new_tokens=frames_per + 1,
    sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                            repetition_penalty=1.05),
    subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
    fused_subtalker=True, fused_talker_step=fused_step)

rng = jax.random.PRNGKey(1)


def make_req(i):
    return Request(
        request_id=i,
        inputs_embeds=(0.02 * jax.random.normal(
            jax.random.fold_in(rng, i), (1, L, cfg.hidden_size))
        ).astype(dtype),
        attn_mask=jnp.ones((1, L), jnp.int32),
        trailing=jnp.zeros((1, 16, cfg.hidden_size), dtype),
        trailing_len=16,
        tts_pad=jnp.zeros((1, 1, cfg.hidden_size), dtype),
        max_frames=frames_per)


results = {}
for slots in slot_list:
    try:
        engine = ContinuousBatchingEngine(
            params, cfg, gen_cfg, num_slots=slots,
            max_len=L + frames_per + 8, max_trailing=32, dtype=dtype,
            ticks_per_sync=50, prefill_bucket=L, chunk_ramp=())
        n_req = 2 * slots
        t0 = time.time()
        for i in range(slots):
            engine.submit(make_req(10_000 + i))
        engine.run_until_drained()
        print(f"slots={slots}: warmup {time.time() - t0:.1f}s", flush=True)
        best = 0.0
        for rep in range(2):
            for i in range(n_req):
                engine.submit(make_req(1000 * rep + i))
            t0 = time.time()
            done = engine.run_until_drained()
            wall = time.time() - t0
            rtf = sum(c.codes.shape[0] for c in done) * 0.08 / wall
            best = max(best, rtf)
        results[slots] = best
        print(f"slots={slots}: engine_rtf={best:.1f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"slots={slots} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

print("\n== ranked ==", flush=True)
base = results.get(32)
for slots, rtf in sorted(results.items(), key=lambda kv: -kv[1]):
    rel = f"  ({rtf / base:.2f}x of 32)" if base else ""
    print(f"slots={slots:3d}  rtf={rtf:7.1f}{rel}", flush=True)
