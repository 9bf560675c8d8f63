"""Isolate the serve-chunk regression: times per-chunk execution for
(a) the AOT-compiled dynamic-n while_loop program,
(b) the jit-compiled dynamic-n while_loop program,
at n=25 and n=4, on the bench engine shape (1.7B int8, 16 slots).
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

T0 = time.time()


def log(m):
    print(f"[probe +{time.time() - T0:6.1f}s] {m}", flush=True)


cfg = TALKER_1B7
dtype = jnp.bfloat16


@jax.jit
def _fab(key):
    return quantize_talker_params(random_talker_params(cfg, key, dtype=dtype))


params = _fab(jax.random.PRNGKey(0))
log("params")

L = 64
frames = 50
gen_cfg = GenerationConfig(
    max_new_tokens=frames + 1,
    sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                            repetition_penalty=1.05),
    subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
    fused_subtalker=True)

eng = ContinuousBatchingEngine(
    params, cfg, gen_cfg, num_slots=16, max_len=L + frames + 8,
    max_trailing=32, dtype=dtype, ticks_per_sync=25, prefill_bucket=L,
    chunk_ramp=())

rng = jax.random.PRNGKey(7)
pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)


def req(i):
    return Request(
        request_id=i,
        inputs_embeds=(0.02 * jax.random.normal(
            jax.random.fold_in(rng, i),
            (1, L, cfg.hidden_size))).astype(dtype),
        attn_mask=jnp.ones((1, L), jnp.int32),
        trailing=jnp.zeros((1, 16, cfg.hidden_size), dtype),
        trailing_len=16, tts_pad=pad, max_frames=frames)


t0 = time.time()
eng.warmup_serve()
log(f"warmup_serve (AOT) {time.time() - t0:.1f}s, "
    f"buckets={list(eng._chunk_exe)}")
eng.warmup_staging()
log("warmup_staging done")

# fill all slots, then time chunks
for i in range(16):
    eng.submit(req(i))
eng._stage_pending()

import jax.numpy as jnp2

attend = list(eng._chunk_exe)[0]
exe = eng._chunk_exe[attend]


def time_exec(fn, label, reps=10):
    # first call then timed reps, each synced on the aux
    st, aux = fn()
    np.asarray(aux)
    t0 = time.time()
    for _ in range(reps):
        st, aux = fn()
        np.asarray(aux)
    dt = (time.time() - t0) / reps * 1e3
    log(f"{label}: {dt:.1f} ms/chunk")


key = jax.random.PRNGKey(3)

def aot25():
    return exe(eng.params, eng.state, key, jnp.int32(25))

# NB: state donation — keep reassigning
def run_aot(n):
    def f():
        st, aux = exe(eng.params, eng.state, key, jnp.int32(n))
        eng.state = st
        return st, aux
    return f

time_exec(run_aot(25), "AOT n=25")
time_exec(run_aot(4), "AOT n=4")
time_exec(run_aot(1), "AOT n=1")

from qwen3_tts_tpu.runtime.batching import serve_chunk

def run_jit(n):
    def f():
        st, aux = serve_chunk(eng.params, cfg, eng.state,
                              eng._gen_cfg_exec, key, jnp.int32(n), 25,
                              attend_len=attend,
                              installs_per_tick=eng.installs_per_tick)
        eng.state = st
        return st, aux
    return f

t0 = time.time()
st, aux = run_jit(25)()
np.asarray(aux)
log(f"jit first call {time.time() - t0:.1f}s")
time_exec(run_jit(25), "JIT n=25")
time_exec(run_jit(4), "JIT n=4")
