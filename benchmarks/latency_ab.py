"""Multi-tenant first-packet latency harness (bench.py sections f/f2,
standalone and faster to iterate on).

Measures, on the real chip at 1.7B/int8:
  load16   — p50/max first-packet ms with all 16 streaming slots submitted
             at once from idle
  latejoin — p50/max first-packet ms of a fresh stream joining 15 busy
             long-running streams (steady state, mid-chunk)

Env knobs: LAT_WARMUP=0 disables srv.warmup(); LAT_TPS sets ticks_per_sync
(default 25); LAT_CAP sets first_packet_ticks (default 4); LAT_JOINS join
count (default 5).
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

import bench as bench_mod
from qwen3_tts_tpu.config import CodecV2DecoderConfig
from qwen3_tts_tpu.ops.sampling import SamplingParams
from qwen3_tts_tpu.runtime.server import AudioPacket, TTSServer
from qwen3_tts_tpu.utils.testing import (TALKER_1B7, random_talker_params,
                                         random_vocoder_params)
from qwen3_tts_tpu.weights import quantize_talker_params


def log(msg):
    print(f"[lat +{time.time() - T0:6.1f}s] {msg}", flush=True)


T0 = time.time()
cfg = TALKER_1B7
dtype = jnp.bfloat16


@jax.jit
def _fab(key):
    return quantize_talker_params(random_talker_params(cfg, key, dtype=dtype))


params = _fab(jax.random.PRNGKey(0))
dec_cfg = CodecV2DecoderConfig(num_quantizers=cfg.num_code_groups)
dec_params = jax.jit(lambda k: random_vocoder_params(dec_cfg, k))(
    jax.random.PRNGKey(1))
log("params made")

model = bench_mod._build_api_model(cfg, params, dec_cfg, dec_params, "int8")
text = "a serving benchmark sentence of ordinary length"
frames_per = 50
TPS = int(os.environ.get("LAT_TPS", "25"))
CAP = int(os.environ.get("LAT_CAP", "4"))
SLOTS = 16


def make_server(max_new_tokens=frames_per + 1):
    srv = TTSServer(model, num_slots=SLOTS, max_new_tokens=max_new_tokens,
                    prefill_bucket=64, max_trailing=64,
                    ticks_per_sync=TPS, first_packet_ticks=CAP, seed=0,
                    output_dtype="int16")
    if os.environ.get("LAT_WARMUP", "1") == "1":
        t0 = time.time()
        srv.warmup(verbose=False)
        log(f"warmup() took {time.time() - t0:.1f}s "
            f"({len(srv.engine._chunk_exe)} chunk exes)")
    return srv


# ---- load16 ----
srv = make_server()
log("load16 traffic warm")
for i in range(SLOTS):
    srv.submit_custom_voice(f"warm{i}", text=text, speaker="vivian",
                            language="english", stream=True)
srv.run_until_drained()
log("load16 measured")
t_submit = {}
first_ms = {}
for i in range(SLOTS):
    t_submit[i] = time.time()
    srv.submit_custom_voice(i, text=text, speaker="vivian",
                            language="english", stream=True)
for _ in range(100000):
    for ev in srv.step():
        if (isinstance(ev, AudioPacket) and ev.request_id not in first_ms
                and ev.frame_count > 0):
            first_ms[ev.request_id] = (
                time.time() - t_submit[ev.request_id]) * 1e3
    if not srv.busy:
        break
vals = sorted(first_ms.values())
log(f"load16 p50={np.median(vals):.1f} max={max(vals):.1f} "
    f"all={[round(v) for v in vals]}")

# ---- latejoin ----
long_frames = 12 * frames_per
srv = make_server(max_new_tokens=long_frames + 1)
bg_next = SLOTS - 1


def bg_submit(i):
    srv.submit_custom_voice(f"bg{i}", text=text, speaker="vivian",
                            language="english", stream=True,
                            max_frames=long_frames)


def bg_refill(events):
    global bg_next
    for ev in events:
        if (isinstance(ev, AudioPacket) and ev.final
                and str(ev.request_id).startswith("bg")):
            bg_submit(bg_next)
            bg_next += 1
    return events


for i in range(SLOTS - 1):
    bg_submit(i)
seen_first = set()
for _ in range(100000):
    for ev in bg_refill(srv.step()):
        if isinstance(ev, AudioPacket) and ev.frame_count > 0:
            seen_first.add(ev.request_id)
    if len(seen_first) >= SLOTS - 1:
        break
log("latejoin steady state reached")
srv.submit_custom_voice("joinwarm", text=text, speaker="vivian",
                        language="english", stream=True, max_frames=25)
for _ in range(100000):
    if [ev for ev in bg_refill(srv.step())
            if isinstance(ev, AudioPacket) and ev.request_id == "joinwarm"
            and ev.frame_count > 0]:
        break
join_ms = []
for k in range(int(os.environ.get("LAT_JOINS", "5"))):
    t0 = time.time()
    srv.submit_custom_voice(f"join{k}", text=text, speaker="vivian",
                            language="english", stream=True, max_frames=25)
    for _ in range(100000):
        if [ev for ev in bg_refill(srv.step())
                if isinstance(ev, AudioPacket)
                and ev.request_id == f"join{k}" and ev.frame_count > 0]:
            join_ms.append((time.time() - t0) * 1e3)
            break
    else:
        raise RuntimeError(f"late joiner {k} never produced audio")
    # space the joins out so they land at uncorrelated chunk phases
    for _ in range(3):
        bg_refill(srv.step())
for i in range(bg_next):
    srv.cancel(f"bg{i}")
srv.run_until_drained()
log(f"latejoin p50={np.median(join_ms):.1f} max={max(join_ms):.1f} "
    f"all={[round(v) for v in join_ms]}")
