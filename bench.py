"""Driver benchmark: flagship (1.7B, int8) synthesis performance on one chip.

Measures all three BASELINE.md targets (random weights — no released
checkpoints exist in-image; the compute graph is the production one):

  a) talker_decode_rtf   — batched talker decode loop only (prefill + per-
     frame talker step + nested 15-step sub-talker + sampling), B=16.
  b) e2e_rtf (HEADLINE)  — (a) plus the full-size 12Hz vocoder decoding the
     generated codes to waveform, B=16.  One frame = 80 ms of audio
     (12.5 Hz codec, configuration...v2.py:148-151).  The waveform ships
     to the host as int16 PCM (converted on device); extra.e2e_compute_rtf
     reports the same run synced on a scalar checksum, isolating chip
     throughput from this environment's ~25 MB/s device tunnel.
  c) first_packet_p50_ms — p50 wall time to the first audio packet of a
     batch-1 StreamingSession (talker warmup chunk + first vocoder chunk),
     the README.md:54 "~97 ms" dual-track claim.
  d) serving_rtf — the continuous-batching engine end to end (staggered
     admission, slot reuse, pipelined chunk syncs) at 16 slots / 32
     requests x 50 frames.  BENCH_SERVING=0 skips it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Headline `vs_baseline` is e2e_rtf / 10 — the BASELINE.json target of >=10x
realtime batched synthesis per v5e chip (the reference publishes no RTF
numbers).  `extra` carries (a) and (c); first_packet vs_baseline is
100 ms / p50 (>1 = better than target).
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

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def _sync(tree):
    for x in jax.tree_util.tree_leaves(tree):
        np.asarray(x)  # D2H forces completion; block_until_ready is
        # unreliable on the axon backend


_T0 = time.time()


def _mark(label):
    # section timestamps on stderr (BENCH_TRACE=0 silences); the JSON line on
    # stdout stays the single driver-parsed artifact
    if os.environ.get("BENCH_TRACE", "1") == "1":
        print(f"[bench +{time.time() - _T0:7.1f}s] {label}", file=sys.stderr,
              flush=True)


def main():
    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.models.codec12.decoder import decode_frames
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig, generate_frames
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)
    from qwen3_tts_tpu.utils.testing import (TALKER_1B7, random_talker_params,
                                             random_vocoder_params)
    from qwen3_tts_tpu.weights import quantize_talker_params

    cfg = TALKER_1B7
    if os.environ.get("BENCH_MODEL", "1b7") == "0b6":
        from qwen3_tts_tpu.utils.testing import TALKER_0B6

        cfg = TALKER_0B6
    # B=32 default: decode is weight-read-bound, so doubling the batch from
    # 16 lifted talker RTF 220 -> 337x and compute e2e 165 -> 231x (measured
    # same-window); B=64 currently fails remote compile (HTTP 500)
    B = int(os.environ.get("BENCH_BATCH", "32"))
    M = int(os.environ.get("BENCH_FRAMES", "64"))  # max_new_tokens
    L = 64                                          # prefill length
    dtype = jnp.bfloat16

    _mark("start: make params")
    # one jitted program for the whole fabrication: eager per-op dispatch on
    # the tunneled axon backend costs ~1s/op (~220s for the 1.7B tree);
    # the fused program executes in ~9s once its compile is cached
    quant = os.environ.get("BENCH_QUANT", "int8")

    @jax.jit
    def _fabricate(key):
        p = random_talker_params(cfg, key, dtype=dtype)
        return quantize_talker_params(p) if quant == "int8" else p

    params = _fabricate(jax.random.PRNGKey(0))
    fused = os.environ.get("BENCH_FUSED", "1" if quant == "int8" else "0") == "1"
    # BENCH_KV=int8 additionally quantizes the KV cache (wins at long
    # generations; see docs/DESIGN.md measurements)
    kv_quant = os.environ.get("BENCH_KV", "") in ("1", "int8")
    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
        fused_subtalker=fused,
        kv_quant=kv_quant,
    )
    dec_cfg = CodecV2DecoderConfig(num_quantizers=cfg.num_code_groups)
    dec_params = jax.jit(
        lambda key: random_vocoder_params(dec_cfg, key))(jax.random.PRNGKey(1))

    rng = jax.random.PRNGKey(1)
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = (0.02 * jax.random.normal(rng, (B, 32, cfg.hidden_size))).astype(dtype)
    pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)

    def talker_run(key):
        return generate_frames(params, cfg, gen_cfg, embeds, mask, trailing,
                               pad, key)

    from qwen3_tts_tpu.models.codec12.decoder import chunked_decode, to_pcm16

    # audio ships as int16 PCM (the delivery format; converted on device):
    # this environment's TPU tunnel moves ~25 MB/s, so the fp32 waveform
    # transfer would otherwise dominate the measurement (production hosts
    # move it over PCIe in ~1 ms).
    # full-length fp32 decode is bounded by TOTAL frames (B*M): the
    # activation footprint at B=16 x 512 frames (~16G) OOMs a v5e
    if B * M <= 16 * 300:
        vocode = jax.jit(
            lambda p, codes: to_pcm16(decode_frames(p, dec_cfg, codes)))
    else:
        # long generations vocode in chunks with 25-frame left context (the
        # reference's chunked_decode semantics); bf16 activations and a
        # batch-scaled chunk keep the conv stack inside HBM at B=16
        # (one full-length fp32 program at B=16 x 512 frames needs ~16G)
        chunk = max(50, 1600 // max(1, B))

        def vocode(p, codes):
            return to_pcm16(chunked_decode(p, dec_cfg, codes, chunk_size=chunk,
                                           dtype=jnp.bfloat16))

    # ---- (a) talker-only decode RTF ----
    _mark("talker warmup")
    _sync(talker_run(jax.random.PRNGKey(2)).codes)  # warmup / compile
    _mark("talker measured run")
    t0 = time.time()
    out = talker_run(jax.random.PRNGKey(3))
    lengths = np.asarray(out.lengths)
    _sync(out.codes)
    talker_wall = time.time() - t0
    frames = int(lengths.sum())
    talker_rtf = frames * 0.08 / talker_wall

    # ---- (b) end-to-end RTF: talker + full-size vocoder ----
    codes_bqt = jnp.swapaxes(out.codes, 1, 2)  # (B, Q, T)
    _mark("vocoder warmup")
    _sync(vocode(dec_params, codes_bqt))       # warmup / compile
    _mark("e2e measured run")
    t0 = time.time()
    out = talker_run(jax.random.PRNGKey(4))
    lengths = np.asarray(out.lengths)
    wav = vocode(dec_params, jnp.swapaxes(out.codes, 1, 2))
    _sync(wav)
    e2e_wall = time.time() - t0
    frames = int(lengths.sum())
    e2e_rtf = frames * 0.08 / e2e_wall

    # compute-only variant: sync a scalar checksum instead of the waveform,
    # isolating chip throughput from this environment's ~25 MB/s tunnel
    def checksum_run(key):
        out = talker_run(key)
        lengths = np.asarray(out.lengths)
        chk = jnp.sum(vocode(dec_params,
                             jnp.swapaxes(out.codes, 1, 2)).astype(jnp.float32))
        _sync(chk)
        return int(lengths.sum())

    _mark("checksum warmup")
    checksum_run(jax.random.PRNGKey(5))  # warm the checksum/astype programs
    _mark("checksum measured run")
    t0 = time.time()
    frames_c = checksum_run(jax.random.PRNGKey(6))
    e2e_compute_rtf = frames_c * 0.08 / (time.time() - t0)

    # ---- (c) p50 first-packet latency, streaming session, B=1 ----
    Bs, Ls = 1, 48
    s_embeds = (0.02 * jax.random.normal(rng, (Bs, Ls, cfg.hidden_size))).astype(dtype)
    s_mask = jnp.ones((Bs, Ls), jnp.int32)
    s_trailing = (0.02 * jax.random.normal(rng, (Bs, 24, cfg.hidden_size))).astype(dtype)
    _mark("first-packet session")
    # 16 frames suffice: the metric is the FIRST packet's latency; fewer
    # chunk shapes = fewer one-time program loads on the remote service
    # (measured ~22 s per (chunk, attend) shape pair at 1.7B)
    fp_cfg = GenerationConfig(
        max_new_tokens=min(M, 16), sampling=gen_cfg.sampling,
        subtalker=gen_cfg.subtalker, fused_subtalker=fused,
        kv_quant=kv_quant)
    session = StreamingSession(params, cfg, fp_cfg, dec_params, dec_cfg,
                               StreamingConfig())
    iters = int(os.environ.get("BENCH_FP_ITERS", "3"))
    latencies = []
    for i in range(iters + 1):  # iter 0 = compile warmup
        _, first = session.synthesize(s_embeds, s_mask, s_trailing, pad,
                                      jax.random.PRNGKey(5 + i))
        if i > 0:
            latencies.append(first * 1000.0)
    p50_ms = float(np.median(latencies))

    # ---- (d) serving engine RTF: 16 slots, 32 staggered requests ----
    serving_rtf = None
    if os.environ.get("BENCH_SERVING", "1") == "1":
        from qwen3_tts_tpu.runtime.batching import (ContinuousBatchingEngine,
                                                    Request)

        slots, n_req, frames_per = 16, 32, 50
        eng_cfg = GenerationConfig(
            max_new_tokens=frames_per + 1, sampling=gen_cfg.sampling,
            subtalker=gen_cfg.subtalker, fused_subtalker=fused,
            kv_quant=kv_quant)
        engine = ContinuousBatchingEngine(
            params, cfg, eng_cfg, num_slots=slots,
            max_len=L + frames_per + 8, max_trailing=32, dtype=dtype,
            ticks_per_sync=50, prefill_bucket=L)

        def make_req(i):
            return Request(
                request_id=i,
                inputs_embeds=(0.02 * jax.random.normal(
                    jax.random.fold_in(rng, i),
                    (1, L, cfg.hidden_size))).astype(dtype),
                attn_mask=jnp.ones((1, L), jnp.int32),
                trailing=jnp.zeros((1, 16, cfg.hidden_size), dtype),
                trailing_len=16, tts_pad=pad, max_frames=frames_per)

        _mark("serving warmup")
        for i in range(slots):      # warmup: compile staging/serve shapes
            engine.submit(make_req(10_000 + i))
        engine.run_until_drained()
        _mark("serving measured run")
        for i in range(n_req):
            engine.submit(make_req(i))
        t0 = time.time()
        done = engine.run_until_drained()
        wall = time.time() - t0
        serving_rtf = sum(c.codes.shape[0] for c in done) * 0.08 / wall

    extra = {
        "talker_decode_rtf": round(talker_rtf, 3),
        "e2e_compute_rtf": round(e2e_compute_rtf, 3),
        "first_packet_p50_ms": round(p50_ms, 1),
        "first_packet_latencies_ms": [round(x, 1) for x in latencies],
        "first_packet_vs_baseline": round(100.0 / p50_ms, 3),
    }
    if serving_rtf is not None:
        extra["serving_rtf_16slots"] = round(serving_rtf, 2)
    _mark("done")
    print(json.dumps({
        "metric": "e2e_rtf_%s_batch%d%s" % (
            os.environ.get("BENCH_MODEL", "1b7"), B,
            "_int8" if quant == "int8" else ""),
        "value": round(e2e_rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(e2e_rtf / 10.0, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
