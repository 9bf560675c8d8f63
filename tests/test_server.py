"""Text-in → audio-out serving front end (runtime/server.py): the engine
bridge must reproduce the public-API generation per request, stream
per-request packets, and serve concurrent HTTP requests through one engine."""

import numpy as np
import pytest

from tests._reference import reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def cv_model(tmp_path_factory):
    if not reference_available():
        pytest.skip("reference repo not mounted")
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer

    ckpt = make_tiny_checkpoint(tmp_path_factory.mktemp("srv_ckpt"))
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32)
    model.processor = FakeTokenizer()
    return model


def _server(model, **kw):
    from qwen3_tts_tpu.runtime.server import TTSServer

    kw.setdefault("num_slots", 2)
    kw.setdefault("prefill_bucket", 32)
    kw.setdefault("max_trailing", 16)
    return TTSServer(model, **kw)


def test_server_nonstream_matches_generate(cv_model):
    """Greedy server results must equal the public generate path byte for
    byte (same codes, same decode) for every concurrent request."""
    from qwen3_tts_tpu.runtime.server import AudioResult

    texts = ["first sample text", "the second one", "and request three"]
    srv = _server(cv_model)
    for i, t in enumerate(texts):
        srv.submit_custom_voice(f"req-{i}", text=t, speaker="vivian",
                                language="english")
    events = srv.run_until_drained()
    results = {e.request_id: e for e in events if isinstance(e, AudioResult)}
    assert set(results) == {f"req-{i}" for i in range(len(texts))}
    assert not srv.busy

    # the tiny checkpoint's generation_config is greedy, so the engine path
    # must match the static path exactly (streaming text layout)
    want, sr = cv_model.generate_custom_voice(
        text=texts, speaker="vivian", language="english",
        non_streaming_mode=False)
    for i in range(len(texts)):
        got = results[f"req-{i}"]
        assert got.sample_rate == sr
        np.testing.assert_array_equal(got.wav, want[i])


def test_server_streaming_packets(cv_model):
    """Streaming egress: per-request packets cover every generated frame
    exactly once, the final packet is flagged, and the concatenated audio
    equals the non-streaming result's prefix structure (chunked left-context
    decode vs one-shot decode agree on early samples)."""
    from qwen3_tts_tpu.runtime.server import AudioPacket

    srv = _server(cv_model, packet_frames=2, left_context=4)
    srv.submit_custom_voice("s0", text="stream me now", speaker="vivian",
                            stream=True)
    events = srv.run_until_drained()
    pkts = [e for e in events if isinstance(e, AudioPacket)]
    assert pkts and pkts[-1].final
    assert sum(p.final for p in pkts) == 1
    up = srv.up
    starts = [p.frame_start for p in pkts]
    assert starts == sorted(starts)
    total = 0
    for p in pkts:
        assert p.frame_start == total
        assert p.wav.shape[0] == p.frame_count * up
        assert np.isfinite(p.wav).all()
        total += p.frame_count
    assert total > 0

    # same text non-streaming: frame count must agree
    from qwen3_tts_tpu.runtime.server import AudioResult

    srv2 = _server(cv_model)
    srv2.submit_custom_voice("n0", text="stream me now", speaker="vivian")
    res = [e for e in srv2.run_until_drained()
           if isinstance(e, AudioResult)][0]
    assert res.wav.shape[0] == total * up


def test_server_clone_context_is_per_request(tmp_path):
    """An ICL clone request's packets must be identical whether it runs
    alone or concurrently with an x-vector-only request — per-row vocoder
    context (the engine-server fix for the mixed-batch degradation)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.inference.model import VoiceClonePromptItem
    from qwen3_tts_tpu.runtime.server import AudioPacket
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer
    from tests.test_pipeline_parity import MODEL_TINY

    root = make_tiny_checkpoint(tmp_path / "base_ckpt", model_type="base")
    model = Qwen3TTSModel.from_pretrained(root, dtype=jnp.float32)
    model.processor = FakeTokenizer()

    rng = np.random.default_rng(0)
    hidden = MODEL_TINY["talker_config"]["hidden_size"]
    icl = VoiceClonePromptItem(
        ref_code=rng.integers(0, 30, size=(5, 4)),
        ref_spk_embedding=rng.normal(0, 0.1, size=(hidden,)).astype(np.float32),
        x_vector_only_mode=False, icl_mode=True, ref_text="ref words here")
    xvec = VoiceClonePromptItem(
        ref_code=None,
        ref_spk_embedding=rng.normal(0, 0.1, size=(hidden,)).astype(np.float32),
        x_vector_only_mode=True, icl_mode=False)

    def run(items_by_id):
        # ICL trailing (text + ref text layout) is 30 here: size the engine
        # so the server's trailing-overflow validation admits it
        srv = _server(model, packet_frames=2, left_context=4, max_trailing=32)
        for rid, item in items_by_id.items():
            srv.submit_voice_clone(rid, text="clone me please",
                                   voice_clone_prompt=[item], stream=True)
        evs = srv.run_until_drained()
        out = {}
        for e in evs:
            if isinstance(e, AudioPacket):
                out.setdefault(e.request_id, []).append(e)
        return out

    alone = run({"icl": icl})
    mixed = run({"icl": icl, "xv": xvec})
    assert set(mixed) >= {"icl"}
    a, m = alone["icl"], mixed["icl"]
    assert [p.frame_count for p in a] == [p.frame_count for p in m]
    for pa, pm in zip(a, m):
        np.testing.assert_array_equal(pa.wav, pm.wav)


def test_http_engine_concurrent_requests(cv_model):
    """≥8 concurrent HTTP syntheses through one engine, each byte-correct
    against the public generate path, plus a chunked /tts_stream request."""
    import base64
    import http.client
    import json
    import socket
    import threading
    import urllib.request

    from qwen3_tts_tpu.cli.demo import _HttpDemo
    from qwen3_tts_tpu.runtime.server import ThreadedTTSServer

    srv = ThreadedTTSServer(_server(cv_model, num_slots=4))
    demo = _HttpDemo(cv_model, "custom_voice", {}, engine=srv)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    t = threading.Thread(target=demo.serve, args=("127.0.0.1", port),
                         daemon=True)
    t.start()
    import time as _t

    deadline = _t.time() + 10
    while _t.time() < deadline:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                   timeout=2)
            break
        except Exception:
            _t.sleep(0.2)

    texts = [f"concurrent request number {i}" for i in range(8)]
    results: dict = {}
    errors: list = []

    def post(i):
        try:
            payload = json.dumps({"task": "custom_voice", "text": texts[i],
                                  "speaker": "vivian"}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/tts", data=payload,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[i] = json.loads(r.read())
        except Exception as e:  # pragma: no cover
            errors.append((i, e))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    assert set(results) == set(range(8))

    want, sr = cv_model.generate_custom_voice(
        text=texts, speaker="vivian", non_streaming_mode=False)
    for i in range(8):
        assert results[i]["sample_rate"] == sr
        wav_bytes = base64.b64decode(results[i]["wavs_b64"][0])
        pcm = np.frombuffer(wav_bytes[44:], dtype="<i2")  # skip WAV header
        ref = (np.clip(want[i], -1, 1) * 32767.0).astype("<i2")
        assert pcm.shape[0] == ref.shape[0]
        np.testing.assert_allclose(pcm, ref, atol=1)

    # streaming endpoint: chunked PCM16 arrives and matches length
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    body = json.dumps({"task": "custom_voice", "text": texts[0],
                       "speaker": "vivian"})
    conn.request("POST", "/tts_stream", body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert int(resp.headers["X-Sample-Rate"]) == sr
    pcm = np.frombuffer(resp.read(), dtype="<i2")
    assert pcm.shape[0] == want[0].shape[0]
    srv.close()
    # stop serve_forever so no server thread outlives this test
    demo._server.shutdown()
    t.join(timeout=10)


def test_server_over_dp_mesh_matches_single(cv_model):
    """One TTSServer spanning a dp=2 mesh (engine slot state sharded over
    chips) must produce exactly the single-device server's results."""
    import jax

    from qwen3_tts_tpu.parallel.mesh import make_mesh, shard_talker_params
    from qwen3_tts_tpu.runtime.server import AudioResult

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs 2 devices")

    texts = ["mesh request one", "mesh request two"]

    def run(model, **kw):
        srv = _server(model, num_slots=2, **kw)
        for i, t in enumerate(texts):
            srv.submit_custom_voice(i, text=t, speaker="vivian")
        return {e.request_id: e.wav for e in srv.run_until_drained()
                if isinstance(e, AudioResult)}

    base = run(cv_model)

    mesh = make_mesh(dp=2, tp=1)
    sharded = shard_talker_params(cv_model.talker_params, mesh)
    import copy

    model2 = copy.copy(cv_model)
    model2.talker_params = sharded
    with mesh:
        got = run(model2, mesh=mesh)
    assert set(got) == set(base)
    for k in base:
        np.testing.assert_array_equal(got[k], base[k])


def test_first_packet_tick_cap(cv_model):
    """While a streaming request awaits its first packet the server caps
    engine chunks so frames reach the host early (chunk length is dynamic
    data to the compiled serve program, so any cap value is exact); the cap
    clears once every stream has its first packet, and the capped run's
    audio is identical to an uncapped run (chunk sizes are
    output-invariant)."""
    from qwen3_tts_tpu.runtime.server import AudioPacket

    def run(first_packet_ticks):
        srv = _server(cv_model, ticks_per_sync=16,
                      first_packet_ticks=first_packet_ticks, packet_frames=2)
        srv.submit_custom_voice("s", text="cap those early chunks",
                                speaker="vivian", stream=True)
        caps = []
        events = []
        for _ in range(1000):
            events.extend(srv.step())
            caps.append((srv.engine.tick_cap, srv.engine._next_ticks()))
            if not srv.busy:
                break
        return srv, caps, [e for e in events if isinstance(e, AudioPacket)]

    srv, caps, pkts = run(first_packet_ticks=3)
    # cap engaged while waiting (next chunk bounded by the cap) ...
    assert caps[0][0] == 3 and caps[0][1] <= 3
    # ... and cleared after the first packet shipped
    assert caps[-1][0] is None
    assert pkts and pkts[-1].final

    _, caps_off, pkts_off = run(first_packet_ticks=0)
    assert all(c[0] is None for c in caps_off)
    np.testing.assert_array_equal(
        np.concatenate([p.wav for p in pkts]),
        np.concatenate([p.wav for p in pkts_off]))


def test_defer_bulk_egress_latency_order(cv_model):
    """While a late joiner awaits its FIRST packet, steady streams' packet
    vocodes are deferred (they hold >= packet_frames of buffered audio;
    a bulk egress wave on the joiner's critical path was the dominant term
    in late-join latency).  Deferral must be output-invariant: every stream
    drains the identical audio with defer on or off; and with defer on, no
    still-live steady stream emits a packet between the join's submission
    and its first packet."""
    from qwen3_tts_tpu.runtime.server import AudioPacket

    def run(defer):
        srv = _server(cv_model, num_slots=4, packet_frames=2,
                      left_context=4, ticks_per_sync=8,
                      defer_bulk_egress=defer)
        for i in range(2):
            srv.submit_custom_voice(f"bg{i}", text="steady background talk",
                                    speaker="vivian", stream=True,
                                    max_frames=40)
        # steady state: both backgrounds streaming (first packets out)
        first = set()
        events = []
        for _ in range(1000):
            evs = srv.step()
            events.extend(evs)
            for ev in evs:
                if isinstance(ev, AudioPacket) and ev.frame_count > 0:
                    first.add(ev.request_id)
            if {"bg0", "bg1"} <= first:
                break
        srv.submit_custom_voice("join", text="late joiner", speaker="vivian",
                                stream=True, max_frames=8)
        window = []   # events between join submit and join's first packet
        for _ in range(1000):
            evs = srv.step()
            events.extend(evs)
            window.extend(evs)
            if any(isinstance(ev, AudioPacket) and ev.request_id == "join"
                   and ev.frame_count > 0 for ev in evs):
                break
        live_bg = set(srv._by_user_id) & {"bg0", "bg1"}
        events.extend(srv.run_until_drained())
        audio = {}
        for ev in events:
            if isinstance(ev, AudioPacket):
                audio.setdefault(ev.request_id, []).append(ev.wav)
        return ({r: np.concatenate(w) for r, w in audio.items()},
                window, live_bg)

    audio_on, window_on, live_on = run(True)
    audio_off, window_off, live_off = run(False)
    # output-invariant: identical audio per stream either way
    assert set(audio_on) == set(audio_off) == {"bg0", "bg1", "join"}
    for rid in audio_on:
        np.testing.assert_array_equal(audio_on[rid], audio_off[rid])
    # with defer on, still-live steady streams stayed silent in the window
    bulk_on = [ev for ev in window_on if isinstance(ev, AudioPacket)
               and ev.request_id in live_on and ev.frame_count > 0
               and not ev.final]
    assert bulk_on == []


def test_stream_cancel_frees_slot(cv_model):
    """Closing a ThreadedTTSServer stream generator cancels the request:
    the engine slot frees (a queued request then runs) and the surviving
    concurrent request's audio is byte-correct."""
    from qwen3_tts_tpu.runtime.server import ThreadedTTSServer

    srv = ThreadedTTSServer(_server(cv_model, num_slots=1))
    try:
        gen = srv.synthesize_stream("custom_voice", text="cancel me early",
                                    speaker="vivian", language="english")
        next(gen)            # stream is live and holds the only slot
        gen.close()          # client disconnect -> cancel

        wav, sr = srv.synthesize("custom_voice", text="the survivor",
                                 speaker="vivian", language="english",
                                 timeout=120.0)
        want, wsr = cv_model.generate_custom_voice(
            text=["the survivor"], speaker="vivian", language="english",
            non_streaming_mode=False)
        assert sr == wsr
        np.testing.assert_array_equal(wav, want[0])
        assert not srv.server.busy
    finally:
        srv.close()


def test_zero_frame_and_overlong_requests(cv_model):
    """A zero-frame-budget request yields an empty result (not a decode
    crash) without disturbing concurrent requests, and a text whose
    trailing exceeds the engine's max_trailing is rejected loudly instead
    of silently dropping the tail of the text."""
    from qwen3_tts_tpu.runtime.server import AudioResult

    srv = _server(cv_model)
    srv.submit_custom_voice("z", text="zero frames", speaker="vivian",
                            language="english", max_frames=0)
    srv.submit_custom_voice("ok", text="a real request", speaker="vivian",
                            language="english")
    res = {e.request_id: e for e in srv.run_until_drained()
           if isinstance(e, AudioResult)}
    assert set(res) == {"z", "ok"}
    assert res["z"].wav.shape[0] == 0
    assert res["ok"].wav.size > 0
    assert not srv.busy

    tight = _server(cv_model, max_trailing=8)   # fixture trailing is 16
    with pytest.raises(ValueError, match="max_trailing"):
        tight.submit_custom_voice("long", text="does not fit",
                                  speaker="vivian", language="english")
    assert not tight.busy


def test_sampling_overrides_kwarg_split():
    """The server maps flat reference-style kwargs: bare names to the talker
    override, `subtalker_*` names to the sub-talker override, None where a
    group has no overrides."""
    from types import SimpleNamespace

    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.server import TTSServer

    gen_cfg = SimpleNamespace(
        sampling=SamplingParams(do_sample=False, top_k=50),
        subtalker=SamplingParams(do_sample=True, top_k=8, temperature=0.9))
    fake = SimpleNamespace(gen_cfg=gen_cfg, _override=TTSServer._override)

    t, s = TTSServer._sampling_overrides(
        fake, temperature=1.5, subtalker_top_k=4, subtalker_temperature=2.0)
    assert t.temperature == 1.5 and t.top_k == 50 and not t.do_sample
    assert s.top_k == 4 and s.temperature == 2.0 and s.do_sample

    t, s = TTSServer._sampling_overrides(fake, subtalker_do_sample=False)
    assert t is None
    assert s is not None and not s.do_sample

    t, s = TTSServer._sampling_overrides(fake)
    assert t is None and s is None


def test_server_vocoder_device_offload_matches(cv_model):
    """vocoder_device pins every vocoder program (packet egress + completion
    decode) to a dedicated device; audio must be bit-identical to the
    single-device server and the model's own tokenizer must stay untouched."""
    import jax

    from qwen3_tts_tpu.runtime.server import AudioPacket, AudioResult

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")

    def run(**kw):
        srv = _server(cv_model, packet_frames=2, left_context=4, **kw)
        srv.submit_custom_voice("s", text="offload the vocoder",
                                speaker="vivian", stream=True)
        srv.submit_custom_voice("n", text="and the completion decode",
                                speaker="vivian")
        events = srv.run_until_drained()
        pkts = [e for e in events if isinstance(e, AudioPacket)]
        res = [e for e in events if isinstance(e, AudioResult)][0]
        return srv, np.concatenate([p.wav for p in pkts]), res.wav

    base_srv, base_stream, base_wav = run()
    dev = jax.devices()[1]
    srv, stream, wav = run(vocoder_device=dev)
    np.testing.assert_array_equal(stream, base_stream)
    np.testing.assert_array_equal(wav, base_wav)
    # decode params really live on the target device ...
    leaf = jax.tree_util.tree_leaves(srv.dec_params)[0]
    assert leaf.devices() == {dev}
    # ... while the model's tokenizer (shared with other servers) does not
    tok_leaf = jax.tree_util.tree_leaves(
        cv_model.speech_tokenizer.dec_params)[0]
    assert dev not in tok_leaf.devices()


def test_server_carries_fused_talker_step_into_engine(tmp_path, monkeypatch):
    """TTSServer defaults the serve step to the XLA path even when the
    model's int8-on-TPU auto default enables fused_talker_step (the fused
    path measured ~+350 ms late-join first packet; the server is the
    latency surface) — but an explicit overrides opt-in carries the kernel
    into the engine's gen_cfg and a fused-layout slot state."""
    import jax.numpy as jnp

    import qwen3_tts_tpu.inference.model as model_mod
    from qwen3_tts_tpu import Qwen3TTSModel
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer

    monkeypatch.setattr(model_mod, "_default_backend_is_tpu", lambda: True)
    ckpt = make_tiny_checkpoint(tmp_path)
    quant = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32,
                                          quantize="int8")
    quant.processor = FakeTokenizer()
    # the auto default enables the kernel on this model's generate path
    assert quant._generation_config(
        quant._merge_generate_kwargs()).fused_talker_step
    # ... but the server's latency-measured default is the XLA step
    srv_default = _server(quant)
    assert srv_default.gen_cfg.fused_talker_step is False
    # explicit opt-in (pure-throughput deployment) carries the kernel in
    srv = _server(quant, overrides={"fused_talker_step": True})
    assert srv.gen_cfg.fused_talker_step is True
    assert srv.engine.max_len % 128 == 0      # kernel KV chunking
    # fused-layout cache: (L, B, Hkv, S, D)
    k = srv.engine.state.cache.k
    assert k.shape[3] == srv.engine.max_len


def test_server_warmup_then_traffic_identical(cv_model):
    """warmup() precompiles the serving program set (serve-chunk attend
    buckets via the AOT cache, staging buckets with all-invalid meta,
    egress vocoder shapes) without touching behavior: a warmed server's
    streamed audio equals a cold one's byte for byte."""
    from qwen3_tts_tpu.runtime.server import AudioPacket

    def run(warm):
        srv = _server(cv_model, packet_frames=2, left_context=4,
                      max_new_tokens=8)
        if warm:
            assert srv.warmup() >= 0.0
            assert len(srv.engine._chunk_exe) >= 1
        srv.submit_custom_voice("s", text="warmup equivalence text",
                                speaker="vivian", stream=True)
        pkts = [e for e in srv.run_until_drained()
                if isinstance(e, AudioPacket)]
        assert pkts and pkts[-1].final
        return np.concatenate([p.wav for p in pkts])

    np.testing.assert_array_equal(run(True), run(False))


def test_first_packet_extract_matches_unpack():
    """The on-device extract must agree with the host-side unpack: for each
    waiting rid, the same slot, the same contiguous first frames, the same
    count (clamped to F)."""
    import jax.numpy as jnp

    from qwen3_tts_tpu.runtime.batching import unpack_chunk_aux
    from qwen3_tts_tpu.runtime.server import _first_packet_extract

    B, ticks, Q, K, F, T = 3, 5, 4, 2, 2, 6
    rng = np.random.default_rng(0)
    frames = rng.integers(1, 100, (B, ticks, Q), dtype=np.int32)
    emit = np.zeros((B, ticks), np.int32)
    req_id = np.zeros((B, ticks), np.int32)
    # slot 0: rid 7 emits ticks 1..3 (3 frames -> clamped to F=2)
    emit[0, 1:4] = 1
    req_id[0, 1:4] = 7
    # slot 1: rid 0 emits tick 4 only (rid 0 is a VALID engine rid)
    emit[1, 4] = 1
    req_id[1, 4] = 0
    # slot 2: rid 9 never emits
    aux = np.concatenate([
        frames.reshape(-1), emit.reshape(-1), req_id.reshape(-1),
        np.zeros(B * ticks, np.int32),          # finished
        np.zeros(2 * K, np.int32),              # staged_valid / staged_rid
        np.zeros(B, np.int32),                  # t
    ])
    rids = jnp.asarray(np.array([7, 0, 9, -1], np.int32))
    codes, counts = _first_packet_extract(jnp.asarray(aux), rids, B=B,
                                          ticks=ticks, Q=Q, F=F, T=T)
    codes, counts = np.asarray(codes), np.asarray(counts)
    assert counts.tolist() == [2, 1, 0, 0]
    # rid 7: frames[0, 1:3] transposed into [:, :2]
    np.testing.assert_array_equal(codes[0, :, :2], frames[0, 1:3].T)
    np.testing.assert_array_equal(codes[0, :, 2:], 0)
    # rid 0: frames[1, 4] in column 0
    np.testing.assert_array_equal(codes[1, :, 0], frames[1, 4])
    np.testing.assert_array_equal(codes[1, :, 1:], 0)
    np.testing.assert_array_equal(codes[2:], 0)
    # cross-check the layout against the host unpack
    f2, e2, r2, *_ = unpack_chunk_aux(aux, B, ticks, Q, K)
    np.testing.assert_array_equal(f2, frames)
    np.testing.assert_array_equal(e2, emit.astype(bool))
    np.testing.assert_array_equal(r2, req_id)


def test_fast_first_packet_matches_host_path(cv_model):
    """The on-device first-packet pipeline must be invisible in the output:
    same packets (segmentation, flags, bytes) as the host-side egress, for
    a multi-request streaming load that overflows the slot count."""
    from qwen3_tts_tpu.runtime.server import AudioPacket

    texts = ["stream one", "the second longer stream", "third text",
             "and a fourth"]

    def run(fast):
        srv = _server(cv_model, num_slots=2, packet_frames=2,
                      left_context=4, first_packet_ticks=2,
                      ticks_per_sync=4, fast_first_packet=fast, seed=0)
        for i, t in enumerate(texts):
            srv.submit_custom_voice(f"r{i}", text=t, speaker="vivian",
                                    stream=True)
        by = {}
        for e in srv.run_until_drained():
            if isinstance(e, AudioPacket):
                by.setdefault(e.request_id, []).append(e)
        return srv, by

    srv_f, fastp = run(True)
    srv_h, hostp = run(False)
    assert srv_f.fast_first_packet and not srv_h.fast_first_packet
    assert srv_f.metrics.snapshot()["counters"].get(
        "server.fast_first_packets", 0) > 0
    assert set(fastp) == set(hostp)
    for rid in hostp:
        fa, ho = fastp[rid], hostp[rid]
        assert [(p.frame_start, p.frame_count, p.final) for p in fa] == \
               [(p.frame_start, p.frame_count, p.final) for p in ho]
        for pf, ph in zip(fa, ho):
            np.testing.assert_array_equal(pf.wav, ph.wav)
