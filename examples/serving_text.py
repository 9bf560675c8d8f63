"""Text-in → audio-out serving example: the TTSServer front end over the
continuous-batching engine (the layer the reference delegates to external
vLLM-Omni, reference README.md:432-457).

With a real checkpoint:

    model = Qwen3TTSModel.from_pretrained(ckpt, quantize="int8")
    srv = TTSServer(model, num_slots=16)
    srv.submit_custom_voice("r1", text="...", speaker="vivian", stream=True)
    for ev in srv.run_until_drained():
        ...  # AudioPacket (streaming) / AudioResult (non-streaming)

This example fabricates a tiny reference-format checkpoint (needs the torch
reference mounted at /root/reference, as the tests do) so it runs in-image.
Concurrent producers (e.g. HTTP handlers) should wrap the server with
`ThreadedTTSServer` — see cli/demo.py, which serves /tts and /tts_stream
through it.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/../tests")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")   # tiny model: CPU is fine
    import jax.numpy as jnp
    import numpy as np

    from qwen3_tts_tpu import Qwen3TTSModel
    from qwen3_tts_tpu.runtime.server import (AudioPacket, AudioResult,
                                              TTSServer)
    from tests._fixtures import make_tiny_checkpoint
    from tests.test_inference_api import FakeTokenizer

    ckpt = make_tiny_checkpoint(tempfile.mkdtemp())
    model = Qwen3TTSModel.from_pretrained(ckpt, dtype=jnp.float32)
    model.processor = FakeTokenizer()   # no tokenizer asset in-image

    srv = TTSServer(model, num_slots=2, prefill_bucket=32, max_trailing=16,
                    packet_frames=2)
    # per-request sampling rides each slot (top_k up to the engine's
    # compiled width); cancel() frees a slot when a client disconnects
    srv.submit_custom_voice("stream-1", text="hello streaming world",
                            speaker="vivian", stream=True,
                            temperature=0.7, top_k=5)
    srv.submit_custom_voice("batch-1", text="hello batch world",
                            speaker="vivian")
    srv.submit_custom_voice("gone-1", text="this client disconnects",
                            speaker="vivian", stream=True)
    srv.cancel("gone-1")
    for ev in srv.run_until_drained():
        if isinstance(ev, AudioPacket):
            print(f"packet  {ev.request_id}: frames "
                  f"[{ev.frame_start}, {ev.frame_start + ev.frame_count}) "
                  f"{ev.wav.shape[0]} samples final={ev.final}")
        elif isinstance(ev, AudioResult):
            print(f"result  {ev.request_id}: {ev.wav.shape[0]} samples "
                  f"@ {ev.sample_rate} Hz")
    print("metrics:", {k: v for k, v in srv.metrics.counters.items()
                       if k.startswith("server.")})


if __name__ == "__main__":
    main()
