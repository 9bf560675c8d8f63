"""Streaming synthesis example: audio packets arrive while the talker is
still decoding (beyond the reference, whose streaming flag only changes the
prompt layout — its vocoder runs after full generation).

With a real checkpoint:
    python examples/streaming_synthesis.py /path/to/Qwen3-TTS-12Hz-1.7B-CustomVoice

Without one (this environment), pass no argument: random weights exercise
the identical compiled pipeline and print per-packet latencies.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)

    if len(sys.argv) > 1:
        from qwen3_tts_tpu import Qwen3TTSModel

        import time

        model = Qwen3TTSModel.from_pretrained(sys.argv[1])
        t0 = time.time()
        for i, (wav_chunk, sr) in enumerate(model.stream_custom_voice(
                text="Streaming with sub-hundred-millisecond first packet.",
                speaker=model.get_supported_speakers()[0])):
            print(f"packet {i}: {np.asarray(wav_chunk).shape[-1]} samples "
                  f"at +{(time.time() - t0) * 1000:.1f} ms (sr {sr})")
        return

    from qwen3_tts_tpu.utils.testing import (TALKER_0B6, random_talker_params,
                                             random_vocoder_params)

    cfg = TALKER_0B6
    dtype = jnp.bfloat16
    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    dec_cfg = CodecV2DecoderConfig(num_quantizers=cfg.num_code_groups)
    dec_params = random_vocoder_params(dec_cfg, jax.random.PRNGKey(1))
    gen_cfg = GenerationConfig(
        max_new_tokens=48,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9))

    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig())
    B, L = 1, 32
    rng = jax.random.PRNGKey(2)
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    for i, pkt in enumerate(session.run(
            embeds, jnp.ones((B, L), jnp.int32),
            (0.02 * jax.random.normal(rng, (B, 16, cfg.hidden_size))).astype(dtype),
            jnp.zeros((1, 1, cfg.hidden_size), dtype), jax.random.PRNGKey(3))):
        print(f"packet {i}: frames [{pkt.frame_start}, "
              f"{pkt.frame_start + pkt.frame_count}) "
              f"{pkt.wav.shape[-1]} samples at +{pkt.latency_s * 1000:.1f} ms")


if __name__ == "__main__":
    main()
