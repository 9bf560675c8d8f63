"""Codec tokenizer roundtrip over every input form (path / URL / numpy /
dict / list-of-dict) — mirrors reference examples/test_tokenizer_12hz.py.

Usage: python examples/test_tokenizer_12hz.py /path/to/Qwen3-TTS-Tokenizer-12Hz [wav...]
"""

import sys
import time

import numpy as np

from qwen3_tts_tpu import Qwen3TTSTokenizer
from qwen3_tts_tpu.utils.audio import read_wav, write_wav


def main():
    ckpt = sys.argv[1]
    wav_paths = sys.argv[2:]
    tokenizer = Qwen3TTSTokenizer.from_pretrained(ckpt)
    sr_in = tokenizer.get_input_sample_rate()

    if not wav_paths:
        # synthesize a test tone when no audio is supplied
        t = np.arange(sr_in * 2) / sr_in
        tone = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        inputs = [(tone, sr_in)]
    else:
        inputs = wav_paths

    # -------- single input --------
    t0 = time.time()
    enc1 = tokenizer.encode(inputs[0] if wav_paths else inputs[0])
    wavs1, out_sr = tokenizer.decode(enc1)
    print(f"single roundtrip: {wavs1[0].shape[0] / out_sr:.2f}s audio "
          f"in {time.time() - t0:.2f}s")
    write_wav("decoded_single_12hz.wav", wavs1[0], out_sr)

    # -------- batch input --------
    enc2 = tokenizer.encode(inputs * 2 if not wav_paths else inputs)
    wavs2, out_sr = tokenizer.decode(enc2)
    for i, w in enumerate(wavs2):
        write_wav(f"decoded_batch_12hz_{i}.wav", w, out_sr)

    # -------- dict / list-of-dict forms --------
    wavs3, _ = tokenizer.decode({"audio_codes": enc2.audio_codes})
    wavs4, _ = tokenizer.decode([{"audio_codes": c} for c in enc2.audio_codes])
    assert all(np.array_equal(a, b) for a, b in zip(wavs3, wavs4))
    print("all input forms OK; wrote decoded_*.wav")


if __name__ == "__main__":
    main()
