"""CustomVoice synthesis, single + batch + instruct — mirrors reference
examples/test_model_12hz_custom_voice.py.

Usage: python examples/test_model_12hz_custom_voice.py /path/to/Qwen3-TTS-12Hz-1.7B-CustomVoice
"""

import sys
import time

from qwen3_tts_tpu import Qwen3TTSModel
from qwen3_tts_tpu.utils.audio import write_wav


def main():
    model = Qwen3TTSModel.from_pretrained(sys.argv[1])
    speakers = model.get_supported_speakers()
    print("speakers:", speakers)
    print("languages:", model.get_supported_languages())

    t0 = time.time()
    wavs, sr = model.generate_custom_voice(
        text="Hello! This is the TPU-native Qwen3-TTS framework speaking.",
        speaker=speakers[0], language="auto",
        instruct="Speak warmly and slowly.")
    print(f"single w/ instruct: {wavs[0].shape[0] / sr:.2f}s in "
          f"{time.time() - t0:.2f}s")
    write_wav("custom_voice_single.wav", wavs[0], sr)

    t0 = time.time()
    wavs, sr = model.generate_custom_voice(
        text=["First sample in the batch.", "Second sample in the batch."],
        speaker=speakers[0], language="auto")
    print(f"batch of {len(wavs)}: in {time.time() - t0:.2f}s")
    for i, w in enumerate(wavs):
        write_wav(f"custom_voice_batch_{i}.wav", w, sr)


if __name__ == "__main__":
    main()
