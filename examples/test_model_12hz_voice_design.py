"""VoiceDesign synthesis, single + batch — mirrors reference
examples/test_model_12hz_voice_design.py.

Usage: python examples/test_model_12hz_voice_design.py /path/to/Qwen3-TTS-12Hz-1.7B-VoiceDesign
"""

import sys
import time

from qwen3_tts_tpu import Qwen3TTSModel
from qwen3_tts_tpu.utils.audio import write_wav


def main():
    model = Qwen3TTSModel.from_pretrained(sys.argv[1])

    t0 = time.time()
    wavs, sr = model.generate_voice_design(
        text="Welcome aboard! The weather today is absolutely lovely.",
        instruct="A cheerful young woman with a bright, energetic voice.",
        language="auto")
    print(f"single: {wavs[0].shape[0] / sr:.2f}s in {time.time() - t0:.2f}s")
    write_wav("voice_design_single.wav", wavs[0], sr)

    t0 = time.time()
    wavs, sr = model.generate_voice_design(
        text=["A calm bedtime story begins.", "Breaking news tonight!"],
        instruct=["A soft, soothing elderly narrator.",
                  "An urgent news anchor voice."],
        language="auto")
    print(f"batch of {len(wavs)} in {time.time() - t0:.2f}s")
    for i, w in enumerate(wavs):
        write_wav(f"voice_design_batch_{i}.wav", w, sr)


if __name__ == "__main__":
    main()
