"""Base-model voice clone: ICL and x-vector-only, direct and prompt-reuse,
single and batch — mirrors reference examples/test_model_12hz_base.py.

Usage: python examples/test_model_12hz_base.py CKPT REF_WAV "ref transcript"
"""

import sys
import time

from qwen3_tts_tpu import Qwen3TTSModel
from qwen3_tts_tpu.utils.audio import write_wav

TEXTS = [
    "Voice cloning from three seconds of reference audio.",
    "The second sentence reuses the same voice prompt.",
]


def main():
    ckpt, ref_wav, ref_text = sys.argv[1], sys.argv[2], sys.argv[3]
    model = Qwen3TTSModel.from_pretrained(ckpt)

    # -------- ICL mode, direct --------
    t0 = time.time()
    wavs, sr = model.generate_voice_clone(
        text=TEXTS[0], ref_audio=ref_wav, ref_text=ref_text)
    print(f"icl direct: {wavs[0].shape[0] / sr:.2f}s in {time.time() - t0:.2f}s")
    write_wav("clone_icl_single.wav", wavs[0], sr)

    # -------- prompt reuse (encode the reference once) --------
    prompt = model.create_voice_clone_prompt(ref_audio=ref_wav,
                                             ref_text=ref_text)
    t0 = time.time()
    wavs, sr = model.generate_voice_clone(text=TEXTS, voice_clone_prompt=prompt)
    print(f"icl batch (reused prompt): {len(wavs)} wavs in "
          f"{time.time() - t0:.2f}s")
    for i, w in enumerate(wavs):
        write_wav(f"clone_icl_batch_{i}.wav", w, sr)

    # -------- x-vector only --------
    prompt_xv = model.create_voice_clone_prompt(ref_audio=ref_wav,
                                                x_vector_only_mode=True)
    wavs, sr = model.generate_voice_clone(text=TEXTS[0],
                                          voice_clone_prompt=prompt_xv)
    write_wav("clone_xvec_single.wav", wavs[0], sr)
    print("wrote clone_*.wav")


if __name__ == "__main__":
    main()
