"""qwen3_tts_tpu — a TPU-native (JAX/XLA/Pallas) TTS framework with the
capabilities of QwenLM/Qwen3-TTS.

Public API mirrors the reference `qwen_tts` package:
    from qwen3_tts_tpu import Qwen3TTSModel, Qwen3TTSTokenizer
"""

__version__ = "0.1.0"

# Lazy imports keep `import qwen3_tts_tpu` cheap and avoid pulling JAX into
# tooling that only wants configs.
_LAZY = {
    "Qwen3TTSModel": "qwen3_tts_tpu.inference.model",
    "Qwen3TTSTokenizer": "qwen3_tts_tpu.inference.tokenizer",
    "VoiceClonePromptItem": "qwen3_tts_tpu.inference.model",
    "Qwen3TTSProcessor": "qwen3_tts_tpu.inference.processor",
    "StreamingSession": "qwen3_tts_tpu.runtime.streaming",
    "ContinuousBatchingEngine": "qwen3_tts_tpu.runtime.batching",
    "TTSServer": "qwen3_tts_tpu.runtime.server",
    "ThreadedTTSServer": "qwen3_tts_tpu.runtime.server",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Qwen3TTSModel", "Qwen3TTSTokenizer", "VoiceClonePromptItem",
           "Qwen3TTSProcessor", "StreamingSession",
           "ContinuousBatchingEngine", "TTSServer", "ThreadedTTSServer",
           "__version__"]
