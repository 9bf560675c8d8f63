"""Qwen3TTSProcessor — text tokenization wrapper.

Mirrors the reference processor surface
(qwen_tts/core/models/processing_qwen3_tts.py: thin wrapper over
Qwen2TokenizerFast with left padding), built on `transformers.AutoTokenizer`
loaded from the checkpoint directory.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np


class Qwen3TTSProcessor:
    def __init__(self, tokenizer, chat_template: Optional[str] = None):
        self.tokenizer = tokenizer
        self.chat_template = chat_template

    @classmethod
    def from_pretrained(cls, model_dir: str, **kwargs) -> "Qwen3TTSProcessor":
        from transformers import AutoTokenizer

        return cls(AutoTokenizer.from_pretrained(model_dir, **kwargs))

    def __call__(self, text: Union[str, List[str]] = None, **kwargs):
        if text is None:
            raise ValueError("You need to specify either a `text` input to process.")
        if not isinstance(text, list):
            text = [text]
        kwargs.setdefault("padding", False)
        kwargs.setdefault("padding_side", "left")
        kwargs.setdefault("return_tensors", "np")
        return self.tokenizer(text, **kwargs)

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, *args, **kwargs):
        return self.tokenizer.decode(*args, **kwargs)

    def apply_chat_template(self, conversations, chat_template=None, **kwargs):
        if isinstance(conversations[0], dict):
            conversations = [conversations]
        # keyword, not positional: HF's signature is (conversation, tools=,
        # documents=, chat_template=, ...) — positionally the template
        # string would bind to `tools` and be silently ignored
        return self.tokenizer.apply_chat_template(
            conversations, chat_template=chat_template, **kwargs)

    @property
    def model_input_names(self):
        return list(dict.fromkeys(self.tokenizer.model_input_names))
