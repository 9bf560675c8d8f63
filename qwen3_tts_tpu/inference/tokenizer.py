"""Qwen3TTSTokenizer — public codec API (encode / decode), TPU-native.

Mirrors the reference wrapper `qwen_tts/inference/qwen3_tts_tokenizer.py`
(same method names, input forms, and return conventions) with JAX execution:

- `from_pretrained(dir)` reads the checkpoint `config.json` + safetensors
  directly (no torch).
- `encode` accepts wav path(s) / URL / base64 / numpy (+sr) and returns
  per-sample (T, Q) int code arrays.
- `decode` accepts the encode output, a dict, or list[dict]; pads with -1,
  chunk-decodes, trims per sample (reference decode 259-365 and
  modeling...v2.py:993-1024).

Shape bucketing keeps recompilation bounded: waveforms pad up to a frame
multiple, codes pad up to the vocoder chunk size.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecV2Config, load_config
from ..models.codec12 import decoder as codec_decoder
from ..models.codec12 import encoder as codec_encoder
from ..utils.audio import load_audio, resample, to_mono
from ..weights import load_safetensors_dir


@dataclasses.dataclass
class EncodeOutput:
    audio_codes: List[np.ndarray]          # V2: (T_i, Q); V1: (T_i,)
    xvectors: Optional[List[np.ndarray]] = None   # V1 only
    ref_mels: Optional[List[np.ndarray]] = None   # V1 only


@partial(jax.jit, static_argnames=("cfg", "num_quantizers", "dtype"))
def _encode_compiled(enc_params, cfg, wavs, num_quantizers, dtype):
    return codec_encoder.encode_waveform(enc_params, cfg, wavs,
                                         num_quantizers=num_quantizers,
                                         dtype=jnp.dtype(dtype))


@partial(jax.jit, static_argnames=("cfg", "chunk_size", "left_context", "dtype"))
def _decode_compiled(dec_params, cfg, codes, chunk_size, left_context, dtype):
    return codec_decoder.chunked_decode(dec_params, cfg, codes,
                                        chunk_size=chunk_size,
                                        left_context_size=left_context,
                                        dtype=jnp.dtype(dtype))


_to_pcm16_compiled = jax.jit(codec_decoder.to_pcm16)


class Qwen3TTSTokenizer:
    """12 Hz (V2) codec tokenizer. 25 Hz (V1) loads via the same entry point
    once `models/codec25` lands (reference registers both; SURVEY §2.3)."""

    def __init__(self):
        self.config = None          # CodecV2Config | CodecV1Config
        self.enc_params = None
        self.dec_params = None
        self.v1_model = None        # models.codec25.model.CodecV1Model
        self.chunk_size = 300
        self.left_context = 25
        self._compute_dtype = jnp.float32
        self._fe_sampling_rate: Optional[int] = None

    # -- loading ----------------------------------------------------------

    @classmethod
    def from_pretrained(cls, model_dir: str, dtype=jnp.float32,
                        **kwargs) -> "Qwen3TTSTokenizer":
        import os

        from ..config import CodecV1Config
        from ..weights import resolve_checkpoint_dir

        model_dir = resolve_checkpoint_dir(model_dir)
        inst = cls()
        cfg = load_config(model_dir)
        inst.config = cfg
        inst._compute_dtype = dtype
        if isinstance(cfg, CodecV2Config):
            tree = load_safetensors_dir(model_dir, dtype=dtype)
            inst.enc_params = codec_encoder.prepare_encoder_params(
                tree["encoder"], cfg.encoder_config)
            inst.dec_params = codec_decoder.prepare_decoder_params(
                tree["decoder"], cfg.decoder_config)
        elif isinstance(cfg, CodecV1Config):
            from ..models.codec25.model import CodecV1Model, XVectorExtractor

            tree = load_safetensors_dir(model_dir, dtype=dtype)
            onnx_path = os.path.join(model_dir, "campplus.onnx")
            xv = XVectorExtractor(onnx_path if os.path.exists(onnx_path)
                                  else None)
            inst.v1_model = CodecV1Model(cfg, tree, xv)
            inst._fe_sampling_rate = 16000
        else:
            raise ValueError(f"unsupported tokenizer config at {model_dir}")
        # feature-extractor sampling rate, if the checkpoint carries one
        pre = os.path.join(model_dir, "preprocessor_config.json")
        if os.path.exists(pre):
            import json

            with open(pre) as f:
                inst._fe_sampling_rate = json.load(f).get(
                    "sampling_rate", inst._fe_sampling_rate)
        return inst

    @classmethod
    def from_params(cls, config: CodecV2Config, enc_params=None,
                    dec_params=None, dtype=jnp.float32) -> "Qwen3TTSTokenizer":
        """Construct from in-memory prepared param trees (tests, serving)."""
        inst = cls()
        inst.config = config
        inst.enc_params = enc_params
        inst.dec_params = dec_params
        inst._compute_dtype = dtype
        return inst

    # -- metadata ---------------------------------------------------------

    def get_model_type(self) -> str:
        return self.config.model_type

    def get_input_sample_rate(self) -> int:
        return int(self.config.input_sample_rate)

    def get_output_sample_rate(self) -> int:
        return int(self.config.output_sample_rate)

    def get_encode_downsample_rate(self) -> int:
        return int(self.config.encode_downsample_rate)

    def get_decode_upsample_rate(self) -> int:
        return int(self.config.decode_upsample_rate)

    # -- encode -----------------------------------------------------------

    def _normalize_audio_inputs(self, audios, sr: Optional[int]) -> List[np.ndarray]:
        target_sr = self._fe_sampling_rate or self.get_input_sample_rate()
        if isinstance(audios, (str, np.ndarray)):
            audios = [audios]
        elif (isinstance(audios, tuple) and len(audios) == 2
                and isinstance(audios[0], np.ndarray)):
            audios = [audios]   # a single (wav, sr) pair, not a sequence
        out = []
        for a in audios:
            if isinstance(a, str):
                wav, asr = load_audio(a)
            elif isinstance(a, np.ndarray):
                if sr is None:
                    raise ValueError(
                        "For numpy waveform input, you must provide `sr`.")
                wav, asr = to_mono(a), int(sr)
            elif isinstance(a, tuple):
                wav, asr = to_mono(a[0]), int(a[1])
            else:
                raise TypeError(f"Unsupported audio input type: {type(a)}")
            if asr != target_sr:
                wav = resample(wav, asr, target_sr)
            out.append(wav.astype(np.float32))
        return out

    def _encode_jit(self, wavs: jax.Array, num_quantizers: int) -> jax.Array:
        return _encode_compiled(self.enc_params, self.config.encoder_config,
                                wavs, num_quantizers,
                                str(np.dtype(self._compute_dtype)))

    def encode(self, audios, sr: Optional[int] = None,
               return_dict: bool = True):
        wavs = self._normalize_audio_inputs(audios, sr)
        if self.v1_model is not None:
            codes, xvectors, ref_mels = self.v1_model.encode(wavs)
            out = EncodeOutput(audio_codes=codes, xvectors=xvectors,
                               ref_mels=ref_mels)
            return out if return_dict else (codes, xvectors, ref_mels)
        ds = self.get_encode_downsample_rate()
        lengths = [len(w) for w in wavs]
        max_len = max(lengths)
        # bucket to an 8-frame multiple to bound recompiles
        bucket = ds * 8
        padded_len = ((max_len + bucket - 1) // bucket) * bucket
        batch = np.zeros((len(wavs), padded_len), np.float32)
        for i, w in enumerate(wavs):
            batch[i, :len(w)] = w
        nq = int(self.config.encoder_valid_num_quantizers)
        codes = np.asarray(self._encode_jit(jnp.asarray(batch), nq))
        # per-sample frame trim: ceil(len / ds) (reference modeling...v2.py:984)
        out = []
        for i, n in enumerate(lengths):
            frames = -(-n // ds)
            out.append(codes[i, :, :frames].T.astype(np.int64))  # (T, Q)
        if return_dict:
            return EncodeOutput(audio_codes=out)
        return (out,)

    # -- decode -----------------------------------------------------------

    def _decode_jit(self, codes: jax.Array) -> jax.Array:
        return _decode_compiled(self.dec_params, self.config.decoder_config,
                                codes, self.chunk_size, self.left_context,
                                str(np.dtype(self._compute_dtype)))

    def decode(self, encoded, output_dtype: str = "float32"
               ) -> Tuple[List[np.ndarray], int]:
        """output_dtype "float32" (reference parity) or "int16": PCM16
        converted ON DEVICE — the delivery format for serving; halves the
        device->host waveform transfer."""
        xvectors = ref_mels = None
        if hasattr(encoded, "audio_codes"):
            codes_list = encoded.audio_codes
            xvectors = getattr(encoded, "xvectors", None)
            ref_mels = getattr(encoded, "ref_mels", None)
        elif isinstance(encoded, dict):
            codes_list = encoded["audio_codes"]
            xvectors = encoded.get("xvectors")
            ref_mels = encoded.get("ref_mels")
        elif isinstance(encoded, list):
            codes_list = [e["audio_codes"] for e in encoded]
            if "xvectors" in encoded[0]:
                xvectors = [e["xvectors"] for e in encoded]
            if "ref_mels" in encoded[0]:
                ref_mels = [e["ref_mels"] for e in encoded]
        else:
            raise TypeError(
                "`encoded` must be an encode output, a dict, or a list of dicts.")

        if output_dtype == "int16":
            out_np = np.int16
        elif output_dtype == "float32":
            out_np = np.float32
        else:
            raise ValueError(f"unsupported output_dtype {output_dtype!r}")
        if self.v1_model is not None:
            return self._decode_v1(codes_list, xvectors, ref_mels, out_np)
        if not isinstance(codes_list, (list, tuple)):
            t = np.asarray(codes_list)
            codes_list = [t] if t.ndim == 2 else list(t)

        codes_list = [np.asarray(c) for c in codes_list]
        lengths = [c.shape[0] for c in codes_list]
        q = codes_list[0].shape[1]
        max_t = max(lengths)
        if max_t == 0:
            # every row is empty (e.g. zero-frame-budget completions):
            # nothing to vocode
            return ([np.zeros((0,), out_np) for _ in codes_list],
                    self.get_output_sample_rate())
        # bucket to the vocoder chunk size: padded frames only affect samples
        # past the per-sample trim point (causal stack)
        padded_t = ((max_t + self.chunk_size - 1)
                    // self.chunk_size) * self.chunk_size
        batch = np.zeros((len(codes_list), q, padded_t), np.int32)
        for i, c in enumerate(codes_list):
            batch[i, :, :c.shape[0]] = np.clip(c.T, 0, None)
        wav_dev = self._decode_jit(jnp.asarray(batch))
        if out_np is np.int16:
            wav_dev = _to_pcm16_compiled(wav_dev)
        wav = np.asarray(wav_dev)[:, 0, :]
        up = self.get_decode_upsample_rate()
        wavs = [wav[i, :lengths[i] * up].astype(out_np)
                for i in range(len(codes_list))]
        return wavs, self.get_output_sample_rate()

    def _decode_v1(self, codes_list, xvectors, ref_mels, out_np=np.float32
                   ) -> Tuple[List[np.ndarray], int]:
        """25 Hz decode: pad codes with -1, stack x-vectors, pad ref mels
        (reference qwen3_tts_tokenizer.py:331-355)."""
        if xvectors is None or ref_mels is None:
            raise ValueError("25Hz decode requires `xvectors` and `ref_mels`.")
        if not isinstance(codes_list, (list, tuple)):
            t = np.asarray(codes_list)
            codes_list = [t] if t.ndim == 1 else list(t)
        codes_list = [np.asarray(c).reshape(-1) for c in codes_list]
        B = len(codes_list)
        max_t = max(c.shape[0] for c in codes_list)
        codes = np.full((B, max_t), -1, np.int64)
        for i, c in enumerate(codes_list):
            codes[i, :c.shape[0]] = c
        xv = np.stack([np.asarray(x) for x in xvectors], axis=0)
        mel_dim = np.asarray(ref_mels[0]).shape[-1]
        max_r = max(np.asarray(m).shape[0] for m in ref_mels)
        rm = np.zeros((B, max_r, mel_dim), np.float32)
        for i, m in enumerate(ref_mels):
            m = np.asarray(m)
            rm[i, :m.shape[0]] = m
        wavs = self.v1_model.decode(codes, xv, rm)
        if out_np is np.int16:
            # same rounding as the on-device to_pcm16 / the WAV writer
            wavs = [np.round(np.clip(w.astype(np.float32), -1.0, 1.0)
                             * 32767.0).astype(np.int16) for w in wavs]
            return wavs, self.get_output_sample_rate()
        return [w.astype(np.float32) for w in wavs], self.get_output_sample_rate()
