"""25 Hz tokenizer top-level model: encode (speech -> codes + x-vector +
ref-mel) and decode (codes -> DiT mel -> BigVGAN wav).

Rebuilds Qwen3TTSTokenizerV1Model (reference
modeling_qwen3_tts_tokenizer_v1.py:1360-1526) and the x-vector extraction
path (vq/speech_vq.py:118-159).  The CAM++ x-vector network ships as ONNX
(`campplus.onnx`); the default path here loads its initializers and runs the
network in pure JAX (models/codec25/campplus.py), with onnxruntime as an
optional fallback/cross-check.  Decode also works with externally supplied
x-vectors when neither is possible.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import CodecV1Config
from ...utils.kaldi import fbank as kaldi_fbank
from .bigvgan import bigvgan_forward
from .dit import dit_sample
from .encoder import quantize_speech
from .mel import bigvgan_ref_mel

Params = Dict[str, Any]

from functools import partial


@partial(jax.jit, static_argnames=("cfg", "num_steps", "guidance_scale",
                                   "sway_coefficient"))
def _dit_sample_jit(params, cfg, codes, xvectors, ref_mels, noise, num_steps,
                    guidance_scale, sway_coefficient):
    return dit_sample(params, cfg, codes, xvectors, ref_mels, noise,
                      num_steps=num_steps, guidance_scale=guidance_scale,
                      sway_coefficient=sway_coefficient)


@partial(jax.jit, static_argnames=("cfg",))
def _bigvgan_jit(params, cfg, mel):
    return bigvgan_forward(params, cfg, mel)


class XVectorExtractor:
    """CAM++ speaker vector (pure-JAX CAM++ by default, onnxruntime as
    fallback), plus BigVGAN-style reference mel.
    Reference: vq/speech_vq.py:118-159."""

    def __init__(self, onnx_path: Optional[str], prefer_jax: bool = True):
        self.session = None
        self.jax_params = None
        self.jax_cfg = None
        if onnx_path is not None and prefer_jax:
            try:
                from .campplus import CAMPPlusConfig, load_campplus_params

                self.jax_params = load_campplus_params(onnx_path)
                self.jax_cfg = CAMPPlusConfig()
            except Exception:
                # the dependency-free protobuf walker can fail in many ways
                # on a differently-exported graph (IndexError, struct.error,
                # reshape TypeError, ...) — any parse failure falls through
                # to onnxruntime rather than crashing the constructor
                self.jax_params = None
        if onnx_path is not None and self.jax_params is None:
            try:
                import onnxruntime

                opt = onnxruntime.SessionOptions()
                opt.intra_op_num_threads = 1
                self.session = onnxruntime.InferenceSession(
                    onnx_path, sess_options=opt,
                    providers=["CPUExecutionProvider"])
            except ImportError:
                self.session = None

    @staticmethod
    def _peak_norm(audio: np.ndarray, db_level: float = -6.0) -> np.ndarray:
        """sox `norm -6`: scale so the peak sits at -6 dBFS."""
        peak = np.abs(audio).max()
        if peak == 0:
            return audio
        target = 10.0 ** (db_level / 20.0)
        return (audio * (target / peak)).astype(np.float32)

    def extract_code(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """16 kHz waveform -> (xvector (D,), ref_mel (T, 80))."""
        norm = self._peak_norm(np.asarray(audio, np.float32))
        ref_mel = np.asarray(bigvgan_ref_mel(norm[None]))[0].T  # (T, 80)
        n_bins = 80 if self.jax_cfg is None else self.jax_cfg.feat_dim
        feat = kaldi_fbank(norm, num_mel_bins=n_bins)
        feat = feat - feat.mean(axis=0, keepdims=True)
        if self.jax_params is not None:
            from .campplus import campplus_embed

            emb = np.asarray(campplus_embed(self.jax_params, self.jax_cfg,
                                            jnp.asarray(feat[None]))).flatten()
        elif self.session is not None:
            emb = self.session.run(
                None,
                {self.session.get_inputs()[0].name: feat[None]})[0].flatten()
        else:
            raise RuntimeError(
                "no CAM++ weights loadable in JAX and onnxruntime is "
                "unavailable: pass precomputed `xvectors` to decode(), or "
                "install onnxruntime.")
        emb = emb / max(np.linalg.norm(emb), 1e-12)
        return emb.astype(np.float32), ref_mel.astype(np.float32)


class CodecV1Model:
    def __init__(self, config: CodecV1Config, params: Params,
                 xvector_extractor: Optional[XVectorExtractor] = None):
        self.config = config
        self.params = params
        self.xvector_extractor = xvector_extractor

    # -- metadata (reference 1381-1394) --------------------------------

    def get_model_type(self) -> str:
        return self.config.model_type

    def get_input_sample_rate(self) -> int:
        return self.config.input_sample_rate

    def get_output_sample_rate(self) -> int:
        return self.config.output_sample_rate

    def get_encode_downsample_rate(self) -> int:
        return self.config.encode_downsample_rate

    def get_decode_upsample_rate(self) -> int:
        return self.config.decode_upsample_rate

    # -- encode (reference 1444-1485) ----------------------------------

    def encode(self, wavs_16k: List[np.ndarray]):
        """16 kHz waveforms -> (codes, xvectors, ref_mels) lists."""
        enc_params = self.params["encoder"]["tokenizer"]
        codes, lens = quantize_speech(enc_params, self.config.encoder_config,
                                      wavs_16k)
        if self.xvector_extractor is None:
            raise RuntimeError(
                "V1 encode needs an XVectorExtractor (campplus.onnx); "
                "construct the model with xvector_extractor=...")
        xvectors, ref_mels = [], []
        for wav in wavs_16k:
            xv, rm = self.xvector_extractor.extract_code(np.asarray(wav))
            xvectors.append(xv)
            ref_mels.append(rm)
        return codes, xvectors, ref_mels

    # -- decode (reference 1487-1526) ----------------------------------

    def decode(self, audio_codes: np.ndarray, xvectors: np.ndarray,
               ref_mels: np.ndarray, num_steps: int = 10,
               guidance_scale: float = 0.5, sway_coefficient: float = -1.0,
               key: Optional[jax.Array] = None) -> List[np.ndarray]:
        """audio_codes: (B, T) padded with -1; xvectors: (B, D);
        ref_mels: (B, Tr, mel). Returns per-sample trimmed waveforms."""
        codes = np.asarray(audio_codes)
        lengths = (codes > -1).sum(axis=1) * self.config.decode_upsample_rate
        codes = np.clip(codes, 0, None)

        dit_cfg = self.config.dit_config
        if key is None:
            key = jax.random.PRNGKey(0)
        T = codes.shape[1] * dit_cfg.repeats
        noise = jax.random.normal(key, (codes.shape[0], T, dit_cfg.mel_dim),
                                  jnp.float32)
        # jit per shape: DiT block-local attention with look-ahead layers
        # makes end-padding non-neutral, so lengths are not bucketed
        mel = _dit_sample_jit(self.params["decoder"]["dit"], dit_cfg,
                              jnp.asarray(codes), jnp.asarray(xvectors),
                              jnp.asarray(ref_mels), noise,
                              num_steps, float(guidance_scale),
                              float(sway_coefficient))
        wav = np.asarray(_bigvgan_jit(self.params["decoder"]["bigvgan"],
                                      self.config.bigvgan_config, mel))
        return [wav[i, :lengths[i]] for i in range(wav.shape[0])]
