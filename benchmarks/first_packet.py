"""First-packet latency benchmark: streaming session at 1.7B talker +
full-size 12Hz vocoder, batch 1.

Prints JSON: {"p50_first_packet_ms", "packets", "rtf"}.
Target (BASELINE.json): < 100 ms p50 first packet.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def fabricate_vocoder(key, cfg, dtype=jnp.float32):
    """Random full-size 12Hz vocoder params in prepared layout."""
    from qwen3_tts_tpu.config import CodecV2DecoderConfig

    rngs = iter(jax.random.split(key, 400))

    def init(*shape, scale=0.05):
        return scale * jax.random.normal(next(rngs), shape, jnp.float32).astype(dtype)

    def conv(o, i, k):
        return {"conv": {"weight": init(o, i, k), "bias": jnp.zeros((o,), dtype)}}

    def tconv(i, o, k):
        return {"conv": {"weight": init(i, o, k), "bias": jnp.zeros((o,), dtype)}}

    h, lat, dd = cfg.hidden_size, cfg.latent_dim, cfg.decoder_dim
    layers = {}
    for li in range(cfg.num_hidden_layers):
        layers[str(li)] = {
            "self_attn": {
                "q_proj": {"weight": init(h, h)},
                "k_proj": {"weight": init(h, h)},
                "v_proj": {"weight": init(h, h)},
                "o_proj": {"weight": init(h, h)},
            },
            "mlp": {"gate_proj": {"weight": init(cfg.intermediate_size, h)},
                    "up_proj": {"weight": init(cfg.intermediate_size, h)},
                    "down_proj": {"weight": init(h, cfg.intermediate_size)}},
            "input_layernorm": {"weight": jnp.ones((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
            "self_attn_layer_scale": {"scale": jnp.full((h,), 0.01, dtype)},
            "mlp_layer_scale": {"scale": jnp.full((h,), 0.01, dtype)},
        }
    upsample = {}
    for i in range(len(cfg.upsampling_ratios)):
        upsample[str(i)] = {
            "0": tconv(lat, lat, cfg.upsampling_ratios[i]),
            "1": {"dwconv": conv(lat, 1, 7), "norm": {
                      "weight": jnp.ones((lat,), dtype),
                      "bias": jnp.zeros((lat,), dtype)},
                  "pwconv1": {"weight": init(4 * lat, lat),
                              "bias": jnp.zeros((4 * lat,), dtype)},
                  "pwconv2": {"weight": init(lat, 4 * lat),
                              "bias": jnp.zeros((lat,), dtype)},
                  "gamma": jnp.full((lat,), 1e-6, dtype)},
        }
    decoder = {"0": conv(dd, lat, 7)}
    for i in range(len(cfg.upsample_rates)):
        ind = dd // (2 ** i)
        outd = dd // (2 ** (i + 1))
        block = {"0": {"alpha": jnp.zeros((ind,), dtype),
                       "beta": jnp.zeros((ind,), dtype)},
                 "1": tconv(ind, outd, 2 * cfg.upsample_rates[i])}
        for j, dil in enumerate((1, 3, 9)):
            block[str(2 + j)] = {
                "act1": {"alpha": jnp.zeros((outd,), dtype),
                         "beta": jnp.zeros((outd,), dtype)},
                "conv1": conv(outd, outd, 7),
                "act2": {"alpha": jnp.zeros((outd,), dtype),
                         "beta": jnp.zeros((outd,), dtype)},
                "conv2": conv(outd, outd, 1),
            }
        decoder[str(1 + i)] = {"block": block}
    outd = dd // (2 ** len(cfg.upsample_rates))
    decoder[str(1 + len(cfg.upsample_rates))] = {
        "alpha": jnp.zeros((outd,), dtype), "beta": jnp.zeros((outd,), dtype)}
    decoder[str(2 + len(cfg.upsample_rates))] = conv(1, outd, 7)

    params = {
        "_codebooks": init(cfg.num_quantizers, cfg.codebook_size,
                           cfg.codebook_dim, scale=0.02),
        "pre_conv": conv(lat, cfg.codebook_dim, 3),
        "pre_transformer": {
            "input_proj": {"weight": init(h, lat), "bias": jnp.zeros((h,), dtype)},
            "layers": layers,
            "norm": {"weight": jnp.ones((h,), dtype)},
            "output_proj": {"weight": init(lat, h), "bias": jnp.zeros((lat,), dtype)},
        },
        "upsample": upsample,
        "decoder": decoder,
    }
    return params


def main():
    from qwen3_tts_tpu.config import CodecV2DecoderConfig
    from qwen3_tts_tpu.ops.sampling import SamplingParams
    from qwen3_tts_tpu.runtime.generate import GenerationConfig
    from qwen3_tts_tpu.runtime.streaming import (StreamingConfig,
                                                 StreamingSession)
    from qwen3_tts_tpu.utils.testing import TALKER_1B7, random_talker_params

    cfg = TALKER_1B7
    dtype = jnp.bfloat16
    B = int(os.environ.get("BENCH_BATCH", "1"))
    M = int(os.environ.get("BENCH_FRAMES", "64"))

    params = random_talker_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    if os.environ.get("BENCH_QUANT", "") == "int8":
        from qwen3_tts_tpu.weights import quantize_talker_params

        params = quantize_talker_params(params)
    dec_cfg = CodecV2DecoderConfig(num_quantizers=cfg.num_code_groups)
    dec_params = fabricate_vocoder(jax.random.PRNGKey(1), dec_cfg, jnp.float32)

    gen_cfg = GenerationConfig(
        max_new_tokens=M,
        sampling=SamplingParams(do_sample=True, top_k=50, temperature=0.9,
                                repetition_penalty=1.05),
        subtalker=SamplingParams(do_sample=True, top_k=50, temperature=0.9),
    )
    session = StreamingSession(params, cfg, gen_cfg, dec_params, dec_cfg,
                               StreamingConfig())

    rng = jax.random.PRNGKey(2)
    L = 48
    embeds = (0.02 * jax.random.normal(rng, (B, L, cfg.hidden_size))).astype(dtype)
    mask = jnp.ones((B, L), jnp.int32)
    trailing = (0.02 * jax.random.normal(rng, (B, 24, cfg.hidden_size))).astype(dtype)
    pad = jnp.zeros((1, 1, cfg.hidden_size), dtype)

    latencies = []
    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    wall0 = audio0 = None
    for i in range(n_iters + 1):  # iter 0 = compile warmup
        t0 = time.time()
        wavs, first = session.synthesize(embeds, mask, trailing, pad,
                                         jax.random.PRNGKey(3 + i))
        wall = time.time() - t0
        if i == 0:
            continue
        latencies.append(first * 1000)
        wall0, audio0 = wall, sum(w.shape[0] for w in wavs) / 24000.0

    print(json.dumps({
        "p50_first_packet_ms": round(float(np.median(latencies)), 1),
        "packets_rtf": round(audio0 / wall0, 2),
        "latencies_ms": [round(l, 1) for l in latencies],
    }))


if __name__ == "__main__":
    main()
