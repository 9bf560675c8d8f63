"""Pallas kernel correctness (interpret mode on CPU) vs the XLA reference
attention path."""

import numpy as np
import pytest


def _want_prefill(q, k, v, start, sliding_window=None):
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.attention import attention, mask_to_bias

    B, T = q.shape[0], q.shape[1]
    # ok[b, i, j] = (j <= i) & (j >= start_b)
    ok = (np.arange(T)[None, None, :] <= np.arange(T)[None, :, None]) & \
         (np.arange(T)[None, None, :] >= start[:, None, None])
    if sliding_window is not None:
        ok &= np.arange(T)[None, None, :] > \
            (np.arange(T)[None, :, None] - sliding_window)
    bias = mask_to_bias(jnp.asarray(ok[:, None]))
    return np.asarray(attention(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), bias))


def test_flash_prefill_matches_xla():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.prefill_attention import flash_prefill

    rng = np.random.default_rng(2)
    B, T, Hq, Hkv, D = 2, 160, 8, 4, 128
    q = rng.normal(0, 1, size=(B, T, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    start = np.array([0, 37], np.int32)

    want = _want_prefill(q, k, v, start)
    got = np.asarray(flash_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(start),
        block_q=64, block_k=64, interpret=True))
    # left-padded rows emit zeros from the kernel; compare valid queries only
    for b in range(B):
        np.testing.assert_allclose(got[b, start[b]:], want[b, start[b]:],
                                   rtol=2e-5, atol=2e-5)


def test_flash_prefill_sliding_window_and_ragged_blocks():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.prefill_attention import flash_prefill

    rng = np.random.default_rng(3)
    B, T, Hq, Hkv, D = 2, 100, 4, 2, 64   # T not a block multiple
    q = rng.normal(0, 1, size=(B, T, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    start = np.array([5, 0], np.int32)

    want = _want_prefill(q, k, v, start, sliding_window=24)
    got = np.asarray(flash_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(start),
        sliding_window=24, block_q=32, block_k=32, interpret=True))
    for b in range(B):
        np.testing.assert_allclose(got[b, start[b]:], want[b, start[b]:],
                                   rtol=2e-5, atol=2e-5)


def test_flash_prefill_bf16():
    import jax.numpy as jnp

    from qwen3_tts_tpu.ops.pallas.prefill_attention import flash_prefill

    rng = np.random.default_rng(4)
    B, T, Hq, Hkv, D = 1, 128, 4, 2, 128
    q = rng.normal(0, 1, size=(B, T, Hq, D)).astype(np.float32)
    k = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    v = rng.normal(0, 1, size=(B, T, Hkv, D)).astype(np.float32)
    start = np.array([11], np.int32)

    want = _want_prefill(q, k, v, start)
    got = np.asarray(flash_prefill(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(start),
        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got[0, 11:], want[0, 11:], rtol=3e-2, atol=3e-2)


def test_talker_prefill_flash_path_matches_dense(monkeypatch):
    """talker_prefill with the flash kernel active (threshold lowered) must
    match the dense-mask path: logits, hiddens, and KV cache writes."""
    import jax
    import jax.numpy as jnp

    from qwen3_tts_tpu import models
    from qwen3_tts_tpu.config import CodePredictorConfig, TalkerConfig
    from qwen3_tts_tpu.models import talker as talker_mod
    from qwen3_tts_tpu.models.talker import (KVCache, StackDims,
                                             talker_prefill)
    from qwen3_tts_tpu.utils.testing import random_talker_params

    cfg = TalkerConfig(
        vocab_size=1152, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, text_hidden_size=128, text_vocab_size=256,
        num_code_groups=4,
        code_predictor_config=CodePredictorConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, num_code_groups=4),
    )
    params = random_talker_params(cfg, jax.random.PRNGKey(0),
                                  dtype=jnp.float32)
    dims = StackDims.from_talker(cfg)
    B, T, S = 2, 40, 48
    embeds = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                     (B, T, cfg.hidden_size))
    mask = (np.arange(T)[None, :] >= np.array([[0], [7]])).astype(np.int32)
    mask = jnp.asarray(mask)

    def run():
        cache = KVCache.zeros(cfg.num_hidden_layers, B, S, dims.kv_heads,
                              dims.head_dim, dtype=jnp.float32)
        return talker_prefill(params, cfg, embeds, mask, cache)

    logits_d, h_d, cache_d = run()
    monkeypatch.setattr(talker_mod, "FLASH_PREFILL_MIN_T", 8)
    logits_f, h_f, cache_f = run()

    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_d),
                               rtol=1e-4, atol=1e-4)
    # padded rows differ (flash emits zeros there; dense emits garbage
    # attention of fully-masked rows) — both are discarded; compare valid
    for b in range(B):
        lo = int(T - np.asarray(mask).sum(axis=1)[b])
        np.testing.assert_allclose(np.asarray(h_f)[b, lo:],
                                   np.asarray(h_d)[b, lo:],
                                   rtol=1e-4, atol=1e-4)
    # cache slots of padded positions hold garbage on both paths (layer>0
    # inputs differ at padded rows) and are never attended (kv_valid False);
    # compare the valid slots only
    for b in range(B):
        lo = int(T - np.asarray(mask).sum(axis=1)[b])
        np.testing.assert_allclose(np.asarray(cache_f.k)[:, b, lo:T],
                                   np.asarray(cache_d.k)[:, b, lo:T],
                                   rtol=1e-4, atol=1e-4)


def test_bench_prefill_kernel_pair_equivalence(monkeypatch):
    """bench.py's fallback prefill row A/Bs `prefill_kernel_pair`'s flash
    and dense functions — the comparison is only meaningful if both compute
    the SAME causal attention (sum).  Verified in interpret mode at a tiny
    shape."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from qwen3_tts_tpu.ops.pallas import prefill_attention as pa

    # route the pair's flash side through interpret mode on CPU
    orig = pa.flash_prefill

    def flash_interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pa, "flash_prefill", flash_interp)

    from qwen3_tts_tpu.utils.testing import TALKER_1B7

    cfg, Bp, Tp = TALKER_1B7, 2, 64
    flash_fn, dense_fn = bench.prefill_kernel_pair(cfg, Bp, Tp)
    rng = jax.random.PRNGKey(0)
    q = (0.02 * jax.random.normal(
        rng, (Bp, Tp, cfg.num_attention_heads,
              cfg.resolved_head_dim))).astype(jnp.float32)
    k = (0.02 * jax.random.normal(
        jax.random.PRNGKey(1),
        (Bp, Tp, cfg.num_key_value_heads,
         cfg.resolved_head_dim))).astype(jnp.float32)
    a = float(flash_fn(q, k, k))
    b = float(dense_fn(q, k, k))
    assert a == pytest.approx(b, rel=1e-5)
