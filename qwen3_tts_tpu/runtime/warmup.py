"""Serving warmup: precompile the standard jit shape set.

First compiles of the big generation programs can take minutes (remote
compile services, cold caches). Production servers call `warmup_model` once
at startup so live traffic only ever hits the jit cache. Combine with
JAX_COMPILATION_CACHE_DIR to persist across restarts.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def warmup_model(model, prefill_buckets: Sequence[int] = (32, 64),
                 batch_sizes: Sequence[int] = (1,),
                 max_new_tokens: Optional[int] = None,
                 verbose: bool = True) -> float:
    """Compile the generation program for each (batch, prefill bucket) pair,
    routed exactly like `Qwen3TTSModel._run` (fused while_loop <= 1024
    frames, chunked above — warming the OTHER program would leave live
    traffic on a cold multi-minute compile).

    `model`: a Qwen3TTSModel. Returns total warmup seconds.
    """
    from ..runtime.generate import generate_frames, generate_frames_chunked

    cfg = model.config.talker_config
    kw = model._merge_generate_kwargs()
    if max_new_tokens is not None:
        kw["max_new_tokens"] = max_new_tokens
    gen_cfg = model._generation_config(kw)
    # mirror Qwen3TTSModel._run's path selection
    run = (generate_frames_chunked if gen_cfg.max_new_tokens > 1024
           else generate_frames)

    t0 = time.time()
    dtype = model.talker_params["codec_embedding"].dtype
    H = cfg.hidden_size
    for B in batch_sizes:
        for L in prefill_buckets:
            embeds = jnp.zeros((B, L, H), dtype)
            mask = jnp.ones((B, L), jnp.int32)
            trailing = jnp.zeros((B, 32, H), dtype)
            pad = jnp.zeros((1, 1, H), dtype)
            out = run(model.talker_params, cfg, gen_cfg, embeds,
                      mask, trailing, pad, jax.random.PRNGKey(0))
            np.asarray(out.lengths)
            if verbose:
                print(f"[warmup] B={B} L={L} done at {time.time() - t0:.1f}s")
    return time.time() - t0
