"""Measure the ACHIEVABLE HBM->VMEM streaming bandwidth on this chip.

The fused talker-step kernel sits at ~43% of the 819 GB/s v5e spec number
(BENCH_r03 pct_of_dma_floor).  Before restructuring the kernel, establish
what a Pallas grid pipeline can actually sustain here:

  1. pure-stream  — one big contiguous tensor read block-by-block through
     Mosaic's automatic double-buffered pipeline, trivial compute
     (accumulate a partial sum so nothing is DCE'd), several block sizes.
  2. kernel-shaped — the talker-step kernel's REAL per-step fetch set
     (one 8 MB qkv-like block + a (B, Hkv, Sc, D)-strided KV chunk pair +
     the tiny scale/norm vectors), same grid length, no compute: isolates
     the block-pattern cost from the compute overlap.
  3. xla-reduce   — jnp.sum over the same bytes: XLA's own streaming
     ceiling for reference.

Prints GB/s for each; the ratio (2)/(1) is the pattern tax, (1)/spec is
the Mosaic pipeline tax.  Env: DMA_GB total gigabytes per timed run
(default 2), DMA_REPS (default 5).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

REPS = int(os.environ.get("DMA_REPS", "5"))
# DMA_INTERPRET=1: CPU smoke test of the kernels (numbers meaningless)
INTERPRET = os.environ.get("DMA_INTERPRET", "0") == "1"


def _sync(x):
    np.asarray(x)


def _time(fn, *args):
    _sync(fn(*args))          # warm / compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        _sync(fn(*args))
        best = min(best, time.time() - t0)
    return best


# ---- 1. pure contiguous stream ------------------------------------------

def _stream_kernel(x_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc[:])

    # one cheap pass over the block: VPU add at fp32, ~free vs the DMA
    acc[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]


def stream_bw(total_bytes: int, block_mb: float, dtype=jnp.int8):
    esize = jnp.dtype(dtype).itemsize
    lane = 1024
    rows_total = total_bytes // (lane * esize)
    # Mosaic wants the block's second-to-last dim divisible by 8
    block_rows = max(8, (int(block_mb * 1e6) // (lane * esize)) // 8 * 8)
    n = max(1, rows_total // block_rows)
    x = jnp.ones((n * block_rows, lane), dtype)

    fn = pl.pallas_call(
        _stream_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((block_rows, lane), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lane,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((lane,), jnp.float32)],
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    sec = _time(jax.jit(fn), x)
    return x.nbytes / sec / 1e9, x.nbytes


# ---- 2. kernel-shaped fetch set ------------------------------------------

def _shaped_kernel(w_ref, k_ref, v_ref, s1_ref, s2_ref, o_ref, acc):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[:] = jnp.zeros_like(acc[:])

    acc[:] += (jnp.sum(w_ref[:].astype(jnp.float32), axis=(0, 1))[:128]
               + jnp.sum(k_ref[:].astype(jnp.float32), axis=(0, 1, 2, 3))
               + jnp.sum(v_ref[:].astype(jnp.float32), axis=(0, 1, 2, 3))
               + jnp.sum(s1_ref[:]) + jnp.sum(s2_ref[:]))

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc[:]


def shaped_bw(L=28, B=32, Hkv=8, Sc=128, S_buf=256, D=128, Wr=4096, H=2048,
              kv_dtype=jnp.bfloat16, contiguous_kv=False):
    """Per grid step: one (Wr, H) int8 weight block (8 MB at 4096x2048) +
    one KV chunk pair in the talker-step kernel's fused layout + two tiny
    fp32 vectors — the kernel's attention-phase fetch profile.

    contiguous_kv=True stores the cache chunk-major ((L*nS, B, Hkv, Sc, D):
    each chunk one contiguous 8.4 MB run) instead of the production fused
    layout ((L, B, Hkv, S_buf, D): each chunk B*Hkv strided 32 KB runs) —
    the A/B that prices a chunk-contiguous cache relayout."""
    w = jnp.ones((L, Wr, H), jnp.int8)
    nS = S_buf // Sc
    if contiguous_kv:
        k = jnp.ones((L * nS, B, Hkv, Sc, D), kv_dtype)
        v = jnp.ones((L * nS, B, Hkv, Sc, D), kv_dtype)
        kv_spec = pl.BlockSpec((1, B, Hkv, Sc, D), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        k = jnp.ones((L, B, Hkv, S_buf, D), kv_dtype)
        v = jnp.ones((L, B, Hkv, S_buf, D), kv_dtype)

        def kvmap(i):
            return (i // nS, 0, 0, i % nS, 0)

        kv_spec = pl.BlockSpec((1, B, Hkv, Sc, D), kvmap,
                               memory_space=pltpu.VMEM)
    s1 = jnp.ones((L, 1, H), jnp.float32)
    s2 = jnp.ones((L, 1, H), jnp.float32)

    fn = pl.pallas_call(
        functools.partial(_shaped_kernel),
        grid=(L * nS,),
        in_specs=[
            pl.BlockSpec((1, Wr, H), lambda i: (i // nS, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, 1, H), lambda i: (i // nS, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda i: (i // nS, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128,), jnp.float32)],
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024),
    )
    sec = _time(jax.jit(fn), w, k, v, s1, s2)
    # bytes actually moved: each weight block fetched once per layer (Mosaic
    # skips refetch of an unchanged block across the nS phases), each KV
    # chunk once, vectors once per layer
    moved = w.nbytes + k.nbytes + v.nbytes + s1.nbytes + s2.nbytes
    return moved / sec / 1e9, moved


# ---- 3. XLA reduce baseline ----------------------------------------------

def xla_bw(total_bytes: int, dtype=jnp.int8):
    lane = 1024
    rows = total_bytes // (lane * jnp.dtype(dtype).itemsize)
    x = jnp.ones((rows, lane), dtype)
    fn = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    sec = _time(fn, x)
    return x.nbytes / sec / 1e9, x.nbytes


def main():
    total = int(float(os.environ.get("DMA_GB", "2")) * 1e9)
    print(f"platform={jax.devices()[0].platform} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    for mb in (2, 4, 8, 16, 32):
        bw, nb = stream_bw(total, mb)
        print(f"pure-stream block={mb:>3} MB: {bw:7.1f} GB/s "
              f"({nb / 1e9:.2f} GB)", flush=True)
    for S_buf in (256, 1024):
        for contig in (False, True):
            bw, nb = shaped_bw(S_buf=S_buf, contiguous_kv=contig)
            tag = "contig" if contig else "strided"
            print(f"kernel-shaped S={S_buf:4d} kv={tag}: {bw:7.1f} GB/s "
                  f"({nb / 1e9:.2f} GB)", flush=True)
    bw, nb = xla_bw(total)
    print(f"xla-reduce: {bw:7.1f} GB/s ({nb / 1e9:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
