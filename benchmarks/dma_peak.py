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
     the block-pattern cost from the compute overlap.  `contig` variant
     stores the cache chunk-major (each chunk one contiguous run) — the
     A/B that prices a chunk-contiguous cache relayout.
  3. xla-reduce   — a shifted-window sum over the same bytes: XLA's own
     streaming ceiling for reference.

Timing: on this environment every device sync costs a ~30 ms tunnel round
trip — far more than streaming 2 GB (2.4 ms at spec).  Every test therefore
streams its data P times INSIDE one invocation (a leading grid/scan pass
axis; block indices change every step so Mosaic refetches), measured at two
pass counts; bandwidth comes from the SLOPE (t(P2)-t(P1)) / ((P2-P1)*bytes),
which cancels the constant launch + sync overhead exactly.

Prints GB/s for each; the ratio (2)/(1) is the pattern tax, (1)/spec is
the Mosaic pipeline tax.  Env: DMA_GB gigabytes per pass (default 2),
DMA_REPS (default 3), DMA_P1/DMA_P2 pass counts (default 2/10).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qwen3_tts_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

REPS = int(os.environ.get("DMA_REPS", "3"))
P1 = int(os.environ.get("DMA_P1", "2"))
P2 = int(os.environ.get("DMA_P2", "10"))
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


def _slope_bw(build, bytes_per_pass):
    """Best-of-REPS at P1 and P2 passes; GB/s from the time slope (the
    constant per-invocation launch/sync overhead cancels)."""
    t1 = _time(build(P1))
    t2 = _time(build(P2))
    dt = max(t2 - t1, 1e-9)
    return (P2 - P1) * bytes_per_pass / dt / 1e9


# ---- 1. pure contiguous stream ------------------------------------------

def _stream_kernel(x_ref, o_ref, acc):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc[:])

    # one cheap pass over the block: VPU add at fp32, ~free vs the DMA
    acc[:] += jnp.sum(x_ref[:].astype(jnp.float32), axis=0)

    @pl.when(i == pl.num_programs(0) * pl.num_programs(1) - 1)
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

    def build(P):
        fn = pl.pallas_call(
            _stream_kernel,
            grid=(P, n),
            in_specs=[pl.BlockSpec((block_rows, lane), lambda p, i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lane,), jnp.float32),
            scratch_shapes=[pltpu.VMEM((lane,), jnp.float32)],
            interpret=INTERPRET,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024),
        )
        jfn = jax.jit(fn)
        return lambda: jfn(x)

    return _slope_bw(build, x.nbytes), x.nbytes


# ---- 2. kernel-shaped fetch set ------------------------------------------

def _shaped_kernel(w_ref, k_ref, v_ref, s1_ref, s2_ref, o_ref, acc):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc[:])

    acc[:] += (jnp.sum(w_ref[:].astype(jnp.float32), axis=(0, 1))[:128]
               + jnp.sum(k_ref[:].astype(jnp.float32), axis=(0, 1, 2, 3))
               + jnp.sum(v_ref[:].astype(jnp.float32), axis=(0, 1, 2, 3))
               + jnp.sum(s1_ref[:]) + jnp.sum(s2_ref[:]))

    @pl.when(i == pl.num_programs(0) * pl.num_programs(1) - 1)
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
        kv_spec = pl.BlockSpec((1, B, Hkv, Sc, D),
                               lambda p, i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        k = jnp.ones((L, B, Hkv, S_buf, D), kv_dtype)
        v = jnp.ones((L, B, Hkv, S_buf, D), kv_dtype)

        def kvmap(p, i):
            return (i // nS, 0, 0, i % nS, 0)

        kv_spec = pl.BlockSpec((1, B, Hkv, Sc, D), kvmap,
                               memory_space=pltpu.VMEM)
    s1 = jnp.ones((L, 1, H), jnp.float32)
    s2 = jnp.ones((L, 1, H), jnp.float32)

    def build(P):
        fn = pl.pallas_call(
            functools.partial(_shaped_kernel),
            grid=(P, L * nS),
            in_specs=[
                pl.BlockSpec((1, Wr, H), lambda p, i: (i // nS, 0, 0),
                             memory_space=pltpu.VMEM),
                kv_spec,
                kv_spec,
                pl.BlockSpec((1, 1, H), lambda p, i: (i // nS, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, H), lambda p, i: (i // nS, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128,), jnp.float32),
            scratch_shapes=[pltpu.VMEM((128,), jnp.float32)],
            interpret=INTERPRET,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024),
        )
        jfn = jax.jit(fn)
        return lambda: jfn(w, k, v, s1, s2)

    # bytes actually moved per pass: each weight block fetched once per
    # layer (Mosaic skips refetch of an unchanged block across the nS
    # phases), each KV chunk once, vectors once per layer
    moved = w.nbytes + k.nbytes + v.nbytes + s1.nbytes + s2.nbytes
    return _slope_bw(build, moved), moved


# ---- 3. XLA reduce baseline ----------------------------------------------

def xla_bw(total_bytes: int, dtype=jnp.int8):
    lane = 1024
    rows = total_bytes // (lane * jnp.dtype(dtype).itemsize)

    def build(P):
        # shifted-window sums: each pass reads a different (rows, lane)
        # window so the loop body cannot be hoisted as loop-invariant
        x = jnp.ones((rows + P, lane), dtype)

        @jax.jit
        def fn(a):
            def body(i, acc):
                win = jax.lax.dynamic_slice(a, (i, 0), (rows, lane))
                return acc + jnp.sum(win.astype(jnp.float32))

            return jax.lax.fori_loop(0, P, body, jnp.float32(0))

        return lambda: fn(x)

    return _slope_bw(build, rows * lane * jnp.dtype(dtype).itemsize), \
        rows * lane


def main():
    total = int(float(os.environ.get("DMA_GB", "2")) * 1e9)
    print(f"platform={jax.devices()[0].platform} "
          f"device={jax.devices()[0].device_kind} "
          f"passes={P1}->{P2}", flush=True)
    for mb in (2, 4, 8, 16):
        bw, nb = stream_bw(total, mb)
        print(f"pure-stream block={mb:>3} MB: {bw:7.1f} GB/s "
              f"({nb / 1e9:.2f} GB/pass)", flush=True)
    for S_buf in (256, 1024):
        for contig in (False, True):
            bw, nb = shaped_bw(S_buf=S_buf, contiguous_kv=contig)
            tag = "contig" if contig else "strided"
            print(f"kernel-shaped S={S_buf:4d} kv={tag}: {bw:7.1f} GB/s "
                  f"({nb / 1e9:.2f} GB/pass)", flush=True)
    bw, nb = xla_bw(total)
    print(f"xla-reduce: {bw:7.1f} GB/s ({nb / 1e9:.2f} GB/pass)", flush=True)


if __name__ == "__main__":
    main()
