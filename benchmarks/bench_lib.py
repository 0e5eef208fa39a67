"""Benchmark harness: GFLOP/s = 5*N*log2(N)*batch / time (BASELINE.md metric).

Times the jitted planar transform with device-resident inputs (the metric the
reference's test_performance.py measured: repeated execute on GPU-resident
arrays, host timers around synchronized runs — SURVEY.md §4).
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def effective_flops(shape, batch):
    n = math.prod(shape)
    return 5.0 * n * math.log2(n) * batch


def time_fn(fn, args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters


def bench_planar(run_planar, shape, batch, real_dtype=np.float32,
                 iters=20, seed=0):
    """run_planar(re, im) -> (re, im); returns (seconds, gflops)."""
    rng = np.random.RandomState(seed)
    full = (batch,) + tuple(shape) if batch > 1 else tuple(shape)
    re = jnp.asarray(rng.standard_normal(full).astype(real_dtype))
    im = jnp.asarray(rng.standard_normal(full).astype(real_dtype))
    fn = jax.jit(run_planar)
    dt = time_fn(fn, (re, im), iters=iters)
    gflops = effective_flops(shape, batch) / dt / 1e9
    return dt, gflops


def hbm_roofline_gflops(shape, batch, bytes_per_elem=8, bw_bytes=819e9,
                        passes=1):
    """Effective-GFLOP/s ceiling if the transform is HBM-bandwidth-bound.

    passes = number of full read+write round trips through HBM.
    v5e HBM ~819 GB/s.
    """
    n = math.prod(shape)
    bytes_moved = 2 * n * batch * bytes_per_elem * passes
    t = bytes_moved / bw_bytes
    return effective_flops(shape, batch) / t / 1e9
