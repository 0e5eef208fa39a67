"""On-TPU micro-bench helpers (thin wrappers over pyfft_tpu.utils.profiling
plus device-side data generation — host transfers through this environment's
tunnel are too slow to include in timing)."""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.utils.profiling import effective_gflops, force, time_chained


def devdata(shape, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, shape, jnp.float32)
    im = jax.random.normal(k2, shape, jnp.float32)
    return re, im


def bench_fn(f, args, k1=4, k2=24, chain=True):
    return time_chained(f, args, k_small=k1, k_large=k2)


def gflops(shape, batch, dt):
    return effective_gflops(shape, batch, dt)


def parity_1d(f, n, rows=130, seed=1):
    rng = np.random.RandomState(seed)
    x = (rng.standard_normal((rows, n))
         + 1j * rng.standard_normal((rows, n))).astype(np.complex64)
    rr, ii = f(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    return float(np.abs(got - ref).max() / np.abs(ref).max())
