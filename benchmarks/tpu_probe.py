"""Quick on-TPU micro-bench driver (device-side data generation, tiny
fetches to force execution — the tunnel makes host transfers expensive)."""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def force(tree):
    return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0].ravel()[:1]))


def devdata(shape, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, shape, jnp.float32)
    im = jax.random.normal(k2, shape, jnp.float32)
    return re, im


def bench_fn(f, args, k1=4, k2=24, chain=True):
    """Returns seconds/iter via k-chained differencing."""
    o = f(*args)
    force(o)

    def run(k):
        t0 = time.perf_counter()
        o = args
        for _ in range(k):
            o = f(*o) if chain else f(*args)
        force(o)
        return time.perf_counter() - t0

    run(1)
    return (run(k2) - run(k1)) / (k2 - k1)


def gflops(shape, batch, dt):
    n = math.prod(shape)
    return 5 * n * math.log2(n) * batch / dt / 1e9


def parity_1d(f, n, rows=130, seed=1):
    rng = np.random.RandomState(seed)
    x = (rng.standard_normal((rows, n)) + 1j * rng.standard_normal((rows, n))).astype(np.complex64)
    rr, ii = f(jnp.asarray(x.real), jnp.asarray(x.imag))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    return float(np.abs(got - ref).max() / np.abs(ref).max())
