"""Probe: df64 kernel efficiency vs tile size n (find the spill-free sweet
spot) and butterfly vs int8-MXU chains at small n."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_df64 as P
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devquad(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return tuple(jax.random.normal(k, shape, jnp.float32) * s
                 for k, s in zip(ks, (1.0, 1e-8, 1.0, 1e-8)))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args, trials=4)
    print(f"{name:48s} {dt*1e3:9.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def main():
    assert jax.default_backend() in ("tpu", "axon")
    # constant total volume 2^25 complex df64 elements
    for n in (256, 512, 1024):
        q = devquad((1, n, (1 << 25) // n), seed=n)
        nb = q[0].size * 4 * 8
        bf = P.default_factors_df64(n)
        mx = P.mxu_factors_df64(n)
        report(f"df64 col n={n} butterfly {bf}",
               lambda *p, f=bf: P.fft_axis_df64(p, -1, axis=-2, factors=f),
               q, nb)
        report(f"df64 col n={n} int8-MXU {mx}",
               lambda *p, f=mx: P.fft_axis_df64(p, -1, axis=-2, factors=f),
               q, nb)


if __name__ == "__main__":
    main()
