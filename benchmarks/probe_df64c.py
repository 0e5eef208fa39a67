"""Probe: single-stage full-matrix int8-MXU df64 kernels (extraction
amortized over one big exact MXU contraction) vs butterfly chains."""
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
    vol = 1 << 24           # total complex elements per measurement
    for n, facs in ((256, (256,)), (512, (512,)), (512, (2, 256)),
                    (1024, (4, 256)), (2048, (4, 2, 256)),
                    (256, (4, 4, 4, 4))):
        q = devquad((1, n, vol // n), seed=n + len(facs))
        nb = q[0].size * 4 * 8
        report(f"df64 col n={n} {facs}",
               lambda *p, f=facs: P.fft_axis_df64(p, -1, axis=-2, factors=f),
               q, nb)


if __name__ == "__main__":
    main()
