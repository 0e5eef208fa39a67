"""Probe 6: factor-chain and lane-size candidates from probe 5's finding
(MXU-128 stages make odd-log2 kernels compute-bound; MXU-64 overlaps)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args)
    print(f"{name:46s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def col(factors=None, lanes=128):
    return lambda r, i: pallas_local.fft_axis(
        r, i, -1, axis=-2, factors=factors, lanes=lanes, alias_io=True)


def row(factors=None, lanes=128):
    return lambda r, i: pallas_local.fft_axis(
        r, i, -1, axis=-1, factors=factors, lanes=lanes, alias_io=True)


def main():
    assert jax.default_backend() in ("tpu", "axon")

    re, im = devdata((8, 2048, 2048))
    nb = re.size * 4 * 4
    report("col n=2048 (4,4,128) [prod]", col(), (re, im), nb)
    report("col n=2048 (2,4,4,64)", col((2, 4, 4, 64)), (re, im), nb)
    report("col n=2048 (4,4,2,64)", col((4, 4, 2, 64)), (re, im), nb)
    report("col n=2048 (4,4,4,32) ", col((4, 4, 4, 32)), (re, im), nb)

    rr, ri = devdata((8 * 2048, 2048), seed=1)
    report("row n=2048 (2,4,4,64)", row((2, 4, 4, 64)), (rr, ri), nb)

    rh, ih = devdata((4096, 4096), seed=2)
    nb2 = rh.size * 4 * 4
    report("row n=4096 (4,4,4,64) lanes=256",
           row(lanes=256), (rh, ih), nb2)
    report("row n=4096 (4,4,4,64) lanes=128 [prod]",
           row(), (rh, ih), nb2)

    r8, i8 = devdata((2048, 8192), seed=3)
    nb3 = r8.size * 4 * 4
    report("row n=8192 (4,4,4,128) [prod]", row(), (r8, i8), nb3)
    report("row n=8192 (2,4,4,4,64)", row((2, 4, 4, 4, 64)), (r8, i8), nb3)

    # 3D z-pass: n=256 over T=65536
    r3, i3 = devdata((1, 256, 65536), seed=4)
    nb4 = r3.size * 4 * 4
    report("3D z col n=256 (4,64) [prod]", col(), (r3, i3), nb4)
    report("3D z col n=256 (2,2,64)", col((2, 2, 64)), (r3, i3), nb4)
    report("3D z col n=256 (4,4,16)", col((4, 4, 16)), (r3, i3), nb4)


if __name__ == "__main__":
    main()
