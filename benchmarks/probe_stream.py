"""Probe: manually double-buffered streaming col kernel vs the
auto-pipelined one."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from benchmarks.pallas_stream import fft_cols_stream
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args)
    print(f"{name:52s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((8, 2048, 2048))
    nb = re.size * 4 * 4
    report("col n=2048 auto (4,4,4,32) alias [control]",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True), (re, im), nb)
    report("col n=2048 STREAM (manual double-buffer)",
           lambda r, i: fft_cols_stream(r, i, -1, axis=-2), (re, im), nb)

    r3, i3 = devdata((1, 256, 65536), seed=2)
    nb3 = r3.size * 4 * 4
    report("3D z col n=256 auto lanes=256 [control]",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True), (r3, i3), nb3)
    report("3D z col n=256 STREAM",
           lambda r, i: fft_cols_stream(r, i, -1, axis=-2), (r3, i3), nb3)
    report("3D z col n=256 STREAM lanes=256",
           lambda r, i: fft_cols_stream(r, i, -1, axis=-2, lanes=256),
           (r3, i3), nb3)


if __name__ == "__main__":
    main()
