"""Probe 8: the restructured four-step (col+tw -> row+swap-store) vs the
production (col+tw+swap -> col) form, at balanced and asymmetric splits;
plus a clean re-measure of the z-pass lane width."""
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
    print(f"{name:48s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def pair_prod(n1, n2, f1=None, f2=None):
    n = n1 * n2

    def fn(r, i):
        r = r.reshape(8, n1, n2)
        i = i.reshape(8, n1, n2)
        r, i = pallas_local.fft_axis(r, i, -1, axis=-2, tw_n=n,
                                     swap_store=True, factors=f1)
        r, i = pallas_local.fft_axis(r, i, -1, axis=-2, factors=f2)
        return r.reshape(8, n), i.reshape(8, n)
    return fn


def pair_b(n1, n2, f1=None, f2=None):
    n = n1 * n2

    def fn(r, i):
        r = r.reshape(8, n1, n2)
        i = i.reshape(8, n1, n2)
        # pass 1: col over j1 + tw, contiguous write of (k1, j2)
        r, i = pallas_local.fft_axis(r, i, -1, axis=-2, tw_n=n, factors=f1)
        # pass 2: row over j2, digit-swap store -> (k2, k1)
        r, i = pallas_local.fft_rows_swap(r, i, -1, factors=f2)
        return r.reshape(8, n), i.reshape(8, n)
    return fn


def main():
    assert jax.default_backend() in ("tpu", "axon")
    n = 1 << 22
    rf, if_ = devdata((8, n))
    nbf = rf.size * 4 * 4 * 2

    report("4step-b 2^22 (2048,2048)", pair_b(2048, 2048), (rf, if_), nbf)
    report("4step-b 2^22 (2048,2048) (4,4,2,64)x2",
           pair_b(2048, 2048, (4, 4, 2, 64), (4, 4, 2, 64)), (rf, if_), nbf)
    report("4step-b 2^22 (1024,4096)", pair_b(1024, 4096), (rf, if_), nbf)
    report("4step-b 2^22 (4096,1024)", pair_b(4096, 1024), (rf, if_), nbf)
    report("4step-prod 2^22 (2048,2048) [control]",
           pair_prod(2048, 2048), (rf, if_), nbf)

    # z-pass lane width, clean estimator
    r3, i3 = devdata((1, 256, 65536), seed=3)
    nb3 = r3.size * 4 * 4
    report("3D z col n=256 lanes=128",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True), (r3, i3), nb3)
    report("3D z col n=256 lanes=256",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2, lanes=256,
                                              alias_io=True), (r3, i3), nb3)


if __name__ == "__main__":
    main()
