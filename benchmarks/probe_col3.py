"""Probe 3: column-kernel variants under scan-chain timing (reliable).

All variants are plain column FFTs (no twiddle/swap) with alias_io so the
scan carry costs nothing; ranking transfers to the tw/swap variants since
the question is pure block-layout DMA efficiency.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from scan_timer import scan_time

HBM_BW = 819e9
L, N, T = 8, 2048, 2048


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((L, N, T))
    nbytes = re.size * 4 * 4

    def report(name, fn, args, nb):
        dt = scan_time(fn, args, verbose=True)
        print(f"{name:40s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)
        return dt

    report("col plain lanes=128 (baseline)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True),
           (re, im), nbytes)
    report("col plain lanes=256",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2, lanes=256,
                                              alias_io=True),
           (re, im), nbytes)

    rr, ri = devdata((L * T, N), seed=1)
    report("row kernel n=2048",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                              alias_io=True),
           (rr, ri), nbytes)

    # the real pass-1 (tw+swap): shape-preserving at n1=n2, so scan works,
    # but no aliasing -> includes one carry-copy (~0.66 ms at this size).
    report("col tw+swap (includes carry copy)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              tw_n=N * T, swap_store=True),
           (re, im), nbytes)
    # calibrate the carry-copy cost: same kernel, no alias
    report("col plain NO-alias (copy calib)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2),
           (re, im), nbytes)

    # 3D z-pass shape
    r3, i3 = devdata((1, 256, 65536), seed=2)
    report("3D z col n=256 T=65536",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True),
           (r3, i3), r3.size * 4 * 4)

    # fused2d on 3D yx
    rf, if_ = devdata((256, 256, 256), seed=3)
    report("fused2d 256x256 (alias)",
           lambda r, i: pallas_local.fft2_fused(r, i, -1, alias_io=True),
           (rf, if_), rf.size * 4 * 4)


if __name__ == "__main__":
    main()
