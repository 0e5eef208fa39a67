"""Radix-8 + fold for COLUMN kernels, on the real four-step shapes.

The 2^22 four-step runs col n=1024 (pass 1, tw+swap) then col n=4096
(pass 2); the 3D/2D configs run col kernels too.  probe_fold showed
radix-8 + folded-twiddle chains beat (4,4,4,64) by ~24% on the row
kernel; this measures the col analogs.
"""
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

ELEMS = 1 << 25          # 2^22 x batch 8, the config-6+ volume
BYTES = 4 * ELEMS * 4


def report(name, dt, gbs):
    print(f"{name:18s} {dt*1e3:7.4f} ms  {BYTES/dt/1e9:6.1f} GB/s "
          f"(copy {gbs:.0f} GB/s, ratio {BYTES/dt/1e9/gbs:.3f})", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))

    # pass-2 shape: (L=8, n=4096, T=1024) col FFT over axis 1
    ra = jax.random.normal(k1, (8, 4096, 1024), jnp.float32)
    ia = jax.random.normal(k2, (8, 4096, 1024), jnp.float32)
    # pass-1-like shape without tw/swap: (L=8, n=1024, T=4096)
    rb = jax.random.normal(k1, (8, 1024, 4096), jnp.float32)
    ib = jax.random.normal(k2, (8, 1024, 4096), jnp.float32)

    cases = [
        ("col4096-cur", (4, 4, 4, 64), (ra, ia)),
        ("col4096-8.8.64", (8, 8, 64), (ra, ia)),
        ("col1024-cur", (4, 4, 64), (rb, ib)),
        ("col1024-8.2.64", (8, 2, 64), (rb, ib)),
        ("col1024-2.8.64", (2, 8, 64), (rb, ib)),
    ]
    for name, factors, (r, i) in cases:
        try:
            dt = time_scan_chain(
                lambda rr, ii, _f=factors: pallas_local.fft_axis(
                    rr, ii, -1, axis=1, alias_io=True, factors=_f),
                (r, i), trials=5)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
