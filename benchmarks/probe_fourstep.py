"""Decompose the c64 2^22 b=8 four-step (config 6+): which pass is slow?

Pass 1 = col n1 + full twiddle + swap_store (write-strided, no alias);
pass 2 = plain col n2 (aliased).  SOL per pass at 819 GB/s for the
(8, 2048, 2048) planar shape is ~0.62 ms.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local, fourstep
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

B = 8
N = 1 << 22
N1, N2 = fourstep.choose_split(N)
BYTES = B * N * 4 * 2 * 2      # planar in+out per pass


def report(name, dt, gbs, passes=1):
    b = BYTES * passes
    print(f"{name:22s} {dt*1e3:7.4f} ms  {b/dt/1e9:6.1f} GB/s(io) "
          f"(copy {gbs:.0f} GB/s, ratio {b/dt/1e9/gbs:.3f})", flush=True)


def main():
    print(f"split: ({N1}, {N2})", flush=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N1, N2), jnp.float32)
    im = jax.random.normal(k2, (B, N1, N2), jnp.float32)

    cases = [
        ("pass1 col+tw+swap", 1, lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-2, tw_n=N, swap_store=True)),
        ("pass1 col+tw (noswap)", 1, lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-2, tw_n=N, alias_io=True)),
        ("pass1 col plain", 1, lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-2, alias_io=True)),
        ("pass2 col plain", 1, lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-2, alias_io=True)),
        ("full fourstep", 2, lambda r, i: tuple(
            a.reshape(B, N1, N2) for a in fourstep.fft_axis_large(
                r.reshape(B, N), i.reshape(B, N), -1, axis=-1))),
    ]
    for name, passes, fn in cases:
        try:
            dt = time_scan_chain(fn, (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs, passes)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
