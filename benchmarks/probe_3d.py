"""Decompose the 3D 256^3 plan (fused2d + z col pass) — which pass eats
the 2.29 ms?  (SOL for 2 passes at 819 GB/s is 0.64 ms; col n=1024
reached 0.93x of copy after radix-8+fold, so 3D at 0.28x has a
pass-local problem, not a congestion one.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

S = 256
TOTAL = S * S * S
BYTES = TOTAL * 4 * 2 * 2      # planar in+out per pass


def report(name, dt, gbs, passes=1):
    b = BYTES * passes
    print(f"{name:16s} {dt*1e3:7.4f} ms  {b/dt/1e9:6.1f} GB/s(io) "
          f"(copy {gbs:.0f} GB/s, ratio {b/dt/1e9/gbs:.3f})", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (S, S, S), jnp.float32)
    im = jax.random.normal(k2, (S, S, S), jnp.float32)

    cases = [
        ("fused2d-yx", 1, lambda r, i: pallas_local.fft2_fused(
            r, i, -1, alias_io=True)),
        ("col-z", 1, lambda r, i: tuple(
            a.reshape(S, S, S) for a in pallas_local.fft_axis(
                r.reshape(S, S * S), i.reshape(S, S * S), -1, axis=0,
                alias_io=True))),
        ("col-z-l256", 1, lambda r, i: tuple(
            a.reshape(S, S, S) for a in pallas_local.fft_axis(
                r.reshape(S, S * S), i.reshape(S, S * S), -1, axis=0,
                lanes=256, alias_io=True))),
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
