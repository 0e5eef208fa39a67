"""Multi-lane-tile column blocks (ctile): does amortizing the ~3.4 us
per-grid-step cost fix the small-n column-pass wall?  (3D z-pass shape:
n=256, trail=65536; SOL 0.31 ms at 819 GB/s, classic kernel 1.2 ms.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

S = 256
BYTES = S * S * S * 4 * 2 * 2


def report(name, dt, gbs):
    print(f"{name:16s} {dt*1e3:7.4f} ms  {BYTES/dt/1e9:6.1f} GB/s(io) "
          f"(copy {gbs:.0f} GB/s, ratio {BYTES/dt/1e9/gbs:.3f})", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (S, S * S), jnp.float32)
    im = jax.random.normal(k2, (S, S * S), jnp.float32)

    for c in (0, 2, 4, 8):
        name = f"col-z ctile={c}"
        try:
            fn = lambda r, i, _c=c: pallas_local.fft_axis(
                r, i, -1, axis=0, alias_io=True, ctile=_c)
            dt = time_scan_chain(fn, (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
