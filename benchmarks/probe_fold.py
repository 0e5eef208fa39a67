"""Measure the r3 headline optimizations: FOLD_LAST_TW + radix-8 chains.

Context (probe_headline, r3): the headline row kernel's wall is VPU data
movement — load/store transposes, per-stage slice/stack rounds, twiddle
rounds — not MXU time.  The fold removes one full twiddle round; radix-8
chains remove one stage round AND one twiddle round vs (4,4,4,64).
Reference points from the load trail: unfolded kernel 0.4747 ms in a
quiet window (copy 675 GB/s), 0.76-0.83 ms loaded.
"""
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

N, B = 4096, 4096
BYTES = 4 * N * B * 4


def report(name, dt, gbs):
    gf = 5 * N * 12 * B / dt / 1e9
    print(f"{name:16s} {dt*1e3:7.4f} ms  {BYTES/dt/1e9:6.1f} GB/s "
          f"{gf:7.1f} GF  (copy {gbs:.0f} GB/s, ratio "
          f"{BYTES/dt/1e9/gbs:.3f})", flush=True)


def main():
    assert pallas_local.FOLD_LAST_TW
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)

    for name, factors in [
        ("fold-4.4.4.64", (4, 4, 4, 64)),
        ("fold-8.8.64", (8, 8, 64)),
        ("fold-2.8.4.64", (2, 8, 4, 64)),
    ]:
        try:
            dt = time_scan_chain(
                lambda r, i, _f=factors: pallas_local.fft_axis(
                    r, i, -1, axis=-1, alias_io=True, factors=_f),
                (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
