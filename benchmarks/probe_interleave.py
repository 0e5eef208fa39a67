"""Interleaved-mode cost study (VERDICT r2 item 7).

probe_headline (r3) measured the fused interleaved row kernel at 2.9 ms
on the headline shape — 3.7x the planar kernel, i.e. the in-kernel
de/re-interleave (pairs reshape + mid-dim slices after the transpose) is
a de-optimization at n=4096.  Candidates:

  fusedkern   current fused interleaved row kernel (view path, 1-pass 1D)
  xlaconv     XLA de-interleave -> planar kernel -> XLA re-interleave,
              one jitted program (strided slice + stack passes)
  planar      reference point (no conversion at all)

Decides whether plan.py's view path should prefer XLA conversions over
the fused kernel, and whether a dedicated Pallas zip/unzip is worth it.
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
    print(f"{name:10s} {dt*1e3:7.4f} ms  {BYTES/dt/1e9:6.1f} GB/s "
          f"{gf:7.1f} GF  (copy {gbs:.0f} GB/s, ratio "
          f"{BYTES/dt/1e9/gbs:.3f})", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    v = jax.random.normal(k1, (B, 2 * N), jnp.float32)
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)

    def xlaconv(a):
        pairs = a.reshape(B, N, 2)
        rr, ii = pallas_local.fft_axis(pairs[..., 0], pairs[..., 1], -1,
                                       axis=-1, alias_io=False)
        return jnp.stack([rr, ii], axis=-1).reshape(B, 2 * N)

    cases = [
        ("planar", lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True), (re, im)),
        ("xlaconv", xlaconv, (v,)),
        ("fusedkern", lambda a: pallas_local.fft_rows_interleaved(
            a, -1, alias_io=True), (v,)),
    ]
    for name, fn, args in cases:
        try:
            dt = time_scan_chain(fn, args, trials=5)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
