"""Headline diagnosis round 2: where does the IO-path time go?

probe_headline round 1 (r3) measured: default-precision row kernel (6x
less MXU work) still 0.63 ms vs the 0.39 ms DMA floor — the wall is VPU
data movement (load/store transposes, per-stage concats, twiddle
multiplies, butterfly slice/stack relayouts), not MXU time.  This round
separates those: the column shape has NO transposes, so its default-
precision time is (DMA + stage movement) alone; stacked=False swaps the
per-MXU-stage concat for 4 half-width matmuls.
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
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    reT = jax.random.normal(k1, (N, B), jnp.float32)
    imT = jax.random.normal(k2, (N, B), jnp.float32)
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)

    variants = {
        # col shape: no transposes; default precision: ~no MXU time.
        # -> pure (DMA + butterfly/concat/twiddle movement) floor
        "col-default": (lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=0, alias_io=True, precision="default"),
            (reT, imT)),
        # col shape, full precision, unstacked MXU stage (no concats,
        # 4 half-width matmuls instead)
        "col-unstacked": (lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=0, alias_io=True, stacked=False),
            (reT, imT)),
        # row kernel, unstacked
        "row-unstacked": (lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True, stacked=False),
            (re, im)),
        # col shape, all-butterfly chain (no MXU stage at all, 6 radix-4):
        # isolates butterfly slice/stack movement vs matmul+concat
        "col-butterfly": (lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=0, alias_io=True,
            factors=(4, 4, 4, 4, 4, 4)), (reT, imT)),
    }
    for name, (fn, args) in variants.items():
        try:
            dt = time_scan_chain(fn, args, trials=4)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
