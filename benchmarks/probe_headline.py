"""Round-3 headline kernel diagnosis (VERDICT r2 item 1b).

Question: the headline row kernel (1D c64 n=4096, batch=4096) measures
~0.58 ms against a concurrently near-spec copy probe — where does the
~0.16 ms over the 0.42 ms DMA floor go?  Variants timed side by side:

  base      current production kernel (alias_io)
  noalias   same without input/output aliasing
  rows256   256-row blocks (fewer, bigger grid steps; minor dim unchanged)
  arbitrary dimension_semantics=("arbitrary",)
  colshape  the same transform as a column kernel (data pre-transposed:
            zero in-kernel transposes, known non-overlapping shape)
  default   precision=DEFAULT (1 bf16 pass instead of HIGHEST's 6):
            compute ~6x smaller -> measures the kernel's pure IO+transpose
            floor; if this is ~0.42 ms the gap is unhidden MXU compute,
            if it is ~0.58 ms the gap is in the IO path itself.
"""
import time

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
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)
    reT = re.T.copy()
    imT = im.T.copy()

    variants = {
        "base": lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True),
        "noalias": lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1),
        "default": lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True, precision="default"),
    }
    for name, fn in variants.items():
        try:
            dt = time_scan_chain(fn, (re, im), trials=4)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # interleaved: ONE (B, 2N) buffer instead of two planes — same math,
    # different DMA stream structure (de/interleave is a free row reshape)
    v = jax.random.normal(k1, (B, 2 * N), jnp.float32)
    try:
        dt = time_scan_chain(
            lambda a: pallas_local.fft_rows_interleaved(a, -1,
                                                        alias_io=True),
            (v,), trials=4)
        gbs = copy_bandwidth_gbs(trials=2)
        report("interleav", dt, gbs)
    except Exception as e:
        print(f"interleav: FAILED {type(e).__name__}: {e}", flush=True)

    # column-shaped: transform on sublanes, batch on lanes, no transposes
    try:
        dt = time_scan_chain(
            lambda r, i: pallas_local.fft_axis(r, i, -1, axis=0,
                                               alias_io=True),
            (reT, imT), trials=4)
        gbs = copy_bandwidth_gbs(trials=2)
        report("colshape", dt, gbs)
    except Exception as e:
        print(f"colshape: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
