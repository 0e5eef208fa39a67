"""Headline kernel block-size sweep: grid granularity vs pipeline overlap.
The (128, 4096) block gives 32 grid steps; arithmetic from probe_parts
says DMA (0.36 ms) + compute (~0.21 ms) ~ measured 0.57 quiet — i.e.
Mosaic overlaps little.  Smaller blocks = finer pipeline stages.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

N, B = 4096, 4096
BYTES = 4 * N * B * 4

def report(name, dt, gbs):
    gf = 5 * N * 12 * B / dt / 1e9
    print(f"{name:14s} {dt*1e3:7.4f} ms {gf:7.1f} GF "
          f"(copy {gbs:.0f} GB/s, ratio {BYTES/dt/1e9/gbs:.3f})", flush=True)

def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)
    for lanes in (128, 64, 32, 256):
        try:
            fn = lambda r, i, _l=lanes: pallas_local.fft_axis(
                r, i, -1, axis=-1, alias_io=True, lanes=_l)
            dt = time_scan_chain(fn, (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(f"lanes={lanes}", dt, gbs)
        except Exception as e:
            print(f"lanes={lanes}: FAILED {type(e).__name__}: {e}", flush=True)

if __name__ == "__main__":
    main()
