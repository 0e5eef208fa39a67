"""A/B the headline chain now that MXU HIGHEST passes are the measured
wall (probe_parts: fft-def fits under the DMA shadow, fft-high does
not): all-butterfly (8,8,8,8) chains (zero MXU madds — newly possible
with r3's radix-8) and the int8 stage (4.5 bf16-equivalents, extraction
VPU cost now shadowed) vs the shipping (8,8,64)-fold HIGHEST chain.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

N, B = 4096, 4096
BYTES = 4 * N * B * 4

def report(name, dt, gbs, err):
    gf = 5 * N * 12 * B / dt / 1e9
    print(f"{name:18s} {dt*1e3:7.4f} ms {gf:7.1f} GF  err={err:.2e} "
          f"(copy {gbs:.0f} GB/s, ratio {BYTES/dt/1e9/gbs:.3f})", flush=True)

def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)
    ref = np.fft.fft(np.asarray(re)[:8].astype(np.float64)
                     + 1j*np.asarray(im)[:8].astype(np.float64), axis=-1)
    sc = np.abs(ref).max()
    cases = [
        ("8.8.64-high", dict()),
        ("8.8.8.8-bfly", dict(factors=(8, 8, 8, 8))),
        ("4.8.8.8-bfly", dict(factors=(4, 8, 8, 8))),
        ("8.8.64-int8", dict(precision="int8")),
    ]
    for name, kw in cases:
        try:
            fn = lambda r, i, _kw=kw: pallas_local.fft_axis(
                r, i, -1, axis=-1, alias_io=True, **_kw)
            yr, yi = fn(re, im)
            got = np.asarray(yr)[:8] + 1j*np.asarray(yi)[:8]
            err = np.abs(got - ref).max() / sc
            dt = time_scan_chain(fn, (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs, err)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

if __name__ == "__main__":
    main()
