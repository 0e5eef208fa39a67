"""MXU tail-width sweep for the headline row chain (r3, after
probe_parts established that ONLY the HIGHEST MXU passes run outside
the DMA shadow): smaller tails do fewer unhidden MXU madds/point
(K = 2f), paid with more shadowed VPU butterfly stages.
(8,8,64): K=128.  (8,8,2,32): K=64.  (8,8,4,16): K=32.
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
    print(f"{name:14s} {dt*1e3:7.4f} ms {gf:7.1f} GF  err={err:.2e} "
          f"(copy {gbs:.0f} GB/s, ratio {BYTES/dt/1e9/gbs:.3f})", flush=True)

def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)
    ref = np.fft.fft(np.asarray(re)[:8].astype(np.float64)
                     + 1j*np.asarray(im)[:8].astype(np.float64), axis=-1)
    sc = np.abs(ref).max()
    for factors in [(8, 8, 64), (8, 8, 2, 32), (8, 4, 4, 32),
                    (8, 8, 4, 16), (4, 8, 4, 32)]:
        name = ".".join(map(str, factors))
        try:
            fn = lambda r, i, _f=factors: pallas_local.fft_axis(
                r, i, -1, axis=-1, alias_io=True, factors=_f)
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
