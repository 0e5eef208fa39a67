"""Probe: df64 rank-4 stage-layout reformulation (r3, VERDICT item 3).

Times the config-5-shaped df64 kernels — row n=2048 and the four-step
column pass n=2048 (tw strided) — under the rank-<=4 (L, f, R, lanes)
tile_fft_df64 vs the r2 rank-(m+1) multi-axis form (A/B via git stash).
The suspected ~2.5-3x VPU-efficiency gap over static flop counts was
attributed to Mosaic relayouts in the deep-axis views.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_df64 as P
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devquad(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return tuple(jax.random.normal(k, shape, jnp.float32) * s
                 for k, s in zip(ks, (1.0, 1e-8, 1.0, 1e-8)))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args, trials=4)
    print(f"{name:52s} {dt*1e3:9.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def main():
    assert jax.default_backend() in ("tpu", "axon")
    secs = set((sys.argv[1] if len(sys.argv) > 1 else "row,col,e2e")
               .split(","))
    n = 2048
    facs = P.mxu_factors_df64(n)
    print(f"factors: {facs}", flush=True)
    vol = 1 << 22                 # one config-5 transform's volume
    if "row" in secs:
        # row kernel: (vol/n, n) quad
        q = devquad((vol // n, n), seed=5)
        nb = q[0].size * 4 * 8
        report(f"df64 row n={n} {facs}",
               lambda *p: P.fft_axis_df64(p, -1, axis=-1, factors=facs),
               q, nb)
    if "col" in secs:
        # four-step pass 1: col + full twiddle + digit-swap store (the
        # real config-5 shape, 2-pass fft_axis_large_df64 form)
        q = devquad((1, n, vol // n), seed=7)
        nb = q[0].size * 4 * 8
        report(f"df64 col n={n} tw+swap {facs}",
               lambda *p: P.fft_axis_df64(p, -1, axis=-2, factors=facs,
                                          tw_n=vol, swap_store=True),
               q, nb)
        # four-step pass 2: plain col (also the 3D/2D shape)
        report(f"df64 col n={n} plain {facs}",
               lambda *p: P.fft_axis_df64(p, -1, axis=-2, factors=facs),
               q, nb)
    if "e2e" in secs:
        # The four-step COMPOSITION in quad form at the acceptance batch
        # shape (config 5 sweeps 2 x batch=32): kernel-sum was 4.92 ms x
        # 64 = 315 ms but acceptance records 518 ms — this row says
        # whether the ~200 ms gap lives in the composition (reshapes /
        # scan carries / batched-grid slowdown) or in the c128 f64<->quad
        # conversion wrappers above it.  nb counts both passes' IO.
        b = 8                      # 8 transforms/call: 1 GiB quad, chains
        q = devquad((b, vol), seed=9)      # stay well under program caps
        nb = q[0].size * 4 * 8 * 2
        # postscale 2^-11 = 1/sqrt(n): RMS-stationary scan chains
        report(f"df64 four-step e2e n=2^22 batch={b}",
               lambda *p: P.fft_axis_large_df64(p, -1, axis=-1,
                                                postscale=2.0 ** -11),
               q, nb)


if __name__ == "__main__":
    main()
