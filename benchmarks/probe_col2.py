"""Probe 2: which four-step/3D pass is actually slow, with repeats.

Measures each real pass of config 6+ (c64 2^22 b=8) and config 4 (256^3)
three times to separate kernel quality from tunnel-congestion variance.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import force, time_chained

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def bench(name, fn, args, nbytes, reps=3):
    o = fn(*args)
    force(o)
    outs = []
    for _ in range(reps):
        dt = time_chained(fn, args, k_small=4, k_large=24)
        outs.append(dt)
    best = min(outs)
    print(f"{name:40s} " + " ".join(f"{d*1e3:7.3f}" for d in outs) +
          f"  ms | best io-eff {nbytes / HBM_BW / best:6.1%}", flush=True)
    return best


def main():
    assert jax.default_backend() in ("tpu", "axon")

    # ---- config 6+ four-step passes: (8, 2048, 2048) ----
    re, im = devdata((8, 2048, 2048))
    nbytes = re.size * 4 * 4
    bench("6+ pass1: col tw+swap (n=2048)",
          jax.jit(lambda r, i: pallas_local.fft_axis(
              r, i, -1, axis=-2, tw_n=2048 * 2048, swap_store=True)),
          (re, im), nbytes)
    bench("6+ pass2: col plain (n=2048)",
          jax.jit(lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2)),
          (re, im), nbytes)
    bench("6+ col tw only (no swap)",
          jax.jit(lambda r, i: pallas_local.fft_axis(
              r, i, -1, axis=-2, tw_n=2048 * 2048)),
          (re, im), nbytes)

    # row kernel reference at the same volume: (32768, 2048)
    rr, ri = devdata((8 * 2048, 2048), seed=1)
    bench("row kernel n=2048 (reference)",
          jax.jit(lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1)),
          (rr, ri), nbytes)

    # ---- config 4 (3D 256^3) passes ----
    r3, i3 = devdata((1, 256, 65536), seed=2)
    nb3 = r3.size * 4 * 4
    bench("3D z: col plain (n=256, T=65536)",
          jax.jit(lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2)),
          (r3, i3), nb3)

    rf, if_ = devdata((256, 256, 256), seed=3)
    bench("3D yx: fused2d 256x256",
          jax.jit(lambda r, i: pallas_local.fft2_fused(r, i, -1)),
          (rf, if_), nb3)


if __name__ == "__main__":
    main()
