"""Probe: int8-MXU df64 chain vs the all-butterfly chain (config-5 class).

Times one n=2048 df64 column pass on the four-step shape and a full
config-5-like transform at reduced batch.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.ops import pallas_df64 as P
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devquad(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return tuple(jax.random.normal(k, shape, jnp.float32) * s
                 for k, s in zip(ks, (1.0, 1e-8, 1.0, 1e-8)))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args, trials=4)
    print(f"{name:48s} {dt*1e3:9.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def main():
    assert jax.default_backend() in ("tpu", "axon")
    q = devquad((8, 2048, 2048))
    nb = q[0].size * 4 * 8          # 4 planes in + 4 out

    def col(factors):
        return lambda *p: P.fft_axis_df64(p, -1, axis=-2, factors=factors)

    report("df64 col n=2048 butterfly (2,4^5) [prod]",
           col((2, 4, 4, 4, 4, 4)), q, nb)
    report("df64 col n=2048 int8-MXU (4,4,2,64)",
           col((4, 4, 2, 64)), q, nb)

    # row form too (the variant-b pass-2 shape)
    q2 = devquad((16384, 2048), seed=1)
    def row(factors):
        return lambda *p: P.fft_axis_df64(p, -1, axis=-1, factors=factors)
    report("df64 row n=2048 butterfly [prod]",
           row((2, 4, 4, 4, 4, 4)), q2, nb)
    report("df64 row n=2048 int8-MXU (4,4,2,64)",
           row((4, 4, 2, 64)), q2, nb)


if __name__ == "__main__":
    main()
