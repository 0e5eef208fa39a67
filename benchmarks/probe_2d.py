"""Probe: 2D-plan alternatives at 1024^2 b=16 — the current row+col chain
vs two row+swap-store passes (no column kernels)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def chain_rowcol(r, i):
    r, i = pallas_local.fft_axis(r, i, -1, axis=-1, alias_io=True)
    r, i = pallas_local.fft_axis(r, i, -1, axis=-2, alias_io=True)
    return r, i


def chain_rowswap2(r, i):
    r, i = pallas_local.fft_rows_swap(r, i, -1)
    r, i = pallas_local.fft_rows_swap(r, i, -1)
    return r, i


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((16, 1024, 1024))
    nb = re.size * 4 * 4 * 2      # two passes

    # parity of the row-swap chain
    rng = np.random.RandomState(1)
    x = rng.standard_normal((2, 1024, 1024)) \
        + 1j * rng.standard_normal((2, 1024, 1024))
    rr, ii = chain_rowswap2(jnp.asarray(x.real, jnp.float32),
                            jnp.asarray(x.imag, jnp.float32))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x, axes=(1, 2))
    print("rowswap2 parity:", np.abs(got - ref).max() / np.abs(ref).max(),
          flush=True)

    for name, fn in (("row+col [prod]", chain_rowcol),
                     ("rowswap x2", chain_rowswap2)):
        dt = time_scan_chain(fn, (re, im))
        print(f"2D 1024^2 b=16 {name:18s} {dt*1e3:8.3f} ms  "
              f"io-eff {nb/HBM_BW/dt:6.1%}", flush=True)


if __name__ == "__main__":
    main()
