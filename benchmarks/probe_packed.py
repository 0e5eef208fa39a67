"""TPU probe: packed-native interleaved row kernel + revised conversions.

WARNING (r3): the packed n=4096 chain never finished compiling on the
shared Mosaic service in two 10-15 min windows — treat this probe as a
compile hazard; run only on a machine with a healthy local compiler.

Headline shape (4096 rows x n=4096).  Compares:
  planar row kernel (the 0.79 ms-class reference point)
  packed interleaved row kernel (tile_fft_packed — one HBM round trip)
  deint+int conversion pair (ops/interleave.py, 2D-grid form)
Each with the concurrent copy-bandwidth load label.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pyfft_tpu.ops import interleave as il
from pyfft_tpu.ops import pallas_local as pk
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

B, N = 4096, 4096

# correctness first, tiny shape (8 rows)
rng = np.random.default_rng(0)
z = (rng.standard_normal((8, N)) + 1j * rng.standard_normal((8, N))
     ).astype(np.complex64)
v = jnp.asarray(z.view(np.float32))
out = pk.fft_rows_interleaved(v, -1, packed=True, interpret=False)
got = np.asarray(out).view(np.complex64)
ref = np.fft.fft(z, axis=-1)
err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
print(f"packed kernel err vs numpy: {err:.2e}", flush=True)
assert err < 2e-6

k1, k2 = jax.random.split(jax.random.PRNGKey(1))
re = jax.random.normal(k1, (B, N), jnp.float32)
im = jax.random.normal(k2, (B, N), jnp.float32)
vb = jax.random.normal(k2, (B, 2 * N), jnp.float32)

dt_planar = time_scan_chain(
    lambda r, i: pk.fft_axis(r, i, -1, axis=-1, alias_io=True),
    (re, im), trials=3)
dt_packed = time_scan_chain(
    lambda x: pk.fft_rows_interleaved(x, -1, packed=True, alias_io=True),
    (vb,), trials=3)
dt_conv = time_scan_chain(
    lambda x: il.interleave(*il.deinterleave(x)), (vb,), trials=3)
gbs = copy_bandwidth_gbs()
bytes_rt = vb.size * 4 * 2
print(f"planar row:      {dt_planar*1e3:.3f} ms", flush=True)
print(f"packed row:      {dt_packed*1e3:.3f} ms "
      f"({dt_packed/dt_planar:.2f}x planar)", flush=True)
print(f"conv pair:       {dt_conv*1e3:.3f} ms "
      f"({2*bytes_rt/dt_conv/1e9:.0f} GB/s eff)", flush=True)
print(f"copy label:      {gbs:.0f} GB/s", flush=True)
