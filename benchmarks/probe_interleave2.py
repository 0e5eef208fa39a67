"""TPU probe: MXU selection de/re-interleave kernels (ops/interleave.py).

Checks bit-exactness on device, then times the conversion pair at the
config-6 shape (2^22 c64 b=8) against the concurrent copy bandwidth.
ONE compile per kernel; 256-lane input tile but a trivial body (single
contraction), well inside the validated plain-pass envelope.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pyfft_tpu.ops import interleave as il
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

print("backend:", jax.default_backend(), flush=True)

# --- small exactness check (also the one compile per kernel) ------------
v = np.random.default_rng(0).standard_normal((256, 512), np.float32)
vj = jnp.asarray(v)
re, im = il.deinterleave(vj, interpret=False)
re_h, im_h = np.asarray(re), np.asarray(im)
assert np.array_equal(re_h, v[:, 0::2]), "deinterleave mismatch"
assert np.array_equal(im_h, v[:, 1::2]), "interleave mismatch"
v2 = il.interleave(re, im, interpret=False)
assert np.array_equal(np.asarray(v2), v), "roundtrip mismatch"
print("bit-exact on TPU: OK", flush=True)

# --- timing at the 2^22 b=8 shape --------------------------------------
rows, n = 8, 1 << 22
k1, k2 = jax.random.split(jax.random.PRNGKey(1))
big = jax.random.normal(k1, (rows, 2 * n), jnp.float32)
bytes_rt = big.size * 4 * 2            # read + write

dt_d = time_scan_chain(lambda x: il.interleave(*il.deinterleave(x)),
                       (big,), trials=3)
gbs = copy_bandwidth_gbs()
# one deint + one int = 2 round trips of the packed bytes
pair_gbs = 2 * bytes_rt / dt_d / 1e9
print(f"deint+int roundtrip: {dt_d*1e3:.3f} ms  "
      f"({pair_gbs:.0f} GB/s effective vs copy {gbs:.0f} GB/s; "
      f"ratio {pair_gbs/gbs:.2f})", flush=True)
