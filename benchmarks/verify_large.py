"""TPU verify: the re-split four-step (config 6+ class) and the new
two-level huge path (n=2^28), parity + scan timing."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from pyfft_tpu.plan import Plan
from pyfft_tpu.utils.profiling import effective_gflops, time_scan_chain

assert jax.default_backend() in ("tpu", "axon")

# config 6+: 2^22 batch 8, new (1024, 4096) split
n, b = 1 << 22, 8
plan = Plan((n,), scale=1.0 / np.sqrt(n), donate=True)
print("2^22 plan passes:", [(p.executor, p.split) for p in plan._exec_plan.passes],
      flush=True)
fn = plan._get_callable((b,), False, "planar")
rng = np.random.RandomState(0)
x = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
     ).astype(np.complex64)
rr, ii = fn(jnp.asarray(x.real), jnp.asarray(x.imag))
got = (np.asarray(rr) + 1j * np.asarray(ii)) * np.sqrt(n)
ref = np.fft.fft(x[:2].astype(np.complex128), axis=-1)
err = np.abs(got[:2] - ref).max() / np.abs(ref).max()
print(f"config6+ parity err={err:.3e}", flush=True)
assert err < 2e-6
dt = time_scan_chain(lambda r, i: fn(r + 0, i + 0),
                     (jnp.asarray(x.real), jnp.asarray(x.imag)),
                     ka=2, kb=12, trials=6)
gf = effective_gflops((n,), b, dt)
print(f"config6+ {dt*1e3:.3f} ms -> {gf:.0f} GF", flush=True)

# huge: 2^28, batch 1
n = 1 << 28
plan = Plan((n,))
print("2^28 plan passes:", [p.executor for p in plan._exec_plan.passes],
      flush=True)
x = (rng.standard_normal(n // (1 << 6)))  # build input in chunks to go easy on host
re = jnp.asarray(np.tile(x, 1 << 6).astype(np.float32))
im = jnp.zeros_like(re)
fn = plan._get_callable((), False, "planar")
rr, ii = fn(re, im)
got = np.asarray(rr[:8]) + 1j * np.asarray(ii[:8])
# oracle on a periodic signal: X[k] = 64 * FFT_small(x)[k/64] at multiples
small = np.fft.fft(x.astype(np.complex128))
print(f"huge 2^28 X[0]={got[0]:.6g} vs {64*small[0]:.6g}", flush=True)
err = abs(got[0] - 64 * small[0]) / abs(64 * small[0])
assert err < 2e-6, err
# spot timing
dt = time_scan_chain(lambda r, i: fn(r, i), (re, im), ka=1, kb=4, trials=4)
gf = effective_gflops((n,), 1, dt)
print(f"huge 2^28 {dt*1e3:.3f} ms -> {gf:.0f} GF", flush=True)
print("OK")
