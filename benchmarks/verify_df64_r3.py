"""TPU verification of the r3 rank-4 df64 stage layout: the c128 paths
only (local row n=2048, four-step n=2^16, roundtrip) — split out of
verify_drive.py because each fresh df64 kernel costs 20-40 s on the
shared compile service and the full drive overruns one watchdog window."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

from pyfft_tpu import fft, ifft

rng = np.random.RandomState(7)
FAILURES = []


def check(name, got, ref, tol):
    err = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'} {name:44s} err={err:.2e} tol={tol}",
          flush=True)
    if not ok:
        FAILURES.append(name)


def cplx(shape, dtype=np.complex128):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(dtype)


xd = cplx((8, 2048))
check("fft c128 local n=2048", fft(xd), np.fft.fft(xd, axis=-1), 1e-11)
xdl = cplx((2, 1 << 16))
check("fft c128 four-step n=2^16", fft(xdl), np.fft.fft(xdl, axis=-1), 1e-11)
check("ifft(fft) c128 roundtrip", ifft(fft(xd)), xd, 1e-11)

print("FAILURES:", FAILURES if FAILURES else "none")
raise SystemExit(1 if FAILURES else 0)
