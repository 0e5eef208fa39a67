"""TPU verification of the c128 (df64) paths: local row, four-step,
roundtrip, and the 2D/3D column-pass compositions (VERDICT r3 missing
item 3).  Kept separate from verify_drive.py because each fresh df64
kernel costs 20-40 s on the shared compile service and the combined
drive overruns one watchdog window."""
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

# 2D/3D: the df64 column-pass composition on real hardware
from pyfft_tpu import fftn

x2 = cplx((2, 512, 512))
check("fftn c128 2D 512^2", fftn(x2, ndim=2),
      np.fft.fftn(x2, axes=(-2, -1)), 1e-11)
x3 = cplx((128, 128, 128))
check("fftn c128 3D 128^3", fftn(x3),
      np.fft.fftn(x3), 1e-11)

print("FAILURES:", FAILURES if FAILURES else "none")
raise SystemExit(1 if FAILURES else 0)
