"""End-to-end verification drive on the real TPU (the /verify recipe):
public API, parity vs numpy.fft, covering the paths this round touches."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import pyfft_tpu
from pyfft_tpu import Plan, fft, ifft, fftn

rng = np.random.RandomState(7)
FAILURES = []


def check(name, got, ref, tol):
    err = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'} {name:44s} err={err:.2e} tol={tol}",
          flush=True)
    if not ok:
        FAILURES.append(name)


def cplx(shape, dtype=np.complex64):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(dtype)


# 1. local path (n<=8192), fast_math default
x = cplx((16, 1024))
check("fft local n=1024", fft(x),
      np.fft.fft(x.astype(np.complex128), axis=-1), 2e-6)
check("ifft(fft) roundtrip", ifft(fft(x)), x.astype(np.complex128), 2e-6)

# 2. fast_math=False butterfly chains (new this round)
p = Plan((1024,), fast_math=False)
y = p.execute(x)
check("fast_math=False n=1024", y,
      np.fft.fft(x.astype(np.complex128), axis=-1), 2e-6)
xs = cplx((8, 2048))
p2 = Plan((2048,), fast_math=False)
check("fast_math=False n=2048 (2,4^5)", p2.execute(xs),
      np.fft.fft(xs.astype(np.complex128), axis=-1), 2e-6)

# 3. four-step (n > 8192)
xl = cplx((2, 1 << 16))
check("fft four-step n=2^16", fft(xl),
      np.fft.fft(xl.astype(np.complex128), axis=-1), 2e-6)

# 4. 2D/3D
x2 = cplx((4, 256, 256))
check("fftn 2D 256^2", fftn(x2, ndim=2),
      np.fft.fftn(x2.astype(np.complex128), axes=(-2, -1)), 2e-6)

# 5. split-complex call form + scale/normalize
import jax.numpy as jnp
pr = Plan((512,), scale=0.5)
re, im = pr.execute(jnp.asarray(x[:, :512].real),
                    jnp.asarray(x[:, :512].imag))
ref = 0.5 * np.fft.fft(x[:, :512].astype(np.complex128), axis=-1)
check("split form + scale", np.asarray(re) + 1j * np.asarray(im), ref, 2e-6)

# 5b. c128 checks live in verify_df64.py: each fresh df64 kernel costs
# 20-40 s on the shared compile service, so the c64 drive and the c128
# drive each fit one watchdog window on their own.

# 6. error cases
try:
    Plan((24,))
    print("FAIL non-pow2 did not raise")
    FAILURES.append("non-pow2")
except ValueError:
    print("PASS non-pow2 raises")

# 7. warmup smoke on TPU (compile-cache path)
n = pyfft_tpu.warmup([256], batches=(4,))
print(f"PASS warmup compiled {n} executables")

print("FAILURES:", FAILURES if FAILURES else "none")
raise SystemExit(1 if FAILURES else 0)
