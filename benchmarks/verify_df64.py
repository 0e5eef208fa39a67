"""TPU verification of the c128 (df64) paths: local row, four-step,
roundtrip, and the 2D/3D column-pass compositions (VERDICT r3 missing
item 3).  Kept separate from verify_drive.py because each fresh df64
kernel costs 20-40 s on the shared compile service and the combined
drive overruns one watchdog window.

r5 restructure: every check runs in its OWN subprocess with a hard
timeout.  Two failure classes this drive has met are not Python
exceptions — the shared compile helper being OOM-killed (r4: the 512^2
multi-kernel program, fixed by the per-pass staged dispatch in plan.py)
and the 2026-08-20 service regression where fresh int8-tail df64 kernel
compiles hang indefinitely inside ``backend_compile_and_load`` (bisected:
fresh c64 kernels compile in ~2 min, butterfly-only df64 in ~3 min,
every int8-tail df64 >50 min without returning).  A hung check now
yields an honest TIMEOUT row instead of eating the rest of the drive.

Usage: ``python verify_df64.py [--timeout S] [names...]``; with no names
all checks run.  ``--one NAME`` is the internal single-check entry.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = ["local2048", "fourstep2e16", "roundtrip", "fftn2d256",
          "fftn3d128", "fftn2d512"]


def _run_one(name: str) -> None:
    import jax
    import numpy as np

    jax.config.update("jax_enable_x64", True)

    from pyfft_tpu import fft, fftn, ifft

    rng = np.random.RandomState(7)

    def cplx(shape, dtype=np.complex128):
        return (rng.standard_normal(shape)
                + 1j * rng.standard_normal(shape)).astype(dtype)

    # deterministic data per check (the old sequential-rng coupling made
    # single-check runs differ from full-drive runs)
    if name == "local2048":
        x = cplx((8, 2048))
        got, ref = fft(x), np.fft.fft(x, axis=-1)
    elif name == "fourstep2e16":
        x = cplx((2, 1 << 16))
        got, ref = fft(x), np.fft.fft(x, axis=-1)
    elif name == "roundtrip":
        x = cplx((8, 2048))
        got, ref = ifft(fft(x)), x
    elif name == "fftn2d256":
        x = cplx((2, 256, 256))
        got, ref = fftn(x, ndim=2), np.fft.fftn(x, axes=(-2, -1))
    elif name == "fftn3d128":
        x = cplx((128, 128, 128))
        got, ref = fftn(x), np.fft.fftn(x)
    elif name == "fftn2d512":
        x = cplx((2, 512, 512))
        got, ref = fftn(x, ndim=2), np.fft.fftn(x, axes=(-2, -1))
    else:
        raise SystemExit(f"unknown check {name}")
    err = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    ok = err < 1e-11
    print(f"{'PASS' if ok else 'FAIL'} {name:16s} err={err:.2e} tol=1e-11",
          flush=True)
    raise SystemExit(0 if ok else 1)


def main() -> int:
    args = sys.argv[1:]
    if args[:1] == ["--one"]:
        _run_one(args[1])
        return 0
    timeout = 900
    if args[:1] == ["--timeout"]:
        timeout = int(args[1])
        args = args[2:]
    names = args or CHECKS
    failures = []
    for name in names:
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                timeout=timeout, capture_output=True, text=True)
            out = (proc.stdout or "").strip()
            print(out or f"FAIL {name:16s} rc={proc.returncode} "
                  f"{(proc.stderr or '').strip().splitlines()[-1][:100] if proc.stderr else ''}",
                  flush=True)
            if proc.returncode != 0:
                failures.append(name)
        except subprocess.TimeoutExpired:
            print(f"HANG {name:16s} compile did not return within "
                  f"{timeout}s ({time.monotonic()-t0:.0f}s elapsed) — "
                  "service-side wedge class, see module docstring",
                  flush=True)
            failures.append(name)
    print("FAILURES:", failures if failures else "none", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
