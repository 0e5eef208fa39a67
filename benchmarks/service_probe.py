"""One-line compile-service health probe.

Two requests, each in its own subprocess with a hard bound, printed as a
single JSON line:

  cached   load + run the headline row kernel (persistent-cache hit —
           exercises program LOAD on the shared service)
  fresh    compile a tiny never-cached c64 kernel variant (exercises a
           real Mosaic compile; the factor chain is salted with the
           current half-hour so repeated probes stay fresh)

Use before launching anything compile-heavy: a stalled "cached" phase
means even executable loads are queued behind wedged jobs (r5: hung
int8-tail df64 compiles saturated the service for hours — see
verify_captures_r5.md) and nothing should be launched at all.
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CACHED = """
import jax, jax.numpy as jnp, sys
sys.path.insert(0, {root!r})
from pyfft_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from pyfft_tpu.ops import pallas_local
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
re = jax.random.normal(k1, (4096, 4096), jnp.float32)
im = jax.random.normal(k2, (4096, 4096), jnp.float32)
rr, ii = pallas_local.fft_axis(re, im, -1, axis=-1, alias_io=True)
print(float(jnp.sum(rr[:1, :1])))
"""

_FRESH = """
import jax, jax.numpy as jnp, sys, time
sys.path.insert(0, {root!r})
from pyfft_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from pyfft_tpu.ops import pallas_local
salt = int(time.time() // 1800) % 4096  # new postscale every half hour
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
re = jax.random.normal(k1, (64, 256), jnp.float32)
im = jax.random.normal(k2, (64, 256), jnp.float32)
rr, ii = pallas_local.fft_axis(re, im, -1, axis=-1,
                               postscale=1.0 + salt * 2.0 ** -20)
print(float(jnp.sum(rr[:1, :1])))
"""


def phase(code: str, bound: float):
    t0 = time.monotonic()
    try:
        proc = subprocess.run([sys.executable, "-c", code.format(root=ROOT)],
                              timeout=bound, capture_output=True, text=True)
        ok = proc.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    return {"ok": ok, "s": round(time.monotonic() - t0, 1)}


def main():
    bound_cached = float(os.environ.get("PROBE_CACHED_BOUND", "240"))
    bound_fresh = float(os.environ.get("PROBE_FRESH_BOUND", "420"))
    out = {"cached": phase(_CACHED, bound_cached)}
    if out["cached"]["ok"] and "--fresh" in sys.argv:
        out["fresh"] = phase(_FRESH, bound_fresh)
    print(json.dumps(out), flush=True)
    return 0 if out["cached"]["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
