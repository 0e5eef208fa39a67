"""Factor-chain calibration sweep for the Pallas kernels (real TPU).

Measures candidate stage factorizations for a given transform size on the
row or column kernel and prints min-of-k times — the data that calibrates
``pallas_local.stage_cost`` / ``default_factors``.

Usage:
    python benchmarks/sweep_factors.py row 4096 "None;(4,4,4,64);(2,4,4,128)"
    python benchmarks/sweep_factors.py col 1024 "None;(4,4,64);(2,4,128)"

Each variant compiles a fresh kernel (~30s on the shared compile service);
keep lists short and NEVER include layouts that violate the Mosaic rules in
CLAUDE.md (lane tiles > 128, non-128-multiple minors).
"""

from __future__ import annotations

import ast
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local as PL
from pyfft_tpu.utils.profiling import time_chained


def mink(fn, args, t=5, ks=(2, 12)):
    ds = [d for d in (time_chained(fn, args, *ks) for _ in range(t)) if d > 0]
    return min(ds) if ds else float("nan")


def main():
    kind, n, variants = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    import functools
    if kind == "row":
        rows = max(128, (1 << 24) // n)       # ~64 MiB per plane
        re = jax.random.normal(k1, (rows, n), jnp.float32)
        im = jax.random.normal(k2, (rows, n), jnp.float32)
        build = lambda facs: functools.partial(
            PL._fft_rows, n=n, sign=-1, postscale=1.0, interpret=False,
            factors=facs)
    else:
        T = max(128, (1 << 24) // n)
        re = jax.random.normal(k1, (1, n, T), jnp.float32)
        im = jax.random.normal(k2, (1, n, T), jnp.float32)
        build = lambda facs: functools.partial(
            PL._fft_cols, n=n, sign=-1, postscale=1.0, interpret=False,
            factors=facs, tw_n=0, swap_store=False)

    for v in variants.split(";"):
        facs = None if v.strip() == "None" else ast.literal_eval(v)
        label = str(facs or PL.default_factors(n))
        try:
            fn = build(facs)
            dt = mink(lambda r, i: fn(r, i), (re, im))
            gbps = re.size * 4 * 4 / dt / 1e9
            print(f"{kind} n={n} {label:>18s}  {dt*1e3:7.3f} ms  {gbps:6.0f} GB/s io",
                  flush=True)
        except Exception as e:
            print(f"{kind} n={n} {label:>18s}  ERROR {str(e).splitlines()[0][:70]}",
                  flush=True)


if __name__ == "__main__":
    main()
