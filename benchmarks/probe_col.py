"""Probe: column-kernel IO-efficiency variants (VERDICT round-2 item 3).

The (1, n, 128)-block column kernel measured ~54% IO-efficient vs the row
kernel's ~95% on v5e.  This probe times layout/scheduling variants of the
n=2048 column pass on the four-step shape (8, 2048, 2048) and prints a
ranked table.  Run on the real TPU only.
"""
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.ops.pallas_local import (
    _kernel, default_factors, needed_tables, tile_fft)
from pyfft_tpu.utils.profiling import force, time_chained

L, N, T = 8, 2048, 2048
BYTES_PER_PASS = L * N * T * 4 * 4          # re+im in, re+im out
HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def col_kernel_2d(n, layout, factors, *refs):
    nt = sum(a for _, a in layout)
    tables, pos = {}, 0
    for k, a in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(a))
        pos += a
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = tile_fft(re_ref[:], im_ref[:], tables, n, factors,
                      "highest", True, -1)
    or_ref[:] = xr
    oi_ref[:] = xi


@functools.partial(jax.jit, static_argnames=("n", "lanes"))
def fft_cols_2dview(re, im, *, n, lanes):
    """(L, n, T) viewed as (L*n, T); 2D blocks (n, lanes)."""
    with jax.enable_x64(False):
        Ld, _, Td = re.shape
        factors = default_factors(n)
        tables = needed_tables(n, -1, factors=factors, stacked=True)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        grid = (Ld, pl.cdiv(Td, lanes))
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((n, lanes), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(col_kernel_2d, n, layout, factors)
        oshape = jax.ShapeDtypeStruct((Ld * n, Td), jnp.float32)
        rr, ii = pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec),
            out_shape=(oshape, oshape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel")),
        )(*flat, re.reshape(Ld * n, Td), im.reshape(Ld * n, Td))
        return rr.reshape(Ld, n, Td), ii.reshape(Ld, n, Td)


def multi_l_kernel(n, lb, layout, factors, *refs):
    nt = sum(a for _, a in layout)
    tables, pos = {}, 0
    for k, a in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(a))
        pos += a
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    for l in range(lb):
        xr, xi = tile_fft(re_ref[l], im_ref[l], tables, n, factors,
                          "highest", True, -1)
        or_ref[l] = xr
        oi_ref[l] = xi


@functools.partial(jax.jit, static_argnames=("n", "lanes", "lb"))
def fft_cols_multil(re, im, *, n, lanes, lb):
    """(lb, n, lanes) blocks: lb transforms per grid step."""
    with jax.enable_x64(False):
        Ld, _, Td = re.shape
        factors = default_factors(n)
        tables = needed_tables(n, -1, factors=factors, stacked=True)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        grid = (Ld // lb, pl.cdiv(Td, lanes))
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((lb, n, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(multi_l_kernel, n, lb, layout, factors)
        oshape = jax.ShapeDtypeStruct((Ld, n, Td), jnp.float32)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec),
            out_shape=(oshape, oshape),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel")),
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon"), "TPU-only probe"
    re, im = devdata((L, N, T))
    rows = []

    def add(name, fn):
        try:
            o = fn(re, im)
            force(o)
            dt = time_chained(fn, (re, im), k_small=4, k_large=24)
            eff = BYTES_PER_PASS / HBM_BW / dt
            rows.append((name, dt * 1e3, eff))
            print(f"{name:32s} {dt*1e3:8.3f} ms   io-eff {eff:6.1%}",
                  flush=True)
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}", flush=True)

    # baseline: current column kernel
    base = jax.jit(lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2))
    add("col lanes=128 (baseline)", base)

    # row kernel upper bound on same data volume: (L*T, N) rows
    rr, ri = devdata((L * T, N), seed=1)
    rowfn = jax.jit(lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1))
    o = rowfn(rr, ri); force(o)
    dt = time_chained(rowfn, (rr, ri), k_small=4, k_large=24)
    print(f"{'row kernel (upper bound)':32s} {dt*1e3:8.3f} ms   io-eff "
          f"{BYTES_PER_PASS / HBM_BW / dt:6.1%}", flush=True)

    # 2D-view blocks
    add("col 2D-view (n, 128)", functools.partial(fft_cols_2dview, n=N, lanes=128))
    add("col 2D-view (n, 256)", functools.partial(fft_cols_2dview, n=N, lanes=256))

    # multi-L blocks
    add("col multi-L lb=2 lanes=128",
        functools.partial(fft_cols_multil, n=N, lanes=128, lb=2))
    add("col multi-L lb=4 lanes=128",
        functools.partial(fft_cols_multil, n=N, lanes=128, lb=4))

    print("\nranked:")
    for name, ms, eff in sorted(rows, key=lambda r: r[1]):
        print(f"  {name:32s} {ms:8.3f} ms   {eff:6.1%}")


if __name__ == "__main__":
    main()
