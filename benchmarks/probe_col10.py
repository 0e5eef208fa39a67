"""Probe 10: why does the col kernel not hide compute under DMA when the
row kernel does?  Scheduling-parameter variants on col n=4096."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops.pallas_local import (
    default_factors, needed_tables, tile_fft)
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9
L, N, T = 8, 4096, 1024


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def col_kernel(n, layout, factors, *refs):
    nt = sum(a for _, a in layout)
    tables, pos = {}, 0
    for k, a in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(a))
        pos += a
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = tile_fft(re_ref[0], im_ref[0], tables, n, factors,
                      "highest", True, -1)
    or_ref[0] = xr
    oi_ref[0] = xi


@functools.partial(jax.jit, static_argnames=("n", "sem", "vlim", "cost"))
def fft_cols_v(re, im, *, n, sem="parallel", vlim=100, cost="normal"):
    with jax.enable_x64(False):
        Ld, _, Td = re.shape
        factors = default_factors(n)
        tables = needed_tables(n, -1, factors=factors, stacked=True)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        grid = (Ld, Td // 128)
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((1, n, 128), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(col_kernel, n, layout, factors)
        oshape = jax.ShapeDtypeStruct(re.shape, jnp.float32)
        nt = len(tspec)
        kwargs = {}
        if cost == "normal":
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=8 * n * sum(factors) * 128 * grid[0] * grid[1],
                bytes_accessed=Ld * n * Td * 4 * 4, transcendentals=0)
        elif cost == "iobound":
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=1000, bytes_accessed=Ld * n * Td * 4 * 4,
                transcendentals=0)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec),
            out_shape=(oshape, oshape),
            input_output_aliases={nt: 0, nt + 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vlim * 1024 * 1024,
                dimension_semantics=(sem, sem)),
            **kwargs,
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((L, N, T))
    nb = re.size * 4 * 4

    def report(name, fn):
        dt = time_scan_chain(fn, (re, im))
        print(f"{name:48s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)

    report("col n=4096 parallel vlim=100 cost [base]",
           lambda r, i: fft_cols_v(r, i, n=N))
    report("col n=4096 arbitrary",
           lambda r, i: fft_cols_v(r, i, n=N, sem="arbitrary"))
    report("col n=4096 no cost_estimate",
           lambda r, i: fft_cols_v(r, i, n=N, cost="none"))
    report("col n=4096 io-bound cost_estimate",
           lambda r, i: fft_cols_v(r, i, n=N, cost="iobound"))
    report("col n=4096 vlim=48",
           lambda r, i: fft_cols_v(r, i, n=N, vlim=48))


if __name__ == "__main__":
    main()
