"""Probe 5: why doesn't the column kernel overlap DMA with compute?

Scan-timed variants: 2D-view blocks, 1D merged grid, row-kernel controls,
precision splits at both n=2048 and the headline n=4096.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.ops.pallas_local import default_factors, needed_tables, tile_fft
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9
L, N, T = 8, 2048, 2048


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def col_kernel_2d(n, layout, factors, precision, *refs):
    nt = sum(a for _, a in layout)
    tables, pos = {}, 0
    for k, a in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(a))
        pos += a
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = tile_fft(re_ref[:], im_ref[:], tables, n, factors,
                      precision, True, -1)
    or_ref[:] = xr
    oi_ref[:] = xi


@functools.partial(jax.jit, static_argnames=("n", "lanes", "precision",
                                             "grid1d"))
def fft_cols_v(re, im, *, n, lanes=128, precision="highest", grid1d=False):
    """Column FFT with 2D (n, lanes) blocks over the (L*n, T) view.

    grid1d=True merges (L, T/lanes) into one grid dimension (index math in
    the maps) to test whether Mosaic only pipelines the last grid dim.
    """
    with jax.enable_x64(False):
        Ld, _, Td = re.shape
        factors = default_factors(n)
        tables = needed_tables(n, -1, factors=factors, stacked=True)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tj = Td // lanes
        if grid1d:
            grid = (Ld * tj,)
            tspec = [pl.BlockSpec(a.shape, lambda g, _nd=a.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM) for a in flat]
            dspec = pl.BlockSpec((n, lanes), lambda g: (g // tj, g % tj),
                                 memory_space=pltpu.VMEM)
            sem = ("parallel",)
        else:
            grid = (Ld, tj)
            tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                                  memory_space=pltpu.VMEM) for a in flat]
            dspec = pl.BlockSpec((n, lanes), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
            sem = ("parallel", "parallel")
        kern = functools.partial(col_kernel_2d, n, layout, factors, precision)
        oshape = jax.ShapeDtypeStruct((Ld * n, Td), jnp.float32)
        nt = len(tspec)
        rr, ii = pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec),
            out_shape=(oshape, oshape),
            input_output_aliases={nt: 0, nt + 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=sem),
        )(*flat, re.reshape(Ld * n, Td), im.reshape(Ld * n, Td))
        return rr.reshape(Ld, n, Td), ii.reshape(Ld, n, Td)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((L, N, T))
    nbytes = re.size * 4 * 4

    def report(name, fn, args, nb=nbytes):
        dt = time_scan_chain(fn, args)
        print(f"{name:46s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)
        return dt

    report("col3d (1,n,128) HIGHEST [control]",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True), (re, im))
    report("col 2D-view (n,128) HIGHEST",
           lambda r, i: fft_cols_v(r, i, n=N), (re, im))
    report("col 2D-view (n,128) DEFAULT",
           lambda r, i: fft_cols_v(r, i, n=N, precision="default"), (re, im))
    report("col 2D-view 1D-grid HIGHEST",
           lambda r, i: fft_cols_v(r, i, n=N, grid1d=True), (re, im))

    rr, ri = devdata((L * T, N), seed=1)
    report("row n=2048 HIGHEST",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                              alias_io=True), (rr, ri))
    report("row n=2048 DEFAULT",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                              precision="default",
                                              alias_io=True), (rr, ri))

    rh, ih = devdata((4096, 4096), seed=2)
    nb2 = rh.size * 4 * 4
    report("row n=4096 b=4096 HIGHEST (headline)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                              alias_io=True), (rh, ih), nb2)
    report("row n=4096 b=4096 DEFAULT",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                              precision="default",
                                              alias_io=True), (rh, ih), nb2)


if __name__ == "__main__":
    main()
