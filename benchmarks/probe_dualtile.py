"""Probe: column kernel with TWO independent (n, 128) tiles per grid step
(block (1, n, 256), compute split in half) — gives Mosaic two independent
compute chains per DMA block to pipeline against."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.ops.pallas_local import col_factors, needed_tables, tile_fft
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def dual_kernel(n, layout, factors, *refs):
    nt = sum(a for _, a in layout)
    tables, pos = {}, 0
    for k, a in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(a))
        pos += a
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    for h in range(2):
        sl = pl.ds(h * 128, 128)
        xr, xi = tile_fft(re_ref[0, :, sl], im_ref[0, :, sl], tables, n,
                          factors, "highest", True, -1)
        or_ref[0, :, sl] = xr
        oi_ref[0, :, sl] = xi


@functools.partial(jax.jit, static_argnames=("n",))
def fft_cols_dual(re, im, *, n):
    with jax.enable_x64(False):
        L, _, T = re.shape
        factors = col_factors(n)
        tables = needed_tables(n, -1, factors=factors, stacked=True)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        grid = (L, T // 256)
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((1, n, 256), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(dual_kernel, n, layout, factors)
        oshape = jax.ShapeDtypeStruct(re.shape, jnp.float32)
        nt = len(tspec)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec),
            out_shape=(oshape, oshape),
            input_output_aliases={nt: 0, nt + 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel")),
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((8, 2048, 2048))
    nb = re.size * 4 * 4

    def report(name, fn):
        dt = time_scan_chain(fn, (re, im))
        print(f"{name:48s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)

    report("col n=2048 single-tile [control]",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-2,
                                              alias_io=True))
    report("col n=2048 dual-tile (1,n,256)/2x128",
           lambda r, i: fft_cols_dual(r, i, n=2048))


if __name__ == "__main__":
    main()
