"""Probe 9: isolate strided-vs-contiguous block DMA cost with pure-copy
kernels (NO aliasing, same scan-carry overhead in every variant — the
difference between variants is pure DMA-pattern cost)."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9
L, N, T = 8, 2048, 2048


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def _copy3(re_ref, im_ref, or_ref, oi_ref):
    or_ref[...] = re_ref[...] + 1.0   # +1 so nothing can alias-elide
    oi_ref[...] = im_ref[...] + 1.0


@functools.partial(jax.jit, static_argnames=("block", "sem"))
def copy_blocks3(re, im, *, block, sem="parallel"):
    Ld, Nd, Td = re.shape
    lb, nb, tb = block
    grid = (Ld // lb, Nd // nb, Td // tb)
    dspec = pl.BlockSpec((lb, nb, tb), lambda i, k, j: (i, k, j),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(re.shape, jnp.float32)
    return pl.pallas_call(
        _copy3, grid=grid,
        in_specs=[dspec, dspec], out_specs=(dspec, dspec),
        out_shape=(oshape, oshape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=(sem,) * 3),
    )(re, im)


def _copy2(re_ref, im_ref, or_ref, oi_ref):
    or_ref[...] = re_ref[...] + 1.0
    oi_ref[...] = im_ref[...] + 1.0


@functools.partial(jax.jit, static_argnames=("block",))
def copy_blocks2(re, im, *, block):
    R, C = re.shape
    rb, cb = block
    grid = (R // rb, C // cb)
    dspec = pl.BlockSpec((rb, cb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(re.shape, jnp.float32)
    return pl.pallas_call(
        _copy2, grid=grid,
        in_specs=[dspec, dspec], out_specs=(dspec, dspec),
        out_shape=(oshape, oshape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
    )(re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    nb = L * N * T * 4 * 4

    def report(name, fn, args):
        dt = time_scan_chain(fn, args)
        print(f"{name:52s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)

    re3, im3 = devdata((L, N, T))
    report("copy col-blocks (1,2048,128) [strided]",
           lambda r, i: copy_blocks3(r, i, block=(1, N, 128)), (re3, im3))
    report("copy row-blocks-3d (1,8,2048) [contig]",
           lambda r, i: copy_blocks3(r, i, block=(1, 8, T)), (re3, im3))

    re2, im2 = devdata((L * N, T), seed=1)
    report("copy row-blocks (128,2048) [contig 2d]",
           lambda r, i: copy_blocks2(r, i, block=(128, T)), (re2, im2))
    report("copy col-blocks-2d (2048,128) [strided 2d]",
           lambda r, i: copy_blocks2(r, i, block=(N, 128)), (re2, im2))
    report("copy col-blocks-2d (2048,256)",
           lambda r, i: copy_blocks2(r, i, block=(N, 256)), (re2, im2))


if __name__ == "__main__":
    main()
