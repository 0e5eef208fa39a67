"""Probe 4: decompose the column-pass time into DMA vs compute.

* pure-copy Pallas kernel on the same block structure -> pure-DMA time
  (is grid pipelining overlapping DMA at all?)
* precision variants -> the MXU 6-bf16-pass share
* factor-chain variants -> MXU vs VPU balance
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
from scan_timer import scan_time

HBM_BW = 819e9
L, N, T = 8, 2048, 2048


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def _copy_kernel(re_ref, im_ref, or_ref, oi_ref):
    or_ref[...] = re_ref[...]
    oi_ref[...] = im_ref[...]


@functools.partial(jax.jit, static_argnames=("block", "alias"))
def copy_blocks(re, im, *, block, alias=True):
    """Identity copy through VMEM with the column kernel's block structure."""
    Ld, Nd, Td = re.shape
    lb, nb, tb = block
    grid = (Ld // lb, Td // tb)
    dspec = pl.BlockSpec((lb, nb, tb), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct(re.shape, jnp.float32)
    return pl.pallas_call(
        _copy_kernel, grid=grid,
        in_specs=[dspec, dspec], out_specs=(dspec, dspec),
        out_shape=(oshape, oshape),
        input_output_aliases={0: 0, 1: 1} if alias else {},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel")),
    )(re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    re, im = devdata((L, N, T))
    nbytes = re.size * 4 * 4

    def report(name, fn, args, nb=nbytes):
        dt = scan_time(fn, args, verbose=False)
        print(f"{name:44s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)
        return dt

    report("copy (1,2048,128) blocks",
           lambda r, i: copy_blocks(r, i, block=(1, N, 128)), (re, im))
    report("copy (1,256,128) blocks",
           lambda r, i: copy_blocks(r, i, block=(1, 256, 128)), (re, im))

    # FFT col variants
    def col(factors=None, precision="highest"):
        return lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-2, factors=factors, precision=precision,
            alias_io=True)

    report("col fft (4,4,128) HIGHEST [prod]", col(), (re, im))
    report("col fft (4,4,128) DEFAULT (1-pass)",
           col(precision="default"), (re, im))
    report("col fft (4,4,4,4,4,2) butterflies-only",
           col(factors=(4, 4, 4, 4, 4, 2)), (re, im))
    report("col fft (4,4,4,4,8) small-MXU-8",
           col(factors=(4, 4, 4, 4, 8)), (re, im))
    report("col fft (4,4,4,32) MXU-32",
           col(factors=(4, 4, 4, 32)), (re, im))
    report("col fft (4,4,4,4,8) DEFAULT",
           lambda r, i: pallas_local.fft_axis(
               r, i, -1, axis=-2, factors=(4, 4, 4, 4, 8),
               precision="default", alias_io=True), (re, im))
    report("col fft (16,128) MXU-heavy", col(factors=(16, 128)), (re, im))


if __name__ == "__main__":
    main()
