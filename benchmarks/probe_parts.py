"""Decompose the headline row kernel's time into parts (r3).

Components, each a Pallas kernel with the SAME grid/BlockSpec shape as
the real row kernel ((lanes, n) blocks, grid rows/lanes), timed with the
scan-chain estimator and labeled with concurrent copy bandwidth:

  copy        load 2 blocks, store 2 blocks         -> DMA floor
  transpose   copy + both in-VMEM plane transposes  -> + relayout cost
  fft-def     full chain, precision=DEFAULT (1-pass MXU)
  fft-high    full chain, precision=HIGHEST (the shipping kernel)

fft-high - fft-def ~ extra MXU passes; fft-def - transpose ~ VPU chain
(butterflies + twiddle rounds + slice/stack); transpose - copy ~ the
load/store transposes.  All on the headline shape (4096 x 4096 c64).
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
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

N, B, LANES = 4096, 4096, 128
BYTES = 4 * N * B * 4


def _passthrough_kernel(transpose, re_ref, im_ref, or_ref, oi_ref):
    xr = re_ref[:]
    xi = im_ref[:]
    if transpose:
        xr, xi = xr.T, xi.T
        # a shape-anchored op in the transposed domain so Mosaic cannot
        # cancel the round trip: scale by a per-row (n, 1) column vector.
        # int32 iota -> f32: Mosaic rejects float iota (see tile_fft_packed).
        col = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).astype(
            jnp.float32) * jnp.float32(1e-30) + jnp.float32(1.0)
        xr = xr * col
        xi = xi * col
        xr, xi = xr.T, xi.T
    or_ref[:] = xr
    oi_ref[:] = xi


@functools.partial(jax.jit, static_argnames=("transpose",))
def _passthrough(re, im, *, transpose):
    dspec = pl.BlockSpec((LANES, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((B, N), jnp.float32)
    return pl.pallas_call(
        functools.partial(_passthrough_kernel, transpose),
        grid=(B // LANES,),
        in_specs=[dspec, dspec],
        out_specs=(dspec, dspec),
        out_shape=(out, out),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
    )(re, im)


def report(name, dt, gbs):
    gf = 5 * N * 12 * B / dt / 1e9
    print(f"{name:12s} {dt*1e3:7.4f} ms  {BYTES/dt/1e9:6.1f} GB/s "
          f"{gf:7.1f} GF  (copy {gbs:.0f} GB/s, ratio "
          f"{BYTES/dt/1e9/gbs:.3f})", flush=True)


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (B, N), jnp.float32)
    im = jax.random.normal(k2, (B, N), jnp.float32)

    cases = [
        ("copy", lambda r, i: _passthrough(r, i, transpose=False)),
        ("transpose", lambda r, i: _passthrough(r, i, transpose=True)),
        ("fft-def", lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True, precision="default")),
        ("fft-high", lambda r, i: pallas_local.fft_axis(
            r, i, -1, axis=-1, alias_io=True)),
    ]
    for name, fn in cases:
        try:
            dt = time_scan_chain(fn, (re, im), trials=6)
            gbs = copy_bandwidth_gbs(trials=2)
            report(name, dt, gbs)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
