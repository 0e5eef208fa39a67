"""Manually double-buffered streaming column FFT kernel.

Mosaic's automatic grid pipelining does not overlap the column kernels'
VPU/MXU compute with their block DMA (measured: pass wall = DMA + compute
at every n; only the headline-shaped row kernel overlaps — see
benchmarks/probe_col5/9/10 and project memory).  This kernel takes the
schedule into its own hands, the way the reference's GlobalFFTKernel
streamed global memory (SURVEY.md §2.3): inputs/outputs stay in HBM
(``memory_space=ANY``), a ``fori_loop`` walks the block sequence, and
explicit ``make_async_copy`` calls keep the next block's loads and the
previous block's stores in flight while the current block computes.

    warmup:  start in-DMA(block 0)
    step i:  start in-DMA(i+1) | wait in(i) | wait out(i-2, same slot)
             | compute FFT tile | start out-DMA(i)
    drain:   wait the last two out-DMAs

Same math as ``pallas_local._fft_cols`` (tile_fft over (n, lanes) tiles,
transform on sublanes, digit-prepending stage order); plain column passes
only (the fused-twiddle/swap variants keep the auto-pipelined kernel).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops.pallas_local import (
    LANES, _interpret_default, col_factors, needed_tables, tile_fft)

__all__ = ["fft_cols_stream"]


def _stream_kernel(n, lanes, nblocks, tj, layout, postscale, factors,
                   precision, stacked, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    (re_hbm, im_hbm, or_hbm, oi_hbm,
     in_r, in_i, out_r, out_i, sin_r, sin_i, sout_r, sout_i) = refs[nt:]

    def in_dma(b, slot, plane_hbm, buf, sem):
        l = b // tj
        j = b % tj
        return pltpu.make_async_copy(
            plane_hbm.at[l, :, pl.ds(j * lanes, lanes)],
            buf.at[slot], sem.at[slot])

    def out_dma(b, slot, buf, plane_hbm, sem):
        l = b // tj
        j = b % tj
        return pltpu.make_async_copy(
            buf.at[slot], plane_hbm.at[l, :, pl.ds(j * lanes, lanes)],
            sem.at[slot])

    # warmup: first input block in flight
    in_dma(0, 0, re_hbm, in_r, sin_r).start()
    in_dma(0, 0, im_hbm, in_i, sin_i).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nblocks)
        def _():
            nslot = jax.lax.rem(i + 1, 2)
            in_dma(i + 1, nslot, re_hbm, in_r, sin_r).start()
            in_dma(i + 1, nslot, im_hbm, in_i, sin_i).start()

        in_dma(i, slot, re_hbm, in_r, sin_r).wait()
        in_dma(i, slot, im_hbm, in_i, sin_i).wait()

        # the out buffers for this slot must have drained (block i-2)
        @pl.when(i >= 2)
        def _():
            out_dma(i - 2, slot, out_r, or_hbm, sout_r).wait()
            out_dma(i - 2, slot, out_i, oi_hbm, sout_i).wait()

        xr, xi = tile_fft(in_r[slot], in_i[slot], tables, n, factors,
                          precision, stacked, sign)
        if postscale != 1.0:
            s = jnp.float32(postscale)
            xr = xr * s
            xi = xi * s
        out_r[slot] = xr
        out_i[slot] = xi

        out_dma(i, slot, out_r, or_hbm, sout_r).start()
        out_dma(i, slot, out_i, oi_hbm, sout_i).start()
        return 0

    jax.lax.fori_loop(0, nblocks, body, 0)

    # drain the last two output DMAs
    @pl.when(nblocks >= 2)
    def _():
        b = nblocks - 2
        out_dma(b, jax.lax.rem(b, 2), out_r, or_hbm, sout_r).wait()
        out_dma(b, jax.lax.rem(b, 2), out_i, oi_hbm, sout_i).wait()

    b = nblocks - 1
    out_dma(b, jax.lax.rem(b, 2), out_r, or_hbm, sout_r).wait()
    out_dma(b, jax.lax.rem(b, 2), out_i, oi_hbm, sout_i).wait()


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "precision",
    "stacked", "lanes"))
def _fft_cols_stream(re, im, *, n, sign, postscale, interpret,
                     factors=None, precision="highest", stacked=True,
                     lanes=LANES):
    with jax.enable_x64(False):
        L, _, T = re.shape
        assert T % lanes == 0, (
            f"streaming column pass needs a whole number of lane tiles "
            f"(trail {T}, lanes {lanes})")
        factors = tuple(factors or col_factors(n))
        tables = needed_tables(n, sign, factors=factors, stacked=stacked)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tj = T // lanes
        nblocks = L * tj
        tspec = [pl.BlockSpec(a.shape, memory_space=pltpu.VMEM)
                 for a in flat]
        hspec = pl.BlockSpec(memory_space=pltpu.ANY)
        kern = functools.partial(_stream_kernel, n, lanes, nblocks, tj,
                                 layout, postscale, factors, precision,
                                 stacked, sign)
        oshape = jax.ShapeDtypeStruct((L, n, T), jnp.float32)
        return pl.pallas_call(
            kern,
            in_specs=tspec + [hspec, hspec],
            out_specs=(hspec, hspec),
            out_shape=(oshape, oshape),
            scratch_shapes=[
                pltpu.VMEM((2, n, lanes), jnp.float32),   # in_r
                pltpu.VMEM((2, n, lanes), jnp.float32),   # in_i
                pltpu.VMEM((2, n, lanes), jnp.float32),   # out_r
                pltpu.VMEM((2, n, lanes), jnp.float32),   # out_i
                pltpu.SemaphoreType.DMA((2,)),            # sin_r
                pltpu.SemaphoreType.DMA((2,)),            # sin_i
                pltpu.SemaphoreType.DMA((2,)),            # sout_r
                pltpu.SemaphoreType.DMA((2,)),            # sout_i
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*flat, re, im)


def fft_cols_stream(re, im, sign, *, axis, postscale: float = 1.0,
                    interpret: bool | None = None, factors=None,
                    lanes: int = LANES):
    """Streaming column FFT along a non-final ``axis`` of planar arrays."""
    axis = axis % re.ndim
    assert axis != re.ndim - 1, "column passes only"
    n = re.shape[axis]
    if interpret is None:
        interpret = _interpret_default()
    shape = re.shape
    lead = math.prod(shape[:axis]) if axis else 1
    trail = math.prod(shape[axis + 1:])
    rr, ii = _fft_cols_stream(
        re.reshape(lead, n, trail), im.reshape(lead, n, trail),
        n=n, sign=sign, postscale=float(postscale),
        interpret=bool(interpret),
        factors=tuple(factors) if factors else None, lanes=lanes)
    return rr.reshape(shape), ii.reshape(shape)
