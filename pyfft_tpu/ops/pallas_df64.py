"""Pallas double-float FFT kernels — the complex128 path on TPU.

The reference got double precision for free from CUDA hardware
(``dtype=numpy.complex128`` plans, fp64-capable devices — SURVEY.md
§2.9-bis); TPU v5e has no f64 compute unit, so this module implements the
transform in **double-float** arithmetic (ops/df64.py): every f64 plane is
an (hi, lo) pair of f32 planes and each complex value is a planar quad
(rh, rl, ih, il).

Kernel strategy — the VPU-native dual of the c64 MXU kernels:

* stages are radix-4/radix-2 **butterflies**: complex additions (error-free
  TwoSum chains) and multiplies by +-i (exact plane swaps) — no df64
  multiplies at all inside a stage;
* the only df64 multiplies are the inter-stage twiddles (one per element
  per stage, ~100 f32 VPU flops), with twiddle tables precomputed on the
  host from f64 and stored as df64 quads;
* normalization by 1/N is an exact power-of-two scale.

Unit roundoff ~2^-48 gives FFT parity ~1e-13 vs numpy complex128 —
inside the ~1e-11 BASELINE gate.  Same layout rules as pallas_local:
(n, lanes) tiles, transform on sublanes, digit-prepending stage order,
no bit reversal.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops.df64 import df64_const, df_add, df_cmul, df_scale_pow2
from pyfft_tpu.ops.pallas_local import LANES, _interpret_default
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["supported", "fft_axis_df64", "fft_axis_large_df64",
           "MAX_LOCAL_N_DF64", "tile_fft_df64", "default_factors_df64"]
# Compile-safety ceilings measured on v5e (the df64 butterfly chains hold
# ~n*lanes-sized live values; Mosaic's register allocator spills them to
# scoped VMEM, which blows the 128 MiB cap past these sizes):
#   row / col kernels:            n <= 2048
#   col + fused twiddle + swap:   n <= 1024
MAX_LOCAL_N_DF64 = 2048
SWAP_MAX_DF64 = 1024
_MIN_N = 8


def default_factors_df64(n: int) -> tuple[int, ...]:
    """Radix-4 chain (one leading 2 for odd log2): butterflies only."""
    p = n.bit_length() - 1
    if p % 2:
        return (2,) + (4,) * (p // 2)
    return (4,) * (p // 2)


def needed_tables_df64(n: int, sign: int, factors=None) -> dict:
    """{("tw", i, factors): (trh, trl, tih, til)} inter-stage twiddles."""
    factors = tuple(factors or default_factors_df64(n))
    assert math.prod(factors) == n
    tables: dict = {}
    for i, f in enumerate(factors[:-1]):
        rest = factors[i + 1:]
        r = math.prod(rest)
        k = np.arange(f).reshape(-1, 1)
        j = np.arange(r).reshape(1, -1)
        ang = sign * 2.0 * np.pi * (k * j) / (f * r)
        shape = (f,) + (1,) * i + rest + (1,)
        trh, trl = df64_const(np.cos(ang))
        tih, til = df64_const(np.sin(ang))
        tables[("tw", i, factors)] = tuple(
            a.reshape(shape) for a in (trh, trl, tih, til))
    return tables


# complex df64 value = (rh, rl, ih, il) tuple of arrays
def _cadd(x, y):
    rr = df_add(x[0], x[1], y[0], y[1])
    ii = df_add(x[2], x[3], y[2], y[3])
    return rr + ii


def _csub(x, y):
    rr = df_add(x[0], x[1], -y[0], -y[1])
    ii = df_add(x[2], x[3], -y[2], -y[3])
    return rr + ii


def _mul_pi(x, sign):
    """Multiply by (sign * i): exact plane swap."""
    rh, rl, ih, il = x
    if sign < 0:      # -i * (r + ii) = i - i r -> (im, -re)
        return (ih, il, -rh, -rl)
    return (-ih, -il, rh, rl)


def _slice4(planes, f, axis):
    return [tuple(jax.lax.index_in_dim(p, j, axis, keepdims=False)
                  for p in planes) for j in range(f)]


def _butterfly_df64(f, planes, axis, sign):
    """f-point DFT (f in 2, 4) over ``axis`` of a complex-df64 quad.

    Pure additions and +-i swaps — exact in df64.  Output digit prepended
    at axis 0 (dot_general convention, matching the c64 kernels).
    """
    xs = _slice4(planes, f, axis)
    if f == 2:
        ys = [_cadd(xs[0], xs[1]), _csub(xs[0], xs[1])]
    elif f == 4:
        a = _cadd(xs[0], xs[2])
        b = _csub(xs[0], xs[2])
        c = _cadd(xs[1], xs[3])
        d = _csub(xs[1], xs[3])
        id_ = _mul_pi(d, sign)
        ys = [_cadd(a, c), _cadd(b, id_), _csub(a, c), _csub(b, id_)]
    else:
        raise ValueError(f"df64 butterfly radix must be 2 or 4, got {f}")
    return tuple(jnp.stack([y[k] for y in ys], axis=0) for k in range(4))


def tile_fft_df64(planes, tables: dict, n: int, factors=None, sign=-1):
    """Length-n DFT over axis 0 of (n, lanes) df64 planar quad."""
    lanes = planes[0].shape[-1]
    factors = tuple(factors or default_factors_df64(n))
    m = len(factors)
    x = tuple(p.reshape(*factors, lanes) for p in planes)
    for i, f in enumerate(factors):
        x = _butterfly_df64(f, x, i, sign)
        if i < m - 1:
            trh, trl, tih, til = tables[("tw", i, factors)]
            x = df_cmul(x[0], x[1], x[2], x[3], trh, trl, tih, til)
    return tuple(p.reshape(n, lanes) for p in x)


def _apply_post(x, postscale):
    if postscale == 1.0:
        return x
    m, e = math.frexp(postscale)
    if m == 0.5:      # exact power of two (the normalize=1/N case)
        rh, rl = df_scale_pow2(x[0], x[1], postscale)
        ih, il = df_scale_pow2(x[2], x[3], postscale)
        return (rh, rl, ih, il)
    sh, sl = df64_const(np.float64(postscale))
    sh, sl = jnp.float32(sh), jnp.float32(sl)
    z = jnp.float32(0.0)
    return df_cmul(x[0], x[1], x[2], x[3], sh, sl, z, z)


def _row_kernel_df64(n, layout, postscale, factors, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    ins = refs[nt:nt + 4]
    outs = refs[nt + 4:nt + 8]
    x = tuple(r[:].T for r in ins)
    x = tile_fft_df64(x, tables, n, factors, sign)
    x = _apply_post(x, postscale)
    for o, p in zip(outs, x):
        o[:] = p.T


def _col_kernel_df64(n, layout, postscale, factors, sign, has_tw, swap,
                     *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    pos = nt
    tw = None
    if has_tw:
        tw = tuple(refs[pos + j] for j in range(4))
        pos += 4
    ins = refs[pos:pos + 4]
    outs = refs[pos + 4:pos + 8]
    x = tuple(r[0] for r in ins)
    x = tile_fft_df64(x, tables, n, factors, sign)
    if has_tw:
        x = df_cmul(x[0], x[1], x[2], x[3],
                    tw[0][:], tw[1][:], tw[2][:], tw[3][:])
    x = _apply_post(x, postscale)
    for o, p in zip(outs, x):
        o[0] = p.T if swap else p


def _vmem_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel",) * 2)


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "lanes"))
def _fft_rows_df64(rh, rl, ih, il, *, n, sign, postscale, interpret,
                   factors=None, lanes=LANES):
    with jax.enable_x64(False):   # Mosaic rejects x64-typed traces
        factors = tuple(factors or default_factors_df64(n))
        tables = needed_tables_df64(n, sign, factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        rows = rh.shape[0]
        grid = (pl.cdiv(rows, lanes),)
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((lanes, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_row_kernel_df64, n, layout, postscale,
                                 factors, sign)
        oshape = (jax.ShapeDtypeStruct((rows, n), jnp.float32),) * 4
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=tspec + [dspec] * 4,
            out_specs=(dspec,) * 4,
            out_shape=oshape,
            cost_estimate=pl.CostEstimate(
                flops=300 * rows * n * max(1, len(factors)),
                bytes_accessed=rows * n * 4 * 8,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*flat, rh, rl, ih, il)


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "lanes", "tw_n",
    "swap_store"))
def _fft_cols_df64(rh, rl, ih, il, *, n, sign, postscale, interpret,
                   factors=None, lanes=LANES, tw_n: int = 0,
                   swap_store: bool = False):
    with jax.enable_x64(False):
        factors = tuple(factors or default_factors_df64(n))
        tables = needed_tables_df64(n, sign, factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        L, _, T = rh.shape
        grid = (L, pl.cdiv(T, lanes))
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        extra = []
        if tw_n:
            k = np.arange(n).reshape(-1, 1)
            j = np.arange(T).reshape(1, -1)
            ang = sign * 2.0 * np.pi * (k * j % tw_n) / tw_n
            for tab in (np.cos(ang), np.sin(ang)):
                hi, lo = df64_const(tab)
                extra += [jnp.asarray(hi), jnp.asarray(lo)]
            # order: trh, trl, tih, til
            extra = [extra[0], extra[1], extra[2], extra[3]]
            tspec = tspec + [pl.BlockSpec((n, lanes), lambda i, j: (0, j),
                                          memory_space=pltpu.VMEM)] * 4
        dspec = pl.BlockSpec((1, n, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        if swap_store:
            ospec = pl.BlockSpec((1, lanes, n), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
            oshape = (jax.ShapeDtypeStruct((L, T, n), jnp.float32),) * 4
        else:
            ospec = dspec
            oshape = (jax.ShapeDtypeStruct((L, n, T), jnp.float32),) * 4
        kern = functools.partial(_col_kernel_df64, n, layout, postscale,
                                 factors, sign, bool(tw_n), swap_store)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=tspec + [dspec] * 4,
            out_specs=(ospec,) * 4,
            out_shape=oshape,
            cost_estimate=pl.CostEstimate(
                flops=300 * L * n * T * max(1, len(factors)),
                bytes_accessed=L * n * T * 4 * 8,
                transcendentals=0),
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(*flat, *extra, rh, rl, ih, il)


def supported(rh, axis: int, max_local: int | None = None) -> bool:
    """Whether the df64 kernels cover this plane/axis (f32 hi plane)."""
    if rh.dtype != jnp.float32:
        return False
    axis = axis % rh.ndim
    n = rh.shape[axis]
    max_local = max_local or MAX_LOCAL_N_DF64
    if not is_power_of_two(n):
        return False
    if _MIN_N <= n <= max_local:
        pass
    elif max_local < n <= max_local * max_local and axis == rh.ndim - 1:
        n1, n2 = _choose_split_df64(n, max_local)
        return LANES <= n1 <= max_local and LANES <= n2 <= max_local
    else:
        return False
    if axis == rh.ndim - 1:
        return True
    trail = math.prod(rh.shape[axis + 1:])
    return trail >= LANES


def fft_axis_df64(planes, sign, *, axis, postscale: float = 1.0,
                  interpret: bool | None = None, factors=None,
                  tw_n: int = 0, swap_store: bool = False):
    """DFT along ``axis`` of a complex-df64 planar quad (rh, rl, ih, il)."""
    rh = planes[0]
    axis = axis % rh.ndim
    n = rh.shape[axis]
    if interpret is None:
        interpret = _interpret_default()
    kw = dict(n=n, sign=sign, postscale=float(postscale),
              interpret=bool(interpret),
              factors=tuple(factors) if factors else None)
    shape = rh.shape
    if axis == rh.ndim - 1:
        assert not tw_n and not swap_store
        lead = shape[:-1]
        rows = math.prod(lead) if lead else 1
        out = _fft_rows_df64(*(p.reshape(rows, n) for p in planes), **kw)
        return tuple(p.reshape(*lead, n) for p in out)
    lead = math.prod(shape[:axis]) if axis else 1
    trail = math.prod(shape[axis + 1:])
    out = _fft_cols_df64(*(p.reshape(lead, n, trail) for p in planes),
                         tw_n=tw_n, swap_store=swap_store, **kw)
    if swap_store:
        oshape = shape[:axis] + shape[axis + 1:] + (n,)
        return tuple(p.reshape(oshape) for p in out)
    return tuple(p.reshape(shape) for p in out)


def _choose_split_df64(n: int, max_local: int) -> tuple[int, int]:
    p = n.bit_length() - 1
    p1 = (p + 1) // 2
    return 1 << p1, 1 << (p - p1)


def fft_axis_large_df64(planes, sign, *, axis, postscale: float = 1.0,
                        max_local: int | None = None,
                        swap_max: int | None = None,
                        interpret: bool | None = None):
    """Four-step df64 DFT over the last axis.

    Two forms, chosen by the measured compile ceilings:

    * two-pass (n <= swap_max * max_local): column pass with fused twiddle
      and digit-swapped store, then a second column pass — the same
      structure as the c64 path in ops/fourstep.py;
    * three-pass (up to max_local^2): column pass with fused twiddle (no
      swap), row pass with the scale folded in, then one XLA digit-swap
      transpose of the four f32 planes.
    """
    rh = planes[0]
    axis = axis % rh.ndim
    assert axis == rh.ndim - 1
    n = rh.shape[-1]
    max_local = max_local or MAX_LOCAL_N_DF64
    swap_max = swap_max or min(SWAP_MAX_DF64, max_local)
    n1, n2 = _choose_split_df64(n, max_local)
    lead = rh.shape[:-1]
    if n1 > swap_max and n2 <= swap_max:
        n1, n2 = n2, n1
    x = tuple(p.reshape(*lead, n1, n2) for p in planes)
    if n1 <= swap_max:
        x = fft_axis_df64(x, sign, axis=-2, tw_n=n, swap_store=True,
                          interpret=interpret)
        x = fft_axis_df64(x, sign, axis=-2, postscale=postscale,
                          interpret=interpret)
        return tuple(p.reshape(*lead, n) for p in x)
    # three-pass form: too big for the swap-store kernel
    x = fft_axis_df64(x, sign, axis=-2, tw_n=n, interpret=interpret)
    x = fft_axis_df64(x, sign, axis=-1, postscale=postscale,
                      interpret=interpret)
    return tuple(jnp.swapaxes(p, -1, -2).reshape(*lead, n) for p in x)
