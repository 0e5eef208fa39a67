"""Planar (split re/im) matmul-form FFT in pure ``jax.numpy``.

This is the framework's L0 compute path (SURVEY.md §7 ``reference.py``):
a slow-but-certain implementation that runs on every JAX backend (CPU, TPU)
and every float dtype (f32, f64 under x64), used as

* the fallback for anything the Pallas kernels don't cover yet, and
* the building block the planner composes for multi-pass (four-step) global
  transforms whose working set exceeds VMEM.

Design (TPU-first, not a translation of the reference):
The reference (``pyfft/kernels.mako``, SURVEY.md §2.5) emits radix-2/4/8
*register butterflies* — the right shape for a GPU SIMT core.  On TPU the
FLOPs live in the 128x128 MXU, so each recursion level here is the
**four-step decomposition** N = N1*N2:

    x[j1*N2 + j2]                        (reshape to (..., N1, N2))
    1. length-N1 DFTs over j1            (MXU contraction)
    2. twiddle multiply T[j2,k1]         (VPU, fuses into neighbors)
    3. length-N2 DFTs over j2            (MXU contraction)
    4. X[k2*N1 + k1] = result[k1,k2]     (transpose + flatten)

with the base case a direct DFT-matrix contraction.  Stockham-style
contiguous reshapes mean there is **no bit-reversal permutation anywhere** —
gathers are the one thing the TPU vector unit punishes.

Everything is planar: complex z is carried as (Re z, Im z) float arrays and a
complex matmul is 4 real matmuls — MXU-native, and the only way to get f64
(and later double-float) transforms on hardware without complex units.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.ops.twiddle import dft_matrix, twiddle_table
from pyfft_tpu.utils.radix import balanced_split, is_power_of_two

__all__ = ["fft_planar", "fftn_planar", "DEFAULT_BASE"]

# Largest transform handled by a single DFT-matrix contraction.  128 matches
# the MXU systolic width; recursion above keeps contraction dims <= this.
DEFAULT_BASE = 128

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _consts(kind: str, *args) -> tuple[np.ndarray, np.ndarray]:
    if kind == "dft":
        return dft_matrix(*args)
    return twiddle_table(*args)


def _cmatmul(ar: Array, ai: Array, br: np.ndarray, bi: np.ndarray,
             precision) -> tuple[Array, Array]:
    """(ar + i*ai) @ (br + i*bi) as 4 real matmuls over the last axis."""
    br = jnp.asarray(br)
    bi = jnp.asarray(bi)
    rr = jnp.matmul(ar, br, precision=precision)
    ri = jnp.matmul(ar, bi, precision=precision)
    ir = jnp.matmul(ai, br, precision=precision)
    ii = jnp.matmul(ai, bi, precision=precision)
    return rr - ii, ri + ir


def _fft_last(re: Array, im: Array, sign: int, base: int,
              precision) -> tuple[Array, Array]:
    """DFT along the last axis of planar (re, im); unnormalized."""
    n = re.shape[-1]
    if n == 1:
        return re, im
    dt = np.dtype(re.dtype)
    if n <= base:
        wr, wi = _consts("dft", n, sign, dt.name)
        return _cmatmul(re, im, wr, wi, precision)

    n1, n2 = balanced_split(n)
    lead = re.shape[:-1]
    re = re.reshape(*lead, n1, n2)
    im = im.reshape(*lead, n1, n2)

    # Step 1: length-n1 DFTs over j1 (bring j1 to the contraction axis).
    ar = jnp.swapaxes(re, -1, -2)          # (..., j2, j1)
    ai = jnp.swapaxes(im, -1, -2)
    br_, bi_ = _fft_last(ar, ai, sign, base, precision)   # (..., j2, k1)

    # Step 2: twiddle T[j2, k1] = w_N^(j2*k1).
    tr, ti = _consts("tw", n2, n1, n, sign, dt.name)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    cr = br_ * tr - bi_ * ti
    ci = br_ * ti + bi_ * tr

    # Step 3: length-n2 DFTs over j2.
    cr = jnp.swapaxes(cr, -1, -2)          # (..., k1, j2)
    ci = jnp.swapaxes(ci, -1, -2)
    dr, di = _fft_last(cr, ci, sign, base, precision)     # (..., k1, k2)

    # Step 4: X[k2*n1 + k1] = D[k1, k2].
    xr = jnp.swapaxes(dr, -1, -2).reshape(*lead, n)
    xi = jnp.swapaxes(di, -1, -2).reshape(*lead, n)
    return xr, xi


def fft_planar(re: Array, im: Array, sign: Literal[-1, 1], axis: int = -1,
               base: int = DEFAULT_BASE,
               precision=jax.lax.Precision.HIGHEST) -> tuple[Array, Array]:
    """Unnormalized DFT of a planar complex array along ``axis``.

    sign=-1 is the forward transform, sign=+1 the inverse kernel (the caller
    applies 1/N normalization per the reference's semantics, SURVEY.md
    §2.9-bis).
    """
    n = re.shape[axis]
    if not is_power_of_two(n):
        raise ValueError(f"transform length {n} is not a power of two")
    if re.shape != im.shape:
        raise ValueError("re/im shape mismatch")
    axis = axis % re.ndim
    if axis != re.ndim - 1:
        re = jnp.moveaxis(re, axis, -1)
        im = jnp.moveaxis(im, axis, -1)
    re, im = _fft_last(re, im, sign, base, precision)
    if axis != re.ndim - 1:
        re = jnp.moveaxis(re, -1, axis)
        im = jnp.moveaxis(im, -1, axis)
    return re, im


def fftn_planar(re: Array, im: Array, sign: Literal[-1, 1],
                axes: tuple[int, ...],
                base: int = DEFAULT_BASE,
                precision=jax.lax.Precision.HIGHEST) -> tuple[Array, Array]:
    """Unnormalized multi-axis DFT (separable: one pass per axis)."""
    for ax in axes:
        re, im = fft_planar(re, im, sign, axis=ax, base=base, precision=precision)
    return re, im
