"""Streaming de/re-interleave kernels for the pyfft-style interleaved API.

The reference formatted interleaved (re,im)-adjacent load/store in every
generated kernel (SURVEY.md §2.5, §3.4).  On TPU the pair-adjacent minor
axis is hostile to the (8,128) tile model: an in-kernel pair split lowers
to stride-2 sublane relayouts and the XLA slice/stack conversion runs
~10x below streaming (docs/design.md, r3 "Interleaved storage" log).
Single-pass 1D plans avoid the problem entirely (the packed-native row
kernel, pallas_local.tile_fft_packed); this module serves every OTHER
plan shape: de/interleave as **0/1 selection contractions on the MXU**.

A (rows, 256)-lane chunk contracted against a (256, 128) selection
matrix extracts the even (re) or odd (im) lanes; the transposed pair
scatters two planar tiles back into pair order.  Under
``Precision.HIGHEST`` the 3-limb bf16 decomposition of each f32 operand
is exact and every output sums exactly one nonzero product, so the
conversion is **bit-exact** — verified against numpy slicing in
tests/test_interleave.py.  The kernel runs on the caller's layout
directly (2D grid over rows x lane-chunks): an outer XLA reshape to a
canonical shape was measured to cost ~3x the kernel itself
(benchmarks/probe_interleave3.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deinterleave", "interleave", "supported"]

_PACK = 256            # packed lanes per selection chunk (= 128 pairs)
_HALF = _PACK // 2
_MAX_ROW_TILE = 256    # sublanes per grid step
_MAX_CHUNKS = 16       # 256-lane chunks per grid step (4096 packed lanes)
# Constant index-map zero.  A bare Python 0 is weak-typed and becomes an
# i64 under jax_enable_x64, which Mosaic rejects at func.return (hit on
# TPU by every x64 session, e.g. any c128 user touching interleaved c64).
_Z = np.int32(0)


@functools.lru_cache(maxsize=None)
def _sel_np() -> tuple[np.ndarray, np.ndarray]:
    se = np.zeros((_PACK, _HALF), np.float32)
    so = np.zeros((_PACK, _HALF), np.float32)
    se[2 * np.arange(_HALF), np.arange(_HALF)] = 1.0
    so[2 * np.arange(_HALF) + 1, np.arange(_HALF)] = 1.0
    return se, so


def _dot(x, w):
    return jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


def _deint_kernel(v_ref, se_ref, so_ref, re_ref, im_ref):
    rt = v_ref.shape[0]
    x = v_ref[:].reshape(rt, -1, _PACK)
    re_ref[:] = _dot(x, se_ref[:]).reshape(rt, -1)
    im_ref[:] = _dot(x, so_ref[:]).reshape(rt, -1)


def _int_kernel(re_ref, im_ref, set_ref, sot_ref, v_ref):
    rt = re_ref.shape[0]
    r = re_ref[:].reshape(rt, -1, _HALF)
    i = im_ref[:].reshape(rt, -1, _HALF)
    v_ref[:] = (_dot(r, set_ref[:]) + _dot(i, sot_ref[:])).reshape(rt, -1)


def _tiles(rows: int, packed_lanes: int) -> tuple[int, int]:
    rt = math.gcd(rows, _MAX_ROW_TILE)
    kc = math.gcd(packed_lanes // _PACK, _MAX_CHUNKS)
    return rt, kc


_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
    dimension_semantics=("parallel", "parallel"),
)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _deinterleave2(v, se, so, *, interpret: bool):
    rows, pn = v.shape
    rt, kc = _tiles(rows, pn)
    out = jax.ShapeDtypeStruct((rows, pn // 2), v.dtype)
    return pl.pallas_call(
        _deint_kernel,
        grid=(rows // rt, pn // (_PACK * kc)),
        in_specs=[
            pl.BlockSpec((rt, _PACK * kc), lambda i, j: (i, j)),
            pl.BlockSpec((_PACK, _HALF), lambda i, j: (_Z, _Z)),
            pl.BlockSpec((_PACK, _HALF), lambda i, j: (_Z, _Z)),
        ],
        out_specs=[pl.BlockSpec((rt, _HALF * kc), lambda i, j: (i, j))] * 2,
        out_shape=[out, out],
        compiler_params=_PARAMS,
        interpret=interpret,
    )(v, se, so)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _interleave2(re, im, set_, sot, *, interpret: bool):
    rows, hn = re.shape
    rt, kc = _tiles(rows, 2 * hn)
    return pl.pallas_call(
        _int_kernel,
        grid=(rows // rt, hn // (_HALF * kc)),
        in_specs=[
            pl.BlockSpec((rt, _HALF * kc), lambda i, j: (i, j)),
            pl.BlockSpec((rt, _HALF * kc), lambda i, j: (i, j)),
            pl.BlockSpec((_HALF, _PACK), lambda i, j: (_Z, _Z)),
            pl.BlockSpec((_HALF, _PACK), lambda i, j: (_Z, _Z)),
        ],
        out_specs=pl.BlockSpec((rt, _PACK * kc), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rows, 2 * hn), re.dtype),
        compiler_params=_PARAMS,
        interpret=interpret,
    )(re, im, set_, sot)


def supported(shape: tuple[int, ...], dtype=jnp.float32) -> bool:
    """Kernel applies to (..., 2n) **f32** views whose minor is whole
    256-lane chunks (n a multiple of 128 — every Pallas-path size).
    f64 views (the c128 path) are rejected: Mosaic has no f64
    dot_general, so those stay on the XLA slice/stack conversion."""
    return (bool(shape) and shape[-1] % _PACK == 0
            and jnp.dtype(dtype) == jnp.float32)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def deinterleave(v, *, interpret: bool | None = None):
    """(..., 2n) f32 interleaved view -> ((..., n), (..., n)) planar planes.

    Bit-exact (0/1 selection contraction); one streaming HBM round trip.
    """
    if interpret is None:
        interpret = _interpret_default()
    lead, two_n = v.shape[:-1], v.shape[-1]
    n = two_n // 2
    se, so = _sel_np()
    flat = v.reshape(-1, two_n)
    re, im = _deinterleave2(flat, jnp.asarray(se), jnp.asarray(so),
                            interpret=bool(interpret))
    return (re.reshape(*lead, n), im.reshape(*lead, n))


def interleave(re, im, *, interpret: bool | None = None):
    """((..., n), (..., n)) planar planes -> (..., 2n) interleaved view."""
    if interpret is None:
        interpret = _interpret_default()
    lead, n = re.shape[:-1], re.shape[-1]
    se, so = _sel_np()
    fr = re.reshape(-1, n)
    fi = im.reshape(-1, n)
    v = _interleave2(fr, fi, jnp.asarray(se.T.copy()),
                     jnp.asarray(so.T.copy()),
                     interpret=bool(interpret))
    return v.reshape(*lead, 2 * n)
