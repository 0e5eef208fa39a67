"""Functional convenience API over cached Plans.

The reference exposed only the Plan class; these wrappers
(``fft``/``ifft``/``fft2``/``fftn``) are the natural JAX-flavored surface on
top of it, with an internal plan cache so repeat shapes reuse traced
executables.
"""

from __future__ import annotations

import numpy as np

from pyfft_tpu.plan import Plan

__all__ = ["fft", "ifft", "fft2", "ifft2", "fftn", "ifftn", "get_plan"]

_PLAN_CACHE: dict = {}


def get_plan(shape, dtype=np.complex64, **kwargs) -> Plan:
    if isinstance(shape, (int, np.integer)):
        shape = (int(shape),)
    key = (tuple(shape), np.dtype(dtype).name, tuple(sorted(kwargs.items())))
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = _PLAN_CACHE[key] = Plan(tuple(shape), dtype, **kwargs)
    return plan


def _transform(x, ndim, inverse, **kwargs):
    x = np.asanyarray(x) if isinstance(x, (list, tuple)) else x
    shape = tuple(x.shape[-ndim:])
    dtype = x.dtype if np.dtype(x.dtype).kind == "c" else np.complex64
    plan = get_plan(shape, dtype, **kwargs)
    return plan.execute(x, inverse=inverse)


def fft(x, **kw):
    """1D FFT over the last axis (power-of-two length)."""
    return _transform(x, 1, False, **kw)


def ifft(x, **kw):
    return _transform(x, 1, True, **kw)


def fft2(x, **kw):
    """2D FFT over the last two axes."""
    return _transform(x, 2, False, **kw)


def ifft2(x, **kw):
    return _transform(x, 2, True, **kw)


def fftn(x, ndim=None, **kw):
    """N-D FFT over the last ``ndim`` axes (default: all, up to 3)."""
    nd = ndim if ndim is not None else min(x.ndim, 3)
    return _transform(x, nd, False, **kw)


def ifftn(x, ndim=None, **kw):
    nd = ndim if ndim is not None else min(x.ndim, 3)
    return _transform(x, nd, True, **kw)
