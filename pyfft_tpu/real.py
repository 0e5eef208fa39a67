"""Real-to-complex transforms (rfft/irfft) — beyond the reference's scope.

The reference handled complex transforms only (SURVEY.md non-goals); these
wrappers add the classic half-size trick on top of the existing complex
machinery: a length-n real FFT runs as one length-n/2 complex FFT (through
whatever executor the planner picks — Pallas on TPU) plus an elementwise
planar untangle that XLA fuses into a single extra pass.

    X[k] = E[k] + w_n^k * O[k],            k = 0..n/2
    E[k] = (Z[k] + conj(Z[-k])) / 2        (FFT of even samples)
    O[k] = (Z[k] - conj(Z[-k])) / (2i)     (FFT of odd samples)

with Z the n/2-point FFT of z[t] = x[2t] + i*x[2t+1].  Everything is
planar (re, im) float pairs internally, complex only at the API boundary —
the same storage policy as the rest of the framework.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["rfft", "irfft"]


@functools.lru_cache(maxsize=None)
def _half_twiddle(n: int, sign: int):
    """(wr, wi) of w_n^(sign*k) for k = 0..n/2, f64-exact then rounded."""
    k = np.arange(n // 2 + 1, dtype=np.int64)
    theta = sign * 2.0 * np.pi * k / n
    return (np.cos(theta).astype(np.float32),
            np.sin(theta).astype(np.float32))


def _get_plan(m: int, **kw):
    from pyfft_tpu.api import get_plan
    return get_plan((m,), np.complex64, **kw)


def rfft(x, **kw):
    """FFT of a real array over its last axis (power-of-two length >= 4).

    Returns the complex half-spectrum of length n//2 + 1 (numpy.fft.rfft
    layout).  Accepts numpy or JAX float arrays (f64 input is computed in
    f32, like ``fft`` on complex64).
    """
    x = jnp.asarray(x)
    n = x.shape[-1]
    if not (is_power_of_two(n) and n >= 4):
        raise ValueError(f"rfft length must be a power of two >= 4, got {n}")
    m = n // 2
    x = x.astype(jnp.float32)
    ze = x[..., 0::2]
    zo = x[..., 1::2]
    plan = _get_plan(m, **kw)
    zr, zi = plan.execute(ze, zo)          # split mode: planar in/out

    # Z[-k] with wraparound: index (m - k) % m for k = 0..m
    idx = (-jnp.arange(m + 1)) % m
    zr_e = jnp.concatenate([zr, zr[..., :1]], axis=-1)   # Z[k], k=0..m
    zi_e = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    vr = jnp.take(zr, idx, axis=-1)                       # Re Z[-k]
    vi = -jnp.take(zi, idx, axis=-1)                      # Im conj(Z[-k])
    er = 0.5 * (zr_e + vr)
    ei = 0.5 * (zi_e + vi)
    onr = 0.5 * (zi_e - vi)                # O = (Z - conj(Z[-k]))/(2i)
    oni = -0.5 * (zr_e - vr)
    wr, wi = (jnp.asarray(t) for t in _half_twiddle(n, -1))
    xr = er + wr * onr - wi * oni
    xi = ei + wr * oni + wi * onr
    out = np.asarray(xr) + 1j * np.asarray(xi)
    return out.astype(np.complex64)


def irfft(X, n: int | None = None, **kw):
    """Inverse of :func:`rfft`: half-spectrum (..., n//2+1) -> real (..., n)."""
    X = np.asarray(X)
    if n is None:
        n = 2 * (X.shape[-1] - 1)
    if not (is_power_of_two(n) and n >= 4) or X.shape[-1] != n // 2 + 1:
        raise ValueError(
            f"irfft needs a (..., n//2+1) half-spectrum with n a power of "
            f"two >= 4; got {X.shape[-1]} columns for n={n}")
    m = n // 2
    xr = jnp.asarray(np.ascontiguousarray(X.real), jnp.float32)
    xi = jnp.asarray(np.ascontiguousarray(X.imag), jnp.float32)

    # E[k] = (X[k] + conj(X[m-k]))/2, O[k] = w_n^{-k} (X[k] - conj(X[m-k]))/2
    rev_r = xr[..., ::-1]                  # X[m-k] for k=0..m
    rev_i = xi[..., ::-1]
    er = 0.5 * (xr + rev_r)
    ei = 0.5 * (xi - rev_i)
    dr = 0.5 * (xr - rev_r)
    di = 0.5 * (xi + rev_i)
    wr, wi = (jnp.asarray(t) for t in _half_twiddle(n, +1))
    onr = wr * dr - wi * di
    oni = wr * di + wi * dr
    # z spectrum: Z[k] = E[k] + i O[k], k = 0..m-1
    zr = (er + -oni)[..., :m]              # Re(E + iO) = Er - Oi
    zi = (ei + onr)[..., :m]               # Im(E + iO) = Ei + Or
    plan = _get_plan(m, **kw)
    br, bi = plan.execute(zr, zi, inverse=True)   # 1/m normalized
    out = jnp.stack([br, bi], axis=-1).reshape(*br.shape[:-1], n)
    return np.asarray(out)
