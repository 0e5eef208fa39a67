"""Double-float (two-f32) arithmetic — the TPU's f64 substitute.

TPU v5e has no native f64 compute path; the reference's double-precision
support (``dtype=numpy.complex128`` plans, SURVEY.md §2.9-bis) maps here to
"double-float" arithmetic: every f64 value is carried as an (hi, lo) pair of
f32 with hi = fl32(x), lo capturing the next 24 mantissa bits, giving a unit
roundoff of ~2^-48 ≈ 3.6e-15 — comfortably inside the complex128 parity gate
(~1e-11..1e-12 vs numpy, BASELINE.md).

All primitives are branch-free elementwise f32 chains (Dekker/Knuth
error-free transformations, FMA-free variants), so they vectorize on the
VPU inside Pallas kernels and work identically under interpret mode / CPU.

References: Dekker (1971); Hida, Li & Bailey's QD library (public domain
algorithms).  No reference-code lineage: pyfft used native CUDA double.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "split_f64", "combine_f64", "two_sum", "quick_two_sum", "two_prod",
    "df_add", "df_sub", "df_mul", "df_neg", "df_scale_pow2", "df_cmul",
    "df64_const",
]


# ------------------------------------------------------------ host helpers

def split_f64(x):
    """f64 array -> (hi, lo) f32 planes with hi + lo == fl48(x).

    Works on numpy or jax arrays; the subtraction happens in f64 (exact).
    """
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def combine_f64(hi, lo):
    """(hi, lo) f32 planes -> f64 array (exact)."""
    return hi.astype(np.float64) + lo.astype(np.float64)


def df64_const(x) -> tuple[np.ndarray, np.ndarray]:
    """Host-side df64 representation of an f64 numpy array (for tables)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


# ----------------------------------------------------- error-free building

def two_sum(a, b):
    """s + e == a + b exactly, branch-based (|.|-ordered quick_two_sum).

    The classic branchless Knuth form (bb = s - a; e = (a-(s-bb)) + (b-bb))
    is algebraically simplified by XLA's HLO passes under fusion — the
    rewrite is only float-valid when |a| >= |b|, silently costing ~2^-24 in
    fused df64 programs (isolated in round 2: butterfly+twiddle chains
    drifted 2.4e-7 under CPU jit, exact eagerly).  Selecting the larger
    operand explicitly is rewrite-immune and exact for any magnitudes.
    7 ops (2 abs, 1 cmp, 2 select, 2 add/sub).
    """
    s = a + b
    swap = jnp.abs(b) > jnp.abs(a)
    big = jnp.where(swap, b, a)
    small = jnp.where(swap, a, b)
    return s, small - (s - big)


def quick_two_sum(a, b):
    """s + e == a + b exactly, assuming |a| >= |b|. 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    """Exact 12+12-bit split of f32 via mantissa masking. 3 ops.

    The classic Veltkamp form (c = 4097*a; hi = c - (c - a)) is broken by
    XLA CPU's default FMA contraction under jit (the (c - a) term fuses
    with the multiply, changing its rounding), which silently degraded
    df64 products to ~2^-25 in fused programs.  Masking the low 12
    mantissa bits is rewrite-immune, exact, and cheaper: hi keeps 12
    significant bits, lo = a - hi is the remaining <= 12 bits (exact by
    Sterbenz), so all cross products in two_prod stay exact in f32.
    """
    bits = jax.lax.bitcast_convert_type(a, jnp.int32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-4096), jnp.float32)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker, FMA-free). 17 flops."""
    p = a * b
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ------------------------------------------------------------- df64 ops

def df_add(ahi, alo, bhi, blo):
    """df64 addition (sloppy variant: ~2^-47 worst case, fine for FFT sums)."""
    s, e = two_sum(ahi, bhi)
    e = e + (alo + blo)
    return quick_two_sum(s, e)


def df_sub(ahi, alo, bhi, blo):
    return df_add(ahi, alo, -bhi, -blo)


def df_neg(ahi, alo):
    return -ahi, -alo


def df_mul(ahi, alo, bhi, blo):
    """df64 multiply: ~2^-48. 24 flops."""
    p, e = two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return quick_two_sum(p, e)


def df_scale_pow2(ahi, alo, s: float):
    """Multiply by an exact power of two (exact, 2 flops)."""
    c = jnp.float32(s)
    return ahi * c, alo * c


def df_cmul(arh, arl, aih, ail, brh, brl, bih, bil):
    """df64 complex multiply (a * b) on planar df64 quads. ~100 flops."""
    # real = ar*br - ai*bi
    prh, prl = df_mul(arh, arl, brh, brl)
    qrh, qrl = df_mul(aih, ail, bih, bil)
    rr = df_add(prh, prl, -qrh, -qrl)
    # imag = ar*bi + ai*br
    pih, pil = df_mul(arh, arl, bih, bil)
    qih, qil = df_mul(aih, ail, brh, brl)
    ri = df_add(pih, pil, qih, qil)
    return rr + ri
