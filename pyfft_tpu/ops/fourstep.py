"""Four-step global FFT for transforms beyond one VMEM tile.

TPU-native analog of the reference's GlobalFFTKernel chain
(``pyfft/kernel.py`` GlobalFFTKernel.createChain, SURVEY.md §2.3/§3.3): a
length-N transform whose working set exceeds VMEM becomes a short chain of
passes through HBM.  Where the GPU chain was one kernel per radix-<=16 pass
(k full HBM round trips for k radices), the TPU chain is exactly three
passes, each a fused Pallas kernel or one XLA transpose:

  view (..., N) as (..., N1, N2), N1*N2 = N, both within the local kernel:
  1. column pass: N1-point FFTs over axis -2 with the inter-pass twiddle
     w_N^(k1*j2) fused into the compute and the digit-swap transpose
     absorbed into the store (``swap_store``): output lands as
     (..., j2, k1) with one in-VMEM 2D transpose — no HBM transpose pass.
  2. column pass: N2-point FFTs over axis -2 of the swapped layout
     (transform already on sublanes: zero transposes), postscale folded
     in; rows come out as (..., k2, k1) = the flattened DFT order.

Two HBM round trips total, both compute passes, zero XLA transposes —
the GPU chain's k radix passes collapse to 2.  N up to MAX_LOCAL_N^2
(= 64M points at 8192) is covered by one level.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["fft_axis_large", "fft_axis_huge", "fft_axis_mid",
           "choose_split", "choose_split3", "supported", "supported_huge",
           "supported_mid"]


# Measured per-element column-pass wall (relative units, scan-chain timed
# on the four-step shapes; refreshed r3 after the radix-8 + folded-twiddle
# chains landed): col n=2048 (8,4,64) measured 0.383 ms/2^24 elems —
# near the HBM roofline — vs 1024's 0.48 and 4096's 0.55, so balanced
# (2048, 2048) is now the 2^22 split (was (1024, 4096) in r2).
_COL_UNIT_COST = {128: 1.30, 256: 0.88, 512: 1.05, 1024: 1.00,
                  2048: 0.80, 4096: 1.16, 8192: 1.35}


def _split_cost(n: int) -> float:
    return _COL_UNIT_COST.get(n, 1.5)


def _tuned_split(kind: str, n: int, parts: int, max_local: int, lanes: int):
    """A machine-measured split from the autotune record (utils/tune), or
    None.  Validated against the caller's constraints so a stale or
    foreign record can never produce an uncompilable plan — it is simply
    ignored and the static cost model decides."""
    v = pallas_local._tuned_factors(kind, n)
    if (not v or len(v) != parts or math.prod(v) != n
            or any(not is_power_of_two(f) or f > max_local or f < lanes
                   for f in v)):
        return None
    return tuple(int(f) for f in v)


def choose_split(n: int, max_local: int | None = None) -> tuple[int, int]:
    """(n1, n2) with n1*n2 = n, both <= max_local, minimizing measured cost.

    An autotune record for this machine (``split:{n}`` — utils/tune) wins
    outright; otherwise the cost model is the sum of the measured
    per-element pass costs of the two axis lengths, since both passes move
    the full array once (ties break toward the balanced split, which has
    the lower VMEM peak).  Both factors must give the column kernels at
    least one 128-lane trail tile, so no valid split exists for
    max_local < n < 128*128: callers must handle the ValueError (the
    planner falls back to XLA).
    """
    max_local = max_local or pallas_local.MAX_LOCAL_N
    lanes = pallas_local.LANES
    t = _tuned_split("split", n, 2, max_local, lanes)
    if t is not None:
        return t
    p = n.bit_length() - 1
    best = None
    for p1 in range(1, p):
        n1, n2 = 1 << p1, 1 << (p - p1)
        if n1 > max_local or n2 > max_local:
            continue
        if n1 < lanes or n2 < lanes:
            continue
        key = (_split_cost(n1) + _split_cost(n2), abs(p1 - (p - p1)))
        if best is None or key < best[0]:
            best = (key, (n1, n2))
    if best is None:
        raise ValueError(
            f"n={n} exceeds the single-level four-step range "
            f"(max {max_local}^2={max_local * max_local})")
    return best[1]


def supported(re, axis: int, max_local: int | None = None) -> bool:
    if re.dtype != jnp.float32:
        return False
    if axis % re.ndim != re.ndim - 1:
        return False
    max_local = max_local or pallas_local.MAX_LOCAL_N
    n = re.shape[axis]
    if not (is_power_of_two(n) and max_local < n <= max_local * max_local):
        return False
    try:
        choose_split(n, max_local)   # both factors must fill a lane tile
    except ValueError:
        return False
    return True


def choose_split3(n: int, max_local: int | None = None
                  ) -> tuple[int, int, int]:
    """(n1, m1, m2) for the two-level (six-step) decomposition of huge n:
    n = n1*m1*m2, every factor a local-kernel size, n1 >= LANES (the
    mid-swap period must be a whole number of lane tiles) and m2 >= LANES
    (pass-2's twiddle stride needs whole tiles per column).  An autotune
    record (``split3:{n}``) wins over the static cost model."""
    max_local = max_local or pallas_local.MAX_LOCAL_N
    lanes = pallas_local.LANES
    t = _tuned_split("split3", n, 3, max_local, lanes)
    if t is not None:
        return t
    p = n.bit_length() - 1
    best = None
    for p1 in range(7, p):
        n1 = 1 << p1
        if n1 > max_local:
            break
        n2 = n // n1
        for q1 in range(7, p - p1):
            m1, m2 = 1 << q1, n2 >> q1
            if m1 > max_local or m2 > max_local or m2 < lanes:
                continue
            cost = (_split_cost(n1) + _split_cost(m1) + _split_cost(m2))
            key = (cost, abs(q1 - (p - p1 - q1)), abs(2 * p1 - p))
            if best is None or key < best[0]:
                best = (key, (n1, m1, m2))
    if best is None:
        raise ValueError(f"n={n} has no two-level decomposition "
                         f"(max_local={max_local})")
    return best[1]


def supported_huge(re, axis: int, max_local: int | None = None) -> bool:
    if re.dtype != jnp.float32:
        return False
    if axis % re.ndim != re.ndim - 1:
        return False
    max_local = max_local or pallas_local.MAX_LOCAL_N
    n = re.shape[axis]
    if not (is_power_of_two(n) and n > max_local * max_local):
        return False
    try:
        choose_split3(n, max_local)
    except ValueError:
        return False
    return True


def fft_axis_huge(re, im, sign, *, axis, postscale: float = 1.0,
                  max_local: int | None = None,
                  interpret: bool | None = None, fast_math: bool = True,
                  split3: tuple[int, int, int] | None = None):
    """Two-level (six-step) DFT for n beyond one four-step level.

    n = n1*m1*m2 with every factor a local-kernel size; three fused column
    passes, each one HBM round trip, digits landing in final DFT order:

      view (..., n1, m1*m2):
      1. col FFT over j1 + FACTORED level-1 twiddle w_n^(k1*j2)
         (A/B tables, O(n1*n2/128) memory), digit-swap store
         -> (..., m1, m2, k1)
      2. col FFT over i1 (trail m2*n1) + STRIDED level-2 twiddle
         w_{m1*m2}^(q1*i2) (constant per lane tile), mid-swap store with
         period n1 -> (..., m2, q1, k1)
      3. col FFT over i2 (trail m1*n1), postscale folded
         -> (..., q2, q1, k1) = flattened DFT order.

    The reference chained one global kernel per radix pass with no upper
    bound on n (SURVEY.md §3.3); this is the TPU-native equivalent: the
    planner docstring's "recurse until they fit" made true at two levels
    (covering n up to MAX_LOCAL_N^3 = 2^39 — beyond any HBM).
    """
    axis = axis % re.ndim
    assert axis == re.ndim - 1, "huge path covers the last axis"
    n = re.shape[-1]
    n1, m1, m2 = split3 or choose_split3(n, max_local)
    if n1 * m1 * m2 != n:
        raise ValueError(f"split3 {n1}x{m1}x{m2} does not factor n={n}")
    n2 = m1 * m2
    lead = re.shape[:-1]
    f1 = f2 = f3 = None
    if not fast_math:
        f1 = pallas_local.precise_factors(n1)
        f2 = pallas_local.precise_factors(m1)
        f3 = pallas_local.precise_factors(m2)
    r = re.reshape(*lead, n1, n2)
    i = im.reshape(*lead, n1, n2)
    # pass 1: level-1 twiddle factored as A[k1, j2//128] * B[k1, j2%128]
    r, i = pallas_local.fft_axis(r, i, sign, axis=-2, tw_n=n,
                                 tw_mode="factored", swap_store=True,
                                 factors=f1, interpret=interpret)
    # now (..., j2, k1) = (..., m1, m2*n1) viewing j2 = i1*m2 + i2
    r = r.reshape(*lead, m1, m2 * n1)
    i = i.reshape(*lead, m1, m2 * n1)
    # pass 2: level-2 twiddle w_{n2}^(q1 * (t // n1)), mid-swap period n1
    r, i = pallas_local.fft_axis(r, i, sign, axis=-2, tw_n=n2,
                                 tw_mode="strided", tw_period=n1,
                                 swap_mid=n1, factors=f2,
                                 interpret=interpret)
    # mid-swap output: (..., m2, m1, n1) = (i2, q1, k1)
    r = r.reshape(*lead, m2, m1 * n1)
    i = i.reshape(*lead, m2, m1 * n1)
    # pass 3: plain col FFT over i2, postscale folded -> (q2, q1, k1)
    r, i = pallas_local.fft_axis(r, i, sign, axis=-2, postscale=postscale,
                                 factors=f3, interpret=interpret)
    return r.reshape(*lead, n), i.reshape(*lead, n)


# Non-final-axis four-step: the level twiddle w_n^(k1*j2) is constant
# across each trail run of length T, so it rides the column kernel's
# "strided" mode — whose (n2, n1) table lives WHOLE in VMEM.  Cap its
# footprint (two f32 planes of n elements); larger axes fall back to XLA.
MAX_MID_TW_BYTES = 16 * 1024 * 1024


def supported_mid(re, axis: int, max_local: int | None = None) -> bool:
    """Whether the non-final-axis four-step covers this array/axis."""
    if re.dtype != jnp.float32:
        return False
    axis = axis % re.ndim
    if axis == re.ndim - 1:
        return False
    max_local = max_local or pallas_local.MAX_LOCAL_N
    n = re.shape[axis]
    if not (is_power_of_two(n) and max_local < n <= max_local * max_local):
        return False
    if n * 8 > MAX_MID_TW_BYTES:
        return False
    trail = math.prod(re.shape[axis + 1:])
    if trail % pallas_local.LANES:
        return False
    try:
        choose_split(n, max_local)
    except ValueError:
        return False
    return True


def fft_axis_mid(re, im, sign, *, axis, postscale: float = 1.0,
                 max_local: int | None = None,
                 interpret: bool | None = None, fast_math: bool = True):
    """Four-step DFT over a NON-final axis of planar f32 arrays.

    The reference ran global radix chains on Y/Z axes as strided kernels
    (SURVEY.md §2.5 "Y/Z done as strided global-style kernels", §3.1);
    this is the TPU-native equivalent for axis lengths beyond one VMEM
    tile: with the data viewed as (..., n1, n2, T) — T the trailing
    extent, a whole number of lane tiles — the transform decomposes into
    two column passes that never touch the trailing layout:

      1. col FFT over j1 with the level twiddle w_n^(k1*j2) in STRIDED
         mode (constant across each T-run: an (n2, n1) VMEM-resident
         table indexed by grid position) and a mid-swap store with
         period T -> (..., j2, k1, T);
      2. col FFT over j2 (trail n1*T), postscale folded
         -> (..., k2, k1, T) = the DFT order along the merged axis.

    Two HBM round trips, zero transposes — same pass structure as the
    last-axis path, with the digit swap landing in the *middle* of the
    layout via the swap_mid store.
    """
    axis = axis % re.ndim
    assert axis != re.ndim - 1, "use fft_axis_large for the last axis"
    orig_shape = re.shape
    n = orig_shape[axis]
    T = math.prod(orig_shape[axis + 1:])
    n1, n2 = choose_split(n, max_local)
    lead = orig_shape[:axis]
    f1 = f2 = None
    if not fast_math:
        f1 = pallas_local.precise_factors(n1)
        f2 = pallas_local.precise_factors(n2)
    r = re.reshape(*lead, n1, n2 * T)
    i = im.reshape(*lead, n1, n2 * T)
    r, i = pallas_local.fft_axis(r, i, sign, axis=-2, tw_n=n,
                                 tw_mode="strided", tw_period=T,
                                 swap_mid=T, factors=f1, interpret=interpret)
    # mid-swap output: (*lead, n2, n1, T) with digits (j2, k1)
    r = r.reshape(*lead, n2, n1 * T)
    i = i.reshape(*lead, n2, n1 * T)
    r, i = pallas_local.fft_axis(r, i, sign, axis=-2, postscale=postscale,
                                 factors=f2, interpret=interpret)
    return r.reshape(orig_shape), i.reshape(orig_shape)


def fft_axis_large(re, im, sign, *, axis, postscale: float = 1.0,
                   max_local: int | None = None,
                   interpret: bool | None = None, fast_math: bool = True,
                   split: tuple[int, int] | None = None):
    """Large-N DFT along the last axis of planar f32 arrays.

    ``split`` forces a specific (n1, n2) decomposition — the autotuner's
    hook for measuring split candidates against each other."""
    axis = axis % re.ndim
    assert axis == re.ndim - 1, "four-step global path covers the last axis"
    n = re.shape[-1]
    n1, n2 = split or choose_split(n, max_local)
    if n1 * n2 != n:
        raise ValueError(f"split {n1}x{n2} does not factor n={n}")
    lead = re.shape[:-1]
    f1 = f2 = None
    if not fast_math:
        f1 = pallas_local.precise_factors(n1)
        f2 = pallas_local.precise_factors(n2)
    r3 = re.reshape(*lead, n1, n2)
    i3 = im.reshape(*lead, n1, n2)
    # pass 1: column FFTs over j1 + fused twiddle w_n^(k1*j2), stored
    # digit-swapped -> (..., j2, k1)
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-2, tw_n=n,
                                   swap_store=True, factors=f1,
                                   interpret=interpret)
    # pass 2: column FFTs over j2 (now on sublanes, trail = k1), scale
    # folded into the store -> (..., k2, k1) = flattened DFT order
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-2, factors=f2,
                                   postscale=postscale, interpret=interpret)
    return r3.reshape(*lead, n), i3.reshape(*lead, n)
