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



import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["fft_axis_large", "choose_split", "supported"]


def choose_split(n: int, max_local: int | None = None) -> tuple[int, int]:
    """(n1, n2) with n1*n2 = n, both <= max_local, minimizing modeled cost.

    The split minimizes summed ``stage_cost`` over both factors' default
    chains (ties break toward the balanced split, which has the lower VMEM
    peak).  Under the butterfly-prefix factorization the balanced splits
    usually win — e.g. 2^20 -> (1024, 1024), two (4,4,64) chains.  Both
    factors must give the column kernels at least one 128-lane trail tile,
    so no valid split exists for max_local < n < 128*128: callers must
    handle the ValueError (the planner falls back to XLA).
    """
    max_local = max_local or pallas_local.MAX_LOCAL_N
    lanes = pallas_local.LANES
    p = n.bit_length() - 1
    best = None
    for p1 in range(1, p):
        n1, n2 = 1 << p1, 1 << (p - p1)
        if n1 > max_local or n2 > max_local:
            continue
        if n1 < lanes or n2 < lanes:
            continue
        cost = (sum(map(pallas_local.stage_cost, pallas_local.default_factors(n1)))
                + sum(map(pallas_local.stage_cost, pallas_local.default_factors(n2))))
        key = (cost, abs(p1 - (p - p1)))   # tie-break toward balanced (VMEM)
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


def fft_axis_large(re, im, sign, *, axis, postscale: float = 1.0,
                   max_local: int | None = None,
                   interpret: bool | None = None):
    """Large-N DFT along the last axis of planar f32 arrays."""
    axis = axis % re.ndim
    assert axis == re.ndim - 1, "four-step global path covers the last axis"
    n = re.shape[-1]
    n1, n2 = choose_split(n, max_local)
    lead = re.shape[:-1]
    r3 = re.reshape(*lead, n1, n2)
    i3 = im.reshape(*lead, n1, n2)
    # pass 1: column FFTs over j1 + fused twiddle w_n^(k1*j2), stored
    # digit-swapped -> (..., j2, k1)
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-2, tw_n=n,
                                   swap_store=True, interpret=interpret)
    # pass 2: column FFTs over j2 (now on sublanes, trail = k1), scale
    # folded into the store -> (..., k2, k1) = flattened DFT order
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-2,
                                   postscale=postscale, interpret=interpret)
    return r3.reshape(*lead, n), i3.reshape(*lead, n)
