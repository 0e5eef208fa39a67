"""Four-step global FFT for transforms beyond one VMEM tile.

TPU-native analog of the reference's GlobalFFTKernel chain
(``pyfft/kernel.py`` GlobalFFTKernel.createChain, SURVEY.md §2.3/§3.3): a
length-N transform whose working set exceeds VMEM becomes a short chain of
passes through HBM.  Where the GPU chain was one kernel per radix-<=16 pass
(k full HBM round trips for k radices), the TPU chain is exactly three
passes, each a fused Pallas kernel or one XLA transpose:

  view (..., N) as (..., N1, N2), N1*N2 = N, both within the local kernel:
  1. column pass: N1-point FFTs over axis -2 with the inter-pass twiddle
     w_N^(k1*j2) fused into the kernel's store (zero extra traffic)
  2. row pass: N2-point FFTs over the last axis, postscale folded in
  3. digit swap: (..., k1, k2) -> (..., k2, k1) — one XLA transpose, the
     only pass that moves data without computing

N up to MAX_LOCAL_N^2 (= 16M points at 4096) is covered by one level.
"""

from __future__ import annotations



import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["fft_axis_large", "choose_split", "supported"]


def choose_split(n: int, max_local: int | None = None) -> tuple[int, int]:
    """(n1, n2) with n1*n2 = n, both <= max_local, as balanced as possible.

    Balanced factors keep both passes' tiles square-ish: the column pass
    wants n1 rows per tile, the row pass n2 lanes — VMEM pressure is the
    max of the two.
    """
    max_local = max_local or pallas_local.MAX_LOCAL_N
    p = n.bit_length() - 1
    p1 = (p + 1) // 2
    n1, n2 = 1 << p1, 1 << (p - p1)
    if n1 > max_local:
        raise ValueError(
            f"n={n} exceeds the single-level four-step range "
            f"(max {max_local}^2={max_local * max_local})")
    return n1, n2


def supported(re, axis: int, max_local: int | None = None) -> bool:
    if re.dtype != jnp.float32:
        return False
    if axis % re.ndim != re.ndim - 1:
        return False
    max_local = max_local or pallas_local.MAX_LOCAL_N
    n = re.shape[axis]
    return (is_power_of_two(n) and max_local < n <= max_local * max_local)


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
    # pass 1: column FFTs over j1 + fused twiddle w_n^(k1*j2)
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-2, tw_n=n,
                                   interpret=interpret)
    # pass 2: row FFTs over j2, scale folded into the store
    r3, i3 = pallas_local.fft_axis(r3, i3, sign, axis=-1,
                                   postscale=postscale, interpret=interpret)
    # pass 3: X[k2*n1 + k1] = D[k1, k2] — digit swap
    rr = jnp.swapaxes(r3, -1, -2).reshape(*lead, n)
    ii = jnp.swapaxes(i3, -1, -2).reshape(*lead, n)
    return rr, ii
