"""Fused VMEM-resident Pallas FFT kernel ("local" executor).

TPU-native analog of the reference's LocalFFTKernel (``pyfft/kernel.py``,
SURVEY.md §2.3): one kernel performs the whole length-N transform for a tile
of the batch, with all radix stages fused so the data makes exactly one
HBM→VMEM→HBM round trip.

Where the GPU kernel used shared-memory transposes between register
butterflies, this kernel keeps the transform axis in lanes and expresses the
radix stages as DFT-matrix contractions on the MXU with twiddle multiplies on
the VPU — shuffles never leave the systolic array.
"""

from __future__ import annotations

import jax

__all__ = ["supported", "fft_axis"]


def supported(re: jax.Array, axis: int) -> bool:
    """Whether the Pallas local kernel covers this array/axis combination."""
    return False  # kernel lands in the next milestone; XLA path covers all


def fft_axis(re, im, sign, *, axis):
    raise NotImplementedError
