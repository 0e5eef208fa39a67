"""Shared test utilities: error metric and data generation.

The parity oracle and tolerance definitions mirror the reference's
``test/test_errors.py`` (SURVEY.md §3.5/§4): forward compared against
``numpy.fft``, inverse compared against the roundtrip input, with
per-dtype gates ~1e-6 (complex64) and ~1e-12 (complex128).
"""

import numpy as np

TOL = {np.complex64: 2e-6, np.complex128: 1e-11}


def rel_err(got, ref) -> float:
    """Max abs error normalized by the ref's max magnitude.

    Plain elementwise relative error blows up on near-zero spectral bins, so
    (like the reference suite) we normalize by the peak magnitude.
    """
    got = np.asarray(got)
    ref = np.asarray(ref)
    denom = np.abs(ref).max()
    if denom == 0:
        return float(np.abs(got).max())
    return float(np.abs(got - ref).max() / denom)


def rand_complex(shape, dtype=np.complex64, seed=0):
    rng = np.random.RandomState(seed)
    real_dt = np.float32 if np.dtype(dtype) == np.complex64 else np.float64
    return (
        rng.standard_normal(shape).astype(real_dt)
        + 1j * rng.standard_normal(shape).astype(real_dt)
    ).astype(dtype)
