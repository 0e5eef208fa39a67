"""Real-to-complex transforms (beyond-parity feature): parity vs
numpy.fft.rfft/irfft, roundtrips, error cases."""

import numpy as np
import pytest

from pyfft_tpu import irfft, rfft

from helpers import TOL


def rel(got, ref):
    return float(np.abs(got - ref).max() / np.abs(ref).max())


@pytest.mark.parametrize("shape", [(4,), (256,), (8, 1024), (3, 2, 512)])
def test_rfft_parity(shape):
    rng = np.random.RandomState(sum(shape))
    x = rng.standard_normal(shape)
    got = rfft(x)
    ref = np.fft.rfft(x, axis=-1)
    assert got.shape == shape[:-1] + (shape[-1] // 2 + 1,)
    assert rel(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("n", [8, 512])
def test_irfft_roundtrip(n):
    rng = np.random.RandomState(n)
    x = rng.standard_normal((5, n))
    back = irfft(rfft(x))
    assert back.shape == x.shape
    assert rel(back, x) < TOL[np.complex64]


def test_irfft_matches_numpy():
    rng = np.random.RandomState(7)
    X = np.fft.rfft(rng.standard_normal((2, 256)), axis=-1)
    got = irfft(X.astype(np.complex64))
    ref = np.fft.irfft(X, axis=-1)
    assert rel(got, ref) < TOL[np.complex64]


def test_rfft_errors():
    with pytest.raises(ValueError):
        rfft(np.zeros(24))
    with pytest.raises(ValueError):
        rfft(np.zeros(2))
    with pytest.raises(ValueError):
        irfft(np.zeros(100, np.complex64))
