"""Doc-example tests — the canonical usage snippets actually run
(parity with the reference's doc doctests, SURVEY.md §2.8/§4)."""

import numpy as np


def test_canonical_example():
    from pyfft_tpu import Plan

    x = (np.random.rand(16, 16) + 1j * np.random.rand(16, 16)).astype(np.complex64)
    plan = Plan((16, 16))
    fwd = plan.execute(x)
    back = plan.execute(fwd, inverse=True)
    assert np.abs(np.asarray(back) - x).max() < 1e-5


def test_functional_example():
    from pyfft_tpu import fft, ifft

    x = (np.random.rand(4, 256) + 1j * np.random.rand(4, 256)).astype(np.complex64)
    assert np.abs(np.asarray(ifft(fft(x))) - x).max() < 1e-5


def test_readme_split_example():
    from pyfft_tpu import Plan

    re = np.random.rand(1024).astype(np.float32)
    im = np.random.rand(1024).astype(np.float32)
    plan = Plan((1024,))
    fr, fi = plan.execute(re, im)
    br, bi = plan.execute(fr, fi, inverse=True)
    assert np.abs(np.asarray(br) - re).max() < 1e-5
    assert np.abs(np.asarray(bi) - im).max() < 1e-5


def test_fftshift_helpers():
    import numpy as np

    from pyfft_tpu import fftfreq, fftshift, ifftshift

    x = np.arange(8.0)
    assert np.array_equal(fftshift(x), np.fft.fftshift(x))
    assert np.array_equal(ifftshift(fftshift(x)), x)
    assert np.allclose(fftfreq(8, 0.5), np.fft.fftfreq(8, 0.5))
