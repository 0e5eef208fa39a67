"""Parity of the planar jnp FFT (pyfft_tpu.reference) vs numpy.fft."""

import numpy as np
import pytest

from pyfft_tpu.reference import fft_planar, fftn_planar

from helpers import TOL, rand_complex, rel_err


def run_fft(x, sign, axis=-1, base=128):
    re, im = fft_planar(np.real(x), np.imag(x), sign, axis=axis, base=base)
    return np.asarray(re) + 1j * np.asarray(im)


@pytest.mark.parametrize("n", [1, 2, 4, 8, 16, 64, 128, 256, 1024, 4096, 2**15])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_1d_forward(n, dtype):
    x = rand_complex((n,), dtype)
    got = run_fft(x, -1)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < TOL[dtype], (n, dtype)


@pytest.mark.parametrize("n", [8, 1024])
@pytest.mark.parametrize("base", [2, 4, 8, 16, 32, 128])
def test_base_cases(n, base):
    """Every recursion depth / base-case size agrees with numpy."""
    x = rand_complex((n,), np.complex64, seed=3)
    got = run_fft(x, -1, base=base)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(got, ref) < TOL[np.complex64], (n, base)


@pytest.mark.parametrize("n", [16, 512])
def test_1d_inverse_kernel(n):
    """sign=+1 path equals numpy's ifft * N (unnormalized inverse)."""
    x = rand_complex((n,), np.complex64, seed=1)
    got = run_fft(x, +1)
    ref = np.fft.ifft(x.astype(np.complex128)) * n
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("batch", [1, 3, 16])
def test_batched(batch):
    x = rand_complex((batch, 256), np.complex64, seed=2)
    got = run_fft(x, -1)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_axis(axis):
    x = rand_complex((8, 16, 32), np.complex64, seed=4)
    got = run_fft(x, -1, axis=axis)
    ref = np.fft.fft(x.astype(np.complex128), axis=axis)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("shape,axes", [
    ((32, 64), (0, 1)),
    ((4, 32, 64), (1, 2)),          # batched 2D
    ((16, 16, 16), (0, 1, 2)),      # 3D
])
def test_fftn(shape, axes):
    x = rand_complex(shape, np.complex64, seed=5)
    re, im = fftn_planar(np.real(x), np.imag(x), -1, axes=axes)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fftn(x.astype(np.complex128), axes=axes)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_f64_accuracy():
    x = rand_complex((4096,), np.complex128, seed=6)
    got = run_fft(x, -1)
    ref = np.fft.fft(x)
    assert rel_err(got, ref) < TOL[np.complex128]


def test_roundtrip():
    x = rand_complex((2048,), np.complex64, seed=7)
    fwd = run_fft(x, -1)
    rt = run_fft(fwd, +1) / 2048
    assert rel_err(rt, x) < TOL[np.complex64]
