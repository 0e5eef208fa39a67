"""Broad accuracy grid — the analog of the reference's ``test/test_errors.py``
(SURVEY.md §3.5): forward vs numpy.fft and inverse roundtrip, swept over
dimensionality x size x dtype x storage format x batch.
"""

import numpy as np
import pytest

from pyfft_tpu import Plan

from helpers import TOL, rand_complex, rel_err

SHAPES_1D = [(16,), (256,), (8192,)]
SHAPES_2D = [(16, 64), (128, 128)]
SHAPES_3D = [(8, 16, 32), (32, 32, 32)]


@pytest.mark.parametrize("shape", SHAPES_1D + SHAPES_2D + SHAPES_3D)
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
@pytest.mark.parametrize("batch", [1, 3])
def test_grid_interleaved(shape, dtype, batch):
    full = (batch,) + shape if batch > 1 else shape
    x = rand_complex(full, dtype, seed=hash((shape, batch)) % 2**31)
    plan = Plan(shape, dtype)
    fwd = plan.execute(x)
    axes = tuple(range(-len(shape), 0))
    ref = np.fft.fftn(x.astype(np.complex128), axes=axes)
    assert rel_err(fwd, ref) < TOL[dtype], "forward"
    rt = plan.execute(fwd, inverse=True)
    assert rel_err(rt, x) < TOL[dtype], "roundtrip"


@pytest.mark.parametrize("shape", [(512,), (64, 64)])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_grid_split(shape, dtype):
    x = rand_complex((2,) + shape, dtype, seed=5)
    real_dt = np.float32 if dtype == np.complex64 else np.float64
    plan = Plan(shape, dtype)
    rr, ii = plan.execute(np.real(x).astype(real_dt).copy(),
                          np.imag(x).astype(real_dt).copy())
    got = np.asarray(rr) + 1j * np.asarray(ii)
    axes = tuple(range(-len(shape), 0))
    ref = np.fft.fftn(x.astype(np.complex128), axes=axes)
    assert rel_err(got, ref) < TOL[dtype]
    br, bi = plan.execute(rr, ii, inverse=True)
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x) < TOL[dtype]


def test_impulse_and_constant():
    """Analytic cases: delta -> flat spectrum; constant -> delta spectrum."""
    n = 1024
    plan = Plan((n,))
    delta = np.zeros(n, np.complex64)
    delta[0] = 1.0
    out = np.asarray(plan.execute(delta))
    assert np.abs(out - 1.0).max() < 1e-5
    const = np.ones(n, np.complex64)
    out = np.asarray(plan.execute(const))
    expect = np.zeros(n, np.complex128)
    expect[0] = n
    assert np.abs(out - expect).max() / n < 1e-6


def test_parseval():
    """Energy conservation: ||X||^2 = N * ||x||^2."""
    n = 4096
    x = rand_complex((n,), seed=31)
    plan = Plan((n,))
    X = np.asarray(plan.execute(x))
    lhs = np.sum(np.abs(X.astype(np.complex128)) ** 2)
    rhs = n * np.sum(np.abs(x.astype(np.complex128)) ** 2)
    assert abs(lhs - rhs) / rhs < 1e-6


def test_linearity():
    n = 512
    a = rand_complex((n,), seed=32)
    b = rand_complex((n,), seed=33)
    plan = Plan((n,))
    lhs = np.asarray(plan.execute(2 * a + 3j * b))
    rhs = 2 * np.asarray(plan.execute(a)) + 3j * np.asarray(plan.execute(b))
    assert rel_err(lhs, rhs) < 1e-5


def test_shift_theorem():
    """x[(j+s) mod N] <-> X[k] * w^(-sk)."""
    n = 256
    s = 17
    x = rand_complex((n,), seed=34)
    plan = Plan((n,))
    Xs = np.asarray(plan.execute(np.roll(x, -s)))
    X = np.asarray(plan.execute(x)).astype(np.complex128)
    k = np.arange(n)
    expect = X * np.exp(2j * np.pi * s * k / n)
    assert rel_err(Xs, expect) < 1e-5
