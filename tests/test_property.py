"""Property-based parity tests (hypothesis): random shapes, batches,
dtypes, directions against numpy.fft."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pyfft_tpu import Plan

from helpers import TOL, rel_err

pow2 = st.integers(1, 9).map(lambda p: 1 << p)


@settings(max_examples=25, deadline=None)
@given(n=pow2, batch=st.integers(1, 5), inverse=st.booleans(),
       seed=st.integers(0, 2**31 - 1))
def test_random_1d(n, batch, inverse, seed):
    rng = np.random.RandomState(seed)
    shape = (batch, n) if batch > 1 else (n,)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    plan = Plan((n,))
    out = plan.execute(x, inverse=inverse)
    ref = np.fft.ifft(x.astype(np.complex128), axis=-1) if inverse \
        else np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(out, ref) < TOL[np.complex64]


@settings(max_examples=10, deadline=None)
@given(p1=st.integers(2, 6), p2=st.integers(2, 6),
       seed=st.integers(0, 2**31 - 1))
def test_random_2d(p1, p2, seed):
    n1, n2 = 1 << p1, 1 << p2
    rng = np.random.RandomState(seed)
    x = (rng.standard_normal((n1, n2))
         + 1j * rng.standard_normal((n1, n2))).astype(np.complex64)
    plan = Plan((n1, n2))
    out = plan.execute(x)
    ref = np.fft.fft2(x.astype(np.complex128))
    assert rel_err(out, ref) < TOL[np.complex64]
