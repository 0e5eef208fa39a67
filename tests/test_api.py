"""Functional-API dtype selection (the Plan facade's own grid lives in
test_plan.py / test_errors.py)."""

import numpy as np

from pyfft_tpu import fft
from pyfft_tpu.api import get_plan


def test_real_f64_input_gets_c128_plan():
    """fft() on a float64 array must not silently downcast to a complex64
    plan (VERDICT r3 weak item 9)."""
    x = np.random.RandomState(0).standard_normal(512)
    out = np.asarray(fft(x))
    assert out.dtype == np.complex128
    ref = np.fft.fft(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-11


def test_real_f32_input_gets_c64_plan():
    x = np.random.RandomState(1).standard_normal(512).astype(np.float32)
    out = np.asarray(fft(x))
    assert out.dtype == np.complex64
    ref = np.fft.fft(x.astype(np.float64))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-6


def test_complex_input_keeps_dtype():
    rng = np.random.RandomState(2)
    for dt in (np.complex64, np.complex128):
        x = (rng.standard_normal(256)
             + 1j * rng.standard_normal(256)).astype(dt)
        assert np.asarray(fft(x)).dtype == dt


def test_plan_cache_reuses_instances():
    p1 = get_plan((256,), np.complex64)
    p2 = get_plan(256, np.complex64)
    assert p1 is p2
