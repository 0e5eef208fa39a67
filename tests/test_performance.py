"""Performance smoke harness — the analog of the reference's
``test/test_performance.py`` (SURVEY.md §4): times repeated executes and
reports GFLOP/s = 5*N*log2(N)*batch / t.  On the CPU test harness this only
asserts the machinery works; real numbers come from benchmarks/ on TPU.
"""

import numpy as np

from pyfft_tpu.plan import Plan
from pyfft_tpu.utils.profiling import effective_gflops, time_chained


def test_performance_harness():
    plan = Plan((1024,))
    fn = plan._get_callable((32,), False, "planar")
    rng = np.random.RandomState(0)
    re = rng.standard_normal((32, 1024)).astype(np.float32)
    im = rng.standard_normal((32, 1024)).astype(np.float32)
    import jax.numpy as jnp
    args = (jnp.asarray(re), jnp.asarray(im))
    dt = time_chained(fn, args, k_small=1, k_large=4)
    gf = effective_gflops((1024,), 32, max(dt, 1e-9))
    assert gf > 0
