"""Profiling & timing utilities.

The reference had no built-in observability — timing lived only in its
performance test script (SURVEY.md §5 "tracing/profiling: none built in").
This module is the upgrade the survey prescribes: `jax.profiler` trace
capture plus robust wall-clock timing that works on backends where
``block_until_ready`` doesn't actually block (this environment's TPU
tunnel — execution is forced with a tiny device-side reduction instead).
"""

from __future__ import annotations

import contextlib
import math
import time

import jax
import jax.numpy as jnp

__all__ = ["trace", "force", "time_chained", "time_scan_chain",
           "effective_gflops", "copy_bandwidth_gbs"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(tree) -> float:
    """Force execution of everything ``tree`` depends on.

    Fetches a single element through a device-side reduction — forces the
    whole dependency chain even where ``block_until_ready`` is a no-op,
    without dragging the array to the host.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    s = jnp.sum(leaves[0].ravel()[:1])
    if jnp.issubdtype(s.dtype, jnp.complexfloating):
        s = jnp.real(s)
    return float(s)


def time_chained(fn, args, k_small: int = 2, k_large: int = 12) -> float:
    """Seconds per call of ``fn`` via k-chained differencing.

    Runs fn k times feeding each output back as input (forcing sequential
    execution), forces once at the end, and differences two chain lengths
    to cancel dispatch/fetch latency.  ``fn`` must map its args to a
    structurally identical output (true for planar FFTs).
    """
    o = fn(*args)
    force(o)

    def run(k):
        t0 = time.perf_counter()
        o = args
        for _ in range(k):
            o = fn(*o)
        force(o)
        return time.perf_counter() - t0

    run(1)
    return (run(k_large) - run(k_small)) / (k_large - k_small)


def time_scan_chain(fn, args, ka: int = 4, kb: int = 24,
                    trials: int = 6) -> float:
    """Best seconds-per-iteration via in-jit ``lax.scan`` chain differencing.

    The only estimator that survives a congested dispatch path (this
    environment's TPU tunnel swings host-visible latency 2-4x): ONE
    dispatched program runs k kernel iterations, so per-call overhead
    appears once per measurement and cancels in the (kb - ka) difference.
    ``fn`` must map its args to structurally identical outputs; use
    alias_io/donation inside ``fn`` where possible so the scan carry
    needs no per-iteration copies.
    """
    def make(k):
        @jax.jit
        def chain(*a):
            def body(c, _):
                o = fn(*c)
                return (o if isinstance(o, tuple) else (o,)), None
            out, _ = jax.lax.scan(body, tuple(a), None, length=k)
            return out
        return chain

    ca, cb = make(ka), make(kb)
    force(ca(*args))
    force(cb(*args))

    def t(c):
        t0 = time.perf_counter()
        force(c(*args))
        return time.perf_counter() - t0

    # congestion only ever ADDS host-visible time, so the best estimate of
    # each chain's true wall is the min over trials; differencing the mins
    # (rather than min-of-differences, which can pair a congested ta with a
    # clean tb and go negative/low) is the robust estimator.
    tas, tbs = [], []
    for _ in range(trials):
        tas.append(t(ca))
        tbs.append(t(cb))
    est = (min(tbs) - min(tas)) / (kb - ka)
    # non-positive differencing (sub-resolution work or a congestion spike
    # in every long chain): fall back to the amortized upper bound
    return est if est > 0 else min(tbs) / kb


def effective_gflops(shape, batch: int, seconds: float) -> float:
    """The reference's throughput metric: 5*N*log2(N)*batch / t (SURVEY §4)."""
    n = math.prod(shape) if not isinstance(shape, int) else shape
    return 5.0 * n * math.log2(n) * batch / seconds / 1e9


_HBM_SPEC_GBS = 819.0      # v5e


def copy_bandwidth_gbs(mib: int = 128, trials: int = 5) -> float:
    """Concurrently-achievable HBM streaming bandwidth (GB/s), right now.

    The co-tenant load label for benchmark captures: times an elementwise
    ``|x| + 1`` (read + write the full array; nonlinear, so k scan
    iterations cannot fold into one) over a ``mib``-MiB f32 array via the
    scan-chain estimator.  A quiet v5e measures ~78% of the 819 GB/s spec
    on this probe (round-2 DMA study); readings far below that mean the
    chip is time-shared by a co-tenant at capture time, so kernel rates
    in the same session underread by roughly the same factor.  Bursty
    load can break the min-then-diff estimator's stationarity and produce
    a physically impossible reading — those are clamped to the spec (the
    label then says "not provably loaded", never "quiet" on its own).
    """
    n = mib * (1 << 20) // 4
    x = jnp.zeros((n // 8192, 8192), jnp.float32)
    dt = time_scan_chain(lambda a: jnp.abs(a) + 1.0, (x,), trials=trials)
    return min(2.0 * n * 4 / dt / 1e9, _HBM_SPEC_GBS)
