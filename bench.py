"""Headline benchmark — prints ONE JSON line.

Metric (BASELINE.md): effective GFLOP/s = 5*N*log2(N)*batch / time on the
headline config (#2: 1D complex64, N=4096, batch=4096), measured with
device-resident planar data around the jitted Plan executable.

vs_baseline: ratio against the BASELINE.md north-star target = 70% of the
single-HBM-pass roofline for this config on v5e
(bytes = 2 * N * batch * 8 at 819 GB/s -> 3071 GFLOP/s effective; target
= 2150).  1.0 means the north-star is met.

The timing forces execution with a tiny device-side reduction fetch: on this
environment's TPU tunnel, block_until_ready() is a no-op and full
device_get drags hundreds of MB over the wire.  k-chained differencing
removes the fetch latency.
"""

from __future__ import annotations

import json
import math
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
BATCH = 4096
HBM_BW = 819e9  # v5e

# Watchdog: this environment's shared compile service can wedge (a
# pathological kernel once blocked the queue for an hour).  If the bench
# can't finish in time, emit an honest zero-value line instead of hanging
# the driver.
TIMEOUT_S = int(os.environ.get("PYFFT_TPU_BENCH_TIMEOUT", "900"))


def _watchdog(signum, frame):
    print(json.dumps({
        "metric": f"effective GFLOP/s, 1D c64 FFT N={N} batch={BATCH} (5N·log2N/t)",
        "value": 0.0,
        "unit": "GFLOP/s",
        "vs_baseline": 0.0,
        "extra": {"error": f"bench did not complete within {TIMEOUT_S}s "
                           "(TPU compile service unresponsive)"},
    }), flush=True)
    os._exit(2)


def _force(tree):
    return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0].ravel()[:1]))


def main():
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(TIMEOUT_S)
    from pyfft_tpu.plan import Plan

    plan = Plan((N,))
    fn = plan._get_callable((BATCH,), False, "planar")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, (BATCH, N), jnp.float32)
    im = jax.random.normal(k2, (BATCH, N), jnp.float32)

    out = fn(re, im)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = (re, im)
        for _ in range(k):
            o = fn(*o)
        _force(o)
        return time.perf_counter() - t0

    run(2)
    ka, kb = 4, 24
    # The tunnel to the TPU suffers 2-4x congestion spikes between identical
    # runs (the same binary has measured 0.32 and 0.92 ms an hour apart);
    # collect two estimator families spread over ~a minute and take the min
    # of the positive estimates: short chained differences (tight but
    # spike-prone) and long-chain amortizations (upper bounds, stable).
    diffs = []
    for trial in range(8):
        diffs.append((run(kb) - run(ka)) / (kb - ka))
        if trial % 3 == 2:
            diffs.append((run(100) - run(2)) / 98)
            time.sleep(2)
    diffs = [d for d in diffs if d > 0]
    if not diffs:
        # everything spiked: one more long chain (never emit a crash or a
        # negative rate — the driver expects exactly one JSON line)
        diffs = [(run(100) - run(2)) / 98]
    dt = max(min(diffs), 1e-9)

    eff_flops = 5.0 * N * math.log2(N) * BATCH
    gflops = eff_flops / dt / 1e9
    roof = eff_flops / (2.0 * N * BATCH * 8 / HBM_BW) / 1e9
    target = 0.70 * roof

    # parity spot check against numpy on a slice
    rng = np.random.RandomState(1)
    xs = (rng.standard_normal((16, N)) + 1j * rng.standard_normal((16, N))
          ).astype(np.complex64)
    rr, ii = fn(jnp.asarray(xs.real), jnp.asarray(xs.imag))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
    err = float(np.abs(got - ref).max() / np.abs(ref).max())

    print(json.dumps({
        "metric": f"effective GFLOP/s, 1D c64 FFT N={N} batch={BATCH} (5N·log2N/t)",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 4),
        "extra": {
            "ms_per_iter": round(dt * 1e3, 4),
            "max_rel_err_vs_numpy": err,
            "roofline_gflops": round(roof, 1),
            "target_gflops_70pct_roofline": round(target, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
