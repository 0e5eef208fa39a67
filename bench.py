"""Headline benchmark — prints ONE JSON line.

Metric (BASELINE.md): effective GFLOP/s = 5*N*log2(N)*batch / time on the
headline config (#2: 1D complex64, N=4096, batch=4096), measured with
device-resident planar data around the jitted Plan executable.

vs_baseline: ratio against the BASELINE.md north-star target = 70% of the
single-HBM-pass roofline for this config on v5e
(bytes = 2 * N * batch * 8 at 819 GB/s -> 3071 GFLOP/s effective; target
= 2150).  1.0 means the north-star is met.

STAGED DESIGN (round 5; round 4's single 900 s window published an honest
0.0 when the shared compile service wedged).  The process invoked by the
driver is a stdlib-only ORCHESTRATOR that cannot wedge — it never imports
jax.  It runs measurement tiers as subprocesses:

  tier "pallas"  the full-quality bench (Plan's fused Pallas kernel, in-jit
                 scan-chain estimator).  It appends every improved estimate
                 to a status file as it goes, so even a mid-loop kill
                 leaves a REAL partial measurement behind.
  tier "xla"     fallback when the pallas tier produced nothing inside its
                 budget (Mosaic compile queue wedged): Plan(force_xla=True)
                 compiles through plain XLA, no Pallas helper involved.
  tier "warm-watcher"  last resort for a FULLY wedged service (2026-08-20:
                 even cached executable loads stopped returning, so any
                 fresh process — pallas or xla tier — hangs at program
                 load).  benchmarks/watch_quiet.py is a long-lived WARM
                 process whose compiled-once headline probe keeps running
                 on the real chip regardless of service health, appending
                 scan-chain timings to load_trail.jsonl every ~7 min.  The
                 orchestrator publishes the freshest row written DURING
                 this bench invocation (falling back to a row ≤1 h old),
                 with the row's timestamp/age/copy-label embedded.  It is
                 a real measurement of the same kernel on the same chip
                 with the same estimator — only taken by a process that
                 initialized before the service wedged.

The published line is the best tier that completed; a non-primary source is
flagged with extra.degraded ("partial-pallas" = real kernel measurement cut
short; "xla-fallback" = the Pallas compile never finished; "warm-watcher-
proxy" = measurement relayed from the warm watcher process).  Only if every
tier fails AND no recent watcher row exists does the orchestrator publish
the honest zero.

Timing strategy inside a tier (this environment's TPU is behind a congested
tunnel where ``block_until_ready`` is a no-op and per-call dispatch latency
swings 2-4x between identical runs):

* PRIMARY estimator — in-jit scan chain: ONE dispatched program runs k
  kernel iterations via ``lax.scan`` (the plan is built with
  scale=1/sqrt(N) so chained magnitudes are stationary — no overflow).
  Differencing two chain lengths cancels the single round-trip constant,
  leaving pure device time; tunnel congestion cannot multiply into it.
* SECONDARY estimator — k-chained host dispatch differencing (the round-1
  method), kept as a cross-check family ONLY: it is reported alongside
  but can never undercut the scan estimate (round 3: a congested-short /
  clean-long pairing made it publish a value above the HBM roofline).

The reported value is the scan-family estimate (best across ~minutes of
trials), hard-clamped at the physical single-HBM-pass time, so the
published GFLOP/s can never exceed the roofline.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

# Pin the autotune record to the repo-committed measurement for this
# machine unless the caller overrides: a stale ~/.cache record from an
# earlier round otherwise silently reverts tuned chains (r3: a round-2
# row:4096 override hid the radix-8+fold headline chain from every
# watcher/bench capture for hours).
_HERE = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault(
    "PYFFT_TPU_TUNE_FILE", os.path.join(_HERE, "benchmarks", "tuned_v5e.json"))

N = 4096
BATCH = 4096
HBM_BW = 819e9  # v5e

TIMEOUT_S = int(os.environ.get("PYFFT_TPU_BENCH_TIMEOUT", "900"))

METRIC = f"effective GFLOP/s, 1D c64 FFT N={N} batch={BATCH} (5N·log2N/t)"
EFF_FLOPS = 5.0 * N * math.log2(N) * BATCH
DT_PHYS = 2.0 * N * BATCH * 8 / HBM_BW          # one HBM pass, 4 f32 planes
ROOF = EFF_FLOPS / DT_PHYS / 1e9
TARGET = 0.70 * ROOF


def _line_from_dt(dt: float, extra: dict) -> dict:
    gflops = EFF_FLOPS / dt / 1e9
    extra = dict(extra)
    extra.update({
        "ms_per_iter": round(dt * 1e3, 4),
        "roofline_gflops": round(ROOF, 1),
        "target_gflops_70pct_roofline": round(TARGET, 1),
    })
    return {
        "metric": METRIC,
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / TARGET, 4),
        "extra": extra,
    }


def _zero_line(msg: str) -> dict:
    return {"metric": METRIC, "value": 0.0, "unit": "GFLOP/s",
            "vs_baseline": 0.0, "extra": {"error": msg}}


# --------------------------------------------------------------------- tiers

def run_tier(tier: str, budget_s: float, status_path: str | None) -> None:
    """One measurement tier (runs in a subprocess; may wedge — the parent
    owns the kill).  Prints the finished JSON line on success and streams
    every improved estimate to ``status_path`` so a kill mid-loop still
    leaves a real measurement behind."""
    deadline = time.monotonic() + budget_s

    # In-process backstop: if the backend wedges inside a C call, SIGALRM
    # can't fire (handler deferred) and only the parent's SIGKILL ends us;
    # this daemon timer covers wedges that DO return to the bytecode loop.
    import threading
    _t = threading.Timer(budget_s + 30, lambda: os._exit(3))
    _t.daemon = True                     # never outlives a normal finish
    _t.start()

    import jax
    import jax.numpy as jnp
    import numpy as np

    def status(payload: dict) -> None:
        if status_path:
            tmp = status_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(payload, f)
            os.replace(tmp, status_path)

    def _force(tree):
        return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0].ravel()[:1]))

    from pyfft_tpu.plan import Plan

    # scale=1/sqrt(N): the forward FFT then preserves RMS magnitude
    # (Parseval), so arbitrarily long timing chains stay finite in f32.
    # donate=True: the kernel aliases its input/output HBM buffers, so the
    # scan-chain carries need no copies (XLA otherwise inserts a 2x64 MiB
    # copy per iteration around the custom call in the loop body).
    plan = Plan((N,), scale=1.0 / math.sqrt(N), donate=True,
                force_xla=(tier == "xla"))
    fn = plan._get_callable((BATCH,), False, "planar")

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, (BATCH, N), jnp.float32)
    im = jax.random.normal(k2, (BATCH, N), jnp.float32)

    # fn donates its inputs (in-place plan): every direct call gets fresh
    # buffers (re + 0); the master copies re/im stay valid for the scan
    # chains, whose outer jit does not donate.
    out = fn(re + 0, im + 0)
    _force(out)

    # ---- primary: in-jit scan chains (one dispatch per measurement) ----
    def make_chain(k):
        @jax.jit
        def chain(r, i):
            def body(c, _):
                return fn(*c), None
            (r, i), _ = jax.lax.scan(body, (r, i), None, length=k)
            return r, i
        return chain

    # the XLA path is ~10x the kernel's per-iter time: shorter chains keep
    # each trial around the same fraction of a second
    KA, KB = (16, 216) if tier == "pallas" else (2, 26)
    chain_a, chain_b = make_chain(KA), make_chain(KB)

    def t_of(c):
        t0 = time.perf_counter()
        _force(c(re, im))
        return time.perf_counter() - t0

    t_of(chain_a), t_of(chain_b)        # compile both

    # ---- secondary: host-dispatch chain differencing (round-1 method) ----
    def run(k):
        t0 = time.perf_counter()
        o = (re + 0, im + 0)      # constant per-run cost, cancels in the diff
        for _ in range(k):
            o = fn(*o)            # donates o, writes in place
        _force(o)
        return time.perf_counter() - t0

    run(2)

    # Spread trials across several minutes: the shared chip's co-tenant
    # load drifts in ~minute-scale waves (measured 2x device-time swings
    # between hours), so a longer window with early exit once the target
    # is cleared maximizes the odds of recording the kernel's true rate.
    #
    # Estimator discipline: per-family MIN-THEN-DIFFERENCE only.  Paired
    # differences ((tb_i - ta_i) per trial) can pair a congested short run
    # with a clean long one and report an arbitrarily LOW figure — one such
    # outlier once reported 10979 GF (0.09 ms) against a true 0.78 ms.
    # Chain walls can only be inflated by congestion, so min-per-chain is
    # sound and the min difference is a lower bound on the true rate only
    # up to overhead variation, never a 10x fantasy.
    target_dt = DT_PHYS / 0.70          # s/iter at the north-star target
    # Physical floor: one iteration moves 4 planes of N*BATCH f32 through
    # HBM; nothing real finishes faster than that at spec bandwidth.  An
    # estimate below the floor is a differencing artifact (round 3's 0.9x
    # slack let the host family publish 3280 GF > the 3071 GF roofline in
    # the same JSON line).  The floor is exactly the physical time, so the
    # published value can NEVER exceed the roofline by construction.
    tas, tbs, r4s, r24s = [], [], [], []

    def scan_family():
        if tas and tbs:
            return (min(tbs) - min(tas)) / (KB - KA)
        return None

    def host_family():
        if r4s and r24s:
            return (min(r24s) - min(r4s)) / 20
        return None

    def published_dt():
        # The in-jit scan chain is the AUTHORITATIVE estimator: one
        # dispatch per measurement, so tunnel congestion cannot divide
        # into it.  The host-dispatch family is a cross-check only — it
        # is never allowed to undercut the scan estimate (round 3: it
        # produced a physically impossible 0.307 ms on an 819 GB/s part).
        s = scan_family()
        if s is None:
            s = host_family()               # scan unavailable: fall back
        if s is None:
            return None
        return max(s, DT_PHYS)              # hard clamp at physics

    def load_label():
        # co-tenant load label (VERDICT r2 item 1): the concurrently-
        # achievable copy bandwidth, recorded with every capture so a slow
        # reading next to a halved copy probe reads as co-tenant load
        from pyfft_tpu.utils.profiling import copy_bandwidth_gbs
        try:
            return round(copy_bandwidth_gbs(trials=3), 1)
        except Exception:
            return None

    # Sampling density: the co-tenant's load comes in second-scale waves,
    # and one ~100 ms micro-quiet window anywhere in the budget is enough
    # for a clean (ta, tb) pair — so take MANY cheap trials (each ~0.2 s of
    # device time) with short gaps instead of a few widely-spaced ones
    # (r3's 64 trials x 6 s sleep never landed on a quiet window; the
    # watcher's quiet captures prove the kernel clears the bar when one
    # arrives).  The host cross-check family runs sparsely: it cannot
    # raise the published number, only corroborate it.
    best_seen = None
    for trial in range(400):
        tas.append(t_of(chain_a))
        tbs.append(t_of(chain_b))
        if tier == "pallas" and trial % 8 == 7:
            r4s.append(run(4))
            r24s.append(run(24))
        dt_now = published_dt()
        if dt_now is not None and dt_now != best_seen:
            best_seen = dt_now
            status(_line_from_dt(dt_now, {
                "backend": jax.default_backend(), "tier": tier,
                "trials": trial + 1}))
        if dt_now is not None and dt_now < 0.95 * target_dt:
            break
        if time.monotonic() > deadline - 60:    # leave room for parity+label
            break
        time.sleep(1.5)

    dt = published_dt()
    if dt is None:
        dt = max(t_of(chain_b) / KB, DT_PHYS)   # amortized upper bound
    scan_est = [scan_family()] if scan_family() is not None else []
    host_est = [host_family()] if host_family() is not None else []

    # parity spot check against numpy on a slice (undo the bench scale)
    rng = np.random.RandomState(1)
    xs = (rng.standard_normal((16, N)) + 1j * rng.standard_normal((16, N))
          ).astype(np.complex64)
    fn16 = plan._get_callable((16,), False, "planar")
    rr, ii = fn16(jnp.asarray(xs.real), jnp.asarray(xs.imag))
    got = (np.asarray(rr) + 1j * np.asarray(ii)) * math.sqrt(N)
    ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
    err = float(np.abs(got - ref).max() / np.abs(ref).max())

    line = _line_from_dt(dt, {
        "max_rel_err_vs_numpy": err,
        "backend": jax.default_backend(),
        "tier": tier,
        "ms_scan_estimates": [round(d * 1e3, 4) for d in scan_est],
        "ms_host_estimates": [round(d * 1e3, 4) for d in host_est],
        "concurrent_copy_gbs": load_label(),
        "kernel_io_gbs": round(4.0 * N * BATCH * 4 / dt / 1e9, 1),
    })
    status(line)
    print(json.dumps(line), flush=True)


# ---------------------------------------------------------------- orchestrator

def _spawn_tier(tier: str, budget_s: float, status_path: str):
    import subprocess
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--tier", tier, "--budget", str(budget_s), "--status", status_path],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, cwd=_HERE)


def _reap(proc, budget_s: float):
    """Wait for a tier subprocess; returns its final stdout JSON dict or
    None.  Kills by PID (never by pattern) on timeout."""
    try:
        out, _ = proc.communicate(timeout=budget_s)
    except Exception:
        proc.kill()
        try:
            proc.communicate(timeout=30)
        except Exception:
            pass
        return None
    if proc.returncode != 0:
        return None
    for ln in reversed((out or "").strip().splitlines()):
        try:
            d = json.loads(ln)
            if isinstance(d, dict) and "value" in d:
                return d
        except json.JSONDecodeError:
            continue
    return None


def _watcher_line(start_epoch: float, deadline_epoch: float):
    """Tier 3: relay the freshest headline measurement from the warm
    watcher process (benchmarks/watch_quiet.py -> load_trail.jsonl).

    Prefers a row written AFTER this bench started (tiers 1-2 burn 700+ s,
    more than one watcher cycle, so a live watcher has produced one by the
    time we look); polls briefly otherwise; accepts a row up to 1 h old as
    a stale last resort.  Returns None when no usable row exists — the
    orchestrator then publishes the honest zero."""
    import datetime

    trail = os.path.join(_HERE, "benchmarks", "load_trail.jsonl")

    def newest_row():
        try:
            with open(trail, "rb") as f:
                f.seek(0, os.SEEK_END)
                f.seek(max(0, f.tell() - 65536))
                lines = f.read().decode("utf-8", "replace").splitlines()
        except OSError:
            return None
        for ln in reversed(lines):
            try:
                row = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if isinstance(row, dict) and "headline_ms" in row:
                try:
                    ts = datetime.datetime.fromisoformat(
                        row["ts"]).timestamp()
                except (KeyError, ValueError):
                    continue
                return ts, row
        return None

    best = newest_row()
    while (best is None or best[0] < start_epoch - 60) and \
            time.time() < deadline_epoch - 20:
        time.sleep(15)
        best = newest_row()
    if best is None:
        return None
    ts, row = best
    age = time.time() - ts
    if age > 3600:
        return None                      # watcher dead too long: no claim
    dt = max(float(row["headline_ms"]) / 1e3, DT_PHYS)
    line = _line_from_dt(dt, {
        "tier": "warm-watcher",
        "degraded": "warm-watcher-proxy",
        "row_ts": row.get("ts"),
        "row_age_s": round(age, 1),
        "fresh_during_bench": bool(ts >= start_epoch - 60),
        "concurrent_copy_gbs": row.get("copy_gbs"),
        "kernel_io_gbs": row.get("kernel_io_gbs"),
    })
    return line


def _read_status(path: str):
    try:
        with open(path) as f:
            d = json.load(f)
        return d if isinstance(d, dict) and d.get("value", 0) > 0 else None
    except Exception:
        return None


def _acquire_capture_lock(max_wait_s: float):
    """Best-effort cross-process capture exclusion (same flock the
    watcher/patrol use).  A bench invoked directly (the driver's
    end-of-round run) would otherwise contend on the chip with an
    in-flight watcher/patrol capture and read their noise as co-tenant
    load.  Holders that spawn bench.py themselves set PYFFT_LOCK_HELD=1
    to skip this.  Never blocks past ``max_wait_s`` — a real measurement
    under contention still beats no measurement."""
    if os.environ.get("PYFFT_LOCK_HELD") == "1":
        return None
    import fcntl
    path = os.environ.get("PYFFT_CAPTURE_LOCK", "/tmp/pyfft_capture.lock")
    try:
        f = open(path, "w")
    except OSError:
        return None
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return f                      # held until process exit
        except OSError:
            if time.monotonic() >= deadline:
                print("bench: capture lock busy after "
                      f"{max_wait_s:.0f}s, proceeding", file=sys.stderr)
                return f                  # keep fd; proceed unlocked
            time.sleep(5.0)


def main() -> None:
    t0 = time.monotonic()
    start_epoch = time.time()
    _lock = _acquire_capture_lock(max_wait_s=min(240.0, TIMEOUT_S / 4))
    left = lambda: TIMEOUT_S - (time.monotonic() - t0)

    import tempfile
    tmpdir = tempfile.mkdtemp(prefix="pyfft_bench_")

    # Tier 1: full-quality Pallas bench.  Its budget leaves enough behind
    # for the XLA fallback tier plus orchestrator slack.
    st1 = os.path.join(tmpdir, "pallas.json")
    # floors keep a normal 900 s window useful; the min() clamp keeps a
    # SMALL configured timeout honest (the floors alone let a 120 s
    # PYFFT_TPU_BENCH_TIMEOUT overrun ~2-3x before the zero line)
    budget1 = min(max(120.0, left() - 300.0), max(30.0, left() - 30.0))
    line = _reap(_spawn_tier("pallas", budget1, st1), budget1 + 45.0)
    if line is not None:
        print(json.dumps(line), flush=True)
        return
    partial = _read_status(st1)
    if partial is not None:
        # the tier was killed mid-loop but HAD a real scan-chain estimate:
        # publish it (it is a genuine kernel measurement, just cut short)
        partial.setdefault("extra", {})["degraded"] = "partial-pallas"
        print(json.dumps(partial), flush=True)
        return

    # Tier 2: the Pallas path never produced a number (compile service
    # wedged / Mosaic queue dead) — measure the pure-XLA path instead.
    st2 = os.path.join(tmpdir, "xla.json")
    budget2 = min(max(90.0, left() - 90.0), max(20.0, left() - 20.0))
    line = _reap(_spawn_tier("xla", budget2, st2), budget2 + 30.0)
    if line is None:
        line = _read_status(st2)
    if line is not None:
        line.setdefault("extra", {})["degraded"] = "xla-fallback"
        print(json.dumps(line), flush=True)
        return

    # Tier 3: both fresh processes wedged at program load — relay the warm
    # watcher's measurement (see module docstring).
    line = _watcher_line(start_epoch, start_epoch + TIMEOUT_S)
    if line is not None:
        print(json.dumps(line), flush=True)
        return

    print(json.dumps(_zero_line(
        f"no tier completed within {TIMEOUT_S}s "
        "(TPU backend/compile service unresponsive)")), flush=True)
    sys.exit(2)


if __name__ == "__main__":
    if "--tier" in sys.argv:
        args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
        run_tier(args["--tier"], float(args.get("--budget", "600")),
                 args.get("--status"))
    else:
        main()
