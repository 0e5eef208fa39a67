"""Service-recovery monitor (r5 wedge, 2026-08-20).

While the shared compile service is wedged (see verify_captures_r5.md),
the ONLY safe traffic is an occasional cached-load probe
(benchmarks/service_probe.py, cached phase).  This monitor:

* polls the cached probe every POLL_S seconds (default 1500 — sparse, so
  failed probes don't pile more grinding jobs onto the wedged service),
* appends every result to benchmarks/recovery_log.jsonl, and
* on the FIRST green probe, starts a replacement warm watcher
  (watch_quiet.py, 16 h deadline, pid -> /tmp/watch_r5b.pid) so the
  load-trail / quiet-capture pipeline outlives the original watcher's
  deadline, then exits, and
* if recovery hasn't happened by FALLBACK_START_EPOCH (just before the
  original watcher's 10 h deadline), starts the replacement anyway: its
  program-load request queues behind the wedged jobs and completes
  automatically whenever the service recovers, so warm coverage resumes
  without anyone noticing the moment of recovery.

The monitor itself never imports jax (cannot wedge) and kills only by
PID, never by pattern.
"""
import datetime
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "benchmarks", "recovery_log.jsonl")
POLL_S = float(os.environ.get("RECOVERY_POLL_S", "1500"))
DEADLINE_S = float(os.environ.get("RECOVERY_DEADLINE_S", 12 * 3600))
WATCH_PID = "/tmp/watch_r5b.pid"


def log(row):
    row = {"ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"), **row}
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[recovery] {row}", flush=True)


def probe_ok() -> dict:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "benchmarks",
                                          "service_probe.py")],
            capture_output=True, text=True, timeout=400,
            env={**os.environ, "PROBE_CACHED_BOUND": "300"})
        out = (proc.stdout or "").strip().splitlines()
        return json.loads(out[-1]) if out else {"cached": {"ok": False}}
    except Exception as e:
        return {"cached": {"ok": False, "err": repr(e)[:80]}}


def start_watcher():
    env = {**os.environ, "WATCH_DEADLINE_S": str(16 * 3600)}
    with open(os.path.join(ROOT, "benchmarks", "watch_r5b.log"), "ab") as f:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "benchmarks",
                                          "watch_quiet.py")],
            stdout=f, stderr=subprocess.STDOUT, cwd=ROOT, env=env,
            start_new_session=True)
    with open(WATCH_PID, "w") as f:
        f.write(str(proc.pid))
    log({"event": "replacement watcher started", "pid": proc.pid})


def main():
    t0 = time.monotonic()
    fallback_epoch = float(os.environ.get("FALLBACK_START_EPOCH", "0"))
    started = False
    while time.monotonic() - t0 < DEADLINE_S:
        res = probe_ok()
        log({"probe": res})
        if res.get("cached", {}).get("ok"):
            log({"event": "service recovered"})
            if not started:
                start_watcher()
            return 0
        if not started and fallback_epoch and time.time() >= fallback_epoch:
            log({"event": "fallback: starting replacement watcher queued "
                          "behind wedged service"})
            start_watcher()
            started = True
        time.sleep(POLL_S)
    log({"event": "monitor deadline reached, no recovery"})
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
