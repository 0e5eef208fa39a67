"""Wait for a quiet co-tenant window, then record acceptance + bench.

The shared chip's load halves kernel throughput in bad hours; this watcher
probes the headline kernel every ~15 min and runs the full acceptance
suite (best-across-runs tracking) plus bench.py once the chip is quiet.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUIET_MS = 0.52
DEADLINE_S = float(os.environ.get("WATCH_DEADLINE_S", 6 * 3600))


def probe_ms():
    import jax
    import jax.numpy as jnp

    from pyfft_tpu.ops import pallas_local
    from pyfft_tpu.utils.profiling import time_scan_chain

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    re = jax.random.normal(k1, (4096, 4096), jnp.float32)
    im = jax.random.normal(k2, (4096, 4096), jnp.float32)
    dt = time_scan_chain(
        lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1, alias_io=True),
        (re, im), trials=2)
    return dt * 1e3


def main():
    t0 = time.monotonic()
    while time.monotonic() - t0 < DEADLINE_S:
        ms = probe_ms()
        print(f"[watch] headline kernel {ms:.3f} ms", flush=True)
        if ms < QUIET_MS:
            print("[watch] quiet window! recording acceptance + bench",
                  flush=True)
            root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            subprocess.run([sys.executable,
                            os.path.join(root, "benchmarks", "acceptance.py")],
                           timeout=1800)
            subprocess.run([sys.executable, os.path.join(root, "bench.py")],
                           timeout=1000)
            return
        time.sleep(900)
    print("[watch] deadline reached without a quiet window", flush=True)


if __name__ == "__main__":
    main()
