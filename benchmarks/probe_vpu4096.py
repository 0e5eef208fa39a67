"""Headline experiment: pure-VPU butterfly chain at n=4096.

probe_parts' decomposition showed the whole VPU chain (butterflies +
twiddle rounds + transposes) rides under the DMA shadow and the ONLY
unhidden cost is the HIGHEST-precision MXU tail (6 bf16 passes on K=128).
A factors=(8,8,8,8) chain has no MXU stage at all — if its extra two
butterfly stages + twiddle rounds still fit under DMA, the row kernel
runs at copy speed (~0.40-0.44 ms loaded-window, vs ships' 0.455 best).

Interleaved A/B with a copy-bandwidth label per round (immune to
co-tenant drift), plus a numpy parity gate for the 4-round twiddle error.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

N, BATCH = 4096, 4096
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
re = jax.random.normal(k1, (BATCH, N), jnp.float32)
im = jax.random.normal(k2, (BATCH, N), jnp.float32)

CHAINS = {"ship_8_8_64": (8, 8, 64), "vpu_8_8_8_8": (8, 8, 8, 8)}


def run(f):
    return time_scan_chain(
        lambda r, i: pallas_local.fft_axis(r, i, -1, axis=-1,
                                           factors=f, alias_io=True),
        (re, im), trials=2) * 1e3


# parity gate first (also the compile warm-up for the new chain)
rng = np.random.RandomState(3)
xs = (rng.standard_normal((256, N))
      + 1j * rng.standard_normal((256, N))).astype(np.complex64)
t0 = time.time()
rr, ii = pallas_local.fft_axis(jnp.asarray(xs.real), jnp.asarray(xs.imag),
                               -1, axis=-1, factors=(8, 8, 8, 8))
got = np.asarray(rr) + 1j * np.asarray(ii)
ref = np.fft.fft(xs.astype(np.complex128), axis=-1)
err = np.abs(got - ref).max() / np.abs(ref).max()
print(f"parity vpu_8888: err={err:.3e} (gate 2e-6) compile {time.time()-t0:.0f}s",
      flush=True)
assert err < 2e-6, err

for name, f in CHAINS.items():
    t0 = time.time()
    run(f)
    print(f"warm {name}: {time.time()-t0:.0f}s", flush=True)

rows = []
for rnd in range(6):
    gbs = copy_bandwidth_gbs()
    r = {"round": rnd, "copy_gbs": round(gbs, 1)}
    for name, f in CHAINS.items():
        r[name] = round(run(f), 4)
    rows.append(r)
    print(json.dumps(r), flush=True)

best = {n: min(r[n] for r in rows) for n in CHAINS}
print(json.dumps({"best_ms": best}))
