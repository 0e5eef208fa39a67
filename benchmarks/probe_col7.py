"""Probe 7: asymmetric four-step splits (n=1024/4096 column passes) and
z-pass lane width.  Hypothesis from probe 6: per-block wall is ~12us flat,
so bigger-n column blocks (DMA-bound like row n=4096 at 89%) win, and the
2^22 split should be (1024, 4096) rather than balanced (2048, 2048)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args)
    print(f"{name:46s} {dt*1e3:8.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
          flush=True)
    return dt


def col(factors=None, lanes=128, tw_n=0, swap=False, alias=True):
    return lambda r, i: pallas_local.fft_axis(
        r, i, -1, axis=-2, factors=factors, lanes=lanes, tw_n=tw_n,
        swap_store=swap, alias_io=alias and not swap)


def main():
    assert jax.default_backend() in ("tpu", "axon")

    # full four-step pairs (shape-preserving, scan-safe): pass1 tw+swap on
    # (n1, n2) then pass2 plain on the swapped (n2, n1) layout
    def fourstep_pair(n1, n2, f1=None, f2=None):
        n = n1 * n2

        def fn(r, i):
            r = r.reshape(8, n1, n2)
            i = i.reshape(8, n1, n2)
            r, i = pallas_local.fft_axis(r, i, -1, axis=-2, tw_n=n,
                                         swap_store=True, factors=f1)
            r, i = pallas_local.fft_axis(r, i, -1, axis=-2, factors=f2)
            return r.reshape(8, n), i.reshape(8, n)
        return fn

    n = 1 << 22
    rf, if_ = devdata((8, n), seed=1)
    nbf = rf.size * 4 * 4 * 2           # two passes
    report("4step 2^22 (2048,2048) [prod]",
           fourstep_pair(2048, 2048), (rf, if_), nbf)
    report("4step 2^22 (2048,2048) (4,4,4,32)x2",
           fourstep_pair(2048, 2048, (4, 4, 4, 32), (4, 4, 4, 32)),
           (rf, if_), nbf)
    report("4step 2^22 (1024,4096)",
           fourstep_pair(1024, 4096), (rf, if_), nbf)
    report("4step 2^22 (4096,1024)",
           fourstep_pair(4096, 1024), (rf, if_), nbf)

    rb, ib = devdata((8, 4096, 1024), seed=2)
    nb = rb.size * 4 * 4
    report("col n=4096 T=1024 plain", col(), (rb, ib), nb)

    # 3D z-pass lane width
    r3, i3 = devdata((1, 256, 65536), seed=3)
    nb3 = r3.size * 4 * 4
    report("3D z col n=256 lanes=256", col(lanes=256), (r3, i3), nb3)


if __name__ == "__main__":
    main()
