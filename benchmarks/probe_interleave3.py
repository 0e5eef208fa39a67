"""Diagnose the selection-conversion kernel's 0.23x-of-copy reading.

Variants on the (8, 2^23) packed shape:
  A. roundtrip as shipped (outer reshape + HIGHEST matmuls)
  B. pre-flattened input (does the (rows,2n)->(R,256) XLA reshape copy?)
  C. DEFAULT-precision matmuls, timing only (is HIGHEST's 6-pass the wall?)
  D. bigger subtile (4096 rows/step): DMA amortization
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pyfft_tpu.ops import interleave as il
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

rows, n = 8, 1 << 22
big = jax.random.normal(jax.random.PRNGKey(1), (rows, 2 * n), jnp.float32)
flat = jnp.reshape(big, (-1, 256))
bytes_rt = big.size * 4 * 2
se, so = il._sel_np()
sej, soj = jnp.asarray(se), jnp.asarray(so)


def report(tag, dt, per_rts):
    gbs = per_rts * bytes_rt / dt / 1e9
    print(f"{tag}: {dt*1e3:.3f} ms ({gbs:.0f} GB/s eff)", flush=True)


# A. as shipped (deint+int roundtrip = 2 HBM round trips)
dt = time_scan_chain(lambda x: il.interleave(*il.deinterleave(x)),
                     (big,), trials=3)
report("A shipped roundtrip", dt, 2)

# B. flat in/flat out deint only (1 round trip)
dt = time_scan_chain(
    lambda f: jnp.concatenate(il._deinterleave_flat(f, sej, soj,
                                                    interpret=False), 1),
    (flat,), trials=3)
report("B flat deint(+concat)", dt, 1)


# C. DEFAULT-precision variant (timing only)
def _deint_kernel_def(v_ref, se_ref, so_ref, re_ref, im_ref):
    v = v_ref[:]
    dn = jax.lax.dot_general
    prec = jax.lax.Precision.DEFAULT
    re_ref[:] = dn(v, se_ref[:], (((1,), (0,)), ((), ())), precision=prec)
    im_ref[:] = dn(v, so_ref[:], (((1,), (0,)), ((), ())), precision=prec)


@functools.partial(jax.jit, static_argnames=("s",))
def deint_def(v, se_, so_, s):
    r = v.shape[0]
    out = jax.ShapeDtypeStruct((r, 128), v.dtype)
    return pl.pallas_call(
        _deint_kernel_def,
        grid=(r // s,),
        in_specs=[pl.BlockSpec((s, 256), lambda i: (i, 0)),
                  pl.BlockSpec((256, 128), lambda i: (0, 0)),
                  pl.BlockSpec((256, 128), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((s, 128), lambda i: (i, 0))] * 2,
        out_shape=[out, out])(v, se_, so_)


dt = time_scan_chain(
    lambda f: jnp.concatenate(deint_def(f, sej, soj, 1024), 1),
    (flat,), trials=3)
report("C flat deint DEFAULT", dt, 1)

# D. HIGHEST, subtile 4096
from pyfft_tpu.ops.interleave import _deint_kernel


@functools.partial(jax.jit, static_argnames=("s",))
def deint_hi(v, se_, so_, s):
    r = v.shape[0]
    out = jax.ShapeDtypeStruct((r, 128), v.dtype)
    return pl.pallas_call(
        _deint_kernel,
        grid=(r // s,),
        in_specs=[pl.BlockSpec((s, 256), lambda i: (i, 0)),
                  pl.BlockSpec((256, 128), lambda i: (0, 0)),
                  pl.BlockSpec((256, 128), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((s, 128), lambda i: (i, 0))] * 2,
        out_shape=[out, out])(v, se_, so_)


dt = time_scan_chain(
    lambda f: jnp.concatenate(deint_hi(f, sej, soj, 4096), 1),
    (flat,), trials=3)
report("D flat deint HIGHEST s=4096", dt, 1)

print("copy:", round(copy_bandwidth_gbs(), 1), "GB/s", flush=True)
