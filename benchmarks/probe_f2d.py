"""Probe (r4, VERDICT item 3): decompose the fused2d per-step cost.

probe_3dz measured the production fused2d 256^2 pass at 39.8% io-eff
(0.825 ms) while the same-block-size zcol pass hits 78.9% — and block_l
2/4/8 all LOSE, killing the per-step-DMA-amortization theory.  The MXU
work ((4,64) chains, ~0.14 ms total) cannot be the bound either.  This
probe attributes the per-step cost with structurally-degenerate variants
(cost-only, numerics intentionally wrong except `full`):

  copy     load (1,256,256) blocks -> store               = DMA floor
  t1       load -> ONE in-VMEM (256,256) transpose -> store
  fft1     load -> y-axis tile_fft -> store               = DMA + 1 FFT
  fft2nt   load -> y-FFT -> y-FFT -> store (no transposes)
  full     production shape: y-FFT -> T -> x-FFT -> T -> store
  fullbf16 full with precision='default' (1 bf16 pass)    = MXU share

Algebra: transpose ~= t1-copy; one-FFT ~= fft1-copy; 2 transposes ~=
full-fft2nt; HIGHEST 6-pass tax ~= full-fullbf16.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYFFT_TPU_TUNE_FILE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "tuned_v5e.json"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.ops.pallas_local import needed_tables, tile_fft
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

HBM_BW = 819e9
Z = Y = X = 256


def devdata(shape, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return (jax.random.normal(k1, shape, jnp.float32),
            jax.random.normal(k2, shape, jnp.float32))


def _kern(variant, n, layout, factors, sign, precision, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = re_ref[0], im_ref[0]
    if variant == "copy":
        pass
    elif variant == "t1":
        xr, xi = xr.T, xi.T
    elif variant == "fft1":
        xr, xi = tile_fft(xr, xi, tables, n, factors, precision, True, sign)
    elif variant == "fft2nt":
        xr, xi = tile_fft(xr, xi, tables, n, factors, precision, True, sign)
        xr, xi = tile_fft(xr, xi, tables, n, factors, precision, True, sign)
    else:   # full / fullbf16
        xr, xi = tile_fft(xr, xi, tables, n, factors, precision, True, sign)
        xr, xi = xr.T, xi.T
        xr, xi = tile_fft(xr, xi, tables, n, factors, precision, True, sign)
        xr, xi = xr.T, xi.T
    or_ref[0] = xr
    oi_ref[0] = xi


@functools.partial(jax.jit, static_argnames=("variant",))
def f2d_variant(re, im, variant):
    with jax.enable_x64(False):
        L, ny, nx = re.shape
        n = ny
        sign = -1
        precision = "default" if variant == "fullbf16" else "highest"
        factors = tuple(pallas_local.default_factors(n))
        tables = needed_tables(n, sign, factors=factors, stacked=True,
                               precision=precision)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_kern, variant, n, layout, factors, sign,
                                 precision)
        oshape = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
        return pl.pallas_call(
            kern, grid=(L,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * ny * nx * 16 * L,
                bytes_accessed=L * ny * nx * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    nb = Z * Y * X * 4 * 4
    re, im = devdata((Z, Y, X), seed=1)

    t = {}
    for v in ("copy", "t1", "fft1", "fft2nt", "full", "fullbf16"):
        dt = time_scan_chain(
            lambda r, i, _v=v: f2d_variant(r, i, variant=_v),
            (re, im), trials=4)
        load = copy_bandwidth_gbs(trials=2)
        t[v] = dt
        print(f"{v:10s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}  "
              f"copy {load:5.0f} GB/s", flush=True)
    print("\n--- attribution (ms per pass) ---")
    print(f"DMA floor (copy)      = {1e3*t['copy']:7.3f}")
    print(f"one transpose         = {1e3*(t['t1']-t['copy']):7.3f}")
    print(f"one y-FFT             = {1e3*(t['fft1']-t['copy']):7.3f}")
    print(f"two FFTs no transpose = {1e3*(t['fft2nt']-t['copy']):7.3f}")
    print(f"2 transposes (in situ)= {1e3*(t['full']-t['fft2nt']):7.3f}")
    print(f"HIGHEST 6-pass tax    = {1e3*(t['full']-t['fullbf16']):7.3f}")


if __name__ == "__main__":
    main()
