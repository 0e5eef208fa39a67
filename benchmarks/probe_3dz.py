"""Probe (r4 item 3): make the 3D 256^3 z-pass overlap DMA with compute.

Already refuted by r2/r3 probes (see docs/design.md): 1D merged grids,
dimension_semantics / cost_estimate variants, ctile multi-tile blocks,
row+swap-store pass pairs, manual double-buffer streaming.  This probe
times the genuinely untried shapes:

  zcol      production z-pass: col kernel (1, Z, lanes=256) blocks
  zrow      grid over y, (Z, 1, X) STRIDED blocks: the kernel sees a
            (Z, X) tile (z on sublanes, x on lanes) — per-step bytes
            match the 512^2 fused tile, strided DMA measured free
  zvpu      production z-pass with the pure-VPU (8,8,4) chain (no MXU
            tail: col kernels pay compute serially, so cutting the 6
            bf16 passes is a direct win if the VPU rounds stay cheaper)
  f2d       production pass 1: fused2d over (y, x), grid over z
  f2dB4     fused2d with (4, ny, nx) blocks: 4 z-planes per grid step —
            per-step bytes match the 512^2 tile (1201 -> 1924 GF was the
            256^2 -> 512^2 fused-tile gap; is it per-step amortization?)

Run on real TPU in a quiet-ish window; every row is load-labeled.
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


def report(name, fn, args, nb):
    dt = time_scan_chain(fn, args, trials=4)
    load = copy_bandwidth_gbs(trials=2)
    print(f"{name:44s} {dt*1e3:8.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}  "
          f"copy {load:5.0f} GB/s", flush=True)
    return dt


def _zrow_kernel(n, layout, factors, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = tile_fft(re_ref[:, 0, :], im_ref[:, 0, :], tables, n, factors,
                      "highest", True, sign)
    or_ref[:, 0, :] = xr
    oi_ref[:, 0, :] = xi


@functools.partial(jax.jit, static_argnames=("sign", "factors"))
def zrow(re, im, sign=-1, factors=None):
    """FFT over axis 0 of (Z, Y, X) with (Z, 1, X) strided blocks."""
    with jax.enable_x64(False):
        z, y, x = re.shape
        factors = tuple(factors or pallas_local.col_factors(z))
        tables = needed_tables(z, sign, factors=factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((z, 1, x), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_zrow_kernel, z, layout, factors, sign)
        oshape = jax.ShapeDtypeStruct((z, y, x), jnp.float32)
        return pl.pallas_call(
            kern, grid=(y,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * z * sum(factors) * x * y,
                bytes_accessed=z * y * x * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(*flat, re, im)


def _f2db_kernel(b, ny, nx, layout, fy, fx, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    for j in range(b):
        xr, xi = tile_fft(re_ref[j], im_ref[j], tables, ny, fy,
                          "highest", True, sign)
        xr, xi = xr.T, xi.T
        xr, xi = tile_fft(xr, xi, tables, nx, fx, "highest", True, sign)
        or_ref[j] = xr.T
        oi_ref[j] = xi.T


@functools.partial(jax.jit, static_argnames=("sign", "b"))
def f2db(re, im, sign=-1, b=4):
    """Fused 2D (y, x) FFT with (b, ny, nx) blocks (b z-planes per step)."""
    with jax.enable_x64(False):
        L, ny, nx = re.shape
        fy = tuple(pallas_local.default_factors(ny))
        fx = tuple(pallas_local.default_factors(nx))
        tables = needed_tables(ny, sign, factors=fy)
        tables.update(needed_tables(nx, sign, factors=fx))
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((b, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_f2db_kernel, b, ny, nx, layout, fy, fx,
                                 sign)
        oshape = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
        return pl.pallas_call(
            kern, grid=(L // b,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * ny * nx * (sum(fy) + sum(fx)) * L,
                bytes_accessed=L * ny * nx * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    nb = Z * Y * X * 4 * 4          # one pass moves 4 f32 planes
    import numpy as np

    # correctness spot-checks first (cheap shapes would hide layout bugs)
    re, im = devdata((Z, Y, X), seed=1)
    ref = np.fft.fft(np.asarray(re, np.float64)
                     + 1j * np.asarray(im, np.float64), axis=0)
    rr, ii = zrow(re, im)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    err = abs(got - ref).max() / abs(ref).max()
    print(f"zrow parity err={err:.2e}", flush=True)
    assert err < 2e-6
    ref2 = np.fft.fft2(np.asarray(re, np.float64)
                       + 1j * np.asarray(im, np.float64), axes=(-2, -1))
    rr, ii = f2db(re, im, b=4)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    err = abs(got - ref2).max() / abs(ref2).max()
    print(f"f2dB4 parity err={err:.2e}", flush=True)
    assert err < 2e-6

    # --- z-pass variants (axis 0 of (Z, Y*X)) ---
    r2, i2 = devdata((Z, Y * X), seed=2)
    report("zcol prod (lanes=256)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=0,
                                              alias_io=True),
           (r2, i2), nb)
    report("zvpu pure-VPU (8,8,4)",
           lambda r, i: pallas_local.fft_axis(r, i, -1, axis=0,
                                              factors=(8, 8, 4),
                                              alias_io=True),
           (r2, i2), nb)
    report("zrow strided (Z,1,X) blocks",
           lambda r, i: zrow(r.reshape(Z, Y, X), i.reshape(Z, Y, X)),
           (r2, i2), nb)

    # --- pass-1 variants (fused 2D over (y, x)) ---
    report("f2d prod (1,256,256) blocks",
           lambda r, i: pallas_local.fft2_fused(r, i, -1, alias_io=True),
           (re, im), nb)
    for b in (2, 4):
        report(f"f2dB{b} ({b},256,256) blocks",
               lambda r, i, _b=b: f2db(r, i, b=_b), (re, im), nb)


if __name__ == "__main__":
    main()
