"""Tiled fused-2D kernel on real TPU (VERDICT r4 item 4: the 1024^2 fused
tile, carried from r3).  The r3 monolithic form (tile_fft at 1024 lanes)
sent Mosaic into an unbounded search and wedged the shared compile queue;
this probe compiles the TILED form (every op at <= 128-lane proven shapes,
pallas_local.fft2_fused_tiled) in risk order:

  canary   256^2  (4 + 2 slice ffts)   — validates the construction cheap
  target   1024^2 batch 16 (config 3)  — the one-HBM-pass win if it holds

Each phase prints parity + scan-chain timing with a load label.  Kill the
client early if a compile exceeds ~15 min; do NOT retry a failed shape.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYFFT_TPU_TUNE_FILE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "tuned_v5e.json"))

import numpy as np

import jax
import jax.numpy as jnp

from pyfft_tpu.ops.pallas_local import fft2_fused, fft2_fused_tiled
from pyfft_tpu.utils.cache import enable_compile_cache
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

enable_compile_cache()
HBM_BW = 819e9


def _halves_kernel(ny, nx, parts, layout, postscale, fy, fx, sign, *refs):
    """Scratch-free tiled fused 2D: y-FFT on ``parts`` static lane slices
    of the VALUE (no scratch refs -> grid pipelining stays intact), concat,
    one whole-tile transpose, x-FFT on slices, store.  Every tile_fft runs
    at nx/parts lanes (512 for 1024^2 with parts=2 — the proven fused-512
    width); the r3 pathological form was the 1024-lane whole-tile chain."""
    import functools as ft

    from pyfft_tpu.ops.pallas_local import tile_fft
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr_full, xi_full = re_ref[0], im_ref[0]
    w = nx // parts
    ys = [tile_fft(xr_full[:, j * w:(j + 1) * w], xi_full[:, j * w:(j + 1) * w],
                   tables, ny, fy, "highest", True, sign)
          for j in range(parts)]
    tr = jnp.concatenate([a for a, _ in ys], axis=1).T      # (nx, ny)
    ti = jnp.concatenate([b for _, b in ys], axis=1).T
    w2 = ny // parts
    xs = [tile_fft(tr[:, j * w2:(j + 1) * w2], ti[:, j * w2:(j + 1) * w2],
                   tables, nx, fx, "highest", True, sign)
          for j in range(parts)]
    outr = jnp.concatenate([a for a, _ in xs], axis=1)      # (nx, ny)
    outi = jnp.concatenate([b for _, b in xs], axis=1)
    if postscale != 1.0:
        s = jnp.float32(postscale)
        outr, outi = outr * s, outi * s
    or_ref[0] = outr.T
    oi_ref[0] = outi.T


@jax.jit
def _noop(x):
    return x


def fft2_halves(re, im, sign, *, parts=2, postscale=1.0, alias_io=False,
                interpret=None):
    import functools as ft

    import jax.numpy as _jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pyfft_tpu.ops.pallas_local import col_factors, needed_tables
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    shape = re.shape
    ny, nx = shape[-2], shape[-1]
    lead = shape[:-2]
    L = int(np.prod(lead)) if lead else 1
    re2 = re.reshape(L, ny, nx)
    im2 = im.reshape(L, ny, nx)
    fy = tuple(col_factors(ny))
    fx = tuple(col_factors(nx))
    with jax.enable_x64(False):
        tables = needed_tables(ny, sign, factors=fy)
        tables.update(needed_tables(nx, sign, factors=fx))
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = ft.partial(_halves_kernel, ny, nx, parts, layout,
                          float(postscale), fy, fx, sign)
        oshape = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
        nd = len(tspec)
        aliases = {nd: 0, nd + 1: 1} if alias_io else {}
        rr, ii = pl.pallas_call(
            kern, grid=(L,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            input_output_aliases=aliases,
            cost_estimate=pl.CostEstimate(
                flops=8 * ny * nx * (sum(fy) + sum(fx)) * L,
                bytes_accessed=L * ny * nx * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
            interpret=bool(interpret),
        )(*flat, re2, im2)
    return rr.reshape(shape), ii.reshape(shape)


def run_halves(name, shape, parts, baseline=False):
    rng = np.random.RandomState(sum(shape))
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    re = jnp.asarray(x.real)
    im = jnp.asarray(x.imag)
    rr, ii = fft2_halves(re, im, -1, parts=parts)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(-2, -1))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"{name} halves parity err={err:.2e}", flush=True)
    assert err < 2e-6
    nb = x.size * 4 * 4
    dt = time_scan_chain(
        lambda r, i: fft2_halves(r, i, -1, parts=parts,
                                 postscale=2.0 ** -11, alias_io=True),
        (re, im), trials=6)
    load = copy_bandwidth_gbs(trials=2)
    n = shape[-1] * shape[-2]
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    gf = 5 * n * np.log2(n) * batch / dt / 1e9
    print(f"{name} halves(p={parts}): {dt*1e3:.3f} ms  "
          f"io-eff {nb/HBM_BW/dt:6.1%}  {gf:6.1f} GF  copy {load:5.0f} GB/s",
          flush=True)
    if baseline:
        dtb = time_scan_chain(
            lambda r, i: fft2_fused(r, i, -1, postscale=2.0 ** -11,
                                    alias_io=True),
            (re, im), trials=6)
        load = copy_bandwidth_gbs(trials=2)
        print(f"{name} monolithic: {dtb*1e3:.3f} ms  io-eff "
              f"{nb/HBM_BW/dtb:6.1%}  copy {load:5.0f} GB/s", flush=True)


def run(name, shape, tol=2e-6, baseline=False):
    rng = np.random.RandomState(sum(shape))
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    re = jnp.asarray(x.real)
    im = jnp.asarray(x.imag)
    rr, ii = fft2_fused_tiled(re, im, -1)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(-2, -1))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"{name} parity err={err:.2e}", flush=True)
    assert err < tol
    nb = x.size * 4 * 4
    dt = time_scan_chain(
        lambda r, i: fft2_fused_tiled(r, i, -1, postscale=2.0 ** -11,
                                      alias_io=True),
        (re, im), trials=6)
    load = copy_bandwidth_gbs(trials=2)
    n = shape[-1] * shape[-2]
    batch = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    gf = 5 * n * np.log2(n) * batch / dt / 1e9
    print(f"{name} tiled: {dt*1e3:.3f} ms  io-eff {nb/HBM_BW/dt:6.1%}  "
          f"{gf:6.1f} GF  copy {load:5.0f} GB/s", flush=True)
    if baseline:
        dtb = time_scan_chain(
            lambda r, i: fft2_fused(r, i, -1, postscale=2.0 ** -11,
                                    alias_io=True),
            (re, im), trials=6)
        load = copy_bandwidth_gbs(trials=2)
        print(f"{name} monolithic: {dtb*1e3:.3f} ms  io-eff "
              f"{nb/HBM_BW/dtb:6.1%}  copy {load:5.0f} GB/s", flush=True)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    phases = (sys.argv[1] if len(sys.argv) > 1 else "canary,target").split(",")
    if "canary" in phases:
        run("canary 4x256^2", (4, 256, 256), baseline=True)
    if "target" in phases:
        run("config3 16x1024^2", (16, 1024, 1024))
    if "hcanary" in phases:
        run_halves("canary 4x256^2", (4, 256, 256), parts=2, baseline=True)
    if "htarget" in phases:
        run_halves("config3 16x1024^2", (16, 1024, 1024), parts=2)


if __name__ == "__main__":
    main()
