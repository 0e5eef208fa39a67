"""Probe (r4 item 3): make the 3D 256^3 z-pass overlap DMA with compute.

Already refuted by r2/r3 probes (see docs/design.md): 1D merged grids,
dimension_semantics / cost_estimate variants, ctile multi-tile blocks,
row+swap-store pass pairs, manual double-buffer streaming.  This probe
times the genuinely untried shapes:

  zcol      production z-pass: col kernel (1, Z, lanes=256) blocks
  zrow      grid over y/8, (Z, 8, X) STRIDED blocks: the kernel sees 8
            (Z, X) tiles (z on sublanes, x on lanes) — per-step bytes
            exceed the 512^2 fused tile, strided DMA measured free.
            ((Z, 1, X) blocks are illegal: Mosaic requires the
            second-minor block dim divisible by 8 or equal to the
            array dim — r4 queue crash 13:35Z.)
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
import time

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
from pyfft_tpu.utils.cache import enable_compile_cache
from pyfft_tpu.utils.profiling import copy_bandwidth_gbs, time_scan_chain

enable_compile_cache()   # r5: probe programs persist across processes

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


def _zfold_kernel(n, by, x, layout, factors, sign, postscale, *refs):
    """Folded-contiguous READ, native strided WRITE (r5 glue2): the input
    block (1, Z, by*X) is a contiguous lane range of the (Z, Y*X) folded
    view (by = rows per step, lanes at y*X stay contiguous), the transform
    runs as ``by`` proven (Z, X)-shaped tile_ffts on static lane slices,
    and each result stores to the NATIVE (Z, Y, X) layout at [:, y, :] —
    absorbing the unfold relayout into the kernel's store."""
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    for j in range(by):
        sl = pl.ds(j * x, x)
        xr, xi = tile_fft(re_ref[0, :, sl], im_ref[0, :, sl], tables, n,
                          factors, "highest", True, sign)
        if postscale != 1.0:
            s = jnp.float32(postscale)
            xr, xi = xr * s, xi * s
        or_ref[:, j, :] = xr
        oi_ref[:, j, :] = xi


@functools.partial(jax.jit, static_argnames=("sign", "factors", "by",
                                              "postscale"))
def zfold(re, im, sign=-1, factors=None, by=8, postscale=1.0):
    """FFT over z of a folded (Z, Y*X) input; output in NATIVE (Z, Y, X)."""
    with jax.enable_x64(False):
        z, yx = re.shape
        y, x = yx // X, X
        factors = tuple(factors or pallas_local.col_factors(z))
        tables = needed_tables(z, sign, factors=factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        ispec = pl.BlockSpec((1, z, by * x), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((z, by, x), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_zfold_kernel, z, by, x, layout, factors,
                                 sign, float(postscale))
        oshape = jax.ShapeDtypeStruct((z, y, x), jnp.float32)
        return pl.pallas_call(
            kern, grid=(y // by,),
            in_specs=tspec + [ispec, ispec],
            out_specs=(ospec, ospec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * z * sum(factors) * x * y,
                bytes_accessed=z * y * x * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(*flat, re.reshape(1, z, yx), im.reshape(1, z, yx))


def _zrow_kernel(n, by, layout, factors, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    for j in range(by):
        xr, xi = tile_fft(re_ref[:, j, :], im_ref[:, j, :], tables, n,
                          factors, "highest", True, sign)
        or_ref[:, j, :] = xr
        oi_ref[:, j, :] = xi


@functools.partial(jax.jit, static_argnames=("sign", "factors", "by"))
def zrow(re, im, sign=-1, factors=None, by=8):
    """FFT over axis 0 of (Z, Y, X) with (Z, by, X) strided blocks."""
    with jax.enable_x64(False):
        z, y, x = re.shape
        factors = tuple(factors or pallas_local.col_factors(z))
        tables = needed_tables(z, sign, factors=factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((z, by, x), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_zrow_kernel, z, by, layout, factors, sign)
        oshape = jax.ShapeDtypeStruct((z, y, x), jnp.float32)
        return pl.pallas_call(
            kern, grid=(y // by,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * z * sum(factors) * x * y,
                bytes_accessed=z * y * x * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(*flat, re, im)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    secs = set((sys.argv[1] if len(sys.argv) > 1 else "f2d,z,e2e,comp")
               .split(","))
    nb = Z * Y * X * 4 * 4          # one pass moves 4 f32 planes
    import numpy as np

    # correctness spot-checks first (cheap shapes would hide layout bugs)
    re, im = devdata((Z, Y, X), seed=1)
    if "f2d" in secs:
        ref2 = np.fft.fft2(np.asarray(re, np.float64)
                           + 1j * np.asarray(im, np.float64), axes=(-2, -1))
        rr, ii = pallas_local.fft2_fused(re, im, -1, block_l=4)
        got = np.asarray(rr) + 1j * np.asarray(ii)
        err = abs(got - ref2).max() / abs(ref2).max()
        print(f"f2dB4 parity err={err:.2e}", flush=True)
        assert err < 2e-6
    if "z" in secs:
        ref = np.fft.fft(np.asarray(re, np.float64)
                         + 1j * np.asarray(im, np.float64), axis=0)
        rr, ii = zrow(re, im)
        got = np.asarray(rr) + 1j * np.asarray(ii)
        err = abs(got - ref).max() / abs(ref).max()
        print(f"zrow parity err={err:.2e}", flush=True)
        assert err < 2e-6

    # --- pass-1 variants (fused 2D over (y, x)) ---
    if "f2d" in secs:
        report("f2d prod (1,256,256) blocks",
               lambda r, i: pallas_local.fft2_fused(r, i, -1, alias_io=True),
               (re, im), nb)
        for b in (2, 4, 8):
            report(f"f2dB{b} ({b},256,256) blocks",
                   lambda r, i, _b=b: pallas_local.fft2_fused(
                       r, i, -1, alias_io=True, block_l=_b), (re, im), nb)

    if not secs & {"z", "e2e", "comp", "comp2", "hlo", "glue2"}:
        return
    # --- z-pass variants (axis 0 of (Z, Y*X)) ---
    r2, i2 = devdata((Z, Y * X), seed=2)
    if "z" not in secs:
        r2 = i2 = None
    if "z" in secs:
        report("zcol prod (lanes=256)",
               lambda r, i: pallas_local.fft_axis(r, i, -1, axis=0,
                                                  alias_io=True),
               (r2, i2), nb)
        report("zvpu pure-VPU (8,8,4)",
               lambda r, i: pallas_local.fft_axis(r, i, -1, axis=0,
                                                  factors=(8, 8, 4),
                                                  alias_io=True),
               (r2, i2), nb)
        report("zrow strided (Z,8,X) blocks",
               lambda r, i: tuple(
                   p.reshape(Z, Y * X) for p in
                   zrow(r.reshape(Z, Y, X), i.reshape(Z, Y, X))),
               (r2, i2), nb)

    if "e2e" in secs:
        # end-to-end glue check: Plan 256^3 vs the sum of its two kernel
        # passes (scale twin keeps chained magnitudes stationary, as
        # acceptance does)
        from pyfft_tpu.plan import Plan
        plan = Plan((Z, Y, X), donate=True,
                    scale=1.0 / float(np.sqrt(Z * Y * X)))
        fn = plan._get_callable((1,), False, "planar")
        re3, im3 = (p.reshape(1, Z, Y, X) for p in (re, im))
        report("Plan 256^3 end-to-end (donate)",
               lambda r, i: fn(r, i), (re3, im3), 2 * nb)

    if "comp" in secs:
        # manual two-pass compositions: isolate whether the e2e glue
        # (2.318 ms vs the 1.24 ms kernel sum, measured QUIET 14:56Z)
        # lives in the Plan wrapper or in the XLA composition of two
        # aliased pallas calls.  postscale 2^-12 keeps chains stationary.
        # postscale rides on the z-pass (as Plan's last-pass norm does),
        # so BOTH kernels are the exact cached programs of the f2d/zcol
        # rows + the e2e row — the r4e form put 2^-12 on the fused2d
        # kernel, a fresh hash the degraded compile service never
        # finished (1200 s, 18:16Z)
        def comp(alias1, alias2):
            def f(r, i):
                rr, ii = pallas_local.fft2_fused(r, i, -1, alias_io=alias1)
                return pallas_local.fft_axis(rr, ii, -1, axis=0,
                                             postscale=2.0 ** -12,
                                             alias_io=alias2)
            return f
        report("comp f2d+zcol alias/alias", comp(True, True),
               (re, im), 2 * nb)
        report("comp f2d+zcol noalias/alias", comp(False, True),
               (re, im), 2 * nb)
        report("comp f2d+zcol noalias/noalias", comp(False, False),
               (re, im), 2 * nb)
        # host-chained cross-check: if the scan-chain 2.3 ms is a scan
        # CARRY-COPY artifact (XLA double-buffering the 64 MB planes per
        # iteration), host-dispatch differencing of the jitted body shows
        # the true per-call time instead (congestion-prone: read with the
        # copy label)
        from pyfft_tpu.utils.profiling import time_chained
        cfn = jax.jit(comp(True, True))
        dt = min(time_chained(cfn, (re, im)) for _ in range(3))
        load = copy_bandwidth_gbs(trials=2)
        print(f"{'comp alias/alias HOST-chained':44s} {dt*1e3:8.3f} ms  "
              f"io-eff {2*nb/HBM_BW/dt:6.1%}  copy {load:5.0f} GB/s",
              flush=True)
        # r4f follow-ups (measured: the one-jit composition costs 2.0-2.3
        # ms vs the 1.24 ms solo-kernel sum, aliasing irrelevant).  Both
        # rows reuse cached kernels only.
        # (a) pass order: z first (postscale riding on it), then fused2d
        def zfirst(r, i):
            rr, ii = pallas_local.fft_axis(r, i, -1, axis=0,
                                           postscale=2.0 ** -12,
                                           alias_io=True)
            return pallas_local.fft2_fused(rr, ii, -1, alias_io=True)
        report("comp zcol+f2d (z first)", zfirst, (re, im), 2 * nb)
        # (b) split dispatch: each pass its OWN jit program (device runs
        # them back-to-back from the dispatch queue; no shared-program
        # XLA composition) — host-chained differencing.  min over trials
        # PER CHAIN LENGTH, then difference (the r4g min-of-differences
        # form paired a congested short chain with a clean long one and
        # printed -32 ms).
        def split_chain(k):
            t0 = time.perf_counter()
            r, i = re, im
            for _ in range(k):
                r, i = pallas_local.fft2_fused(r, i, -1)
                r, i = pallas_local.fft_axis(r, i, -1, axis=0,
                                             postscale=2.0 ** -12)
            float(jnp.sum(r.ravel()[:1]))
            return time.perf_counter() - t0
        split_chain(2)
        t8 = min(split_chain(8) for _ in range(5))
        t24 = min(split_chain(24) for _ in range(5))
        dt = (t24 - t8) / 16
        if dt <= 0:
            dt = t24 / 24          # amortized upper bound
        load = copy_bandwidth_gbs(trials=2)
        print(f"{'comp split-dispatch (2 programs/iter)':44s} "
              f"{dt*1e3:8.3f} ms  io-eff "
              f"{2*nb/HBM_BW/dt:6.1%}  copy {load:5.0f} GB/s",
              flush=True)

    if "glue2" in secs:
        # r5: absorb the UNFOLD relayout into the z-kernel's store.  The
        # r4h HLO dump named the composition glue: XLA relayout copies for
        # the (Z,Y,X) <-> (1,Z,Y*X) fold (489k cycles for the output pair)
        # plus S(1) staging around the aliased custom calls.  zfold reads
        # the folded layout contiguously and writes NATIVE (Z,Y,X) blocks,
        # so the composed program needs only the INPUT-side fold copy.
        ref = np.fft.fft(np.asarray(re, np.float64)
                         + 1j * np.asarray(im, np.float64), axis=0)
        r2f = re.reshape(Z, Y * X)
        i2f = im.reshape(Z, Y * X)
        rr, ii = zfold(r2f, i2f)
        got = np.asarray(rr) + 1j * np.asarray(ii)
        err = abs(got - ref).max() / abs(ref).max()
        print(f"zfold parity err={err:.2e}", flush=True)
        assert err < 2e-6
        for by in (8, 16):
            report(f"zfold foldin/nativeout by={by}",
                   lambda r, i, _b=by: tuple(
                       p.reshape(Z, Y * X) for p in zfold(r, i, by=_b)),
                   (r2f, i2f), nb)
        # full 3D chain with zfold: fused2d (native) -> fold reshape (the
        # one remaining XLA relayout) -> zfold -> native output
        def chain_zfold(r, i):
            rr, ii = pallas_local.fft2_fused(r, i, -1, alias_io=True)
            return zfold(rr.reshape(Z, Y * X), ii.reshape(Z, Y * X),
                         postscale=2.0 ** -12)
        report("chain f2d+fold+zfold (e2e)", chain_zfold, (re, im), 2 * nb)
        # baseline in the same load window
        def dep(r, i):
            rr, ii = pallas_local.fft2_fused(r, i, -1, alias_io=True)
            return pallas_local.fft_axis(rr, ii, -1, axis=0,
                                         postscale=2.0 ** -12,
                                         alias_io=True)
        report("chain f2d+zcol (current e2e)", dep, (re, im), 2 * nb)

    if "comp2" in secs:
        # r4h: is the ~1 ms composition glue tied to the DATA DEPENDENCY
        # (a layout/copy on the intermediate between the two custom
        # calls), or generic two-custom-calls-in-one-program overhead?
        # Compose the SAME two cached kernels on INDEPENDENT inputs
        # (stream A through f2d, stream B through zcol), swapping streams
        # each iteration so both stay stationary over 2 steps (f2d grows
        # ~2^8 on random data, zcol's 2^-12 postscale nets it back).
        # If this row ~= the 1.24 ms solo sum, the glue is the dependent
        # intermediate; if it stays ~2.3 ms, it's generic program glue.
        reB, imB = devdata((Z, Y, X), seed=3)

        def indep(r1, i1, r2, i2):
            a, b = pallas_local.fft2_fused(r1, i1, -1, alias_io=True)
            c, d = pallas_local.fft_axis(r2, i2, -1, axis=0,
                                         postscale=2.0 ** -12,
                                         alias_io=True)
            return c, d, a, b
        report("comp2 f2d(A)+zcol(B) independent", indep,
               (re, im, reB, imB), 2 * nb)

    if "hlo" in secs:
        # r4h: read the optimized HLO of the dependent composition — any
        # copy/transpose/fusion ops BETWEEN the two pallas custom calls
        # are the glue, by name.  Compile is a cache hit (same program as
        # the comp alias/alias row).
        def dep(r, i):
            rr, ii = pallas_local.fft2_fused(r, i, -1, alias_io=True)
            return pallas_local.fft_axis(rr, ii, -1, axis=0,
                                         postscale=2.0 ** -12,
                                         alias_io=True)
        compiled = jax.jit(dep).lower(re, im).compile()
        try:
            txt = compiled.as_text()
        except Exception as e:          # remote backend may not return it
            print(f"HLO text unavailable: {e!r}", flush=True)
            txt = ""
        if txt:
            lines = txt.splitlines()
            entry = []
            in_entry = False
            for ln in lines:
                if ln.startswith("ENTRY"):
                    in_entry = True
                if in_entry:
                    entry.append(ln)
                    if ln.strip() == "}":
                        break
            print(f"HLO: {len(lines)} lines total; ENTRY ops "
                  f"({len(entry)} lines):", flush=True)
            for ln in entry:
                s = ln.strip()
                if s and not s.startswith(("//", "ROOT tuple")):
                    print("   ", s[:240], flush=True)
            ncopy = sum(" copy(" in ln or "copy-start" in ln
                        for ln in lines)
            print(f"HLO copy ops anywhere: {ncopy}", flush=True)
        try:
            ma = compiled.memory_analysis()
            print(f"HLO temp {ma.temp_size_in_bytes/2**20:.1f} MiB, "
                  f"output {ma.output_size_in_bytes/2**20:.1f} MiB, "
                  f"args {ma.argument_size_in_bytes/2**20:.1f} MiB",
                  flush=True)
        except Exception as e:
            print(f"memory_analysis unavailable: {e!r}", flush=True)


if __name__ == "__main__":
    main()
