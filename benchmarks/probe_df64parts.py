"""Probe (r4, VERDICT item 2): decompose the config-5 df64 kernel cost.

probe_df64r3 showed the config-5 row/col kernels at ~6.5% io-eff —
VPU-bound, ~15x off HBM.  This probe attributes the 2.5 ms to the kernel's
parts by timing structurally-identical chains with pieces disabled
(numerics intentionally wrong for *-cost variants; only `full`, `prod`
and `cheapacc` are parity-valid):

  prod      production fft_axis_df64 row kernel (sanity vs `full`)
  full      local copy of the (8, 4, 64) chain          = P + X + M + A + T
  notw      full minus the inter-stage df64 twiddle round (T)
  consttw   twiddle round replaced by the deferred-split form: per-(k0,j1)
            slice multiplies by a df64 CONSTANT, trivial slices skipped
            (the two-level-fold candidate's residual cost)
  nomxu     int8 tail replaced by a passthrough          = P (butterflies)
  mxu1      tail with only the most-significant shift group (X + 1 matmul)
  fold32    tail split into 32 digit slices (the two-level fold's tail
            shape: 32 small calls instead of 4)
  cheapacc  shift groups s >= 35 accumulated in plain f32 (error ~2^-45,
            inside the 1e-11 gate) — a parity-valid accumulation trim (A/2)
  bfly      production all-butterfly chain (2,4,4,4,4,4) for reference

Cost algebra: T = full-notw; tail = full-nomxu; X ~= mxu1-nomxu;
matmuls+accum = full-mxu1; accum trim win = full-cheapacc.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops import pallas_df64 as P
from pyfft_tpu.ops.df64 import df_add, df_cmul
from pyfft_tpu.utils.profiling import time_scan_chain

HBM_BW = 819e9
N = 2048
VOL = 1 << 22


def _mxu_stage_variant(x, f, axis, wch, sign, keep, cheapacc,
                       bfch=False):
    """P._mxu_stage_df64 with a tunable combined-shift cap, an optional
    f32 accumulation of the low-significance shift groups, and an
    optional bf16-channel tail (``bfch``): the 7-bit chunks are exact in
    bf16, pair products <= 2^14, and every f32 partial sum <= 6 pairs x
    128 x 127^2 = 12.4e6 < 2^24 — so ONE native bf16 MXU pass per dot is
    bit-exact, vs the int8->int32 lowering the r4f A/B showed running at
    ~11% of peak (the c64 HIGHEST tail measures ~57%)."""
    rh, rl, ih, il = x
    a = jnp.maximum(jnp.abs(rh), jnp.abs(ih))
    amax = jnp.max(a).reshape(1, 1)
    eb = (jax.lax.bitcast_convert_type(amax, jnp.int32) >> 23) & 0xFF
    m = jnp.clip(eb - 126, -40, 120)

    chdt = jnp.bfloat16 if bfch else jnp.int8
    channels = []
    for cre, cim, s in zip(P._chunk_plane(rh, m, P._HI_SHIFTS, chdt),
                           P._chunk_plane(ih, m, P._HI_SHIFTS, chdt),
                           P._HI_SHIFTS):
        channels.append((jnp.concatenate([cre, cim], axis=axis), s))
    for cre, cim, s in zip(P._chunk_plane(rl, m, P._LO_SHIFTS, chdt),
                           P._chunk_plane(il, m, P._LO_SHIFTS, chdt),
                           P._LO_SHIFTS):
        channels.append((jnp.concatenate([cre, cim], axis=axis), s))

    dims = (((1,), (axis,)), ((), ()))
    pairs: dict = {}
    for wi, ws in enumerate(P._W_SHIFTS):
        for ci, (_, xs_) in enumerate(channels):
            s = ws + xs_
            if s <= keep:
                pairs.setdefault(s, []).append((wi, ci))

    # least-significant first (matches production): the f32 trim needs no
    # extra live accumulator plane (the ascending form OOMed scoped VMEM
    # at 113.5M/100M on the n=2048 chain)
    if bfch:
        wch = [w.astype(jnp.bfloat16) for w in wch]
    acc_h = acc_l = None
    for s in sorted(pairs, reverse=True):
        g = None
        for wi, ci in pairs[s]:
            y = jax.lax.dot_general(
                wch[wi], channels[ci][0], dims,
                preferred_element_type=jnp.float32 if bfch else jnp.int32)
            g = y if g is None else g + y
        val = (g if bfch else g.astype(jnp.float32)) \
            * P._exp2_f32(m - jnp.int32(s))
        if acc_h is None:
            acc_h, acc_l = val, jnp.zeros_like(val)
        elif cheapacc and s >= 35:
            acc_h = acc_h + val
        else:
            acc_h, acc_l = df_add(acc_h, acc_l, val, jnp.zeros_like(val))
    return acc_h[:f], acc_l[:f], acc_h[f:], acc_l[f:]


# w32^(k0*j1) df64 constants for the consttw variant (sign=-1)
_W32 = [P.df64_const(np.cos(-2 * np.pi * m / 32))
        + P.df64_const(np.sin(-2 * np.pi * m / 32)) for m in range(32)]


def _const_cmul(q, m):
    """Multiply a df64 quad by the constant w32^m (trace-time constant)."""
    if m % 32 == 0:
        return q
    ch, cl, sh, sl = (P._vconst(float(v)) for v in _W32[m % 32])
    return df_cmul(q[0], q[1], q[2], q[3], ch, cl, sh, sl)


def tile_variant(planes, tables, n, factors, sign, variant):
    """tile_fft_df64 with the variant switches (see module docstring)."""
    lanes = planes[0].shape[-1]
    m = len(factors)
    fold = ("wi8fold", factors) in tables
    assert fold and factors[-1] >= P.MXU_MIN_F
    L, R = 1, n
    x = tuple(p.reshape(1, n, lanes) for p in planes)
    for i, f in enumerate(factors):
        R //= f
        if i == m - 1:
            # int8 tail (folded tables), under the variant's shape
            flat = tables[("wi8fold", factors)]
            nch = len(P._W_SHIFTS)
            if variant == "nomxu":
                x = tuple(jnp.moveaxis(
                    p.reshape(L, f, lanes), 1, 0) for p in x)
                break
            groups = 32 if variant == "fold32" else factors[m - 2]
            keep = (14 if variant == "mxu1"
                    else int(variant[4:]) if variant.startswith("keep")
                    else P._KEEP)
            cheap = (variant in ("cheapacc", "bfch")
                     or variant.startswith("keep"))
            x4 = tuple(p.reshape(groups, L // groups, f, lanes) for p in x)
            outs = []
            for j in range(groups):
                xj = tuple(p[j] for p in x4)
                wj = (j * factors[m - 2]) // groups   # cost-correct reuse
                wch = flat[wj * nch:(wj + 1) * nch]
                outs.append(_mxu_stage_variant(xj, f, 1, wch, sign,
                                               keep, cheap,
                                               bfch=variant == "bfch"))
            x = tuple(jnp.stack([o[k] for o in outs], axis=1)
                      for k in range(4))
            break
        x4 = tuple(p.reshape(L, f, R, lanes) for p in x)
        y = P._butterfly_df64(f, x4, sign)            # (f, L, R, lanes)
        if i < m - 2:                                 # tw rounds before fold
            if variant in ("notw",):
                pass
            elif variant == "consttw":
                # deferred-split residual: w32^(k0*j1) per (k0, j1) slice
                # (j2-dependent part folds into the tail tables; here we
                # only pay the residual constant round — numerics wrong,
                # cost right)
                f1 = factors[i + 1]
                y5 = tuple(p.reshape(f, L, f1, R // f1, lanes) for p in y)
                cols = []
                for j1 in range(f1):
                    rows = []
                    for k0 in range(f):
                        q = tuple(p[k0, :, j1] for p in y5)
                        # w_{f*f1}^(k0*j1) with f*f1 == 32 for (8,4,64)
                        rows.append(_const_cmul(q, (k0 * j1) % 32))
                    cols.append(tuple(jnp.stack([r[k] for r in rows], 0)
                                      for k in range(4)))
                y = tuple(jnp.stack([c[k] for c in cols], axis=2)
                          .reshape(f, L, R, lanes) for k in range(4))
            else:
                trh, trl, tih, til = tables[("tw", i, factors)]
                y = df_cmul(y[0], y[1], y[2], y[3], trh, trl, tih, til)
        L *= f
        x = tuple(p.reshape(L, R, lanes) for p in y)
    return tuple(p.reshape(n, lanes) for p in x)


def _row_kernel(n, layout, factors, sign, variant, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    ins = refs[nt:nt + 4]
    outs = refs[nt + 4:nt + 8]
    x = tuple(r[:].T for r in ins)
    x = tile_variant(x, tables, n, factors, sign, variant)
    for o, p in zip(outs, x):
        o[:] = p.T


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def row_variant(rh, rl, ih, il, variant, interpret=False):
    with jax.enable_x64(False):
        n = N
        sign = -1
        factors = P.mxu_factors_df64(n)
        tables = P.needed_tables_df64(n, sign, factors)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        rows = rh.shape[0]
        lanes = P.LANES
        grid = (pl.cdiv(rows, lanes),)
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((lanes, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_row_kernel, n, layout, factors, sign,
                                 variant)
        oshape = (jax.ShapeDtypeStruct((rows, n), jnp.float32),) * 4
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=tspec + [dspec] * 4,
            out_specs=(dspec,) * 4, out_shape=oshape,
            cost_estimate=pl.CostEstimate(
                flops=300 * rows * n * 3,
                bytes_accessed=rows * n * 4 * 8, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*flat, rh, rl, ih, il)


def devquad(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return tuple(jax.random.normal(k, shape, jnp.float32) * s
                 for k, s in zip(ks, (1.0, 1e-8, 1.0, 1e-8)))


def main():
    assert jax.default_backend() in ("tpu", "axon")
    q = devquad((VOL // N, N), seed=5)
    nb = q[0].size * 4 * 8

    def report(name, fn):
        dt = time_scan_chain(fn, q, trials=4)
        print(f"{name:40s} {dt*1e3:9.3f} ms   io-eff {nb/HBM_BW/dt:6.1%}",
              flush=True)
        return dt

    # parity first (full and cheapacc must be numerically valid)
    import numpy as np
    qs = devquad((256, N), seed=9)
    ref = np.fft.fft(
        (np.asarray(qs[0], np.float64) + np.asarray(qs[1], np.float64))
        + 1j * (np.asarray(qs[2], np.float64)
                + np.asarray(qs[3], np.float64)), axis=-1)
    # keepS variants truncate the pair set at combined shift S — MEASURED
    # over the gate (TPU r4f: keep45 7.3e-11, keep40 9.6e-9 vs 1e-11;
    # the dropped products sum coherently over the K=128 contraction),
    # so they are cost-curve rows only.  Parity-check just the variants
    # actually selected for timing (each costs a kernel compile).
    sel_parity = [v for v in ("full", "cheapacc", "bfch",
                              "keep45", "keep40")
                  if v in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["full", "cheapacc"])]
    for v in sel_parity:
        out = row_variant(*qs, variant=v)
        got = (np.asarray(out[0], np.float64) + np.asarray(out[1])
               + 1j * (np.asarray(out[2], np.float64) + np.asarray(out[3])))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        ok = err < 1e-11
        print(f"{v} parity err={err:.2e}"
              + ("" if ok else "  [over gate — cost row only]"), flush=True)
        if not v.startswith("keep"):
            assert ok, (v, err)     # keeps are timed regardless: the cost
                                    # curve matters even past the gate

    # fold2/fold32 are OFF the default list: their 32 unrolled tail groups
    # produce a 3.7 MB MLIR program that SIGKILLs the shared compile helper
    # (r4d 16:44Z — helper OOM class, same as the 512^2 df64 2D program).
    # Select explicitly (argv) only if the helper ever gains headroom.
    sel = (sys.argv[1].split(",") if len(sys.argv) > 1 else
           ["prod", "full", "notw", "consttw", "nomxu", "mxu1",
            "cheapacc", "keep45", "keep40", "bfly"])
    t = {}
    if "prod" in sel:
        t["prod"] = report("prod fft_axis_df64 (8,4,64)",
                           lambda *p: P.fft_axis_df64(p, -1, axis=-1))
    if "fold2" in sel:
        t["fold2"] = report("prod fold2 (two-level fold)",
                            lambda *p: P.fft_axis_df64(p, -1, axis=-1,
                                                       fold2=True))
    for v in ("full", "notw", "consttw", "nomxu", "mxu1", "fold32",
              "cheapacc", "bfch", "keep45", "keep40"):
        if v in sel:
            t[v] = report(f"variant {v}",
                          lambda *p, _v=v: row_variant(*p, variant=_v))
    if "bfly" in sel:
        t["bfly"] = report("prod all-butterfly (2,4,4^4)",
                           lambda *p: P.fft_axis_df64(
                               p, -1, axis=-1,
                               factors=P.default_factors_df64(N)))
    def row(label, a, b=None):
        if a in t and (b is None or b in t):
            v = t[a] - (t[b] if b else 0.0)
            print(f"{label} = {1e3*v:7.3f}")

    print("\n--- attribution (ms) ---")
    row("twiddle round T       ", "full", "notw")
    row("  deferred-const resid", "consttw", "notw")
    row("int8 tail (X+M+A)     ", "full", "nomxu")
    row("  extraction X ~=     ", "mxu1", "nomxu")
    row("  matmuls+accum M+A   ", "full", "mxu1")
    row("  accum trim win      ", "full", "cheapacc")
    row("  keep45 win          ", "cheapacc", "keep45")
    row("  keep40 win          ", "cheapacc", "keep40")
    row("  bf16-channel win    ", "cheapacc", "bfch")
    row("  fold32 tail delta   ", "fold32", "full")
    row("butterfly prefix P    ", "nomxu")
    row("fold2 win vs prod     ", "prod", "fold2")


if __name__ == "__main__":
    main()
