"""Pallas double-float FFT kernels — the complex128 path on TPU.

The reference got double precision for free from CUDA hardware
(``dtype=numpy.complex128`` plans, fp64-capable devices — SURVEY.md
§2.9-bis); TPU v5e has no f64 compute unit, so this module implements the
transform in **double-float** arithmetic (ops/df64.py): every f64 plane is
an (hi, lo) pair of f32 planes and each complex value is a planar quad
(rh, rl, ih, il).

Kernel strategy — the VPU-native dual of the c64 MXU kernels:

* stages are radix-4/radix-2 **butterflies**: complex additions (error-free
  TwoSum chains) and multiplies by +-i (exact plane swaps) — no df64
  multiplies at all inside a stage;
* the only df64 multiplies are the inter-stage twiddles (one per element
  per stage, ~100 f32 VPU flops), with twiddle tables precomputed on the
  host from f64 and stored as df64 quads;
* normalization by 1/N is an exact power-of-two scale.

Unit roundoff ~2^-48 gives FFT parity ~1e-13 vs numpy complex128 —
inside the ~1e-11 BASELINE gate.  Same layout rules as pallas_local:
(n, lanes) tiles, transform on sublanes, digit-prepending stage order,
no bit reversal.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops.df64 import (df64_const, df_add, df_cmul, df_mul,
                                df_scale_pow2)
from pyfft_tpu.ops.pallas_local import LANES, _interpret_default
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["supported", "supported_huge", "fft_axis_df64",
           "fft_axis_large_df64", "fft_axis_huge_df64",
           "MAX_LOCAL_N_DF64", "HUGE_MAX_F_DF64", "tile_fft_df64",
           "default_factors_df64", "mxu_factors_df64"]
# Compile-safety ceilings measured on v5e.  The round-1 limits (row/col
# n <= 2048, tw+swap n <= 1024) were set by the all-butterfly chains'
# register spills; the int8-MXU tail chains (now the default) hold far
# fewer live butterfly values and verified clean compiles + parity at:
#   row / col kernels:            n <= 4096   (row 7.9e-13, col tested)
#   col + fused twiddle + swap:   n <= 2048   (5.8e-13)
# so config-5-class transforms run the TWO-pass four-step form (the XLA
# digit-swap pass of the old three-pass form is gone).
MAX_LOCAL_N_DF64 = 4096
SWAP_MAX_DF64 = 2048
# Largest per-pass factor in the two-level (six-step) df64 chain: every
# pass there carries a fused twiddle and/or swap store, so stay at the
# measured tw+swap ceiling rather than the plain row/col 4096.
HUGE_MAX_F_DF64 = 2048
_MIN_N = 8


def default_factors_df64(n: int) -> tuple[int, ...]:
    """Radix-4 chain (one leading 2 for odd log2): butterflies only."""
    p = n.bit_length() - 1
    if p % 2:
        return (2,) + (4,) * (p // 2)
    return (4,) * (p // 2)


# ----------------------------------------------------------------------
# int8-split exact MXU DFT stage (the c128 throughput fix, ROADMAP item 3)
#
# A factor f >= MXU_MIN_F runs as a DFT-matrix contraction on the MXU in
# EXACT integer arithmetic: the df64 operand planes are decomposed into
# 7-bit int8 channels against a per-tile power-of-two alignment, the
# stacked complex DFT matrix into 8 channels of its 56 leading bits, and
# the stage output is reassembled from int8 x int8 -> int32 matmuls
# (grouped by combined shift) through TwoSum chains.  Validated numerics:
# per-stage error ~3e-14 with 38 matmuls (benchmarks/proto_int8_df64.py).
# ----------------------------------------------------------------------

MXU_MIN_F = 32
_B = 7                                              # bits per int8 channel
# Channel counts tuned against the c128 gate (measured on the full
# (4,4,2,64) chain at n=2048: 6.2e-13 vs numpy — 16x inside the 1e-11
# gate — with 27 matmuls; the conservative 8/5/8/keep-60 set costs 38
# matmuls for 6e-15, precision the contract doesn't need):
_W_SHIFTS = tuple(_B * (i + 1) for i in range(6))   # W bits 1..42
_HI_SHIFTS = tuple(_B * (i + 1) for i in range(6))  # hi bits 1..42
# lo channels at shifts 31/38/45: a 4th (shift 52) could never pair under
_LO_SHIFTS = tuple(24 + _B * (i + 1) for i in range(3))  # _KEEP (52+7 > 53)
_KEEP = 53                                          # max combined shift
# Shift groups at/below this significance accumulate in plain f32 (one
# df_add folds the sum in at the end) — see the accumulation loop comment.
_F32_ACC_MIN_S = 35


def mxu_factors_df64(n: int) -> tuple[int, ...]:
    """Butterfly prefix + one 64-point int8-MXU tail.

    Radix-8-heavy prefixes since r3: each butterfly stage costs a df64
    twiddle round (~100 VPU flops/element — the dominant term), so the
    fewest-stages chain wins; radix-8 covers 3 bits per stage and its
    w8 constants cost a df64 scale on only half the odd-branch elements.
    The last twiddle round folds into the int8 tail entirely (FOLD)."""
    p = n.bit_length() - 1
    if p < 6:
        return default_factors_df64(n)
    r = p - 6
    if n <= 2048:
        # radix-8's 8 live slice quads exceed the VMEM scoped limit at
        # n=4096 (measured: 121M > 100M); 2048 covers the config-5
        # four-step splits, where the win matters
        a, rem = divmod(r, 3)
        if rem == 0:
            return (8,) * a + (64,)
        if rem == 1:
            return (8,) * a + (2, 64)
        return (8,) * a + (4, 64)
    if r % 2:
        return (4,) * (r // 2) + (2, 64)
    return (4,) * (r // 2) + (64,)


def _int8_channels(ws: np.ndarray) -> tuple[np.ndarray, ...]:
    chunks = []
    r = ws.copy()
    for s in _W_SHIFTS:
        sh = 2.0 ** (-s)
        c = np.clip(np.rint(r / sh), -127, 127)
        r -= c * sh
        chunks.append(c.astype(np.int8))
    return tuple(chunks)


def _dft_rw(f: int, sign: int):
    k = np.arange(f).reshape(-1, 1)
    j = np.arange(f).reshape(1, -1)
    ang = sign * 2.0 * np.pi * (k * j % f) / f
    return np.cos(ang), np.sin(ang)


def int8_dft_table(f: int, sign: int) -> tuple[np.ndarray, ...]:
    """The stacked complex DFT matrix [[Wr,-Wi],[Wi,Wr]] as len(_W_SHIFTS)
    int8 channels W ~= sum_k C_k 2^-shift_k (exact to 7*len(_W_SHIFTS)
    bits; the channel budget is tuned against the c128 gate — see the
    _W_SHIFTS comment)."""
    wr, wi = _dft_rw(f, sign)
    return _int8_channels(np.block([[wr, -wi], [wi, wr]]))


def int8_dft_table_folded(f: int, f_prev: int, sign: int):
    """Per-digit folded tables: the twiddle between the previous stage
    and this MXU tail (T[j_prev, i], |T|=1) pre-multiplied into the DFT
    matrix in f64, then channel-quantized — the df64 analog of the c64
    FOLD_LAST_TW: one entire df64 twiddle round (~100 VPU flops/element)
    vanishes for the same MXU madds.  Returns f_prev channel-tuples."""
    wr, wi = _dft_rw(f, sign)
    i = np.arange(f, dtype=np.int64)
    out = []
    for j in range(f_prev):
        ang = sign * 2.0 * np.pi * ((j * i) % (f_prev * f)) / (f_prev * f)
        tr, ti = np.cos(ang)[None, :], np.sin(ang)[None, :]
        wjr = wr * tr - wi * ti
        wji = wr * ti + wi * tr
        out.append(_int8_channels(np.block([[wjr, -wji], [wji, wjr]])))
    return tuple(out)


def _exp2_f32(e):
    """2^e for a (1, 1) int32 array e, |e| < 127, via exponent bitcast.
    (Mosaic's tpu.bitcast only accepts vectors, so the tile exponent is
    carried as a (1, 1) array, never a scalar.)"""
    bits = (e + jnp.int32(127)) << 23
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)


def _chunk_plane(p, m, shifts, dtype=jnp.int8):
    """Exact 7-bit channels of plane ``p`` at tile alignment 2^m:
    p ~= sum_k c_k 2^(m - shifts[k]) (progressive subtraction is exact).
    ``dtype`` int8 or bfloat16 — 7-bit ints are exact in both."""
    out = []
    r = p
    for s in shifts:
        sh = _exp2_f32(m - jnp.int32(s))
        inv = _exp2_f32(jnp.int32(s) - m)
        c = jnp.clip(jnp.round(r * inv), -127.0, 127.0)
        r = r - c * sh
        out.append(c.astype(dtype))
    return out


def _mxu_stage_df64(x, f, axis, wch, sign):
    """f-point DFT over ``axis`` of the df64 quad ``x`` via exact int8 MXU
    products.  Output digit prepended at axis 0 (dot_general convention)."""
    rh, rl, ih, il = x
    # reduce in place (no reshape(1, -1) flatten: that forces a full
    # row-major relayout in Mosaic before the reduction)
    a = jnp.maximum(jnp.abs(rh), jnp.abs(ih))
    amax = jnp.max(a).reshape(1, 1)                          # (1, 1) f32
    eb = (jax.lax.bitcast_convert_type(amax, jnp.int32) >> 23) & 0xFF
    m = jnp.clip(eb - 126, -40, 120)    # 2^m >= amax, clamped for safety

    # x channels: (int8 stacked [re; im] along ``axis``, shift)
    channels = []
    for cre, cim, s in zip(_chunk_plane(rh, m, _HI_SHIFTS),
                           _chunk_plane(ih, m, _HI_SHIFTS),
                           _HI_SHIFTS):
        channels.append((jnp.concatenate([cre, cim], axis=axis), s))
    for cre, cim, s in zip(_chunk_plane(rl, m, _LO_SHIFTS),
                           _chunk_plane(il, m, _LO_SHIFTS),
                           _LO_SHIFTS):
        channels.append((jnp.concatenate([cre, cim], axis=axis), s))

    dims = (((1,), (axis,)), ((), ()))
    pairs: dict = {}
    for wi, ws in enumerate(_W_SHIFTS):
        for ci, (_, xs_) in enumerate(channels):
            s = ws + xs_
            if s <= _KEEP:
                pairs.setdefault(s, []).append((wi, ci))

    # Iterate shift groups LEAST-significant first: groups at combined
    # shift >= _F32_ACC_MIN_S are summed in PLAIN f32 (their magnitudes
    # are <= 2^(m-s+18), so the f32 rounding contributes ~2^(m-41) —
    # below the df64 unit roundoff of the 2^(m+6)-scale stage output;
    # measured 6.0e-13 vs 5.9e-13 full-df64 end-to-end, probe_df64parts
    # cheapacc), then the df64 accumulation runs smallest-to-largest.
    # This replaces ~5 df_add rounds (12 VPU flops each) with plain adds
    # while keeping peak liveness at 3 planes (acc_h, acc_l, val) — the
    # ascending-order form kept a 4th live plane and rolled the n=2048
    # chain over the 100M scoped-VMEM limit (113.5M, r4c probe OOM).
    # Only ONE int32 partial is live at a time either way; per-group
    # int32 sums stay < 2^22 (proto bound 2.5e5), so the f32 conversion
    # is exact.
    # Per-pair dots, NOT one concat-K matmul per shift group: the
    # bit-identical concat-K form (weights concatenated on lanes, data
    # on the contraction axis, K = k*2T per group, 27 dispatches -> 9)
    # measured 3.835 ms vs 2.484 for this form in a same-window TPU A/B
    # (r4f 19:38Z) — Mosaic materializes the concatenated operands as
    # full VMEM relayouts every grid step, which costs far more than
    # the dispatch/fill savings.  The dots are MAC-shaped, not
    # dispatch-shaped; leave them separate.
    acc_h = acc_l = None
    for s in sorted(pairs, reverse=True):
        g = None
        for wi, ci in pairs[s]:
            y = jax.lax.dot_general(wch[wi], channels[ci][0], dims,
                                    preferred_element_type=jnp.int32)
            g = y if g is None else g + y
        val = g.astype(jnp.float32) * _exp2_f32(m - jnp.int32(s))
        if acc_h is None:
            acc_h, acc_l = val, jnp.zeros_like(val)
        elif s >= _F32_ACC_MIN_S:
            acc_h = acc_h + val         # plain f32: see comment above
        else:
            acc_h, acc_l = df_add(acc_h, acc_l, val, jnp.zeros_like(val))
    return acc_h[:f], acc_l[:f], acc_h[f:], acc_l[f:]


def _fold_applies_df64(factors) -> bool:
    return (len(factors) >= 2 and factors[-1] >= MXU_MIN_F
            and factors[-2] <= 8)


# Two-level fold (r4, VERDICT item 2 "fold a second twiddle round into the
# int8 tail"): for a 3-factor chain (f0, f1, T) the stage-0 Cooley-Tukey
# twiddle w_n^(k0*(j1*T+j2)) splits exactly into
#   w_{f0*f1}^(k0*j1)   — f0*f1 CONSTANTS, applied per (k0, j1) slice
#                         between the butterflies (trivial slices skipped),
#   w_n^(k0*j2)         — commutes past stage 1 (which acts on j1 only) and
#                         folds into the tail tables together with stage 1's
#                         own twiddle: w_n^(k0*j2) * w_{f1*T}^(k1*j2)
#                         = w_n^((k0 + f0*k1)*j2).
# After stage 1 the digit-prepend L index IS m = k0 + f0*k1, so the tail
# needs f0*f1 per-digit folded tables indexed by the L slice directly —
# int8_dft_table_folded(T, f0*f1, sign) already builds exactly these.
# Net: the LAST remaining full df64 twiddle round (~120 VPU flops/element)
# collapses to constant multiplies on ~2/3 of the elements.
# HAZARD (r4d 16:44Z): the unrolled f0*f1=32-group tail emits a 3.7 MB
# MLIR program that SIGKILLs the shared compile helper (OOM class, like
# the 512^2 df64 2D program) — interpret-mode parity is green
# (tests/test_df64.py::test_df64_fold2_chains) but the kernel cannot
# compile on this environment's service.  A batched-dot_general tail
# (groups as a dot_general batch dim) would shrink the program ~8x if
# Mosaic accepts it; until then this stays opt-in and OFF.
DF64_FOLD2 = False


def _fold2_applies_df64(factors, fold2=None) -> bool:
    if fold2 is None:
        fold2 = DF64_FOLD2
    if not (fold2 and len(factors) == 3
            and factors[0] in (2, 4, 8) and factors[1] in (2, 4, 8)
            and factors[-1] >= MXU_MIN_F):
        return False
    # table VMEM: f0*f1 per-digit channel sets of the stacked (2T, 2T)
    # int8 matrix — cap at 4 MiB (the (8,4,64) chain costs 3 MiB)
    q, t = factors[0] * factors[1], factors[-1]
    return q * len(_W_SHIFTS) * (2 * t) ** 2 <= (4 << 20)


def needed_tables_df64(n: int, sign: int, factors=None,
                       fold2=None) -> dict:
    """{("tw", i, factors): (trh, trl, tih, til)} inter-stage twiddles,
    plus ("wint8", f, sign): int8 DFT channels for MXU-stage factors —
    or ("wi8fold", factors): f_prev per-digit channel tuples (flattened)
    when the last twiddle round folds into the MXU tail, or
    ("wi8fold2", factors): f0*f1 per-digit tuples when BOTH twiddle
    rounds fold (two-level fold — see _fold2_applies_df64)."""
    factors = tuple(factors or default_factors_df64(n))
    assert math.prod(factors) == n
    m = len(factors)
    if _fold2_applies_df64(factors, fold2):
        groups = int8_dft_table_folded(factors[-1],
                                       factors[0] * factors[1], sign)
        return {("wi8fold2", factors): tuple(c for g in groups for c in g)}
    fold = _fold_applies_df64(factors)
    tables: dict = {}
    for i, f in enumerate(factors):
        if fold and i == m - 1:
            groups = int8_dft_table_folded(f, factors[m - 2], sign)
            tables[("wi8fold", factors)] = tuple(
                c for g in groups for c in g)
            continue
        if f >= MXU_MIN_F:
            tables.setdefault(("wint8", f, sign), int8_dft_table(f, sign))
        if i >= m - 1 or (fold and i == m - 2):
            continue
        rest = factors[i + 1:]
        r = math.prod(rest)
        k = np.arange(f).reshape(-1, 1)
        j = np.arange(r).reshape(1, -1)
        ang = sign * 2.0 * np.pi * (k * j) / (f * r)
        # rank-4 (f, 1, r, 1): broadcasts over the (digit, L, rest, lanes)
        # stage layout of tile_fft_df64 — rank stays <= 4 for any chain
        # length (the r2 multi-axis views cost ~2.5-3x in Mosaic relayouts)
        shape = (f, 1, r, 1)
        trh, trl = df64_const(np.cos(ang))
        tih, til = df64_const(np.sin(ang))
        tables[("tw", i, factors)] = tuple(
            a.reshape(shape) for a in (trh, trl, tih, til))
    return tables


# complex df64 value = (rh, rl, ih, il) tuple of arrays
def _cadd(x, y):
    rr = df_add(x[0], x[1], y[0], y[1])
    ii = df_add(x[2], x[3], y[2], y[3])
    return rr + ii


def _csub(x, y):
    rr = df_add(x[0], x[1], -y[0], -y[1])
    ii = df_add(x[2], x[3], -y[2], -y[3])
    return rr + ii


def _mul_pi(x, sign):
    """Multiply by (sign * i): exact plane swap."""
    rh, rl, ih, il = x
    if sign < 0:      # -i * (r + ii) = i - i r -> (im, -re)
        return (ih, il, -rh, -rl)
    return (-ih, -il, rh, rl)


def _slice4(planes, f):
    """The f digit slices of rank-4 (L, f, R, lanes) planes.  Axis 1 is
    third-from-minor, so each slice is a contiguous sublane-row range —
    no Mosaic relayout (the r2 form sliced ever-deeper axes of a
    rank-(m+1) view, which measured ~2.5-3x over static flop counts)."""
    return [tuple(p[:, j] for p in planes) for j in range(f)]


def _fft4_quads(xs, sign):
    """4-point DFT of 4 complex-df64 quads; returns the 4 output quads."""
    a = _cadd(xs[0], xs[2])
    b = _csub(xs[0], xs[2])
    c = _cadd(xs[1], xs[3])
    d = _csub(xs[1], xs[3])
    id_ = _mul_pi(d, sign)
    return [_cadd(a, c), _cadd(b, id_), _csub(a, c), _csub(b, id_)]


# sqrt(1/2) as a df64 constant (hi + lo carries ~2^-48 of the exact value)
_C_HI, _C_LO = (float(v) for v in df64_const(np.sqrt(np.float64(0.5))))


def _vconst(v):
    """A (1, 1) f32 vector constant: Mosaic's tpu.bitcast (inside the
    df64 Veltkamp split) only accepts vectors, so df64 scalar operands
    must be at least rank-2 arrays, never Python floats."""
    return jnp.full((1, 1), v, jnp.float32)


def _mul_w8_odd(x, k, sign):
    """x * w8^k for k in (1, 3), exact-to-df64: w8^1 = c(1 -+ i),
    w8^3 = c(-1 -+ i) with c = sqrt(1/2) (sign < 0: the -+ is -)."""
    rh, rl, ih, il = x
    ch, cl = _vconst(_C_HI), _vconst(_C_LO)
    # s = c*(re + im), d = c*(im - re) in df64
    sh, sl = df_add(rh, rl, ih, il)
    dh, dl = df_add(ih, il, -rh, -rl)
    sh, sl = df_mul(sh, sl, ch, cl)
    dh, dl = df_mul(dh, dl, ch, cl)
    if sign < 0:
        if k == 1:    # c(1-i): re' = c(r+m), im' = c(m-r)
            return (sh, sl, dh, dl)
        # k == 3, c(-1-i): re' = c(m-r), im' = -c(r+m)
        return (dh, dl, -sh, -sl)
    if k == 1:        # c(1+i): re' = c(r-m) = -d/..., im' = c(r+m)
        return (-dh, -dl, sh, sl)
    # k == 3, c(-1+i): re' = -c(r+m), im' = c(r-m)
    return (-sh, -sl, -dh, -dl)


def _butterfly_df64(f, planes, sign):
    """f-point DFT (f in 2, 4, 8) over axis 1 of an (L, f, R, lanes)
    complex-df64 quad.

    Radix-2/4: pure additions and +-i swaps — exact in df64.  Radix-8:
    fused 2x4 with the w8 constants as df64 scalars (~2^-48 each, the
    same error class as the inter-stage twiddles).  Output digit
    prepended at axis 0 (dot_general convention, matching c64).
    """
    xs = _slice4(planes, f)
    if f == 2:
        ys = [_cadd(xs[0], xs[1]), _csub(xs[0], xs[1])]
    elif f == 4:
        ys = _fft4_quads(xs, sign)
    elif f == 8:
        ev = [_cadd(xs[j], xs[4 + j]) for j in range(4)]
        od = [_csub(xs[j], xs[4 + j]) for j in range(4)]
        od[1] = _mul_w8_odd(od[1], 1, sign)
        od[2] = _mul_pi(od[2], sign)
        od[3] = _mul_w8_odd(od[3], 3, sign)
        a = _fft4_quads(ev, sign)    # k1 = 0
        b = _fft4_quads(od, sign)    # k1 = 1
        ys = [q for pair in zip(a, b) for q in pair]
    else:
        raise ValueError(f"df64 butterfly radix must be 2, 4 or 8, got {f}")
    return tuple(jnp.stack([y[k] for y in ys], axis=0) for k in range(4))


def _const_round_df64(y, f0, f1, sign):
    """The two-level fold's residual: multiply slice (k0, j1) of a
    (f0, 1, f1*T, lanes) quad by the CONSTANT w_{f0*f1}^(k0*j1).

    Trivial slices are free (k0=0 or j1=0: identity; m=q/2: negate;
    m=q/4, 3q/4: exact +-i plane swaps); the rest cost one df64
    constant cmul on a (T, lanes) slice — ~2/3 of the elements for the
    (8, 4, 64) chain, vs a full twiddle round on ALL elements.
    Slices/stacks touch only the two leading axes (rank-4 discipline)."""
    q = f0 * f1
    f1T = y[0].shape[2]
    lanes = y[0].shape[-1]
    y4 = tuple(p.reshape(f0, f1, f1T // f1, lanes) for p in y)
    consts = {}
    for mm in range(q):
        ang = sign * 2.0 * math.pi * mm / q
        ch, cl = df64_const(np.cos(np.float64(ang)))
        sh, sl = df64_const(np.sin(np.float64(ang)))
        consts[mm] = (float(ch), float(cl), float(sh), float(sl))
    cols = []
    for j1 in range(f1):
        rows = []
        for k0 in range(f0):
            s = tuple(p[k0, j1] for p in y4)            # (T, lanes)
            mm = (k0 * j1) % q
            if mm == 0:
                pass
            elif 2 * mm == q:
                s = tuple(-p for p in s)
            elif 4 * mm == q:
                s = _mul_pi(s, sign)
            elif 4 * mm == 3 * q:
                s = _mul_pi(s, -sign)
            else:
                ch, cl, sh, sl = (_vconst(v) for v in consts[mm])
                s = df_cmul(s[0], s[1], s[2], s[3], ch, cl, sh, sl)
            rows.append(s)
        cols.append(tuple(jnp.stack([r[k] for r in rows], axis=0)
                          for k in range(4)))           # (f0, T, lanes)
    out = tuple(jnp.stack([c[k] for c in cols], axis=1)
                for k in range(4))                      # (f0, f1, T, lanes)
    return tuple(p.reshape(f0, 1, f1T, lanes) for p in out)


def tile_fft_df64(planes, tables: dict, n: int, factors=None, sign=-1):
    """Length-n DFT over axis 0 of (n, lanes) df64 planar quad.

    Factors 2/4/8 run as exact VPU butterflies; factors >= MXU_MIN_F run
    as exact int8-split DFT contractions on the MXU (both prepend the
    output digit at axis 0, so they compose freely in one chain).  When
    the per-digit folded tail tables are present, the last df64 twiddle
    round is skipped entirely (it lives inside the int8 channels).

    Layout discipline (r3): every stage views the quad as rank-4
    (L, f, R, lanes) — L = digits emitted so far (newest major), R =
    factors still to come — so slices/stacks only ever touch the two
    leading axes and the minor (sublane, lane) pair is never disturbed.
    The r2 form kept one array axis per factor and sliced ever-deeper
    axes, which Mosaic paid for in relayouts (~2.5-3x over static flop
    counts on the VPU chains)."""
    lanes = planes[0].shape[-1]
    factors = tuple(factors or default_factors_df64(n))
    m = len(factors)
    fold = ("wi8fold", factors) in tables
    fold2 = ("wi8fold2", factors) in tables
    L, R = 1, n
    x = tuple(p.reshape(1, n, lanes) for p in planes)   # (L, f*R, lanes)
    for i, f in enumerate(factors):
        R //= f
        if (fold or fold2) and i == m - 1:
            key = ("wi8fold2", factors) if fold2 else ("wi8fold", factors)
            flat = tables[key]
            nch = len(_W_SHIFTS)
            groups = factors[0] * factors[1] if fold2 else factors[m - 2]
            x4 = tuple(p.reshape(groups, L // groups, f, lanes) for p in x)
            outs = []
            for j in range(groups):
                xj = tuple(p[j] for p in x4)            # (L/groups, f, lanes)
                wch = flat[j * nch:(j + 1) * nch]
                outs.append(_mxu_stage_df64(xj, f, 1, wch, sign))
            x = tuple(jnp.stack([o[k] for o in outs], axis=1)
                      for k in range(4))         # (f, groups, L/groups, ln)
            break
        x4 = tuple(p.reshape(L, f, R, lanes) for p in x)
        if f >= MXU_MIN_F:
            y = _mxu_stage_df64(x4, f, 1, tables[("wint8", f, sign)], sign)
        else:
            y = _butterfly_df64(f, x4, sign)            # (f, L, R, lanes)
        if fold2:
            # both twiddle rounds live in the tail tables; only the
            # residual w_{f0*f1}^(k0*j1) constants remain after stage 0
            if i == 0:
                y = _const_round_df64(y, factors[0], factors[1], sign)
        elif i < m - 1 and not (fold and i == m - 2):
            trh, trl, tih, til = tables[("tw", i, factors)]   # (f, 1, R, 1)
            y = df_cmul(y[0], y[1], y[2], y[3], trh, trl, tih, til)
        L *= f
        x = tuple(p.reshape(L, R, lanes) for p in y)
    return tuple(p.reshape(n, lanes) for p in x)


def _apply_post(x, postscale):
    if postscale == 1.0:
        return x
    m, e = math.frexp(postscale)
    if m == 0.5:      # exact power of two (the normalize=1/N case)
        rh, rl = df_scale_pow2(x[0], x[1], postscale)
        ih, il = df_scale_pow2(x[2], x[3], postscale)
        return (rh, rl, ih, il)
    sh, sl = df64_const(np.float64(postscale))
    # rank-2 vector constants: Mosaic's tpu.bitcast inside the df64
    # split rejects scalar operands (same issue as _exp2_f32)
    sh, sl = _vconst(float(sh)), _vconst(float(sl))
    z = _vconst(0.0)
    return df_cmul(x[0], x[1], x[2], x[3], sh, sl, z, z)


def _row_kernel_df64(n, layout, postscale, factors, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    ins = refs[nt:nt + 4]
    outs = refs[nt + 4:nt + 8]
    x = tuple(r[:].T for r in ins)
    x = tile_fft_df64(x, tables, n, factors, sign)
    x = _apply_post(x, postscale)
    for o, p in zip(outs, x):
        o[:] = p.T


def _col_kernel_df64(n, layout, postscale, factors, sign, tw_kind, tw_qdiv,
                     swap, swap_mid, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    pos = nt
    tw = tb = None
    if tw_kind in ("full", "strided"):
        tw = tuple(refs[pos + j] for j in range(4))
        pos += 4
    elif tw_kind == "factored":
        tw = tuple(refs[pos + j] for j in range(4))
        tb = tuple(refs[pos + 4 + j] for j in range(4))
        pos += 8
    ins = refs[pos:pos + 4]
    outs = refs[pos + 4:pos + 8]
    x = tuple(r[0] for r in ins)
    x = tile_fft_df64(x, tables, n, factors, sign)
    if tw_kind == "full":
        # fused inter-pass twiddle: T[k, j2] with j2 = this tile's lanes
        x = df_cmul(x[0], x[1], x[2], x[3],
                    tw[0][:], tw[1][:], tw[2][:], tw[3][:])
    elif tw_kind == "strided":
        # twiddle constant across each lane tile: one row of the
        # transposed-resident (Q, n) tables, selected by the grid index
        # (the multi-level inner-pass form — see the c64 _col_kernel)
        q = pl.program_id(1) // tw_qdiv
        trh, trl, tih, til = (t[pl.ds(q, 1), :].T for t in tw)   # (n, 1)
        x = df_cmul(x[0], x[1], x[2], x[3], trh, trl, tih, til)
    elif tw_kind == "factored":
        # T[k, q*lanes + r] = A[k, q] * B[k, r]: phases add exactly, the
        # df64 product costs one ~2^-48 rounding — far inside the 1e-11
        # gate.  A transposed-resident (Q, n) quad, B an (n, lanes) quad.
        q = pl.program_id(1)
        arh, arl, aih, ail = (t[pl.ds(q, 1), :].T for t in tw)   # (n, 1)
        brh, brl, bih, bil = (t[:] for t in tb)
        trh, trl, tih, til = df_cmul(arh, arl, aih, ail,
                                     brh, brl, bih, bil)
        x = df_cmul(x[0], x[1], x[2], x[3], trh, trl, tih, til)
    x = _apply_post(x, postscale)
    for o, p in zip(outs, x):
        if swap:
            o[0] = p.T
        elif swap_mid:
            o[0, 0] = p
        else:
            o[0] = p


def _vmem_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
        dimension_semantics=("parallel",) * 2)


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "lanes", "fold2"))
def _fft_rows_df64(rh, rl, ih, il, *, n, sign, postscale, interpret,
                   factors=None, lanes=LANES, fold2=None):
    with jax.enable_x64(False):   # Mosaic rejects x64-typed traces
        factors = tuple(factors or default_factors_df64(n))
        tables = needed_tables_df64(n, sign, factors, fold2)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        rows = rh.shape[0]
        grid = (pl.cdiv(rows, lanes),)
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((lanes, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_row_kernel_df64, n, layout, postscale,
                                 factors, sign)
        oshape = (jax.ShapeDtypeStruct((rows, n), jnp.float32),) * 4
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=tspec + [dspec] * 4,
            out_specs=(dspec,) * 4,
            out_shape=oshape,
            cost_estimate=pl.CostEstimate(
                flops=300 * rows * n * max(1, len(factors)),
                bytes_accessed=rows * n * 4 * 8,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*flat, rh, rl, ih, il)


def _df64_quad(cos_f64: np.ndarray, sin_f64: np.ndarray,
               transpose: bool = False):
    """[cos_hi, cos_lo, sin_hi, sin_lo] f32 arrays from f64 tables."""
    out = []
    for tab in (cos_f64, sin_f64):
        hi, lo = df64_const(tab)
        if transpose:
            hi, lo = hi.T.copy(), lo.T.copy()
        out += [jnp.asarray(hi), jnp.asarray(lo)]
    return out


def _phases(rows, cols, tw_n, sign, col_stride: int = 1):
    r = np.arange(rows, dtype=np.int64)[:, None]
    c = (np.arange(cols, dtype=np.int64) * col_stride) % tw_n
    ang = sign * 2.0 * np.pi * ((r * c) % tw_n) / tw_n
    return np.cos(ang), np.sin(ang)


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "lanes", "tw_n",
    "tw_mode", "tw_period", "swap_store", "swap_mid", "fold2"))
def _fft_cols_df64(rh, rl, ih, il, *, n, sign, postscale, interpret,
                   factors=None, lanes=LANES, tw_n: int = 0,
                   tw_mode: str = "full", tw_period: int = 0,
                   swap_store: bool = False, swap_mid: int = 0,
                   fold2=None):
    with jax.enable_x64(False):
        factors = tuple(factors or default_factors_df64(n))
        tables = needed_tables_df64(n, sign, factors, fold2)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        L, _, T = rh.shape
        grid = (L, pl.cdiv(T, lanes))
        tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        extra = []
        tw_kind = None
        if tw_n and tw_mode == "full":
            tw_kind = "full"
            extra = _df64_quad(*_phases(n, T, tw_n, sign))
            tspec = tspec + [pl.BlockSpec((n, lanes), lambda i, j: (0, j),
                                          memory_space=pltpu.VMEM)] * 4
        elif tw_n and tw_mode == "factored":
            tw_kind = "factored"
            # A stored transposed (T/lanes, n), resident whole (Mosaic
            # rejects (n, 1) minor-dim blocks; a sublane-dim slice is free)
            extra = (_df64_quad(*_phases(n, T // lanes, tw_n, sign, lanes),
                                transpose=True)
                     + _df64_quad(*_phases(n, lanes, tw_n, sign)))
            tspec = tspec + [pl.BlockSpec((T // lanes, n),
                                          lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)] * 4 \
                          + [pl.BlockSpec((n, lanes), lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)] * 4
        elif tw_n:
            assert tw_mode == "strided", tw_mode
            tw_kind = "strided"
            assert tw_period % lanes == 0 and T % tw_period == 0, \
                (tw_period, lanes, T)
            extra = _df64_quad(*_phases(n, T // tw_period, tw_n, sign),
                               transpose=True)
            tspec = tspec + [pl.BlockSpec((T // tw_period, n),
                                          lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)] * 4
        dspec = pl.BlockSpec((1, n, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
        if swap_store:
            assert not swap_mid
            ospec = pl.BlockSpec((1, lanes, n), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
            oshape = (jax.ShapeDtypeStruct((L, T, n), jnp.float32),) * 4
        elif swap_mid:
            assert swap_mid % lanes == 0 and T % swap_mid == 0, (swap_mid, T)
            kq = swap_mid // lanes
            ospec = pl.BlockSpec(
                (1, 1, n, lanes),
                lambda i, j, _k=kq: (i, j // _k, 0, j % _k),
                memory_space=pltpu.VMEM)
            oshape = (jax.ShapeDtypeStruct((L, T // swap_mid, n, swap_mid),
                                           jnp.float32),) * 4
        else:
            ospec = dspec
            oshape = (jax.ShapeDtypeStruct((L, n, T), jnp.float32),) * 4
        tw_qdiv = max(1, tw_period // lanes) if tw_kind == "strided" else 1
        kern = functools.partial(_col_kernel_df64, n, layout, postscale,
                                 factors, sign, tw_kind, tw_qdiv,
                                 swap_store, bool(swap_mid))
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=tspec + [dspec] * 4,
            out_specs=(ospec,) * 4,
            out_shape=oshape,
            cost_estimate=pl.CostEstimate(
                flops=300 * L * n * T * max(1, len(factors)),
                bytes_accessed=L * n * T * 4 * 8,
                transcendentals=0),
            compiler_params=_vmem_params(),
            interpret=interpret,
        )(*flat, *extra, rh, rl, ih, il)


def supported(rh, axis: int, max_local: int | None = None) -> bool:
    """Whether the df64 kernels cover this plane/axis (f32 hi plane)."""
    if rh.dtype != jnp.float32:
        return False
    axis = axis % rh.ndim
    n = rh.shape[axis]
    max_local = max_local or MAX_LOCAL_N_DF64
    if not is_power_of_two(n):
        return False
    if _MIN_N <= n <= max_local:
        pass
    elif max_local < n <= max_local * max_local and axis == rh.ndim - 1:
        n1, n2 = _choose_split_df64(n, max_local)
        return LANES <= n1 <= max_local and LANES <= n2 <= max_local
    elif n > max_local * max_local and axis == rh.ndim - 1:
        return supported_huge(rh, axis)
    else:
        return False
    if axis == rh.ndim - 1:
        return True
    trail = math.prod(rh.shape[axis + 1:])
    return trail >= LANES


def supported_huge(rh, axis: int, max_f: int | None = None) -> bool:
    """Whether the two-level df64 chain covers this plane/axis."""
    if rh.dtype != jnp.float32:
        return False
    axis = axis % rh.ndim
    if axis != rh.ndim - 1:
        return False
    n = rh.shape[axis]
    if not (is_power_of_two(n)
            and n > MAX_LOCAL_N_DF64 * MAX_LOCAL_N_DF64):
        return False
    from pyfft_tpu.ops.fourstep import choose_split3
    try:
        choose_split3(n, max_f or HUGE_MAX_F_DF64)
    except ValueError:
        return False
    return True


def fft_axis_df64(planes, sign, *, axis, postscale: float = 1.0,
                  interpret: bool | None = None, factors=None,
                  tw_n: int = 0, tw_mode: str = "full", tw_period: int = 0,
                  swap_store: bool = False, swap_mid: int = 0,
                  fast_math: bool = True, fold2: bool | None = None):
    """DFT along ``axis`` of a complex-df64 planar quad (rh, rl, ih, il).

    ``fast_math=False`` selects the all-butterfly chain (exact adds, df64
    twiddles only: ~1e-13) where its compile ceiling allows (n <= 2048);
    the default int8-MXU tail chain is ~1e-12 — both inside the 1e-11
    contract gate.
    """
    rh = planes[0]
    axis = axis % rh.ndim
    n = rh.shape[axis]
    if interpret is None:
        interpret = _interpret_default()
    _butterfly_env = os.environ.get(
        "PYFFT_TPU_DF64_BUTTERFLY", "").lower() in ("1", "true", "yes", "on")
    if (factors is None and n <= 2048
            and (not fast_math or _butterfly_env)):
        # the precise butterfly chain.  The env override exists because
        # fresh compiles of int8-MXU-tail df64 kernels HANG indefinitely
        # on this environment's 2026-08-20 compile service (r5 bisection:
        # fresh c64 kernels compile in ~2 min, butterfly-only df64 in
        # ~3 min, every int8-tail df64 >50 min without returning —
        # docs/design.md round-5 log); butterfly chains keep c128 usable
        # on such a service at the precise-chain speed.
        factors = default_factors_df64(n)
    if factors is None and n >= 64:
        # int8-MXU tail chains replace the small-rest butterfly stages
        # (the expensive ones) with one exact MXU contraction: measured
        # 17% faster than all-butterfly at n=2048 and 6.9e-13 on TPU
        factors = mxu_factors_df64(n)
    factors = tuple(factors or default_factors_df64(n))
    has_mxu = any(f >= MXU_MIN_F for f in factors)
    kw = dict(n=n, sign=sign, postscale=float(postscale),
              interpret=bool(interpret), factors=factors, fold2=fold2)
    shape = rh.shape
    if axis == rh.ndim - 1:
        assert not tw_n and not swap_store and not swap_mid
        lead = shape[:-1]
        rows = math.prod(lead) if lead else 1
        pad = (-rows) % LANES if has_mxu else 0
        # the int8-MXU stage's per-tile alignment reads max|x| over the
        # whole block; Pallas pads partial edge blocks with unspecified
        # values, so MXU chains must see whole lane tiles only
        ins = tuple(p.reshape(rows, n) for p in planes)
        if pad:
            ins = tuple(jnp.pad(p, ((0, pad), (0, 0))) for p in ins)
        out = _fft_rows_df64(*ins, **kw)
        if pad:
            out = tuple(p[:rows] for p in out)
        return tuple(p.reshape(*lead, n) for p in out)
    lead = math.prod(shape[:axis]) if axis else 1
    trail = math.prod(shape[axis + 1:])
    if has_mxu and trail % LANES:
        # not an assert: the MXU stage's per-tile amax reads the whole
        # block including Pallas's unspecified edge-pad values, so a
        # misaligned trail means silent corruption — and asserts vanish
        # under python -O.  Internal callers are guarded by supported().
        raise ValueError(
            f"int8-MXU column pass needs the trailing extent ({trail}) to "
            f"be a whole number of {LANES}-lane tiles; pass an "
            f"all-butterfly factor chain (factors=) for this shape instead")
    out = _fft_cols_df64(*(p.reshape(lead, n, trail) for p in planes),
                         tw_n=tw_n, tw_mode=tw_mode, tw_period=tw_period,
                         swap_store=swap_store, swap_mid=swap_mid, **kw)
    if swap_store:
        oshape = shape[:axis] + shape[axis + 1:] + (n,)
        return tuple(p.reshape(oshape) for p in out)
    if swap_mid:
        oshape = shape[:axis] + (trail // swap_mid, n, swap_mid)
        return tuple(p.reshape(oshape) for p in out)
    return tuple(p.reshape(shape) for p in out)


def _choose_split_df64(n: int, max_local: int) -> tuple[int, int]:
    """Balanced (n1, n2) split, unless this machine's autotune record
    (``dsplit:{n}`` — utils/tune) has measured a better one."""
    from pyfft_tpu.ops.fourstep import _tuned_split
    t = _tuned_split("dsplit", n, 2, max_local, LANES)
    if t is not None:
        return t
    p = n.bit_length() - 1
    p1 = (p + 1) // 2
    return 1 << p1, 1 << (p - p1)


def fft_axis_large_df64(planes, sign, *, axis, postscale: float = 1.0,
                        max_local: int | None = None,
                        swap_max: int | None = None,
                        interpret: bool | None = None,
                        fast_math: bool = True,
                        split: tuple[int, int] | None = None):
    """Four-step df64 DFT over the last axis.

    Two forms, chosen by the measured compile ceilings:

    * two-pass (n <= swap_max * max_local): column pass with fused twiddle
      and digit-swapped store, then a second column pass — the same
      structure as the c64 path in ops/fourstep.py;
    * three-pass (up to max_local^2): column pass with fused twiddle (no
      swap), row pass with the scale folded in, then one XLA digit-swap
      transpose of the four f32 planes.

    ``split`` forces a specific (n1, n2) — the autotuner's hook.
    """
    rh = planes[0]
    axis = axis % rh.ndim
    assert axis == rh.ndim - 1
    n = rh.shape[-1]
    max_local = max_local or MAX_LOCAL_N_DF64
    swap_max = swap_max or min(SWAP_MAX_DF64, max_local)
    n1, n2 = split or _choose_split_df64(n, max_local)
    if n1 * n2 != n:
        raise ValueError(f"split {n1}x{n2} does not factor n={n}")
    lead = rh.shape[:-1]
    if n1 > swap_max and n2 <= swap_max:
        n1, n2 = n2, n1
    x = tuple(p.reshape(*lead, n1, n2) for p in planes)
    if n1 <= swap_max:
        x = fft_axis_df64(x, sign, axis=-2, tw_n=n, swap_store=True,
                          interpret=interpret, fast_math=fast_math)
        x = fft_axis_df64(x, sign, axis=-2, postscale=postscale,
                          interpret=interpret, fast_math=fast_math)
        return tuple(p.reshape(*lead, n) for p in x)
    # three-pass form: too big for the swap-store kernel
    x = fft_axis_df64(x, sign, axis=-2, tw_n=n, interpret=interpret,
                      fast_math=fast_math)
    x = fft_axis_df64(x, sign, axis=-1, postscale=postscale,
                      interpret=interpret, fast_math=fast_math)
    return tuple(jnp.swapaxes(p, -1, -2).reshape(*lead, n) for p in x)


def fft_axis_huge_df64(planes, sign, *, axis, postscale: float = 1.0,
                       max_f: int | None = None,
                       interpret: bool | None = None,
                       fast_math: bool = True):
    """Two-level (six-step) df64 DFT for n beyond one four-step level.

    The c128 analog of ops/fourstep.fft_axis_huge — the reference's
    double path had no upper bound (SURVEY §2.9-bis), and neither does
    this chain in principle (max_f^3 = 2^33 points, beyond any HBM):

      n = n1*m1*m2, view (..., n1, m1*m2):
      1. col FFT over j1 + FACTORED level-1 twiddle w_n^(k1*j2)
         (A/B df64 quads, O(n1*n2/128) memory), digit-swap store
         -> (..., m1, m2, k1)
      2. col FFT over i1 + STRIDED level-2 twiddle w_{m1*m2}^(q1*i2)
         (constant per lane tile), mid-swap store with period n1
         -> (..., m2, q1, k1)
      3. col FFT over i2, postscale folded -> flattened DFT order.

    Every pass carries a fused twiddle or swap, so factors stay at the
    measured df64 tw+swap compile ceiling (HUGE_MAX_F_DF64).
    """
    from pyfft_tpu.ops.fourstep import choose_split3
    rh = planes[0]
    axis = axis % rh.ndim
    assert axis == rh.ndim - 1, "huge path covers the last axis"
    n = rh.shape[-1]
    n1, m1, m2 = choose_split3(n, max_f or HUGE_MAX_F_DF64)
    n2 = m1 * m2
    lead = rh.shape[:-1]
    x = tuple(p.reshape(*lead, n1, n2) for p in planes)
    x = fft_axis_df64(x, sign, axis=-2, tw_n=n, tw_mode="factored",
                      swap_store=True, interpret=interpret,
                      fast_math=fast_math)
    # now (..., j2, k1) = (..., m1, m2*n1) viewing j2 = i1*m2 + i2
    x = tuple(p.reshape(*lead, m1, m2 * n1) for p in x)
    x = fft_axis_df64(x, sign, axis=-2, tw_n=n2, tw_mode="strided",
                      tw_period=n1, swap_mid=n1, interpret=interpret,
                      fast_math=fast_math)
    # mid-swap output: (..., m2, m1, n1) = (i2, q1, k1)
    x = tuple(p.reshape(*lead, m2, m1 * n1) for p in x)
    x = fft_axis_df64(x, sign, axis=-2, postscale=postscale,
                      interpret=interpret, fast_math=fast_math)
    return tuple(p.reshape(*lead, n) for p in x)
