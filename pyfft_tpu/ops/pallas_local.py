"""Fused VMEM-resident Pallas FFT kernel (the "local" executor).

TPU-native analog of the reference's LocalFFTKernel (``pyfft/kernel.py``,
SURVEY.md §2.3): one kernel performs the whole length-N transform for a tile
of the batch with all radix stages fused, so the data makes exactly **one**
HBM→VMEM→HBM round trip.  (The pure-XLA path materializes each four-step
level's transposes in HBM, ~6 round trips; on v5e that is the difference
between ~0.4 and multi-TFLOP/s effective rates.)

Layout — the key TPU-first decision (found by probing Mosaic's layout rules):
the tile is **(n, 128): transform along sublanes, batch along lanes**.  Every
radix stage is then a `dot_general` *from the left* over the leading axis,

    stage A   C[k1,j2,b] = sum_j1 W1[k1,j1] * x[j1,j2,b]      (MXU)
    stage B   C *= T[k1,j2]  (broadcast over lanes)           (VPU)
    stage C   X[k2,k1,b] = sum_j2 W2[k2,j2] * C[k1,j2,b]      (MXU)

and — because dot_general prepends the contracted-out index — stage C's
output rows flatten to exactly k2*n1 + k1, the DFT output order.  No
bit-reversal, no 3D minor transposes, no lane-splitting reshapes (all of
which Mosaic either rejects or lowers to slow shuffles); the minor dimension
stays a full 128 lanes through the whole kernel.  User data arrives
batch-major, so the kernel brackets the math with one in-VMEM 2D transpose
on load and one on store — still a single HBM round trip.

How the GPU structure maps here:

  reference (GPU)                      this kernel (TPU)
  ---------------------------------   -----------------------------------
  radix-2/4/8 register butterflies    DFT-matrix contractions on the MXU
  twiddle via sincos() per thread     f64-precomputed tables resident in VMEM
  shared-memory transposes            none (dot_general's index ordering)
  bit-reversal index maps             none (four-step output ordering)
  block-size halving on overflow      static VMEM capacity model (planner)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyfft_tpu.ops.twiddle import dft_matrix, twiddle_table
from pyfft_tpu.utils.radix import is_power_of_two

__all__ = ["supported", "fft_axis", "tile_fft", "MAX_LOCAL_N", "LANES"]

# Lanes per tile = batch rows processed per grid step.
LANES = 128

# Largest axis the local kernel owns: (n, 128) io planes at n=8192 are
# 4 MiB each; in+out+temporaries still fit VMEM (measured: n=8192 compiles
# and runs at 752 GF single-pass, beating the 3-pass four-step).  Larger
# axes take the four-step global path.
MAX_LOCAL_N = 8192

_MIN_N = 8

# Matmul precision for the DFT contractions.  Mosaic lowers only DEFAULT
# (1-pass bf16, err ~3e-3: fails the 1e-6 gate) and HIGHEST (6-pass bf16,
# err ~1.5e-7).  A 3-pass hi/lo split was measured at ~4e-6 — two bf16
# mantissas carry only 16 of f32's 24 bits — so HIGHEST it is.
_PRECISION = "highest"

_PREC_MAP = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def stage_cost(f: int) -> int:
    """Modeled per-element cost of one f-point stage, TPU-calibrated.

    MXU stages (f >= 64): one dense stacked (2f, 2f) matmul — every tile of
    the systolic array fully used, cost ~ 4f madds/element.  MXU stages
    below 64 run at (2f/128)^2 occupancy (cost 16384/f) and are never
    optimal.  Factors 2 and 4 run as exact VPU butterflies (add/sub chains,
    +-i swaps); their constants are calibrated so the DP reproduces the
    measured rankings on v5e: n=4096 (4,4,4,64) beats (64,64); n=256
    (4,64)/(2,128) beat (256,) ~5x; 128-point single stages stay single.
    """
    if f == 2:
        return 100
    if f == 4:
        return 64
    return 4 * f if f >= 64 else 16384 // f


# Column-kernel factor overrides (scan-chain measured, v5e round 2-3):
# at n=2048 the parity rule's 128-wide MXU stage makes the column kernel
# compute-bound (1.56 ms vs 1.22 for a 32-wide stage on the 2^22 four-step
# shape); the row kernel at the same n prefers the production chain.
# n=1024/4096: radix-8 + folded-twiddle chains measured 14%/22% faster
# than the radix-4 chains on the 2^22 four-step shapes (probe_fold2, r3;
# col1024 (8,2,64) reached 0.93x of the concurrent copy bandwidth).
# autotune r3 (benchmarks/tuned_v5e.json): col2048 (8,4,64) 0.383 ms vs
# 0.635 for the old (4,4,4,32) (+66%); col256 (8,32) 0.422 vs 0.480.
COL_FACTORS = {2048: (8, 4, 64), 1024: (8, 2, 64), 4096: (8, 8, 64),
               256: (8, 32)}

# Row-kernel overrides (autotune-measured, v5e round 2-3): a late radix-2
# ahead of a 64-wide MXU stage beats the parity rule's 128-wide stage by
# 46% at n=2048 (0.283 vs 0.414 ms on the 2^23-element tuned shape).
# n=4096: radix-8 butterflies + folded last twiddle measured 0.607 ms
# vs 0.756 (fold-4.4.4.64) / 0.786 (unfolded) in the same load window —
# fewer VPU stage/twiddle rounds, the measured wall (probe_fold, r3).
# autotune r3: row1024 (8,2,64) 0.568 ms vs 0.727 for (4,4,64) (+28%).
ROW_FACTORS = {2048: (4, 4, 2, 64), 4096: (8, 8, 64), 1024: (8, 2, 64)}

# Autotuned overrides (utils/tune.autotune persists measured winners per
# machine); consulted before the static tables.
_TUNED: dict | None = None


def reload_tuned() -> None:
    global _TUNED
    from pyfft_tpu.utils.tune import load_tuned
    _TUNED = load_tuned()


def _tuned_factors(kind: str, n: int):
    global _TUNED
    if _TUNED is None:
        reload_tuned()
    v = _TUNED.get(f"{kind}:{n}")
    return tuple(v) if v else None


def col_factors(n: int) -> tuple[int, ...]:
    return (_tuned_factors("col", n) or COL_FACTORS.get(n)
            or default_factors(n))


def row_factors(n: int) -> tuple[int, ...]:
    return (_tuned_factors("row", n) or ROW_FACTORS.get(n)
            or default_factors(n))


@functools.lru_cache(maxsize=None)
def default_factors(n: int) -> tuple[int, ...]:
    """TPU-calibrated factorization: radix-4 VPU butterflies in front of
    one full-width MXU stage.

    Replaces the reference's fixed radix-8/4/2 ladder (``getRadixArray``,
    pyfft/kernel_helpers.py): on TPU the tradeoff is MXU occupancy vs madds
    vs VPU butterfly work.  Measured on v5e: (4,4,4,64) beats (64,64) at
    n=4096 by 15-50%; (4,64) beats the single 256-point contraction ~5x;
    butterfly-LAST chains like (64,4) are ~4x slower than butterfly-first
    (the late small-factor axis sits badly in the tile layout), hence the
    fixed prefix ordering.  The MXU stage is 64 or 128 — whichever parity
    makes the remainder a whole number of radix-4s (always possible).
    """
    if n <= _MIN_N:
        return (n,)
    p = n.bit_length() - 1
    if p < 6:
        return (n,)               # cold small sizes: one matmul stage
    mxu = 64 if (p - 6) % 2 == 0 else 128
    r = p - (mxu.bit_length() - 1)
    return (4,) * (r // 2) + (mxu,)


# Factors executed as exact VPU butterflies (twiddle-free add/sub chains)
# instead of DFT-matrix contractions: a 2- or 4-point "matmul" would run
# the 128x128 systolic array at <0.1% occupancy, while the butterfly is a
# handful of f32 adds per element on the VPU.  Radix-8 is a fused 2x4
# chain with the w8 twiddle constants inlined (two sqrt(2)/2 roundings
# per 8 outputs — far under the 2e-6 gate): one fewer stage round and one
# fewer inter-stage twiddle/materialization round than 4,4 — the VPU
# data-movement rounds, not the adds, are what the r3 probes measured as
# the headline kernel's wall (benchmarks/probe_headline*.py).
VPU_RADICES = (2, 4, 8)

# Fold the twiddle between the last butterfly stage and the final MXU
# stage into per-digit DFT matrices: T[k_prev, j] depends only on the
# previous stage's digit and the MXU stage's input index, so the single
# stacked contraction becomes f_prev contractions with W_j = W * diag(T[j])
# (same MXU madds — each slice is 1/f_prev of the tile — and one entire
# VPU twiddle round is gone; host-folded in f64, so one FEWER f32
# rounding).  Module-level so every kernel (row/col/swap/fused2d) builds
# the same tables; flip only at process start (jit caches key on factors,
# not this flag).
FOLD_LAST_TW = True

# Largest axis for the butterfly-only (fast_math=False) factor chains: the
# same compile-safety consideration as the df64 kernels' 2048 ceiling —
# deep butterfly chains hold ~n*lanes live values that Mosaic spills.
MAX_BUTTERFLY_N = 2048


def butterfly_factors(n: int) -> tuple[int, ...]:
    """All-butterfly factor chain (radix-4 with one leading 2 for odd log2).

    The ``fast_math=False`` chain (reference: precise trig instead of
    ``native_sin``/``native_cos`` — SURVEY.md §2.9-bis): every stage is an
    exact VPU add/sub butterfly, so the only rounding is the f32 inter-stage
    twiddle multiplies — no bf16 MXU passes anywhere.  Slower (VPU-bound)
    but measurably more accurate than the MXU chains.
    """
    p = n.bit_length() - 1
    if p % 2:
        return (2,) + (4,) * (p // 2)
    return (4,) * (p // 2)


def precise_factors(n: int) -> tuple[int, ...] | None:
    """Factor chain for fast_math=False, or None where the butterfly-only
    chain is not compile-safe (n > MAX_BUTTERFLY_N: the default MXU chain,
    which still holds the documented tolerance gate, is used instead)."""
    if _MIN_N <= n <= MAX_BUTTERFLY_N and is_power_of_two(n):
        return butterfly_factors(n)
    return None


# int8-split exact MXU mode for c64 (precision="int8"): W in 3 7-bit
# channels (21 bits), x in 4 (28 bits), keeping pair shifts <= 35 -> 9
# exact int8 matmuls ~ 4.5 bf16-equivalents vs HIGHEST's 6 passes, with
# measured stage error 4.7e-7 (gate 2e-6).  MEASURED SLOWER end to end on
# v5e (col n=2048: 7.0 vs 1.5 ms; row n=4096: 3.5 vs 0.8): the VPU chunk
# extraction + int8 relayouts swamp c64's small per-element compute budget
# (for df64, whose budget is ~10x, the same idea wins ~1.8x).  Kept as a
# correct optional mode; not selected by any default.
_I8_B = 7
_I8_W_SHIFTS = tuple(_I8_B * (i + 1) for i in range(3))
_I8_X_SHIFTS = tuple(_I8_B * (i + 1) for i in range(4))
_I8_KEEP = 35


def _int8_chunks_np(x: np.ndarray, shifts) -> tuple[np.ndarray, ...]:
    out = []
    r = np.asarray(x, np.float64)
    for s in shifts:
        c = np.clip(np.rint(r * 2.0 ** s), -127, 127)
        r = r - c * 2.0 ** (-s)
        out.append(c.astype(np.int8))
    return tuple(out)


def _fold_applies(factors, stacked: bool, precision: str) -> bool:
    """Whether the last inter-stage twiddle folds into the final MXU stage
    (see FOLD_LAST_TW): final factor is a stacked-matrix contraction, at
    least one stage precedes it, and the per-digit table count is small."""
    return (FOLD_LAST_TW and stacked and precision != "int8"
            and len(factors) >= 2 and factors[-1] not in VPU_RADICES
            and factors[-2] <= 8)


def needed_tables(n: int, sign: int, dtype=np.float32, factors=None,
                  stacked: bool = True, precision: str = _PRECISION,
                  trail_ndim: int = 1) -> dict:
    """Ordered {key: (real, imag)} numpy tables for a length-n tile FFT.

    With ``stacked`` the DFT matrices are stored in the 2x2 real-stacked
    form [[Wr, -Wi], [Wi, Wr]] so a complex contraction is one real matmul
    with doubled K — full MXU width even for 64-point factors.
    VPU-butterfly factors need no DFT matrix, only inter-stage twiddles.
    ``precision="int8"`` stores the stacked matrix as 3 int8 channels
    instead (exact quantized products — see _I8_* constants).
    When the fold applies (FOLD_LAST_TW), the last twiddle round is
    pre-multiplied into f_prev per-digit stacked matrices on the host
    (f64-exact, rounded once).
    """
    factors = tuple(factors or default_factors(n))
    assert math.prod(factors) == n
    m = len(factors)
    fold = _fold_applies(factors, stacked, precision)
    tables: dict = {}
    for i, f in enumerate(factors):
        if fold and i == m - 1:
            wr, wi = dft_matrix(f, sign, np.float64)
            f_prev = factors[m - 2]
            tr, ti = twiddle_table(f_prev, f, f_prev * f, sign, np.float64)
            mats = []
            for j in range(f_prev):
                # W_j[k, i] = W[k, i] * T[j, i]: scale W's columns
                wjr = wr * tr[j][None, :] - wi * ti[j][None, :]
                wji = wr * ti[j][None, :] + wi * tr[j][None, :]
                mats.append(np.block([[wjr, -wji],
                                      [wji, wjr]]).astype(dtype))
            tables[("dftsfold", factors)] = tuple(mats)
            continue
        if f not in VPU_RADICES:
            wr, wi = dft_matrix(f, sign, np.float64)
            if precision == "int8":
                ws = np.block([[wr, -wi], [wi, wr]])
                tables.setdefault(("wi8", f),
                                  _int8_chunks_np(ws, _I8_W_SHIFTS))
            elif stacked:
                ws = np.block([[wr, -wi], [wi, wr]]).astype(dtype)
                tables.setdefault(("dfts", f), (ws,))
            else:
                tables.setdefault(("dft", f),
                                  (wr.astype(dtype), wi.astype(dtype)))
        if i < m - 1 and not (fold and i == m - 2):
            rest = factors[i + 1:]
            r = math.prod(rest)
            tr, ti = twiddle_table(f, r, f * r, sign, dtype)
            shape = (f,) + (1,) * i + rest + (1,) * trail_ndim
            tables[("tw", i, factors)] = (tr.reshape(shape), ti.reshape(shape))
    return tables


def _fft4_lists(rs, ms, sign):
    """4-point DFT of 4 (re, im) slice pairs; returns output lists."""
    ar, ai = rs[0] + rs[2], ms[0] + ms[2]
    br, bi = rs[0] - rs[2], ms[0] - ms[2]
    cr, ci = rs[1] + rs[3], ms[1] + ms[3]
    dr, di = rs[1] - rs[3], ms[1] - ms[3]
    if sign < 0:     # forward: y1 = b - i*d, y3 = b + i*d
        yr = [ar + cr, br + di, ar - cr, br - di]
        yi = [ai + ci, bi - dr, ai - ci, bi + dr]
    else:
        yr = [ar + cr, br - di, ar - cr, br + di]
        yi = [ai + ci, bi + dr, ai - ci, bi - dr]
    return yr, yi


_SQRT1_2 = float(np.float32(np.sqrt(0.5)))


def _butterfly(f, xr, xi, axis, sign):
    """f-point DFT over ``axis`` as exact VPU add/sub chains (f in 2,4,8).

    The output digit is prepended at axis 0 with ``axis`` consumed —
    the same index convention as the dot_general stages, so butterfly and
    matmul stages compose freely in one factor chain.
    """
    rs = [jax.lax.index_in_dim(xr, j, axis, keepdims=False) for j in range(f)]
    ms = [jax.lax.index_in_dim(xi, j, axis, keepdims=False) for j in range(f)]
    if f == 2:
        yr = [rs[0] + rs[1], rs[0] - rs[1]]
        yi = [ms[0] + ms[1], ms[0] - ms[1]]
    elif f == 4:
        yr, yi = _fft4_lists(rs, ms, sign)
    elif f == 8:
        # 8 = 2 x 4 fused: radix-2 over the high input digit, the w8^j2
        # twiddle inlined as constants (1, c(1∓i), ∓i, -c(1±i) with
        # c = sqrt(1/2)), then two 4-point DFTs; outputs interleave as
        # k = k2*2 + k1 — the standard from-the-left digit order.
        er = [rs[j] + rs[4 + j] for j in range(4)]
        ei = [ms[j] + ms[4 + j] for j in range(4)]
        or_ = [rs[j] - rs[4 + j] for j in range(4)]
        oi_ = [ms[j] - ms[4 + j] for j in range(4)]
        c = _SQRT1_2
        if sign < 0:
            # w8^1 = c(1-i): (r+i*m)*(c-ic) = c(r+m) + i c(m-r)
            or_[1], oi_[1] = c * (or_[1] + oi_[1]), c * (oi_[1] - or_[1])
            or_[2], oi_[2] = oi_[2], -or_[2]                  # * -i
            or_[3], oi_[3] = c * (oi_[3] - or_[3]), -c * (or_[3] + oi_[3])
        else:
            or_[1], oi_[1] = c * (or_[1] - oi_[1]), c * (oi_[1] + or_[1])
            or_[2], oi_[2] = -oi_[2], or_[2]                  # * +i
            or_[3], oi_[3] = -c * (or_[3] + oi_[3]), c * (or_[3] - oi_[3])
        ar, ai = _fft4_lists(er, ei, sign)    # k1 = 0
        br, bi = _fft4_lists(or_, oi_, sign)  # k1 = 1
        yr = [p for pair in zip(ar, br) for p in pair]
        yi = [p for pair in zip(ai, bi) for p in pair]
    else:
        raise ValueError(f"unsupported butterfly radix {f}")
    return jnp.stack(yr, axis=0), jnp.stack(yi, axis=0)


# ------------------------------------------------------------- packed mode
# Interleaved (re,im)-adjacent storage processed natively: the bitcast
# (..., 2n) view is transposed to (2n, lanes) rows and reshaped once to
# (*factors, 2, lanes).  The size-2 pair axis sits second-to-last and
# NEVER moves — every stage contracts a factor axis and prepends its
# digit in front, so the final flatten is already packed DFT output
# order (the interleaved analog of tile_fft's no-bit-reversal
# digit-prepend ordering).  Cross-plane arithmetic (twiddles, MXU
# stages, +-i butterfly arms) goes through ``_pair_i`` — one flip of the
# size-2 axis + a plane-sign mask — replacing the stride-2 plane
# splits of the first-generation interleaved kernel (measured 2.63 ms
# vs 0.79 planar on the headline shape; docs/design.md r3 log).
#
# STATUS (r3): numerically validated end-to-end under interpret mode
# (tests/test_interleave.py), but on this environment's shared Mosaic
# compile service the n=4096 packed chain did not finish compiling
# within two 10-15 min windows (docs/design.md r3 log) — a compile
# hazard, so PACKED_INTERLEAVED stays False and the TPU path uses the
# planar-split fused kernel below.  Flip on a machine with a healthy
# local compiler to A/B the two.
# RE-ATTEMPTED (r4, 2026-08-19 17:03Z, idle service window per VERDICT
# item 4): benchmarks/probe_packed.py hit its 900 s bound with the
# compile still unfinished — hazard stands.

PACKED_INTERLEAVED = False


def _pair_swap(x):
    """Swap the (re, im) pair rows: (..., 2, L) -> (im, re) in place.

    Mosaic has no `rev` lowering and a strided pair split is the relayout
    this whole mode exists to avoid, so the swap is two whole-tile row
    rolls (contiguous block concats) + a parity select on the flattened
    row axis — every op block-contiguous.
    """
    shape = x.shape
    rows = math.prod(shape[:-1])
    x2 = x.reshape(rows, shape[-1])
    up = jnp.roll(x2, -1, axis=0)        # row 2k   <- im_k
    dn = jnp.roll(x2, 1, axis=0)         # row 2k+1 <- re_k
    par = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % 2
    return jnp.where(par == 0, up, dn).reshape(shape)


def _pair_i(x, sign):
    """(sign * i) * z elementwise on a packed array (pair axis at -2):
    i*z = (-im, re); -i*z = (im, -re)."""
    y = _pair_swap(x)
    par = jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)   # [[0], [1]]
    lo, hi = (-1.0, 1.0) if sign >= 0 else (1.0, -1.0)
    m = jnp.where(par == 0, jnp.asarray(lo, x.dtype), jnp.asarray(hi, x.dtype))
    return y * m


def _fft4_packed(xs, sign):
    """4-point DFT of 4 packed slices; mirrors _fft4_lists."""
    a, b = xs[0] + xs[2], xs[0] - xs[2]
    c, d = xs[1] + xs[3], xs[1] - xs[3]
    idd = _pair_i(d, sign)
    return [a + c, b + idd, a - c, b - idd]


def _butterfly_packed(f, x, axis, sign):
    """Packed-complex analog of _butterfly (f in 2, 4, 8); the pair axis
    rides along untouched except inside the +-i / w8 arms."""
    xs = [jax.lax.index_in_dim(x, j, axis, keepdims=False) for j in range(f)]
    if f == 2:
        ys = [xs[0] + xs[1], xs[0] - xs[1]]
    elif f == 4:
        ys = _fft4_packed(xs, sign)
    elif f == 8:
        ev = [xs[j] + xs[4 + j] for j in range(4)]
        od = [xs[j] - xs[4 + j] for j in range(4)]
        c = _SQRT1_2
        if sign < 0:   # w8^1 = c(1-i), w8^2 = -i, w8^3 = -c(1+i)
            od[1] = c * (od[1] - _pair_i(od[1], 1))
            od[2] = _pair_i(od[2], -1)
            od[3] = -c * (od[3] + _pair_i(od[3], 1))
        else:          # w8^-1 = c(1+i), w8^-2 = i, w8^-3 = c(-1+i)
            od[1] = c * (od[1] + _pair_i(od[1], 1))
            od[2] = _pair_i(od[2], 1)
            od[3] = -c * (od[3] - _pair_i(od[3], 1))
        a = _fft4_packed(ev, sign)
        b = _fft4_packed(od, sign)
        ys = [q for pair in zip(a, b) for q in pair]
    else:
        raise ValueError(f"unsupported butterfly radix {f}")
    return jnp.stack(ys, axis=0)


def needed_tables_packed(n: int, sign: int, factors=None,
                         dtype=np.float32) -> dict:
    """Packed-mode tables: ("dftp", f) = one (f, 2f) [Wr | Wi] matrix —
    contracted against [x ; i*x] so the complex product is ONE real
    matmul at full MXU K-width — plus ("twp", ...) twiddles broadcast
    over the pair axis."""
    factors = tuple(factors or default_factors(n))
    assert math.prod(factors) == n
    tables: dict = {}
    for i, f in enumerate(factors):
        if f not in VPU_RADICES:
            wr, wi = dft_matrix(f, sign, np.float64)
            tables.setdefault(("dftp", f),
                              (np.concatenate([wr, wi], 1).astype(dtype),))
        if i < len(factors) - 1:
            rest = factors[i + 1:]
            r = math.prod(rest)
            tr, ti = twiddle_table(f, r, f * r, sign, dtype)
            shape = (f,) + (1,) * i + rest + (1, 1)
            # sin table carries the pair signs (-ti at re, +ti at im) so
            # the twiddle round is tr*x + tip*pair_swap(x) with no extra
            # sign pass
            tip = (ti.reshape(shape)
                   * np.asarray([-1.0, 1.0], dtype).reshape(2, 1))
            tables[("twp", i, factors)] = (tr.reshape(shape), tip)
    return tables


def tile_fft_packed(x, tables: dict, n: int, factors=None,
                    precision=_PRECISION, sign: int = -1):
    """Length-n DFT over the packed rows of a (2n, lanes) tile.

    Rows alternate (re, im) — the transposed bitcast view of interleaved
    complex64 (the reference's default storage, SURVEY.md §2.5/§3.4).
    Same digit-prepend chain as tile_fft; outputs land packed, so the
    kernel is one HBM round trip with zero plane-split relayouts.
    """
    lanes = x.shape[-1]
    assert x.shape == (2 * n, lanes), (x.shape, n)
    factors = tuple(factors or default_factors(n))
    m = len(factors)
    x = x.reshape(*factors, 2, lanes)
    for i, f in enumerate(factors):
        if f in VPU_RADICES:
            x = _butterfly_packed(f, x, i, sign)
        else:
            (wcat,) = tables[("dftp", f)]
            xcat = jnp.concatenate([x, _pair_i(x, 1)], axis=i)
            x = _dg(wcat, xcat, i, precision)
        if i < m - 1:
            tr, tip = tables[("twp", i, factors)]
            x = tr * x + tip * _pair_swap(x)
    return x.reshape(2 * n, lanes)


def _dg(w, x, axis, precision):
    dims = (((1,), (axis,)), ((), ()))
    return jax.lax.dot_general(w, x, dims,
                               preferred_element_type=jnp.float32,
                               precision=_PREC_MAP[precision])


def _exp2_vec(e):
    """2^e for a (1, 1) int32 array (Mosaic bitcast needs vectors)."""
    bits = (e + jnp.int32(127)) << 23
    return jax.lax.bitcast_convert_type(bits.astype(jnp.int32), jnp.float32)


def _int8_stage(xr, xi, f, axis, wch):
    """f-point stacked-complex DFT stage via exact int8-split MXU products.

    x is decomposed into 4 7-bit int8 channels against a per-tile
    power-of-two alignment (progressive extraction, exact in f32), W into
    3 host-precomputed channels; the 9 significant channel pairs run as
    exact int8 x int8 -> int32 matmuls and recombine in f32 (int32 group
    sums stay < 2^24, so every conversion is exact).  Measured stage
    error 4.7e-7 — inside the 2e-6 c64 gate with margin — at ~4.5
    bf16-pass-equivalents of MXU work vs HIGHEST's 6.
    """
    # reduce in place (a reshape(1, -1) flatten would force a full
    # row-major relayout in Mosaic before the reduction)
    a = jnp.maximum(jnp.abs(xr), jnp.abs(xi))
    amax = jnp.max(a).reshape(1, 1)
    eb = (jax.lax.bitcast_convert_type(amax, jnp.int32) >> 23) & 0xFF
    m = jnp.clip(eb - 126, -40, 120)
    xs = jnp.concatenate([xr, xi], axis=axis)
    chans = []
    r = xs
    for s in _I8_X_SHIFTS:
        sh = _exp2_vec(m - jnp.int32(s))
        inv = _exp2_vec(jnp.int32(s) - m)
        c = jnp.clip(jnp.round(r * inv), -127.0, 127.0)
        r = r - c * sh
        chans.append((c.astype(jnp.int8), s))
    dims = (((1,), (axis,)), ((), ()))
    groups: dict = {}
    for wi, ws in enumerate(_I8_W_SHIFTS):
        for cx, sx in chans:
            s = ws + sx
            if s <= _I8_KEEP:
                groups.setdefault(s, []).append((wi, cx))
    acc = None
    for s in sorted(groups):
        g = None
        for wi, cx in groups[s]:
            y = jax.lax.dot_general(wch[wi], cx, dims,
                                    preferred_element_type=jnp.int32)
            g = y if g is None else g + y
        t = g.astype(jnp.float32) * _exp2_vec(m - jnp.int32(s))
        acc = t if acc is None else acc + t
    return acc[:f], acc[f:]


def _cdot(wr, wi, xr, xi, axis, precision):
    """Complex (w @ x) contracting x's ``axis``, as 4 real contractions.
    The contracted-out index lands at axis 0 of the outputs."""
    rr = _dg(wr, xr, axis, precision)
    ii = _dg(wi, xi, axis, precision)
    ri = _dg(wr, xi, axis, precision)
    ir = _dg(wi, xr, axis, precision)
    return rr - ii, ri + ir


def tile_fft(re, im, tables: dict, n: int, factors=None,
             precision=_PRECISION, stacked: bool = True, sign: int = -1):
    """Length-n DFT over axis 0 of an (n, lanes) planar tile.

    Mixed-radix from-the-left formulation: with x viewed as
    (f_1, ..., f_m, lanes), stage i contracts axis i against the f_i-point
    DFT matrix (MXU) or applies a small-radix butterfly (VPU, exact).
    Both prepend the new spectral digit, so after all m stages the rows
    flatten to k_m*(n/f_m) + ... + k_1 — exactly the DFT output order: no
    bit-reversal and no transposes anywhere.

    Pure jnp function — identical under Pallas compilation, interpret mode,
    or plain tracing (how tests pin the math without TPU hardware).
    ``sign`` only matters for butterfly factors; matmul stages carry the
    direction in their tables.

    The tile may carry extra trailing dims beyond ``lanes`` — e.g.
    (n, c, 128) for the multi-lane-tile column blocks — as long as the
    tables were built with the matching ``trail_ndim``; every stage op
    touches only leading axes, so the trailing layout rides along.
    """
    trail = re.shape[1:]
    assert re.shape[0] == n, (re.shape, n)
    factors = tuple(factors or default_factors(n))
    m = len(factors)
    fold = ("dftsfold", factors) in tables
    xr = re.reshape(*factors, *trail)
    xi = im.reshape(*factors, *trail)
    for i, f in enumerate(factors):
        if fold and i == m - 1:
            # folded final stage: the last twiddle round is baked into
            # per-digit matrices W_j (j = the previous stage's digit,
            # living at axis 0); same MXU madds split across f_prev
            # contractions, one whole VPU twiddle round saved.
            mats = tables[("dftsfold", factors)]
            yr, yi = [], []
            for j in range(len(mats)):
                xr_j = jax.lax.index_in_dim(xr, j, 0, keepdims=False)
                xi_j = jax.lax.index_in_dim(xi, j, 0, keepdims=False)
                xs = jnp.concatenate([xr_j, xi_j], axis=i - 1)
                y = _dg(mats[j], xs, i - 1, precision)
                yr.append(y[:f])
                yi.append(y[f:])
            xr = jnp.stack(yr, axis=1)
            xi = jnp.stack(yi, axis=1)
            break
        if f in VPU_RADICES:
            xr, xi = _butterfly(f, xr, xi, i, sign)
        elif precision == "int8":
            xr, xi = _int8_stage(xr, xi, f, i, tables[("wi8", f)])
        elif stacked:
            xs = jnp.concatenate([xr, xi], axis=i)
            (ws,) = tables[("dfts", f)]
            y = _dg(ws, xs, i, precision)     # (2*k_i, k_prev..., rest, lanes)
            xr, xi = y[:f], y[f:]
        else:
            wr, wi = tables[("dft", f)]
            xr, xi = _cdot(wr, wi, xr, xi, i, precision)
        if i < m - 1 and not (fold and i == m - 2):
            twr, twi = tables[("tw", i, factors)]
            xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
    return xr.reshape(n, *trail), xi.reshape(n, *trail)


def _kernel(n, layout, postscale, factors, precision, stacked, interleaved,
            packed, sign, *refs):
    nt = sum(arity for _, arity in layout)
    table_refs = refs[:nt]
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(table_refs[pos + j][:] for j in range(arity))
        pos += arity
    if interleaved and packed:
        # One (lanes, 2n) block of interleaved complex (a bitcast view of
        # complex64), processed natively in packed form: the pair axis
        # never moves, so there are no plane-split relayouts anywhere
        # (tile_fft_packed).  Interpret-validated; compile hazard on the
        # shared Mosaic service — see PACKED_INTERLEAVED.
        (v_ref, o_ref) = refs[nt], refs[nt + 1]
        x = tile_fft_packed(v_ref[:].T, tables, n, factors, precision, sign)
        if postscale != 1.0:
            x = x * jnp.float32(postscale)
        o_ref[:] = x.T
        return
    if interleaved:
        # Planar-split fused form: after the load transpose rows alternate
        # re/im — (2n, L) -> (n, 2, L) is a row reshape, but the pair
        # split lowers to stride-2 sublane relayouts (measured 2.63 ms vs
        # 0.79 planar on the headline shape; still the best *compilable*
        # single-pass interleaved option, docs/design.md r3 log).
        (v_ref, o_ref) = refs[nt], refs[nt + 1]
        pairs = v_ref[:].T.reshape(n, 2, -1)
        xr = pairs[:, 0, :]
        xi = pairs[:, 1, :]
    else:
        re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
        xr = re_ref[:].T
        xi = im_ref[:].T
    xr, xi = tile_fft(xr, xi, tables, n, factors, precision, stacked, sign)
    if postscale != 1.0:
        s = jnp.float32(postscale)
        xr = xr * s
        xi = xi * s
    if interleaved:
        out = jnp.stack([xr, xi], axis=1).reshape(2 * n, -1)
        o_ref[:] = out.T
    else:
        or_ref[:] = xr.T
        oi_ref[:] = xi.T


def _row_call(inputs, rows, n, *, sign, postscale, interpret, factors,
              precision, stacked, lanes, interleaved, packed=False,
              alias_io=False):
    # Trace the kernel with x64 semantics off regardless of caller config:
    # under x64, Pallas index bookkeeping picks up 64-bit types that Mosaic
    # cannot legalize ("failed to legalize operation 'func.return'"); the
    # kernel itself is pure f32 either way.
    with jax.enable_x64(False):
        return _row_call_inner(inputs, rows, n, sign=sign,
                               postscale=postscale, interpret=interpret,
                               factors=factors, precision=precision,
                               stacked=stacked, lanes=lanes,
                               interleaved=interleaved, packed=packed,
                               alias_io=alias_io)


def _row_call_inner(inputs, rows, n, *, sign, postscale, interpret, factors,
                    precision, stacked, lanes, interleaved, packed, alias_io):
    factors = tuple(factors or default_factors(n))
    if interleaved and packed:
        tables = needed_tables_packed(n, sign, factors=factors)
    else:
        tables = needed_tables(n, sign, factors=factors, stacked=stacked,
                               precision=precision)
    layout = tuple((k, len(v)) for k, v in tables.items())
    flat = [jnp.asarray(a) for v in tables.values() for a in v]
    grid = (pl.cdiv(rows, lanes),)
    tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for a in flat]
    width = 2 * n if interleaved else n
    dspec = pl.BlockSpec((lanes, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, n, layout, postscale, factors,
                             precision, stacked, interleaved, packed, sign)
    nt = len(tspec)
    if interleaved:
        out_shape = jax.ShapeDtypeStruct((rows, width), jnp.float32)
        out_specs = dspec
        in_specs = tspec + [dspec]
        aliases = {nt: 0} if alias_io else {}
    else:
        out_shape = (jax.ShapeDtypeStruct((rows, n), jnp.float32),) * 2
        out_specs = (dspec, dspec)
        in_specs = tspec + [dspec, dspec]
        aliases = {nt: 0, nt + 1: 1} if alias_io else {}
    # alias_io: each grid step reads and writes the SAME (lanes, n) block,
    # so in-place aliasing is race-free; it lets XLA drop the carry copies
    # it otherwise inserts around custom calls in scan/while bodies and
    # makes donate=True plans truly in-place (reference's execute mutated
    # its GPU buffer in place — SURVEY.md §2.9-bis).
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=8 * n * sum(factors) * lanes * grid[0],
            bytes_accessed=rows * n * 4 * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # v5e has far more physical VMEM than the 16 MiB default scoped
            # limit; the n=4096 tile's working set needs ~24 MiB.
            vmem_limit_bytes=100 * 1024 * 1024,
            # row tiles are fully independent (disjoint output blocks):
            # "parallel" lets Mosaic reorder and overlap block DMAs with
            # compute (measured ~7% faster than "arbitrary" at n=4096)
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*flat, *inputs)


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "precision", "stacked",
    "lanes", "alias_io"))
def _fft_rows(re, im, *, n, sign, postscale, interpret,
              factors=None, precision=_PRECISION, stacked=True, lanes=LANES,
              alias_io=False):
    out_r, out_i = _row_call(
        (re, im), re.shape[0], n, sign=sign, postscale=postscale,
        interpret=interpret, factors=factors, precision=precision,
        stacked=stacked, lanes=lanes, interleaved=False, alias_io=alias_io)
    return out_r, out_i


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "precision", "stacked",
    "lanes", "packed", "alias_io"))
def _fft_rows_interleaved(v, *, n, sign, postscale, interpret,
                          factors=None, precision=_PRECISION, stacked=True,
                          lanes=LANES, packed=False, alias_io=False):
    """FFT of (rows, 2n) interleaved-complex f32 views, fully fused.

    The input is the bitcast view of a complex64 (rows, n) array
    (re0,im0,re1,im1,...); the kernel de/re-interleaves inside the
    load/store transposes, so the pyfft-style interleaved API costs exactly
    one HBM round trip — no separate conversion passes.
    """
    return _row_call(
        (v,), v.shape[0], n, sign=sign, postscale=postscale,
        interpret=interpret, factors=factors, precision=precision,
        stacked=stacked, lanes=lanes, interleaved=True, packed=packed,
        alias_io=alias_io)


def fft_rows_interleaved(v, sign, *, postscale: float = 1.0,
                         interpret: bool | None = None, factors=None,
                         packed: bool | None = None, alias_io=False):
    """Public wrapper: v is a (..., 2n) f32 view of interleaved complex."""
    if interpret is None:
        interpret = _interpret_default()
    if packed is None:
        packed = PACKED_INTERLEAVED
    n = v.shape[-1] // 2
    lead = v.shape[:-1]
    rows = math.prod(lead) if lead else 1
    out = _fft_rows_interleaved(v.reshape(rows, 2 * n), n=n, sign=sign,
                                postscale=float(postscale),
                                factors=tuple(factors) if factors else None,
                                interpret=bool(interpret),
                                packed=bool(packed), alias_io=alias_io)
    return out.reshape(*lead, 2 * n)


def _row_swap_kernel(n, layout, postscale, factors, precision, stacked,
                     sign, *refs):
    """Row FFT with digit-swap store: reads a (lanes, n) row block, writes
    the spectral (n, lanes) tile UNtransposed into a 3D output — the
    four-step global path's final pass lands directly in (k2, k1) DFT
    order with zero VPU output transpose."""
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    xr, xi = tile_fft(re_ref[:].T, im_ref[:].T, tables, n, factors,
                      precision, stacked, sign)
    if postscale != 1.0:
        s = jnp.float32(postscale)
        xr = xr * s
        xi = xi * s
    or_ref[0] = xr
    oi_ref[0] = xi


@functools.partial(jax.jit, static_argnames=(
    "sign", "postscale", "interpret", "factors", "precision", "stacked",
    "lanes"))
def _fft_rows_swap(re, im, *, sign, postscale, interpret,
                   factors=None, precision=_PRECISION, stacked=True,
                   lanes=LANES):
    """FFT over axis -1 of (lead, n1, n) planar arrays, output (lead, n, n1).

    The four-step pass-2 shape: reads contiguous (lanes, n) row blocks,
    stores each spectral tile into the digit-swapped position, so the pass
    is read-contiguous / write-strided (the transpose's unavoidable strided
    side) with no in-kernel output transpose at all.
    """
    with jax.enable_x64(False):   # see _row_call: Mosaic rejects x64 traces
        lead, n1, n = re.shape
        assert n1 % lanes == 0, (n1, lanes)
        k = n1 // lanes
        factors = tuple(factors or default_factors(n))
        tables = needed_tables(n, sign, factors=factors, stacked=stacked,
                           precision=precision)
        layout = tuple((kk, len(v)) for kk, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        rows = lead * n1
        grid = (rows // lanes,)
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((lanes, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, n, lanes), lambda i: (i // k, 0, i % k),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_row_swap_kernel, n, layout, postscale,
                                 factors, precision, stacked, sign)
        oshape = jax.ShapeDtypeStruct((lead, n, n1), jnp.float32)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=tspec + [dspec, dspec],
            out_specs=(ospec, ospec),
            out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * n * sum(factors) * lanes * grid[0],
                bytes_accessed=rows * n * 4 * 4,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(*flat, re.reshape(rows, n), im.reshape(rows, n))


def fft_rows_swap(re, im, sign, *, postscale: float = 1.0,
                  interpret: bool | None = None, factors=None,
                  lanes: int = LANES):
    """Public wrapper: (..., n1, n) -> (..., n, n1) row FFT + digit swap."""
    if interpret is None:
        interpret = _interpret_default()
    *lead, n1, n = re.shape
    L = math.prod(lead) if lead else 1
    rr, ii = _fft_rows_swap(re.reshape(L, n1, n), im.reshape(L, n1, n),
                            sign=sign, postscale=float(postscale),
                            interpret=bool(interpret),
                            factors=tuple(factors) if factors else None,
                            lanes=lanes)
    oshape = (*lead, n, n1)
    return rr.reshape(oshape), ii.reshape(oshape)


def _col_kernel(n, layout, postscale, factors, precision, stacked,
                tw_kind, tw_qdiv, swap, swap_mid, sign, *refs):
    nt = sum(arity for _, arity in layout)
    table_refs = refs[:nt]
    pos = nt
    twr_ref = twi_ref = tbr_ref = tbi_ref = None
    if tw_kind == "full" or tw_kind == "strided":
        twr_ref, twi_ref = refs[pos], refs[pos + 1]
        pos += 2
    elif tw_kind == "factored":
        twr_ref, twi_ref, tbr_ref, tbi_ref = refs[pos:pos + 4]
        pos += 4
    re_ref, im_ref, or_ref, oi_ref = refs[pos:pos + 4]
    tables = {}
    tpos = 0
    for k, arity in layout:
        tables[k] = tuple(table_refs[tpos + j][:] for j in range(arity))
        tpos += arity
    # (1, n, lanes) block: the transform axis already sits on sublanes —
    # no transposes at all (the advantage of column passes on TPU).
    xr, xi = tile_fft(re_ref[0], im_ref[0], tables, n, factors, precision,
                      stacked, sign)
    if tw_kind == "full":
        # fused inter-pass twiddle of the four-step global path:
        # T[k, j2] with j2 = this tile's lane slice
        twr = twr_ref[:]
        twi = twi_ref[:]
        xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
    elif tw_kind == "strided":
        # twiddle constant across each lane tile: one column of the
        # transposed-resident (Q, n) table, selected by the grid index and
        # broadcast over lanes (the multi-level inner-pass form, where the
        # twiddle index advances every ``period`` trail elements).  The
        # table stays whole in VMEM: Mosaic rejects (n, 1) blocks, and a
        # sublane-dim dynamic slice of the transposed table is free.
        q = pl.program_id(1) // tw_qdiv
        twr = twr_ref[pl.ds(q, 1), :].T        # (n, 1)
        twi = twi_ref[pl.ds(q, 1), :].T
        xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
    elif tw_kind == "factored":
        # T[k, q*lanes + r] = A[k, q] * B[k, r]: the (n, T) table of a huge
        # global transform factored into a transposed-resident (T/lanes, n)
        # column stream plus one (n, lanes) tile — O(n*T/128) memory
        q = pl.program_id(1)
        ar = twr_ref[pl.ds(q, 1), :].T          # (n, 1)
        ai = twi_ref[pl.ds(q, 1), :].T
        br, bi = tbr_ref[:], tbi_ref[:]
        twr = ar * br - ai * bi
        twi = ar * bi + ai * br
        xr, xi = xr * twr - xi * twi, xr * twi + xi * twr
    if postscale != 1.0:
        s = jnp.float32(postscale)
        xr = xr * s
        xi = xi * s
    if swap:
        # digit-swapped store: the (n, lanes) spectral tile lands as
        # (lanes, n) in an output whose last two axes are exchanged —
        # this is how the four-step global path absorbs its transpose
        # pass into the store of pass 1 (one 2D VPU transpose instead
        # of a full HBM round trip).
        or_ref[0] = xr.T
        oi_ref[0] = xi.T
    elif swap_mid:
        # mid-swap store: the tile lands untransposed at [L, t//P, :, t%P]
        # of a (L, T/P, n, P) output — exchanging the transform digit with
        # only the *leading* part of the trail (the multi-level four-step's
        # digit-reorder, free at store time, zero VPU transposes)
        or_ref[0, 0] = xr
        oi_ref[0, 0] = xi
    else:
        or_ref[0] = xr
        oi_ref[0] = xi


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "precision", "stacked",
    "lanes", "tw_n", "tw_mode", "tw_period", "swap_store", "swap_mid",
    "alias_io", "ctile"))
def _fft_cols(re, im, *, n, sign, postscale, interpret,
              factors=None, precision=_PRECISION, stacked=True, lanes=LANES,
              tw_n: int = 0, tw_mode: str = "full", tw_period: int = 0,
              swap_store: bool = False, swap_mid: int = 0, alias_io=False,
              ctile: int = 0):
    """FFT over axis 1 of (L, n, T) planar arrays (column kernel).

    ``tw_n``: if nonzero, multiply the spectral output elementwise by the
    four-step twiddle T[k, g(j)] = w_{tw_n}^(k*g(j)) with j the global
    position along the trailing axis.  ``tw_period`` selects g:

    * "full" (default): g(j) = j via a full (n, T) table — the
      single-level four-step form;
    * "factored": g(j) = j with the table FACTORED as A[k, j//lanes] *
      B[k, j%lanes] — O(n*T/lanes) memory, for huge-N level-1 twiddles;
    * "strided" (with ``tw_period``, a multiple of ``lanes``):
      g(j) = j // tw_period via an (n, T/tw_period) column-streamed
      table — the multi-level inner-pass twiddle, constant across each
      lane tile.

    ``swap_store``: write the output with the last two axes exchanged —
    result shape (L, T, n).  Used by the four-step global path to absorb
    its digit-swap transpose into this pass's store.

    ``swap_mid`` (= P > 0, P a multiple of ``lanes`` dividing T): store to
    a (L, T//P, n, P) output — the transform digit is exchanged with only
    the leading T//P part of the trail, landing multi-level digits in
    final DFT order with zero VPU transposes.

    ``ctile`` (= c > 0): process c lane tiles per grid step via a 4D
    (1, n, c, lanes) block (minor dim stays ``lanes``; Pallas requires
    c % 8 == 0).  KEPT AS A MEASURED NEGATIVE RESULT: built to amortize
    an apparent ~3.4 us fixed per-step cost on small-n column passes,
    but c=8 measured 1.16 ms vs the classic kernel's 0.45-0.50 on the
    3D z-pass shape (probe_ctile, r3) — the 3D in-kernel tile costs
    Mosaic relayouts that swamp the amortization, and the classic
    kernel's "wall" turned out to be co-tenant congestion, not
    per-step overhead.  Plain and "full"-twiddle passes only; opt-in.
    """
    with jax.enable_x64(False):   # see _row_call: Mosaic rejects x64 traces
        return _fft_cols_inner(re, im, n=n, sign=sign, postscale=postscale,
                               interpret=interpret, factors=factors,
                               precision=precision, stacked=stacked,
                               lanes=lanes, tw_n=tw_n, tw_mode=tw_mode,
                               tw_period=tw_period, swap_store=swap_store,
                               swap_mid=swap_mid, alias_io=alias_io,
                               ctile=ctile)


def _fft_cols_ctile(re, im, *, n, sign, postscale, interpret,
                    factors, precision, stacked, lanes, tw_n, alias_io,
                    ctile):
    """Multi-lane-tile column pass: (1, n, c, lanes) blocks, minor dim
    fixed at ``lanes``; see _fft_cols ``ctile``."""
    L, _, T = re.shape
    assert T % lanes == 0, (T, lanes)
    C = T // lanes
    while ctile > 1 and C % ctile:      # clamp to a divisor of the tile count
        ctile //= 2
    factors = tuple(factors or default_factors(n))
    tables = needed_tables(n, sign, factors=factors, stacked=stacked,
                           precision=precision, trail_ndim=2)
    layout = tuple((k, len(v)) for k, v in tables.items())
    flat = [jnp.asarray(a) for v in tables.values() for a in v]
    grid = (L, C // ctile)
    tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for a in flat]
    extra = []
    tw_kind = None
    if tw_n:
        tw_kind = "full"
        twr, twi = twiddle_table(n, T, tw_n, sign)
        extra = [jnp.asarray(twr).reshape(n, C, lanes),
                 jnp.asarray(twi).reshape(n, C, lanes)]
        tspec = tspec + [pl.BlockSpec((n, ctile, lanes),
                                      lambda i, j: (0, j, 0),
                                      memory_space=pltpu.VMEM)] * 2
    dspec = pl.BlockSpec((1, n, ctile, lanes), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((L, n, C, lanes), jnp.float32)
    kern = functools.partial(_col_kernel, n, layout, postscale, factors,
                             precision, stacked, tw_kind, 1, False, False,
                             sign)
    nd = len(tspec)
    aliases = {nd: 0, nd + 1: 1} if alias_io else {}
    out_r, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=tspec + [dspec, dspec],
        out_specs=(dspec, dspec),
        out_shape=(oshape, oshape),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=8 * n * sum(factors) * ctile * lanes * grid[0] * grid[1],
            bytes_accessed=L * n * T * 4 * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*flat, *extra, re.reshape(L, n, C, lanes), im.reshape(L, n, C, lanes))
    return out_r.reshape(L, n, T), out_i.reshape(L, n, T)


def _fft_cols_inner(re, im, *, n, sign, postscale, interpret,
                    factors, precision, stacked, lanes, tw_n, tw_mode,
                    tw_period, swap_store, swap_mid, alias_io, ctile=0):
    if ctile:
        assert not swap_store and not swap_mid and precision != "int8"
        assert not tw_n or tw_mode == "full", (tw_n, tw_mode)
        return _fft_cols_ctile(re, im, n=n, sign=sign, postscale=postscale,
                               interpret=interpret, factors=factors,
                               precision=precision, stacked=stacked,
                               lanes=lanes, tw_n=tw_n, alias_io=alias_io,
                               ctile=ctile)
    L, _, T = re.shape
    factors = tuple(factors or default_factors(n))
    tables = needed_tables(n, sign, factors=factors, stacked=stacked,
                           precision=precision)
    layout = tuple((k, len(v)) for k, v in tables.items())
    flat = [jnp.asarray(a) for v in tables.values() for a in v]
    grid = (L, pl.cdiv(T, lanes))
    tspec = [pl.BlockSpec(a.shape, lambda i, j, _nd=a.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for a in flat]
    extra = []
    tw_kind = None
    if tw_n and tw_mode == "full":
        tw_kind = "full"
        twr, twi = twiddle_table(n, T, tw_n, sign)
        extra = [jnp.asarray(twr), jnp.asarray(twi)]
        tspec = tspec + [pl.BlockSpec((n, lanes), lambda i, j: (0, j),
                                      memory_space=pltpu.VMEM)] * 2
    elif tw_n and tw_mode == "factored":
        tw_kind = "factored"
        from pyfft_tpu.ops.twiddle import twiddle_table_strided
        ar, ai = twiddle_table_strided(n, T // lanes, tw_n, sign, lanes)
        br, bi = twiddle_table(n, lanes, tw_n, sign)
        # A stored transposed (T/lanes, n) and resident whole: Mosaic
        # rejects (n, 1) minor-dim blocks; the kernel slices row q instead
        extra = [jnp.asarray(ar.T.copy()), jnp.asarray(ai.T.copy()),
                 jnp.asarray(br), jnp.asarray(bi)]
        tspec = tspec + [pl.BlockSpec((T // lanes, n),
                                      lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2 \
                      + [pl.BlockSpec((n, lanes), lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2
    elif tw_n:
        assert tw_mode == "strided", tw_mode
        tw_kind = "strided"
        assert tw_period % lanes == 0 and T % tw_period == 0, \
            (tw_period, lanes, T)
        from pyfft_tpu.ops.twiddle import twiddle_table_strided
        ar, ai = twiddle_table_strided(n, T // tw_period, tw_n, sign, 1)
        extra = [jnp.asarray(ar.T.copy()), jnp.asarray(ai.T.copy())]
        tspec = tspec + [pl.BlockSpec((T // tw_period, n),
                                      lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM)] * 2
    dspec = pl.BlockSpec((1, n, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    if swap_store:
        assert not swap_mid
        ospec = pl.BlockSpec((1, lanes, n), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((L, T, n), jnp.float32)
    elif swap_mid:
        assert swap_mid % lanes == 0 and T % swap_mid == 0, (swap_mid, T)
        kq = swap_mid // lanes
        ospec = pl.BlockSpec(
            (1, 1, n, lanes),
            lambda i, j, _k=kq: (i, j // _k, 0, j % _k),
            memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((L, T // swap_mid, n, swap_mid),
                                      jnp.float32)
    else:
        ospec = dspec
        oshape = jax.ShapeDtypeStruct((L, n, T), jnp.float32)
    tw_qdiv = max(1, tw_period // lanes) if tw_kind == "strided" else 1
    kern = functools.partial(_col_kernel, n, layout, postscale, factors,
                             precision, stacked, tw_kind, tw_qdiv,
                             swap_store, bool(swap_mid), sign)
    # in-place aliasing only when blocks map 1:1 (not the digit-swap store,
    # whose output block lives at a different offset than its input block)
    nd = len(tspec)
    aliases = {nd: 0, nd + 1: 1} if (alias_io and not swap_store) else {}
    out_r, out_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=tspec + [dspec, dspec],
        out_specs=(ospec, ospec),
        out_shape=(oshape, oshape),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=8 * n * sum(factors) * lanes * grid[0] * grid[1],
            bytes_accessed=L * n * T * 4 * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(*flat, *extra, re, im)
    return out_r, out_i


def _col_fold_kernel(n, by, xc, x_ext, layout, postscale, factors, sign,
                     precision, *refs):
    """Column FFT with folded-contiguous READ and native strided WRITE.

    The r4 HLO study (docs/design.md round-5 log; probe_3dz glue2) named
    the 3D composition glue: the (Z, Y, X) <-> (Z, Y*X) fold is a real
    retiling (native tiles group 8 y-rows per z; folded tiles group 8
    z-rows), which XLA materializes as relayout copies + S(1) staging
    around the aliased custom calls (~1.0 ms of the 2.27 ms 256^3 plan).
    Absorbing the UNFOLD into this kernel's store removes the output-side
    relayout entirely: blocks read a contiguous lane range of the folded
    view, the transform runs as proven (n, xc)-shaped tile_ffts on static
    lane slices, and each slice stores straight into the native 4D layout.
    (The mirrored native-READ form is a measured dead end: strided reads
    ran at 24.3% io-eff — probe_3dz zrow — while this shape's strided
    writes are free: 0.824 ms incl. one relayout vs zcol's 0.41 bare.)
    """
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    per_row = x_ext // xc                 # xc-sized chunks per output row
    for j in range(by * per_row):
        yy, xq = divmod(j, per_row)
        sl = pl.ds(j * xc, xc)
        xr, xi = tile_fft(re_ref[0, :, sl], im_ref[0, :, sl], tables, n,
                          factors, precision, True, sign)
        if postscale != 1.0:
            s = jnp.float32(postscale)
            xr, xi = xr * s, xi * s
        osl = pl.ds(xq * xc, xc)
        or_ref[0, :, yy, osl] = xr
        oi_ref[0, :, yy, osl] = xi


@functools.partial(jax.jit, static_argnames=(
    "n", "sign", "postscale", "interpret", "factors", "precision", "by",
    "x_ext"))
def _fft_cols_fold(re, im, *, n, sign, postscale, interpret, factors,
                   precision, by, x_ext):
    """FFT over axis 1 of folded (L, n, T) planar arrays, output in the
    native (L, n, T//x_ext, x_ext) layout (see _col_fold_kernel)."""
    with jax.enable_x64(False):
        L, _, T = re.shape
        rows = T // x_ext
        factors = tuple(factors or col_factors(n))
        tables = needed_tables(n, sign, factors=factors,
                               precision=precision)
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        # lane width per tile_fft slice: 256 lanes are validated for
        # column-pass tile shapes with n <= 512 only (CLAUDE.md Mosaic
        # rules), and the chunked row walk needs xc | x_ext (a 256-chunk
        # over x_ext=384 would read misaligned and leave lanes unwritten);
        # everything else uses the universal 128-lane tile, which always
        # divides the lane-aligned x_ext
        if n <= 512 and x_ext % (2 * LANES) == 0:
            xc = 2 * LANES
        else:
            xc = min(x_ext, LANES)
        tspec = [pl.BlockSpec(a.shape, lambda l, j, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        ispec = pl.BlockSpec((1, n, by * x_ext), lambda l, j: (l, 0, j),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((1, n, by, x_ext), lambda l, j: (l, 0, j, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_col_fold_kernel, n, by, xc, x_ext, layout,
                                 float(postscale), factors, sign, precision)
        oshape = jax.ShapeDtypeStruct((L, n, rows, x_ext), jnp.float32)
        return pl.pallas_call(
            kern, grid=(L, rows // by),
            in_specs=tspec + [ispec, ispec],
            out_specs=(ospec, ospec), out_shape=(oshape, oshape),
            cost_estimate=pl.CostEstimate(
                flops=8 * n * sum(factors) * T * L,
                bytes_accessed=L * n * T * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(*flat, re, im)


def supported_fold(re, axis: int) -> bool:
    """Whether the fold-store column kernel covers this array/axis: a
    transform axis with >= 2 trailing dims (where the folded view costs a
    real retiling — for <= 1 trailing dim the fold is free and the plain
    column kernel is optimal), lane-aligned minor, 8-row store groups."""
    if re.dtype != jnp.float32:
        return False
    axis = axis % re.ndim
    n = re.shape[axis]
    if not (is_power_of_two(n) and _MIN_N <= n <= MAX_LOCAL_N):
        return False
    trail = re.shape[axis + 1:]
    if len(trail) < 2:
        return False
    x_ext = trail[-1]
    rows = math.prod(trail[:-1])
    # VMEM footprint cap: each grid step holds 4 f32 block planes of
    # n x by x x_ext (by=8) plus tables, double-buffered — the hardware-
    # proven class is n=256, x_ext=256 (256^3 z-pass, ~8 MiB of blocks);
    # n * x_ext <= 2^17 bounds a block plane at 4 MiB so larger shapes
    # (e.g. a (4096, 8, 256) z-pass) stay on the plain column kernel
    # instead of compiling a >100 MiB-block kernel on the shared service
    if n * x_ext > 1 << 17:
        return False
    return (x_ext % LANES == 0 and x_ext <= 4 * LANES and rows % 8 == 0
            and math.prod(trail) >= LANES)


def fft_axis_fold(re, im, sign, *, axis, postscale: float = 1.0,
                  interpret: bool | None = None, factors=None,
                  precision: str = _PRECISION, by: int = 8):
    """DFT along a non-minor ``axis`` with the output in NATIVE layout.

    The TPU-native fix for the 3D z-pass composition glue (SURVEY §7
    hard-part 3): the plain column kernel works on the folded
    (lead, n, trail-flat) view, whose retiling XLA pays for on BOTH sides
    of the kernel; this variant pays it once (on the input reshape) and
    stores natively.  Covers axes with >= 2 trailing dims — 3D z-passes
    and batched 2D column passes land here via ``supported_fold``.
    """
    if interpret is None:
        interpret = _interpret_default()
    axis = axis % re.ndim
    n = re.shape[axis]
    lead = re.shape[:axis]
    trail = re.shape[axis + 1:]
    L = math.prod(lead) if lead else 1
    T = math.prod(trail)
    x_ext = trail[-1]
    rr, ii = _fft_cols_fold(
        re.reshape(L, n, T), im.reshape(L, n, T), n=n, sign=sign,
        postscale=float(postscale), interpret=bool(interpret),
        factors=tuple(factors) if factors else None, precision=precision,
        by=by, x_ext=x_ext)
    oshape = (*lead, n, *trail)
    return rr.reshape(oshape), ii.reshape(oshape)


# Largest ny*nx element count for the fused 2D kernel.  2^18 (= 512x512,
# 1 MiB per f32 plane) is the measured compile-safety limit: a 1024x1024
# fused tile sends the Mosaic compile into a >6-minute (likely unbounded)
# search and wedges this environment's shared compile service.  512x512
# measured 1924 GF effective, 256x256 1201 GF.
MAX_FUSED2D_ELEMS = 1 << 18


def _fused2d_kernel(bl, ny, nx, layout, postscale, fy, fx, precision,
                    stacked, sign, *refs):
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref = refs[nt:nt + 4]
    # bl (ny, nx) planes per grid step (block_l): larger per-step DMA
    # amortizes pipeline fill on small tiles — probe_3dz's f2dB question
    for j in range(bl):
        # y-axis FFT: transform already on sublanes, x as lanes — no
        # transpose
        xr, xi = tile_fft(re_ref[j], im_ref[j], tables, ny, fy, precision,
                          stacked, sign)
        # x-axis FFT: one in-VMEM transpose each way
        xr, xi = xr.T, xi.T
        xr, xi = tile_fft(xr, xi, tables, nx, fx, precision, stacked, sign)
        if postscale != 1.0:
            s = jnp.float32(postscale)
            xr = xr * s
            xi = xi * s
        or_ref[j] = xr.T
        oi_ref[j] = xi.T


@functools.partial(jax.jit, static_argnames=(
    "ny", "nx", "sign", "postscale", "interpret", "factors_y", "factors_x",
    "precision", "stacked", "alias_io", "block_l"))
def _fft2_fused(re, im, *, ny, nx, sign, postscale, interpret,
                factors_y=None, factors_x=None, precision=_PRECISION,
                stacked=True, alias_io=False, block_l=1):
    with jax.enable_x64(False):   # see _row_call: Mosaic rejects x64 traces
        return _fft2_fused_inner(re, im, ny=ny, nx=nx, sign=sign,
                                 postscale=postscale, interpret=interpret,
                                 factors_y=factors_y, factors_x=factors_x,
                                 precision=precision, stacked=stacked,
                                 alias_io=alias_io, block_l=block_l)


def _fft2_fused_inner(re, im, *, ny, nx, sign, postscale, interpret,
                      factors_y, factors_x, precision, stacked, alias_io,
                      block_l):
    L = re.shape[0]
    bl = block_l if block_l > 1 and L % block_l == 0 else 1
    fy = tuple(factors_y or default_factors(ny))
    fx = tuple(factors_x or default_factors(nx))
    tables = needed_tables(ny, sign, factors=fy, stacked=stacked,
                           precision=precision)
    tables.update(needed_tables(nx, sign, factors=fx, stacked=stacked,
                                precision=precision))
    layout = tuple((k, len(v)) for k, v in tables.items())
    flat = [jnp.asarray(a) for v in tables.values() for a in v]
    grid = (L // bl,)
    tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                          memory_space=pltpu.VMEM) for a in flat]
    dspec = pl.BlockSpec((bl, ny, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_fused2d_kernel, bl, ny, nx, layout, postscale,
                             fy, fx, precision, stacked, sign)
    oshape = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
    nd = len(tspec)
    aliases = {nd: 0, nd + 1: 1} if alias_io else {}
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=tspec + [dspec, dspec],
        out_specs=(dspec, dspec),
        out_shape=(oshape, oshape),
        input_output_aliases=aliases,
        cost_estimate=pl.CostEstimate(
            flops=8 * ny * nx * (sum(fy) + sum(fx)) * L,
            bytes_accessed=L * ny * nx * 4 * 4,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*flat, re, im)


# Tiled fused-2D ceiling: the r3 monolithic 1024^2 tile (tile_fft at 1024
# lanes) sent Mosaic into an unbounded search; the TILED variant below
# keeps every op at the proven (n, 128)-lane shapes, so its ceiling is
# VMEM (3 plane pairs of ny*nx f32 + kernel temps under the 100 MiB
# scoped limit), not the compile search.
MAX_FUSED2D_TILED_ELEMS = 1 << 20


def _fused2d_tiled_kernel(ny, nx, layout, postscale, fy, fx, precision,
                          sign, *refs):
    """Fused 2D DFT with every tile_fft at <= 128 lanes.

    KEPT AS A MEASURED NEGATIVE RESULT (r5) — correct, compiles safely,
    and is NOT routed by the planner.  The monolithic fused kernel
    transforms whole (ny, nx) planes with nx-lane tile_ffts — fine to
    512^2, pathological Mosaic compile at 1024^2 (docs/design.md r3).
    This variant walks 128-lane slices through a VMEM scratch plane to
    keep every op at proven shapes; measured on TPU (probe_f2dtiled):
    0.977 ms vs the monolithic kernel's 0.071 on 4x256^2 — 14x — and a
    scratch-FREE value-level halves variant measured the same (1.017 ms),
    so the cost is Mosaic materializing each lane slice/concat as full
    VMEM relayout rounds, not the scratch.  Conclusion recorded in
    docs/design.md round-5 log: a one-HBM-pass 1024^2 fused tile is
    infeasible on this toolchain in all three constructions; config 3
    stays on the native row+col two-pass schedule.
    """
    nt = sum(arity for _, arity in layout)
    tables = {}
    pos = 0
    for k, arity in layout:
        tables[k] = tuple(refs[pos + j][:] for j in range(arity))
        pos += arity
    re_ref, im_ref, or_ref, oi_ref, sr_ref, si_ref = refs[nt:nt + 6]
    for j in range(nx // LANES):          # y-axis stages, per x-slice
        sl = pl.ds(j * LANES, LANES)
        xr, xi = tile_fft(re_ref[0, :, sl], im_ref[0, :, sl], tables, ny,
                          fy, precision, True, sign)
        sr_ref[:, sl] = xr
        si_ref[:, sl] = xi
    for j in range(ny // LANES):          # x-axis stages, per ky-slice
        rs = pl.ds(j * LANES, LANES)
        xr, xi = tile_fft(sr_ref[rs, :].T, si_ref[rs, :].T, tables, nx,
                          fx, precision, True, sign)
        if postscale != 1.0:
            s = jnp.float32(postscale)
            xr, xi = xr * s, xi * s
        or_ref[0, rs, :] = xr.T
        oi_ref[0, rs, :] = xi.T


@functools.partial(jax.jit, static_argnames=(
    "ny", "nx", "sign", "postscale", "interpret", "factors_y", "factors_x",
    "precision", "alias_io"))
def _fft2_fused_tiled(re, im, *, ny, nx, sign, postscale, interpret,
                      factors_y=None, factors_x=None, precision=_PRECISION,
                      alias_io=False):
    with jax.enable_x64(False):
        L = re.shape[0]
        fy = tuple(factors_y or col_factors(ny))
        fx = tuple(factors_x or col_factors(nx))
        tables = needed_tables(ny, sign, factors=fy, precision=precision)
        tables.update(needed_tables(nx, sign, factors=fx,
                                    precision=precision))
        layout = tuple((k, len(v)) for k, v in tables.items())
        flat = [jnp.asarray(a) for v in tables.values() for a in v]
        tspec = [pl.BlockSpec(a.shape, lambda i, _nd=a.ndim: (0,) * _nd,
                              memory_space=pltpu.VMEM) for a in flat]
        dspec = pl.BlockSpec((1, ny, nx), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_fused2d_tiled_kernel, ny, nx, layout,
                                 float(postscale), fy, fx, precision, sign)
        oshape = jax.ShapeDtypeStruct((L, ny, nx), jnp.float32)
        nd = len(tspec)
        aliases = {nd: 0, nd + 1: 1} if alias_io else {}
        return pl.pallas_call(
            kern, grid=(L,),
            in_specs=tspec + [dspec, dspec],
            out_specs=(dspec, dspec), out_shape=(oshape, oshape),
            input_output_aliases=aliases,
            scratch_shapes=[pltpu.VMEM((ny, nx), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=8 * ny * nx * (sum(fy) + sum(fx)) * L,
                bytes_accessed=L * ny * nx * 4 * 4, transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(*flat, re, im)


def fft2_fused_tiled(re, im, sign, *, postscale: float = 1.0,
                     interpret: bool | None = None, factors_y=None,
                     factors_x=None, precision: str = _PRECISION,
                     alias_io: bool = False):
    """One-HBM-pass 2D DFT for tiles past the monolithic compile ceiling
    (512^2 < ny*nx <= 1024^2); see _fused2d_tiled_kernel."""
    if interpret is None:
        interpret = _interpret_default()
    shape = re.shape
    ny, nx = shape[-2], shape[-1]
    lead = shape[:-2]
    L = math.prod(lead) if lead else 1
    rr, ii = _fft2_fused_tiled(
        re.reshape(L, ny, nx), im.reshape(L, ny, nx), ny=ny, nx=nx,
        sign=sign, postscale=float(postscale), interpret=bool(interpret),
        factors_y=tuple(factors_y) if factors_y else None,
        factors_x=tuple(factors_x) if factors_x else None,
        precision=precision, alias_io=alias_io)
    return rr.reshape(shape), ii.reshape(shape)


def supported_2d(re, im=None) -> bool:
    """Whether the fused 2D kernel covers the last two axes of this array."""
    if re.dtype != jnp.float32 or re.ndim < 2:
        return False
    ny, nx = re.shape[-2], re.shape[-1]
    if not (is_power_of_two(ny) and is_power_of_two(nx)):
        return False
    # both tile dims sit on the minor axis at some point (x on load/store,
    # y after the in-kernel transpose): keep them lane-aligned
    if nx % 128 or ny % 128:
        return False
    return ny * nx <= MAX_FUSED2D_ELEMS


def fft2_fused(re, im, sign, *, postscale: float = 1.0,
               interpret: bool | None = None, factors_y=None, factors_x=None,
               precision: str = _PRECISION, stacked: bool = True,
               alias_io: bool = False, block_l: int = 1):
    """2D DFT over the last two axes of planar f32 arrays, one HBM pass.

    TPU-native fusion of the reference's separate row/column kernel passes
    (SURVEY.md §3.1: per-axis kernel chain): when the whole (ny, nx) tile
    fits VMEM, the y-axis stages, the in-tile transpose, and the x-axis
    stages all happen in registers/VMEM — the data crosses HBM exactly once
    instead of twice.
    """
    if interpret is None:
        interpret = _interpret_default()
    shape = re.shape
    ny, nx = shape[-2], shape[-1]
    lead = shape[:-2]
    L = math.prod(lead) if lead else 1
    rr, ii = _fft2_fused(re.reshape(L, ny, nx), im.reshape(L, ny, nx),
                         ny=ny, nx=nx, sign=sign, postscale=float(postscale),
                         interpret=bool(interpret),
                         factors_y=tuple(factors_y) if factors_y else None,
                         factors_x=tuple(factors_x) if factors_x else None,
                         precision=precision, stacked=stacked,
                         alias_io=alias_io, block_l=int(block_l))
    return rr.reshape(shape), ii.reshape(shape)


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def supported(re, axis: int) -> bool:
    """Whether the Pallas local kernel covers this array/axis combination."""
    if re.dtype != jnp.float32:
        return False
    axis = axis % re.ndim
    n = re.shape[axis]
    if not (is_power_of_two(n) and _MIN_N <= n <= MAX_LOCAL_N):
        return False
    if axis == re.ndim - 1:
        return True
    # column pass: trailing dims become lanes; need at least one lane tile
    trail = math.prod(re.shape[axis + 1:])
    return trail >= LANES


def fft_axis(re, im, sign, *, axis, postscale: float = 1.0,
             interpret: bool | None = None, factors=None,
             precision: str = _PRECISION, stacked: bool = True,
             lanes: int = LANES, tw_n: int = 0, tw_mode: str = "full",
             tw_period: int = 0, swap_store: bool = False, swap_mid: int = 0,
             alias_io: bool = False, ctile: int = 0):
    """DFT along ``axis`` of planar f32 arrays.

    Last axis -> row kernel (in-VMEM transpose brackets); any other axis ->
    column kernel (transform already on sublanes: zero transposes).
    ``tw_n`` (column passes only): fuse the four-step inter-pass twiddle —
    see ``_fft_cols``.
    ``swap_store`` (column passes only): the output comes back with the
    transform axis moved to the *end*, i.e. shape
    ``(*shape[:axis], *shape[axis+1:], n)`` — the digit-swap store of the
    four-step path, done inside the kernel for free.
    """
    axis = axis % re.ndim
    n = re.shape[axis]
    if interpret is None:
        interpret = _interpret_default()
    kw = dict(n=n, sign=sign, postscale=float(postscale),
              interpret=bool(interpret),
              factors=tuple(factors) if factors else None,
              precision=precision, stacked=stacked, lanes=lanes,
              alias_io=bool(alias_io))
    shape = re.shape
    if axis == re.ndim - 1:
        assert not tw_n, "fused twiddle is a column-pass feature"
        assert not swap_store, "swap_store is a column-pass feature"
        if kw["factors"] is None:
            kw["factors"] = row_factors(n)     # autotuned / calibrated
        lead = shape[:-1]
        rows = math.prod(lead) if lead else 1
        r2 = re.reshape(rows, n)
        i2 = im.reshape(rows, n)
        pad = (-rows) % lanes if precision == "int8" else 0
        if pad:
            # the int8 stage's per-tile alignment reads max|x| over the
            # whole block; partial edge blocks are padded with unspecified
            # values by Pallas, so pad to whole lane tiles with zeros
            r2 = jnp.pad(r2, ((0, pad), (0, 0)))
            i2 = jnp.pad(i2, ((0, pad), (0, 0)))
        rr, ii = _fft_rows(r2, i2, **kw)
        if pad:
            rr, ii = rr[:rows], ii[:rows]
        return rr.reshape(*lead, n), ii.reshape(*lead, n)
    lead = math.prod(shape[:axis]) if axis else 1
    trail = math.prod(shape[axis + 1:])
    if kw["factors"] is None:
        kw["factors"] = col_factors(n)     # measured col-kernel chains
    if precision == "int8" and trail % lanes:
        # the int8 stage's per-tile alignment reads max|x| over the whole
        # lane tile; Pallas fills partial edge tiles with unspecified
        # values, which would corrupt the tile scale (and the valid lanes
        # with it) — mirror the row path and pad to whole tiles.
        if swap_store or swap_mid:
            raise ValueError("int8 precision with swap stores needs a "
                             "lane-tile-aligned trail")
        pad = (-trail) % lanes
        r3 = jnp.pad(re.reshape(lead, n, trail), ((0, 0), (0, 0), (0, pad)))
        i3 = jnp.pad(im.reshape(lead, n, trail), ((0, 0), (0, 0), (0, pad)))
        rr, ii = _fft_cols(r3, i3, tw_n=tw_n, tw_mode=tw_mode,
                           tw_period=tw_period, swap_store=swap_store,
                           swap_mid=swap_mid, **kw)
        rr, ii = rr[..., :trail], ii[..., :trail]
        return rr.reshape(shape), ii.reshape(shape)
    if (not ctile and lanes == LANES and n <= 512 and trail % 256 == 0
            and not tw_n and not swap_store and not swap_mid):
        # small-n column blocks are per-step-overhead-bound; doubling the
        # lane tile measured +36% on the 3D z-pass (probe_col8)
        kw["lanes"] = 256
    rr, ii = _fft_cols(re.reshape(lead, n, trail),
                       im.reshape(lead, n, trail), tw_n=tw_n,
                       tw_mode=tw_mode, tw_period=tw_period,
                       swap_store=swap_store, swap_mid=swap_mid,
                       ctile=int(ctile or 0), **kw)
    if swap_store:
        oshape = shape[:axis] + shape[axis + 1:] + (n,)
        return rr.reshape(oshape), ii.reshape(oshape)
    if swap_mid:
        oshape = shape[:axis] + (trail // swap_mid, n, swap_mid)
        return rr.reshape(oshape), ii.reshape(oshape)
    return rr.reshape(shape), ii.reshape(shape)
