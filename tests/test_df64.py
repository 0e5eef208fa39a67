"""Double-float (two-f32) arithmetic and the df64 Pallas FFT path.

The complex128 parity gate is ~1e-11 (BASELINE); df64 unit roundoff is
~2^-48, so the kernels should land near 1e-13 on these sizes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyfft_tpu.ops import df64
from pyfft_tpu.ops import pallas_df64


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float64)


def test_split_combine_roundtrip():
    x = _rand((64,), 1) * 1e3
    hi, lo = df64.split_f64(x)
    back = df64.combine_f64(hi, lo)
    assert np.abs(back - x).max() / np.abs(x).max() < 2 ** -46


@pytest.mark.parametrize("op,ref", [
    ("df_add", np.add),
    ("df_mul", np.multiply),
])
def test_df_arith(op, ref):
    a = _rand((512,), 2)
    b = _rand((512,), 3)
    ah, al = df64.split_f64(a)
    bh, bl = df64.split_f64(b)
    rh, rl = getattr(df64, op)(jnp.asarray(ah), jnp.asarray(al),
                               jnp.asarray(bh), jnp.asarray(bl))
    got = df64.combine_f64(np.asarray(rh), np.asarray(rl))
    want = ref(a, b)
    assert np.abs(got - want).max() / np.abs(want).max() < 2 ** -45


def test_df_cmul():
    a = _rand((256,), 4) + 1j * _rand((256,), 5)
    b = _rand((256,), 6) + 1j * _rand((256,), 7)
    quads = []
    for z in (a, b):
        for plane in (z.real, z.imag):
            hi, lo = df64.split_f64(plane)
            quads += [jnp.asarray(hi), jnp.asarray(lo)]
    rh, rl, ih, il = df64.df_cmul(*quads)
    got = (df64.combine_f64(np.asarray(rh), np.asarray(rl))
           + 1j * df64.combine_f64(np.asarray(ih), np.asarray(il)))
    want = a * b
    assert np.abs(got - want).max() / np.abs(want).max() < 2 ** -44


def _quad(x):
    out = []
    for plane in (x.real, x.imag):
        hi, lo = df64.split_f64(plane)
        out += [jnp.asarray(hi), jnp.asarray(lo)]
    return tuple(out)


def _unquad(planes):
    rh, rl, ih, il = (np.asarray(p) for p in planes)
    return df64.combine_f64(rh, rl) + 1j * df64.combine_f64(ih, il)


@pytest.mark.parametrize("n", [8, 64, 256, 1024])
def test_df64_fft_rows_parity(n):
    x = _rand((16, n), n) + 1j * _rand((16, n), n + 1)
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.parametrize("n", [16, 256])
def test_df64_fft_cols_parity(n):
    x = _rand((2, n, 128), n) + 1j * _rand((2, n, 128), n + 3)
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=1, interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_df64_inverse_roundtrip():
    n = 512
    x = _rand((4, n), 11) + 1j * _rand((4, n), 12)
    fwd = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, interpret=True)
    back = pallas_df64.fft_axis_df64(fwd, +1, axis=-1, postscale=1.0 / n,
                                     interpret=True)
    got = _unquad(back)
    assert np.abs(got - x).max() / np.abs(x).max() < 1e-12


def test_df64_fourstep_parity():
    n = 1 << 16
    x = _rand((2, n), 13) + 1j * _rand((2, n), 14)
    out = pallas_df64.fft_axis_large_df64(_quad(x), -1, axis=-1,
                                          max_local=256, interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_df64_nonpow2_scale():
    """Arbitrary user scale goes through the general df64 path."""
    n = 64
    x = _rand((4, n), 15) + 1j * _rand((4, n), 16)
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, postscale=0.3,
                                    interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1) * 0.3
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_df64_fourstep_threepass_parity():
    """The 3-pass form (swap-store kernel too big): col+tw, row, XLA swap."""
    n = 1 << 16
    x = _rand((2, n), 17) + 1j * _rand((2, n), 18)
    out = pallas_df64.fft_axis_large_df64(_quad(x), -1, axis=-1,
                                          max_local=256, swap_max=128,
                                          interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


# The int8-MXU chains are exact on the CPU interpreter too since df64's
# two_sum moved to the rewrite-immune branch form (XLA's simplifier broke
# the Knuth form under fusion — see ops/df64.py).
_INT8_INTERP_TOL = 1e-12


def test_df64_int8_mxu_stage():
    """int8-split exact MXU DFT stages (the c128 throughput path): parity
    for mxu factor chains, forward and inverse."""
    for n in (64, 256, 2048):
        facs = pallas_df64.mxu_factors_df64(n)
        assert facs[-1] == 64
        x = _rand((3, n), 40 + n % 37) + 1j * _rand((3, n), 41 + n % 37)
        out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, factors=facs,
                                        interpret=True)
        got = _unquad(out)
        ref = np.fft.fft(x, axis=-1)
        tol = 1e-12 if len(facs) == 1 else _INT8_INTERP_TOL
        assert np.abs(got - ref).max() / np.abs(ref).max() < tol
        inv = pallas_df64.fft_axis_df64(_quad(got), +1, axis=-1, factors=facs,
                                        postscale=1.0 / n, interpret=True)
        back = _unquad(inv)
        assert np.abs(back - x).max() / np.abs(x).max() < tol


def test_df64_int8_mxu_wide_dynamic_range():
    """Per-tile alignment must hold across wide element magnitude spreads."""
    n = 256
    rng = np.random.RandomState(5)
    mag = np.exp(rng.uniform(-20, 20, (2, n)))
    x = (_rand((2, n), 42) * mag) + 1j * (_rand((2, n), 43) * mag)
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1,
                                    factors=pallas_df64.mxu_factors_df64(n),
                                    interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    # wide dynamic range is exactly where the gate-tuned channel budget is
    # spent (absolute floor ~2^-46 of the tile max): assert the contract
    # gate, not the quiet-data figure
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11


def test_df64_huge_two_level_parity():
    """Two-level (six-step) df64 chain: c128 beyond one four-step level
    (VERDICT r2 item 5), at a forced-small max_f so the three passes —
    factored twiddle + swap, strided twiddle + mid-swap, plain — all run
    at CPU test sizes."""
    n = 1 << 21
    x = _rand((n,), 23) + 1j * _rand((n,), 24)
    out = pallas_df64.fft_axis_huge_df64(_quad(x), -1, axis=-1, max_f=128,
                                         postscale=0.5, interpret=True)
    got = _unquad(out) * 2.0
    ref = np.fft.fft(x)
    # the three-level chain (factored-twiddle df64 product + two fused
    # twiddle layers) lands at ~1.1e-12 — 9x inside the 1e-11 gate
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-12
    # inverse through the same machinery
    back = pallas_df64.fft_axis_huge_df64(out, +1, axis=-1, max_f=128,
                                          postscale=1.0 / n, interpret=True)
    rt = _unquad(back) * 2.0
    assert np.abs(rt - x).max() / np.abs(x).max() < 3e-12


def test_df64_planner_schedules_huge():
    """c128 beyond 2^24 gets the huge executor (no XLA cliff)."""
    from pyfft_tpu import planner

    p = planner.build_plan((1 << 26,), np.complex128, on_tpu=True)
    assert [q.executor for q in p.passes] == ["huge"]


@pytest.mark.parametrize("factors", [(8, 64), (8, 2, 64), (8, 4, 64),
                                     (8, 8, 32)])
def test_df64_radix8_fold_chains(factors):
    """Radix-8 df64 butterflies + the folded int8 tail (r3 c128
    throughput work): parity and the fold tables actually engaging."""
    import math
    n = math.prod(factors)
    x = _rand((8, n), 31) + 1j * _rand((8, n), 32)
    tabs = pallas_df64.needed_tables_df64(n, -1, factors)
    assert ("wi8fold", tuple(factors)) in tabs
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, factors=factors,
                                    interpret=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11
    # inverse
    back = pallas_df64.fft_axis_df64(out, +1, axis=-1, factors=factors,
                                     postscale=1.0 / n, interpret=True)
    rt = _unquad(back)
    assert np.abs(rt - x).max() / np.abs(x).max() < 1e-11


@pytest.mark.parametrize("factors", [(8, 4, 64), (4, 8, 64), (8, 8, 32),
                                     (2, 4, 64)])
def test_df64_fold2_chains(factors):
    """Two-level fold (r4): BOTH twiddle rounds folded into the int8
    tail tables; only the w_{f0*f1}^(k0*j1) constants remain between the
    butterflies.  Parity both signs + the fold2 tables engaging."""
    import math
    n = math.prod(factors)
    x = _rand((8, n), 41) + 1j * _rand((8, n), 42)
    tabs = pallas_df64.needed_tables_df64(n, -1, factors, fold2=True)
    assert ("wi8fold2", tuple(factors)) in tabs
    assert not any(k[0] == "tw" for k in tabs)
    out = pallas_df64.fft_axis_df64(_quad(x), -1, axis=-1, factors=factors,
                                    interpret=True, fold2=True)
    got = _unquad(out)
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11
    back = pallas_df64.fft_axis_df64(out, +1, axis=-1, factors=factors,
                                     postscale=1.0 / n, interpret=True,
                                     fold2=True)
    rt = _unquad(back)
    assert np.abs(rt - x).max() / np.abs(x).max() < 1e-11


def test_df64_default_chain_uses_radix8():
    assert pallas_df64.mxu_factors_df64(2048) == (8, 4, 64)
    assert pallas_df64.mxu_factors_df64(1024) == (8, 2, 64)
    # n=4096 stays radix-4: radix-8's live slices blow the VMEM scoped
    # limit there (measured 121M > 100M on TPU)
    assert pallas_df64.mxu_factors_df64(4096) == (4, 4, 4, 64)


def test_tile_fft_df64_rank4_layout():
    """The r3 stage-layout contract: tile_fft_df64 works directly on
    (n, lanes) quads with the rank-4 (f, 1, r, 1) twiddle tables, for
    butterfly-only, MXU-tail, and folded-tail chains alike."""
    for n, factors in ((256, (4, 4, 4, 4)),       # butterflies only
                       (256, (4, 64,)),           # MXU tail, no fold
                       (512, (8, 64,))):          # folded tail
        x = _rand((n, 128), n) + 1j * _rand((n, 128), n + 9)
        tabs = pallas_df64.needed_tables_df64(n, -1, factors)
        for k, v in tabs.items():
            if k[0] == "tw":
                assert all(a.ndim == 4 and a.shape[1] == a.shape[3] == 1
                           for a in v), (k, [a.shape for a in v])
        planes = tuple(jnp.asarray(p) for p in _quad(x))
        tabs_j = {k: tuple(jnp.asarray(a) for a in v)
                  for k, v in tabs.items()}
        out = pallas_df64.tile_fft_df64(planes, tabs_j, n, factors)
        got = _unquad(out)
        ref = np.fft.fft(x, axis=0)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11, factors


def test_df64_autotuned_dsplit_override(tmp_path, monkeypatch):
    """``dsplit:{n}`` autotune records steer the df64 four-step split;
    invalid records are ignored (the c128 analog of split:{n})."""
    import json

    from pyfft_tpu.ops import pallas_local

    path = tmp_path / "tuned.json"
    json.dump({
        "dsplit:4194304": [1024, 4096],      # valid, non-balanced
        "dsplit:1048576": [256, 256],        # product != n: ignored
    }, open(path, "w"))
    monkeypatch.setenv("PYFFT_TPU_TUNE_FILE", str(path))
    pallas_local.reload_tuned()
    try:
        assert pallas_df64._choose_split_df64(1 << 22, 4096) == (1024, 4096)
        assert pallas_df64._choose_split_df64(1 << 20, 4096) == (1024, 1024)
        # a record over the caller's ceiling falls back to balanced
        assert pallas_df64._choose_split_df64(1 << 22, 2048) == (2048, 2048)
    finally:
        empty = tmp_path / "empty.json"
        json.dump({}, open(empty, "w"))
        monkeypatch.setenv("PYFFT_TPU_TUNE_FILE", str(empty))
        pallas_local.reload_tuned()
        pallas_local._TUNED = None


def test_df64_fourstep_forced_split_parity():
    """The autotuner's split= hook: every candidate decomposition computes
    the same transform (two-pass and three-pass forms both)."""
    n = 1 << 16
    x = _rand((2, n), 23) + 1j * _rand((2, n), 24)
    ref = np.fft.fft(x, axis=-1)
    for split in ((128, 512), (512, 128)):
        out = pallas_df64.fft_axis_large_df64(
            _quad(x), -1, axis=-1, max_local=512, swap_max=256,
            split=split, interpret=True)
        got = _unquad(out)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12, split
    with pytest.raises(ValueError):
        pallas_df64.fft_axis_large_df64(_quad(x), -1, axis=-1,
                                        split=(128, 128), interpret=True)


def test_butterfly_env_override(monkeypatch):
    """PYFFT_TPU_DF64_BUTTERFLY=1 routes default df64 chains through the
    exact butterfly kernels (the r5 compile-service-regression escape
    hatch) at full parity."""
    import numpy as np

    from pyfft_tpu.ops.df64 import split_f64
    from pyfft_tpu.ops.pallas_df64 import fft_axis_df64

    monkeypatch.setenv("PYFFT_TPU_DF64_BUTTERFLY", "1")
    rng = np.random.RandomState(9)
    x = (rng.standard_normal((8, 512))
         + 1j * rng.standard_normal((8, 512))).astype(np.complex128)
    rh, rl = split_f64(x.real)
    ih, il = split_f64(x.imag)
    out = fft_axis_df64((rh, rl, ih, il), -1, axis=-1)
    got = (np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
           + 1j * (np.asarray(out[2], np.float64)
                   + np.asarray(out[3], np.float64)))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11
