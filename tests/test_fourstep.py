"""Four-step global path parity (interpret mode, reduced max_local so the
multi-pass machinery runs at CPU-friendly sizes)."""

import numpy as np
import pytest

from pyfft_tpu.ops import fourstep

from helpers import TOL, rand_complex, rel_err


def planar(x):
    return (np.ascontiguousarray(np.real(x)).astype(np.float32),
            np.ascontiguousarray(np.imag(x)).astype(np.float32))


@pytest.mark.parametrize("n,max_local", [
    (16384, 128),    # 128 x 128: the smallest two-column-pass split
    (65536, 256),    # 256 x 256: both factors AT the cap
    (32768, 256),    # unbalanced 256 x 128
])
def test_fourstep_parity(n, max_local):
    x = rand_complex((4, n), seed=n % 1000)
    re, im = planar(x)
    rr, ii = fourstep.fft_axis_large(re, im, -1, axis=-1,
                                     max_local=max_local, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_fourstep_inverse_postscale():
    n = 16384
    x = rand_complex((2, n), seed=9)
    re, im = planar(x)
    fr, fi = fourstep.fft_axis_large(re, im, -1, axis=-1, max_local=128,
                                     interpret=True)
    br, bi = fourstep.fft_axis_large(fr, fi, +1, axis=-1, max_local=128,
                                     postscale=1.0 / n, interpret=True)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]


def test_choose_split():
    for p in (14, 20, 22, 24):
        n1, n2 = fourstep.choose_split(1 << p)
        assert n1 * n2 == 1 << p
        assert 128 <= n1 <= 8192 and 128 <= n2 <= 8192
    assert fourstep.choose_split(1 << 14) == (128, 128)
    with pytest.raises(ValueError):
        fourstep.choose_split(1 << 25, max_local=256)


def test_huge_two_level_parity():
    """Two-level (six-step) decomposition: parity at a forced-small
    max_local so the multi-level path runs at test sizes (VERDICT round-1
    item 6: the Pallas chain now has no practical upper bound)."""
    import jax.numpy as jnp

    from pyfft_tpu.ops.fourstep import choose_split3, fft_axis_huge

    assert choose_split3(1 << 21, 128) == (128, 128, 128)
    n1, m1, m2 = choose_split3(1 << 28)
    assert n1 * m1 * m2 == 1 << 28

    n = 1 << 21
    x = rand_complex((2, n), seed=90)
    rr, ii = fft_axis_huge(jnp.asarray(x.real), jnp.asarray(x.imag), -1,
                           axis=-1, max_local=128, postscale=0.5,
                           interpret=True)
    got = (np.asarray(rr) + 1j * np.asarray(ii)) * 2.0
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]
    # inverse direction through the same machinery
    br, bi = fft_axis_huge(rr, ii, +1, axis=-1, max_local=128,
                           postscale=1.0 / n, interpret=True)
    back = (np.asarray(br) + 1j * np.asarray(bi)) * 2.0
    assert rel_err(back, x) < TOL[np.complex64]


def test_planner_schedules_huge(monkeypatch):
    """n beyond max_local^2 gets the 'huge' executor on TPU plans."""
    from pyfft_tpu import planner

    plan = planner.build_plan((1 << 28,), np.complex64, on_tpu=True)
    assert [p.executor for p in plan.passes] == ["huge"]
    plan = planner.build_plan((1 << 28,), np.complex64, on_tpu=False)
    assert [p.executor for p in plan.passes] == ["xla"]


# ------------------------------------------------- non-final axes (r3)


@pytest.mark.parametrize("shape,axis,max_local", [
    ((16384, 128), 0, 128),      # 2D row axis, smallest split
    ((2, 32768, 128), 1, 256),   # 3D middle axis with lead dim
])
def test_mid_axis_parity(shape, axis, max_local):
    x = rand_complex(shape, seed=sum(shape) % 997)
    re, im = planar(x)
    assert fourstep.supported_mid(
        __import__("jax.numpy", fromlist=["x"]).asarray(re), axis,
        max_local=max_local)
    rr, ii = fourstep.fft_axis_mid(re, im, -1, axis=axis,
                                   max_local=max_local, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=axis)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_mid_axis_inverse_postscale():
    shape, axis, n = (16384, 128), 0, 16384
    x = rand_complex(shape, seed=77)
    re, im = planar(x)
    fr, fi = fourstep.fft_axis_mid(re, im, -1, axis=axis, max_local=128,
                                   interpret=True)
    br, bi = fourstep.fft_axis_mid(fr, fi, +1, axis=axis, max_local=128,
                                   postscale=1.0 / n, interpret=True)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]


def test_supported_mid_gates():
    import jax.numpy as jnp
    ok = jnp.zeros((16384, 128), jnp.float32)
    assert fourstep.supported_mid(ok, 0, max_local=128)
    # last axis is the large-path's job
    assert not fourstep.supported_mid(ok, 1, max_local=128)
    # trail not a whole number of lane tiles
    assert not fourstep.supported_mid(
        jnp.zeros((16384, 64), jnp.float32), 0, max_local=128)
    # within the local range: not a four-step candidate
    assert not fourstep.supported_mid(
        jnp.zeros((1024, 128), jnp.float32), 0, max_local=8192)
    # level twiddle would exceed its VMEM budget
    assert not fourstep.supported_mid(
        jnp.zeros((1 << 24, 128), jnp.float32), 0, max_local=8192)


def test_planner_schedules_mid_axis():
    from pyfft_tpu import planner

    p = planner.build_plan((16384, 512), np.complex64, on_tpu=True)
    assert [q.executor for q in p.passes] == ["local", "fourstep"]
    mid = p.passes[1]
    assert mid.axis == 0 and mid.split is not None
    # misaligned trail: falls back to XLA rather than a broken kernel
    p = planner.build_plan((16384, 64), np.complex64, on_tpu=True)
    assert [q.executor for q in p.passes] == ["local", "xla"]
    # both axes large: four-step on each, no XLA pass (VERDICT r2 item 4)
    p = planner.build_plan((16384, 16384), np.complex64, on_tpu=True)
    assert [q.executor for q in p.passes] == ["fourstep", "fourstep"]


def test_autotuned_split_override(tmp_path, monkeypatch):
    """utils.tune ``split:{n}`` / ``split3:{n}`` winners override the static
    cost model, and invalid records (wrong product, over-ceiling factors)
    are ignored rather than scheduled (VERDICT r2 item 9)."""
    import json

    from pyfft_tpu.ops import pallas_local
    from pyfft_tpu.utils import tune

    path = tmp_path / "tuned.json"
    json.dump({
        "split:4194304": [512, 8192],          # valid, non-default
        "split:1048576": [512, 512],           # product != n: ignored
        "split:16777216": [16384, 1024],       # factor > max_local: ignored
        "split3:134217728": [512, 1024, 256],  # valid three-level
    }, open(path, "w"))
    monkeypatch.setenv("PYFFT_TPU_TUNE_FILE", str(path))
    pallas_local.reload_tuned()
    try:
        assert fourstep.choose_split(1 << 22) == (512, 8192)
        assert fourstep.choose_split(1 << 20) != (512, 512)
        n1, n2 = fourstep.choose_split(1 << 24)
        assert n1 <= 8192 and n2 <= 8192 and n1 * n2 == 1 << 24
        assert fourstep.choose_split3(1 << 27) == (512, 1024, 256)
        # a tuned record never leaks past a caller's tighter ceiling
        assert fourstep.choose_split(1 << 22, max_local=4096) != (512, 8192)
        # candidate generator: valid decompositions only
        for s in tune._split_candidates(1 << 22):
            assert s[0] * s[1] == 1 << 22
            assert 128 <= s[0] <= 8192 and 128 <= s[1] <= 8192
    finally:
        empty = tmp_path / "empty.json"
        json.dump({}, open(empty, "w"))
        monkeypatch.setenv("PYFFT_TPU_TUNE_FILE", str(empty))
        pallas_local.reload_tuned()
        pallas_local._TUNED = None


def test_fourstep_forced_split_parity():
    """The autotuner's split= hook computes the same transform for every
    candidate decomposition."""
    n = 16384
    x = rand_complex((2, n), seed=3)
    re, im = planar(x)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rr, ii = fourstep.fft_axis_large(re, im, -1, axis=-1, max_local=8192,
                                     split=(128, 128), interpret=True)
    assert rel_err(np.asarray(rr) + 1j * np.asarray(ii), ref) < TOL[np.complex64]
    with pytest.raises(ValueError):
        fourstep.fft_axis_large(re, im, -1, axis=-1, split=(128, 64),
                                interpret=True)


def test_sixstep_forced_split3_parity():
    """The autotuner's split3= hook (``autotune(kinds=("split3",))``)
    computes the same transform for every candidate decomposition, and the
    candidate generator only emits valid ones (VERDICT r3 item 6)."""
    from pyfft_tpu.utils import tune

    n = 1 << 22
    x = rand_complex((1, n), seed=4)
    re, im = planar(x)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    rr, ii = fourstep.fft_axis_huge(re, im, -1, axis=-1, max_local=1024,
                                    split3=(128, 128, 256), interpret=True)
    assert rel_err(np.asarray(rr) + 1j * np.asarray(ii), ref) < TOL[np.complex64]
    with pytest.raises(ValueError):
        fourstep.fft_axis_huge(re, im, -1, axis=-1, split3=(128, 128, 128),
                               interpret=True)
    cands = tune._split3_candidates(1 << 27)
    assert cands, "2^27 must have six-step candidates"
    for n1, m1, m2 in cands:
        assert n1 * m1 * m2 == 1 << 27
        assert 128 <= n1 <= 8192 and m1 <= 8192 and 128 <= m2 <= 8192
