"""Plan API tests: the reference's public contract (SURVEY.md §2.9-bis),
including the five BASELINE acceptance configs at reduced sizes plus the
full-size CPU-runnable ones."""

import numpy as np
import pytest

from pyfft_tpu import Plan
from pyfft_tpu.api import fft, fft2, fftn, ifft

from helpers import TOL, rand_complex, rel_err


def test_int_shape():
    x = rand_complex((64,))
    p = Plan(64)
    assert rel_err(p.execute(x), np.fft.fft(x)) < TOL[np.complex64]


def test_non_power_of_two_raises():
    with pytest.raises(ValueError):
        Plan((24,))
    with pytest.raises(ValueError):
        Plan((16, 24))


def test_bad_rank_raises():
    with pytest.raises(ValueError):
        Plan((2, 2, 2, 2))


def test_bad_dtype_raises():
    with pytest.raises(ValueError):
        Plan((16,), dtype=np.float32)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_roundtrip_1d(dtype):
    """BASELINE config 1: N=1024 batch=1 forward+inverse roundtrip."""
    x = rand_complex((1024,), dtype)
    plan = Plan((1024,), dtype)
    fwd = plan.execute(x)
    assert rel_err(fwd, np.fft.fft(x.astype(np.complex128))) < TOL[dtype]
    rt = plan.execute(fwd, inverse=True)
    assert rel_err(rt, x) < TOL[dtype]


def test_batched_1d():
    """BASELINE config 2 (reduced batch): batched interleaved 1D."""
    x = rand_complex((32, 4096))
    plan = Plan((4096,))
    out = plan.execute(x)
    assert rel_err(out, np.fft.fft(x.astype(np.complex128), axis=-1)) \
        < TOL[np.complex64]


def test_2d_batched():
    """BASELINE config 3 (reduced): 2D with batch."""
    x = rand_complex((4, 256, 256))
    plan = Plan((256, 256))
    out = plan.execute(x)
    ref = np.fft.fft2(x.astype(np.complex128))
    assert rel_err(out, ref) < TOL[np.complex64]


def test_3d():
    """BASELINE config 4 (reduced): 3D single batch."""
    x = rand_complex((64, 64, 64))
    plan = Plan((64, 64, 64))
    out = plan.execute(x)
    ref = np.fft.fftn(x.astype(np.complex128))
    assert rel_err(out, ref) < TOL[np.complex64]


def test_large_1d_c128_split():
    """BASELINE config 5 (reduced): large 1D c128, split complex, batch."""
    n = 2**16
    x = rand_complex((4, n), np.complex128, seed=11)
    plan = Plan((n,), np.complex128)
    rr, ii = plan.execute(np.real(x).copy(), np.imag(x).copy())
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(got, ref) < TOL[np.complex128]
    br, bi = plan.execute(rr, ii, inverse=True)
    assert rel_err(np.asarray(br) + 1j * np.asarray(bi), x) < TOL[np.complex128]


def test_flat_buffer_batch():
    """Reference-style: flat buffer + batch=k (SURVEY.md §2.9-bis)."""
    x = rand_complex((8 * 512,), seed=9)
    plan = Plan((512,))
    out = plan.execute(x, batch=8)
    assert out.shape == x.shape
    ref = np.fft.fft(x.reshape(8, 512).astype(np.complex128)).reshape(-1)
    assert rel_err(out, ref) < TOL[np.complex64]


def test_batch_mismatch_raises():
    plan = Plan((512,))
    with pytest.raises(ValueError):
        plan.execute(rand_complex((1000,)), batch=2)


def test_normalize_off():
    x = rand_complex((256,), seed=10)
    plan = Plan((256,), normalize=False)
    rt = plan.execute(plan.execute(x), inverse=True)
    assert rel_err(rt, x * 256) < TOL[np.complex64]


def test_scale():
    x = rand_complex((128,), seed=12)
    plan = Plan((128,), scale=0.5)
    out = plan.execute(x)
    assert rel_err(out, 0.5 * np.fft.fft(x.astype(np.complex128))) \
        < TOL[np.complex64]


def test_split_interleaved_agree():
    x = rand_complex((2, 1024), seed=13)
    plan = Plan((1024,))
    inter = np.asarray(plan.execute(x))
    rr, ii = plan.execute(np.real(x).copy(), np.imag(x).copy())
    split = np.asarray(rr) + 1j * np.asarray(ii)
    assert rel_err(split, inter) < 1e-6


def test_wait_for_finish_async():
    x = rand_complex((256,), seed=14)
    plan = Plan((256,), wait_for_finish=False)
    out = plan.execute(x)         # async dispatch
    out.block_until_ready()
    assert rel_err(out, np.fft.fft(x.astype(np.complex128))) < TOL[np.complex64]


def test_functional_api():
    x = rand_complex((4, 512), seed=15)
    assert rel_err(fft(x), np.fft.fft(x.astype(np.complex128))) < TOL[np.complex64]
    assert rel_err(ifft(fft(x)), x) < TOL[np.complex64]
    y = rand_complex((8, 32, 64), seed=16)
    assert rel_err(fft2(y), np.fft.fft2(y.astype(np.complex128))) < TOL[np.complex64]
    assert rel_err(fftn(y), np.fft.fftn(y.astype(np.complex128))) < TOL[np.complex64]


def test_backend_shims():
    from pyfft_tpu import cpu, tpu
    x = rand_complex((512,), seed=17)
    ref = np.fft.fft(x.astype(np.complex128))
    assert rel_err(cpu.Plan((512,)).execute(x), ref) < TOL[np.complex64]
    assert rel_err(tpu.Plan((512,)).execute(x), ref) < TOL[np.complex64]


def test_repr():
    assert "1024" in repr(Plan((1024,)))


def test_view_path_interleaved(monkeypatch):
    """The TPU interleaved path (host bitcast view -> planar device compute)
    — forced on CPU by pretending complex dtypes are unavailable."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_complex_on_device_ok", lambda: False)
    x = rand_complex((4, 512), seed=21)
    plan = Plan((512,))
    out = plan.execute(x)
    assert isinstance(out, np.ndarray) and out.dtype == np.complex64
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(out, ref) < TOL[np.complex64]
    rt = plan.execute(out, inverse=True)
    assert rel_err(rt, x) < TOL[np.complex64]


def test_view_path_2d(monkeypatch):
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_complex_on_device_ok", lambda: False)
    x = rand_complex((2, 64, 128), seed=22)
    plan = Plan((64, 128))
    out = plan.execute(x)
    ref = np.fft.fft2(x.astype(np.complex128))
    assert rel_err(out, ref) < TOL[np.complex64]


def test_donate_plan():
    import jax.numpy as jnp
    x = rand_complex((8, 256), seed=23)
    plan = Plan((256,), donate=True)
    re = jnp.asarray(np.real(x).copy())
    im = jnp.asarray(np.imag(x).copy())
    rr, ii = plan.execute(re, im)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_view_path_fused_1d(monkeypatch):
    """TPU-style 1D interleaved: planner labels 'local', the fused
    interleaved kernel runs (interpret mode on CPU)."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_complex_on_device_ok", lambda: False)
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((8, 1024), seed=24)
    plan = Plan((1024,))
    assert [p.executor for p in plan._exec_plan.passes] == ["local"]
    out = plan.execute(x)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(out, ref) < TOL[np.complex64]
    rt = plan.execute(out, inverse=True)
    assert rel_err(rt, x) < TOL[np.complex64]


def test_df64_plan_1d(monkeypatch):
    """complex128 plan routed through the double-float Pallas kernels
    (interpret mode on CPU), parity at the c128 gate."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((4, 2048), seed=31, dtype=np.complex128)
    plan = Plan((2048,), np.complex128)
    assert [p.executor for p in plan._exec_plan.passes] == ["local"]
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(got, ref) < 1e-12
    br, bi = plan.execute(rr, ii, inverse=True)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(rt, x) < TOL[np.complex128]


def test_df64_plan_large_1d(monkeypatch):
    """complex128 four-step (n beyond the df64 local kernel)."""
    import pyfft_tpu.plan as planmod
    import pyfft_tpu.ops.pallas_df64 as dfk
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(dfk, "MAX_LOCAL_N_DF64", 256)
    n = 1 << 16
    x = rand_complex((2, n), seed=32, dtype=np.complex128)
    plan = Plan((n,), np.complex128)
    assert [p.executor for p in plan._exec_plan.passes] == ["fourstep"]
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(got, ref) < TOL[np.complex128]


def test_df64_plan_chunked_batch(monkeypatch):
    """Batched c128 plan over the HBM chunk budget: the lax.map sweep
    routes through the df64 QUAD path with its lean fudge (16 vs the XLA
    recursion's 128 — config-5 throughput fix, r4), parity at the gate."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(planmod, "_HBM_CHUNK_BUDGET", 1 << 20)
    x = rand_complex((8, 2048), seed=34, dtype=np.complex128)
    plan = Plan((2048,), np.complex128)
    # budget 1 MiB / (2048 * 8 B * fudge 16) = chunk 4: two map steps
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(got, ref) < TOL[np.complex128]


def test_df64_view_chunked_batch(monkeypatch):
    """complex-in/complex-out c128 with a batch over the HBM chunk budget:
    execute must split to planar on the HOST (no device-native f64
    deinterleave exists) and run the chunked planar path — the in-jit XLA
    slice/stack fallback compiled a batch-40 2^22 input to 16 GiB of
    padded HLO temps on real TPU (r4i verify-drive OOM)."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_complex_on_device_ok", lambda: False)
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(planmod, "_HBM_CHUNK_BUDGET", 1 << 20)
    x = rand_complex((8, 2048), seed=35, dtype=np.complex128)
    plan = Plan((2048,), np.complex128)
    out = plan.execute(x)
    assert isinstance(out, np.ndarray) and out.dtype == np.complex128
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(out, ref) < TOL[np.complex128]


def test_df64_plan_2d(monkeypatch):
    """complex128 2D: two df64 column/row passes."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((256, 256), seed=33, dtype=np.complex128)
    plan = Plan((256, 256), np.complex128)
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x)
    # two compounded df64 passes with the gate-tuned int8-MXU channels
    # measure ~1.1e-12; the c128 contract gate is 1e-11 (TOL)
    assert rel_err(got, ref) < TOL[np.complex128]


def test_fused2d_plan(monkeypatch):
    """2D c64 plan collapses to one fused kernel pass (interpret mode)."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((2, 256, 128), seed=34)
    plan = Plan((256, 128))
    assert [p.executor for p in plan._exec_plan.passes] == ["fused2d"]
    rr, ii = plan.execute(np.real(x).astype(np.float32),
                          np.imag(x).astype(np.float32))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(1, 2))
    assert rel_err(got, ref) < TOL[np.complex64]
    br, bi = plan.execute(rr, ii, inverse=True)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(rt, x) < TOL[np.complex64]


def test_df64_view_path(monkeypatch):
    """complex128 interleaved (complex-in/complex-out) on a TPU-style
    backend: host bitcast view -> planar df64 quad compute."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_complex_on_device_ok", lambda: False)
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((3, 512), seed=41, dtype=np.complex128)
    plan = Plan((512,), np.complex128)
    out = plan.execute(x)
    assert isinstance(out, np.ndarray) and out.dtype == np.complex128
    ref = np.fft.fft(x, axis=-1)
    assert rel_err(out, ref) < TOL[np.complex128]
    rt = plan.execute(out, inverse=True)
    assert rel_err(rt, x) < TOL[np.complex128]


def test_multipass_inverse_normalize(monkeypatch):
    """Regression: on a MULTI-pass Pallas plan (2D above the fused2d cap),
    the inverse 1/N normalization and user scale must survive — round 1
    cleared scale_left whenever ANY pass folded its (unit) postscale,
    silently dropping 1/N on every multi-pass inverse (ADVICE.md high)."""
    import pyfft_tpu.plan as planmod
    from pyfft_tpu.ops import pallas_local
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    # force the multi-pass shape class at interpret-mode-friendly sizes
    monkeypatch.setattr(pallas_local, "MAX_FUSED2D_ELEMS", 2 ** 14)
    x = rand_complex((128, 256), seed=77)
    plan = Plan((128, 256))
    execs = [p.executor for p in plan._exec_plan.passes]
    assert len(execs) == 2 and all(e == "local" for e in execs), execs
    rr, ii = plan.execute(np.real(x).astype(np.float32),
                          np.imag(x).astype(np.float32))
    br, bi = plan.execute(rr, ii, inverse=True)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    ref = np.fft.ifftn(np.fft.fftn(x.astype(np.complex128)))
    assert rel_err(rt, ref) < TOL[np.complex64]
    # user scale on a multi-pass forward
    plan_s = Plan((128, 256), scale=0.25)
    sr, si = plan_s.execute(np.real(x).astype(np.float32),
                            np.imag(x).astype(np.float32))
    got = np.asarray(sr) + 1j * np.asarray(si)
    assert rel_err(got, 0.25 * np.fft.fftn(x.astype(np.complex128))) \
        < TOL[np.complex64]


def test_df64_fallback_to_xla(monkeypatch):
    """c128 shape with a pass the df64 kernels don't cover (column trail
    < 128 lanes) silently falls back to the XLA f64 path — same results."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((256, 64), seed=42, dtype=np.complex128)
    plan = Plan((256, 64), np.complex128)
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x)
    assert rel_err(got, ref) < 1e-12


def test_fast_math_selects_chains(monkeypatch):
    """fast_math=True -> MXU default chains; fast_math=False -> exact VPU
    butterfly chains (the reference's precise-trig mode, SURVEY §2.9-bis).
    Both must hold the c64 tolerance gate; the selected factor chains must
    actually differ (VERDICT round-1 item 7: the flag was inert)."""
    import jax.numpy as jnp

    import pyfft_tpu.plan as planmod
    from pyfft_tpu.ops import pallas_local

    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    seen = []
    orig = pallas_local.fft_axis

    def spy(re, im, sign, **kw):
        seen.append(kw.get("factors"))
        return orig(re, im, sign, **kw)

    monkeypatch.setattr(pallas_local, "fft_axis", spy)
    x = rand_complex((8, 1024), seed=40)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)

    rr, ii = Plan((1024,), fast_math=True).execute(re, im)
    assert seen[-1] is None          # calibrated MXU chain
    assert rel_err(np.asarray(rr) + 1j * np.asarray(ii), ref) \
        < TOL[np.complex64]

    rr, ii = Plan((1024,), fast_math=False).execute(re, im)
    assert seen[-1] == pallas_local.butterfly_factors(1024) == (4,) * 5
    assert rel_err(np.asarray(rr) + 1j * np.asarray(ii), ref) \
        < TOL[np.complex64]


def test_fast_math_false_large_n_still_works(monkeypatch):
    """Above MAX_BUTTERFLY_N the precise chain falls back to the default
    (still within the documented gate) instead of an unsafe compile."""
    from pyfft_tpu.ops import pallas_local

    assert pallas_local.precise_factors(2048) == (2,) + (4,) * 5
    assert pallas_local.precise_factors(4096) is None
    x = rand_complex((4, 4096), seed=41)
    out = Plan((4096,), fast_math=False).execute(x)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(out, ref) < TOL[np.complex64]


def test_warmup_compiles(tmp_path, monkeypatch):
    """pyfft_tpu.warmup precompiles plan executables (and the persistent
    compile cache engages) — VERDICT round-1 item 5."""
    import pyfft_tpu
    import pyfft_tpu.utils.cache as cachemod

    monkeypatch.setattr(cachemod, "_enabled", False)
    monkeypatch.setenv("PYFFT_TPU_CACHE_DIR", str(tmp_path / "xc"))
    n = pyfft_tpu.warmup([64, (32, 32)], batches=(1, 4))
    assert n == 2 * 2 * 2  # shapes x batches x directions
    x = rand_complex((4, 64), seed=50)
    out = Plan((64,)).execute(x)
    assert rel_err(out, np.fft.fft(x.astype(np.complex128), axis=-1)) \
        < TOL[np.complex64]


def test_api_axis_kwargs():
    """numpy-style axis/axes selection on the functional API."""
    rng = np.random.RandomState(60)
    x = (rng.standard_normal((8, 64, 4))
         + 1j * rng.standard_normal((8, 64, 4))).astype(np.complex64)
    got = fft(x, axis=1)
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    assert rel_err(got, ref) < TOL[np.complex64]
    got = fft2(np.swapaxes(x, 0, 2), axes=(2, 1))
    ref = np.fft.fftn(np.swapaxes(x, 0, 2).astype(np.complex128),
                      axes=(2, 1))
    assert rel_err(got, ref) < TOL[np.complex64]
    got = fftn(x, axes=(1,))
    assert rel_err(got, np.fft.fft(x.astype(np.complex128), axis=1)) \
        < TOL[np.complex64]
    with pytest.raises(ValueError):
        fftn(x, axes=(1, 1))


def test_fast_math_false_c128(monkeypatch):
    """fast_math=False restores the all-butterfly df64 chains for c128
    (review finding: the int8-MXU default left the flag inert there)."""
    import pyfft_tpu.plan as planmod
    from pyfft_tpu.ops import pallas_df64

    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((2, 1024), seed=70, dtype=np.complex128)
    ref = np.fft.fft(x, axis=-1)

    seen = []
    orig = pallas_df64.fft_axis_df64

    def spy(planes, sign, **kw):
        out = orig(planes, sign, **kw)
        seen.append(kw.get("fast_math", True))
        return out

    monkeypatch.setattr(pallas_df64, "fft_axis_df64", spy)
    rr, ii = Plan((1024,), np.complex128, fast_math=False).execute(
        np.real(x), np.imag(x))
    assert seen and seen[-1] is False
    got = np.asarray(rr) + 1j * np.asarray(ii)
    # butterfly chains hold the tighter pre-round-2 accuracy
    assert rel_err(got, ref) < 1e-12


def test_api_axis_validation():
    """Out-of-range / wrong-arity axes raise instead of silently wrapping
    (review finding: axis=2 on a 2D array used to transform axis 0)."""
    x = rand_complex((8, 64))
    with pytest.raises(ValueError):
        fft(x, axis=2)
    with pytest.raises(ValueError):
        fft(x, axis=-3)
    with pytest.raises(ValueError):
        fft2(x, axes=(0,))
    with pytest.raises(ValueError):
        fftn(x, axes=(0, 1, 0))


def test_plan_huge_two_level(monkeypatch):
    """Plan-level integration of the two-level six-step executor
    (forced small local ceiling so it runs at test sizes)."""
    import pyfft_tpu.plan as planmod
    from pyfft_tpu.ops import pallas_local

    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    monkeypatch.setattr(pallas_local, "MAX_LOCAL_N", 128)
    n = 1 << 21
    plan = Plan((n,), scale=0.5)
    assert [p.executor for p in plan._exec_plan.passes] == ["huge"]
    x = rand_complex((2, n), seed=91)
    rr, ii = plan.execute(x.real.copy(), x.imag.copy())
    got = (np.asarray(rr) + 1j * np.asarray(ii)) * 2.0
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]
    br, bi = plan.execute(rr, ii, inverse=True)
    # the user scale folds into BOTH directions: roundtrip carries 0.25
    back = (np.asarray(br) + 1j * np.asarray(bi)) * 4.0
    assert rel_err(back, x) < TOL[np.complex64]


def test_mid_axis_fourstep_plan(monkeypatch):
    """A large NON-final axis rides the strided-twiddle four-step — no
    XLA pass anywhere in the plan (VERDICT r2 item 4; interpret on CPU)."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    plan = Plan((16384, 128))
    assert [p.executor for p in plan._exec_plan.passes] == \
        ["local", "fourstep"]
    x = rand_complex((16384, 128), seed=41)
    rr, ii = plan.execute(np.real(x).astype(np.float32),
                          np.imag(x).astype(np.float32))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128))
    assert rel_err(got, ref) < TOL[np.complex64]
    br, bi = plan.execute(rr, ii, inverse=True)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(rt, x) < TOL[np.complex64]


def test_df64_staged_multipass(monkeypatch):
    """Multi-pass c128 plans on TPU dispatch each df64 pass as its OWN
    compiled program (the r4 512^2 de-monolith): the planar callable is
    the unjitted composition, and parity holds through it."""
    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((256, 256), seed=41, dtype=np.complex128)
    plan = Plan((256, 256), np.complex128)
    fn = plan._get_callable((), False, "planar")
    # the staged path returns a plain function, not a jitted executable
    assert not hasattr(fn, "lower")
    rr, ii = plan.execute(np.real(x), np.imag(x))
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x, axes=(-2, -1))
    assert rel_err(got, ref) < TOL[np.complex128]


def test_hbm_chunk_budget_sources(monkeypatch):
    """_hbm_chunk_budget: module override wins; else the device's
    bytes_limit/4; else the 4 GiB v5e constant (r4 verdict weak #7)."""
    import pyfft_tpu.plan as planmod

    monkeypatch.setattr(planmod, "_HBM_CHUNK_BUDGET", 123)
    assert planmod._hbm_chunk_budget() == 123

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 16 << 30}

    monkeypatch.setattr(planmod, "_HBM_CHUNK_BUDGET", None)
    monkeypatch.setattr(planmod, "_HBM_BUDGET_CACHE", None)
    monkeypatch.setattr(planmod.jax, "local_devices", lambda: [FakeDev()])
    assert planmod._hbm_chunk_budget() == 4 << 30

    class NoStats:
        def memory_stats(self):
            return None

    monkeypatch.setattr(planmod, "_HBM_BUDGET_CACHE", None)
    monkeypatch.setattr(planmod.jax, "local_devices", lambda: [NoStats()])
    assert planmod._hbm_chunk_budget() == 4 << 30


def test_il1d_route_record(monkeypatch):
    """_il1d_route follows the autotune record and falls back to the
    calibrated streaming default on anything unrecognized (r4 verdict
    weak #4: route by measured cost, not capability order)."""
    import pyfft_tpu.plan as planmod
    from pyfft_tpu.ops import pallas_local

    records = {}
    monkeypatch.setattr(pallas_local, "_tuned_factors",
                        lambda kind, n: records.get(f"{kind}:{n}"))
    assert planmod._il1d_route(4096) == "stream"      # no record
    records["il1d:4096"] = ["fused"]
    assert planmod._il1d_route(4096) == "fused"
    records["il1d:4096"] = ["stream"]
    assert planmod._il1d_route(4096) == "stream"
    records["il1d:4096"] = ["garbage"]                # corrupt record
    assert planmod._il1d_route(4096) == "stream"


def test_df64_staged_multipass_all_splits(monkeypatch):
    """The 512^2 de-monolith must cover every split form: a jitted
    "complex"/"view" wrapper would rebuild the monolithic multi-kernel
    df64 program the staged planar path exists to avoid (r5 review)."""
    import jax.numpy as jnp

    import pyfft_tpu.plan as planmod
    monkeypatch.setattr(planmod, "_on_tpu", lambda: True)
    x = rand_complex((256, 256), seed=42, dtype=np.complex128)
    plan = Plan((256, 256), np.complex128)
    for split in ("planar", "complex"):
        fn = plan._get_callable((), False, split)
        assert not hasattr(fn, "lower"), f"{split} callable is a monolith"
    got = np.asarray(plan._get_callable((), False, "complex")(jnp.asarray(x)))
    ref = np.fft.fftn(x, axes=(-2, -1))
    assert rel_err(got, ref) < TOL[np.complex128]
