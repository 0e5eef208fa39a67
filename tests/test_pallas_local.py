"""Pallas local-kernel parity tests (interpret mode on CPU; same kernel code
compiles for TPU — set PYFFT_TPU_TEST_PLATFORM=tpu to run compiled)."""

import numpy as np
import pytest

from pyfft_tpu.ops import pallas_local
from pyfft_tpu.ops.pallas_local import fft_axis, needed_tables, tile_fft

from helpers import TOL, rand_complex, rel_err


def planar(x):
    return (np.ascontiguousarray(np.real(x)).astype(np.float32),
            np.ascontiguousarray(np.imag(x)).astype(np.float32))


@pytest.mark.parametrize("n", [8, 16, 64, 128, 256, 1024, 4096])
@pytest.mark.parametrize("stacked", [True, False])
def test_tile_fft_parity(n, stacked):
    """The in-kernel tile math, run as a plain traced function.
    Tile layout is (n, lanes): transform along axis 0."""
    import jax.numpy as jnp
    x = rand_complex((n, 16), seed=n)   # 16 lanes of batch
    tables = {k: tuple(jnp.asarray(a) for a in v)
              for k, v in needed_tables(n, -1, stacked=stacked).items()}
    re, im = planar(x)
    rr, ii = tile_fft(jnp.asarray(re), jnp.asarray(im), tables, n,
                      stacked=stacked)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=0)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("factors", [(16, 16, 16), (4, 32, 32), (2, 2, 2, 2)])
def test_tile_fft_multi_factor(factors):
    """Mixed-radix stage chains of any depth agree with numpy."""
    import jax.numpy as jnp
    import math
    n = math.prod(factors)
    x = rand_complex((n, 8), seed=n + 1)
    tables = {k: tuple(jnp.asarray(a) for a in v)
              for k, v in needed_tables(n, -1, factors=factors).items()}
    re, im = planar(x)
    rr, ii = tile_fft(jnp.asarray(re), jnp.asarray(im), tables, n,
                      factors=factors)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=0)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("n", [8, 128, 1024, 4096])
@pytest.mark.parametrize("rows", [1, 8, 40, 130])
def test_kernel_parity(n, rows):
    """Full pallas_call path (interpret mode), ragged row tiles included."""
    x = rand_complex((rows, n), seed=rows * 7 + n)
    re, im = planar(x)
    rr, ii = fft_axis(re, im, -1, axis=-1)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_kernel_inverse_and_postscale():
    n = 512
    x = rand_complex((16, n), seed=5)
    re, im = planar(x)
    fr, fi = fft_axis(re, im, -1, axis=-1)
    br, bi = fft_axis(fr, fi, +1, axis=-1, postscale=1.0 / n)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]


def test_kernel_leading_dims():
    """3D input: leading dims fold into rows."""
    x = rand_complex((3, 5, 256), seed=8)
    re, im = planar(x)
    rr, ii = fft_axis(re, im, -1, axis=-1)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_supported():
    import jax.numpy as jnp
    a = jnp.zeros((4, 1024), jnp.float32)
    assert pallas_local.supported(a, 1)
    assert pallas_local.supported(a, -1)
    assert not pallas_local.supported(a, 0)
    assert not pallas_local.supported(jnp.zeros((4, 24), jnp.float32), 1)
    assert not pallas_local.supported(jnp.zeros((4, 4), jnp.float32), 1)
    assert not pallas_local.supported(jnp.zeros((4, 1024), jnp.float64), 1)
    assert not pallas_local.supported(jnp.zeros((4, 2 * pallas_local.MAX_LOCAL_N), jnp.float32), 1)


@pytest.mark.parametrize("shape,axis", [
    ((2, 256, 256), 1),       # 2D column pass (batched)
    ((512, 256), 0),          # 2D column, no lead
    ((2, 64, 32, 128), 1),    # 3D z-axis (trailing dims fold to lanes)
    ((128, 140), 0),          # ragged lanes
])
def test_column_kernel_parity(shape, axis):
    x = rand_complex(shape, seed=sum(shape))
    re, im = planar(x)
    rr, ii = fft_axis(re, im, -1, axis=axis)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=axis)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("tw_n", [0, 256 * 16])
def test_column_kernel_ctile(tw_n):
    """Multi-lane-tile blocks (opt-in experiment; measured slower on TPU
    but kept correct — see _fft_cols ``ctile``)."""
    shape, axis = (2, 256, 1024), 1
    x = rand_complex(shape, seed=7)
    re, im = planar(x)
    rr, ii = fft_axis(re, im, -1, axis=axis, tw_n=tw_n, ctile=8)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=axis)
    if tw_n:
        k = np.arange(256)[:, None]
        j = np.arange(1024)[None, :]
        ref = ref * np.exp(-2j * np.pi * k * j / tw_n)[None]
    assert rel_err(got, ref) < TOL[np.complex64]


def test_column_kernel_supported():
    import jax.numpy as jnp
    a = jnp.zeros((4, 1024, 256), jnp.float32)
    assert pallas_local.supported(a, 1)
    assert pallas_local.supported(a, -2)
    b = jnp.zeros((1024, 64), jnp.float32)   # too few lanes for a column pass
    assert not pallas_local.supported(b, 0)


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("rows", [1, 40])
def test_interleaved_fused_kernel(n, rows):
    """Interleaved (bitcast complex view) in/out, fully fused."""
    from pyfft_tpu.ops.pallas_local import fft_rows_interleaved
    x = rand_complex((rows, n), seed=n + rows)
    v = np.ascontiguousarray(x).view(np.float32)       # (rows, 2n)
    out = np.asarray(fft_rows_interleaved(v, -1)).view(np.complex64)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(out, ref) < TOL[np.complex64]
    # inverse with postscale
    back = np.asarray(fft_rows_interleaved(
        np.ascontiguousarray(out).view(np.float32), +1,
        postscale=1.0 / n)).view(np.complex64)
    assert rel_err(back, x) < TOL[np.complex64]


def test_row_swap_store():
    """Row kernel with digit-swap store (four-step pass 2): the spectral
    tile lands untransposed at the swapped position -> (lead, n, n1)."""
    import jax.numpy as jnp
    x = rand_complex((2, 256, 512), seed=77)
    rr, ii = pallas_local.fft_rows_swap(
        jnp.asarray(x.real), jnp.asarray(x.imag), -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.transpose(np.fft.fft(x.astype(np.complex128), axis=-1),
                       (0, 2, 1))
    assert got.shape == (2, 512, 256)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_fourstep_variant_b_parity():
    """col+tw (no swap) then row+swap-store == the full DFT in order."""
    import jax.numpy as jnp
    n1, n2 = 256, 512
    n = n1 * n2
    x = rand_complex((2, n), seed=78)
    r = jnp.asarray(x.real.reshape(2, n1, n2))
    i = jnp.asarray(x.imag.reshape(2, n1, n2))
    r, i = pallas_local.fft_axis(r, i, -1, axis=-2, tw_n=n, interpret=True)
    r, i = pallas_local.fft_rows_swap(r, i, -1, postscale=2.0,
                                      interpret=True)
    got = (np.asarray(r) + 1j * np.asarray(i)).reshape(2, n)
    ref = 2.0 * np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("n,rows", [(256, 200), (2048, 64)])
def test_int8_precision_mode(n, rows):
    """Exact int8-split MXU mode (precision='int8'): parity inside the c64
    gate.  Measured slower than HIGHEST on v5e (see the _I8_* comment) —
    kept as correct optional machinery."""
    import jax.numpy as jnp
    x = rand_complex((rows, n), seed=n + rows + 7)
    rr, ii = fft_axis(jnp.asarray(x.real), jnp.asarray(x.imag), -1,
                      axis=-1, precision="int8", interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("factors", [
    (8, 8), (8, 64), (2, 8, 16), (8, 8, 64), (8, 4, 2, 8)])
def test_tile_fft_radix8(factors):
    """Radix-8 fused butterflies compose with every other stage kind
    (r3 headline work: fewer VPU stage rounds than 4,4)."""
    import jax.numpy as jnp
    import math
    n = math.prod(factors)
    x = rand_complex((n, 8), seed=n + 3)
    for sign, ref in ((-1, np.fft.fft), (+1, np.fft.ifft)):
        tables = {k: tuple(jnp.asarray(a) for a in v)
                  for k, v in needed_tables(n, sign,
                                            factors=factors).items()}
        re, im = planar(x)
        rr, ii = tile_fft(jnp.asarray(re), jnp.asarray(im), tables, n,
                          factors=factors, sign=sign)
        got = np.asarray(rr) + 1j * np.asarray(ii)
        want = ref(x.astype(np.complex128), axis=0)
        if sign > 0:
            want = want * n      # tile level is unnormalized
        assert rel_err(got, want) < TOL[np.complex64]


@pytest.mark.parametrize("factors", [(4, 64), (4, 4, 4, 64), (8, 8, 64),
                                     (2, 4, 64), (8, 128)])
def test_tile_fft_fold_last_twiddle(factors):
    """FOLD_LAST_TW bakes the final twiddle round into per-digit MXU
    matrices — bit-identical layout, parity within the gate, and the
    fold tables actually engage."""
    import jax.numpy as jnp
    import math
    from pyfft_tpu.ops import pallas_local as pk
    n = math.prod(factors)
    x = rand_complex((n, 8), seed=n + 5)
    assert pk.FOLD_LAST_TW, "suite assumes the fold is the default"
    tables_np = needed_tables(n, -1, factors=factors)
    assert ("dftsfold", tuple(factors)) in tables_np
    assert ("tw", len(factors) - 2, tuple(factors)) not in tables_np
    tables = {k: tuple(jnp.asarray(a) for a in v)
              for k, v in tables_np.items()}
    re, im = planar(x)
    rr, ii = tile_fft(jnp.asarray(re), jnp.asarray(im), tables, n,
                      factors=factors)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=0)
    assert rel_err(got, ref) < TOL[np.complex64]


@pytest.mark.parametrize("shape,axis", [
    ((64, 8, 128), 0),         # 3D z-pass, minimal store groups
    ((256, 16, 256), 0),       # config-4 class (scaled down)
    ((2, 64, 8, 128), 1),      # batched 3D z-pass
    ((2, 32, 16, 8, 128), 1),  # 4D trail flattens to (rows, x_ext)
    ((256, 8, 384), 0),        # x_ext not 256-divisible: xc must drop to 128
])
def test_fold_kernel_parity(shape, axis):
    """Fold-store column kernel: folded read, NATIVE-layout store (the 3D
    composition-glue fix — docs/design.md round-5 log)."""
    import jax.numpy as jnp

    from pyfft_tpu.ops.pallas_local import fft_axis_fold, supported_fold
    x = rand_complex(shape, seed=sum(shape) + 3)
    re, im = planar(x)
    assert supported_fold(jnp.asarray(re), axis)
    rr, ii = fft_axis_fold(re, im, -1, axis=axis)
    assert rr.shape == shape
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fft(x.astype(np.complex128), axis=axis)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_fold_kernel_inverse_postscale():
    from pyfft_tpu.ops.pallas_local import fft_axis_fold
    n = 64
    x = rand_complex((n, 8, 128), seed=11)
    re, im = planar(x)
    fr, fi = fft_axis_fold(re, im, -1, axis=0)
    br, bi = fft_axis_fold(fr, fi, +1, axis=0, postscale=1.0 / n)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]


def test_fold_kernel_supported():
    import jax.numpy as jnp

    from pyfft_tpu.ops.pallas_local import supported_fold
    ok = jnp.zeros((64, 8, 128), jnp.float32)
    assert supported_fold(ok, 0)
    # <2 trailing dims: the fold is free, plain column kernel applies
    assert not supported_fold(jnp.zeros((64, 128), jnp.float32), 0)
    # minor dim not lane-aligned
    assert not supported_fold(jnp.zeros((64, 8, 64), jnp.float32), 0)
    # store rows not 8-groupable
    assert not supported_fold(jnp.zeros((64, 4, 128), jnp.float32), 0)
    # f64 planes stay on the df64/XLA paths
    assert not supported_fold(jnp.zeros((64, 8, 128), jnp.float64), 0)
    # VMEM footprint cap: a (4096, 8, 256) z-pass would need >100 MiB of
    # block planes — must stay on the plain column kernel (n*x_ext > 2^17)
    assert not supported_fold(jnp.zeros((4096, 8, 256), jnp.float32), 0)
    assert not supported_fold(jnp.zeros((1024, 8, 256), jnp.float32), 0)
    # boundary: exactly 2^17 is the proven-safe block size
    assert supported_fold(jnp.zeros((512, 8, 256), jnp.float32), 0)


@pytest.mark.parametrize("shape", [(256, 128), (2, 128, 256)])
def test_fused2d_tiled_parity(shape):
    """Tiled fused-2D kernel (the 1024^2-class compile-safe form): same
    math as fft2_fused, every tile_fft at <= 128 lanes."""
    from pyfft_tpu.ops.pallas_local import fft2_fused_tiled
    x = rand_complex(shape, seed=sum(shape))
    re, im = planar(x)
    rr, ii = fft2_fused_tiled(re, im, -1)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(-2, -1))
    assert rel_err(got, ref) < TOL[np.complex64]


def test_fused2d_tiled_inverse_postscale():
    from pyfft_tpu.ops.pallas_local import fft2_fused_tiled
    x = rand_complex((128, 128), seed=21)
    re, im = planar(x)
    fr, fi = fft2_fused_tiled(re, im, -1)
    br, bi = fft2_fused_tiled(fr, fi, +1, postscale=1.0 / x.size)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]
