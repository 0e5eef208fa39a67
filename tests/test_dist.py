"""Distributed FFT over the 8-virtual-device CPU mesh (conftest forces it).

Validates the shard_map four-step: batch sharding over 'dp', transform-axis
sharding over 'sp' with all_to_all exchanges, vs numpy.fft.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from pyfft_tpu.parallel import dist_fft_1d, make_dist_fft

from helpers import TOL, rand_complex, rel_err


def _mesh(dp, sp):
    devs = np.array(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_dist_fft_parity(dp, sp):
    mesh = _mesh(dp, sp)
    n, b = 512, 8
    x = rand_complex((b, n), seed=dp * 10 + sp)
    re, im = dist_fft_1d(np.real(x).copy(), np.imag(x).copy(), mesh)
    got = np.asarray(re) + 1j * np.asarray(im)
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    assert rel_err(got, ref) < TOL[np.complex64]


def test_dist_fft_roundtrip():
    mesh = _mesh(2, 4)
    n, b = 1024, 4
    x = rand_complex((b, n), seed=3)
    fr, fi = dist_fft_1d(np.real(x).copy(), np.imag(x).copy(), mesh, sign=-1)
    br, bi = dist_fft_1d(np.asarray(fr), np.asarray(fi), mesh, sign=+1,
                         normalize=True)
    got = np.asarray(br) + 1j * np.asarray(bi)
    assert rel_err(got, x) < TOL[np.complex64]


def test_make_dist_fft_validates():
    mesh = _mesh(1, 8)
    with pytest.raises(ValueError):
        make_dist_fft(mesh, 24)
    with pytest.raises(ValueError):
        make_dist_fft(mesh, 32)  # 32 < 8*8


def test_dist_fft2_parity():
    """Distributed 2D: rows local, all_to_all transpose, columns local."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pyfft_tpu.parallel.dist import make_dist_fft2

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(2, 4), ("dp", "sp"))
    ny, nx = 64, 128
    rng = np.random.RandomState(5)
    x = (rng.standard_normal((4, ny, nx))
         + 1j * rng.standard_normal((4, ny, nx))).astype(np.complex64)
    fwd = make_dist_fft2(mesh, (ny, nx))
    inv = make_dist_fft2(mesh, (ny, nx), sign=+1, normalize=True)
    spec = NamedSharding(mesh, P("dp", "sp", None))
    re = jax.device_put(x.real.astype(np.float32), spec)
    im = jax.device_put(x.imag.astype(np.float32), spec)
    rr, ii = fwd(re, im)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(1, 2))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
    br, bi = inv(rr, ii)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert np.abs(rt - x).max() / np.abs(x).max() < 2e-6


def test_dist_fft3_parity():
    """Distributed 3D: local (ny, nx) planes per z-slice, all_to_all
    z-transpose, local z columns."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pyfft_tpu.parallel.dist import make_dist_fft3

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(2, 4), ("dp", "sp"))
    nz, ny, nx = 32, 16, 64
    rng = np.random.RandomState(6)
    x = (rng.standard_normal((2, nz, ny, nx))
         + 1j * rng.standard_normal((2, nz, ny, nx))).astype(np.complex64)
    fwd = make_dist_fft3(mesh, (nz, ny, nx))
    inv = make_dist_fft3(mesh, (nz, ny, nx), sign=+1, normalize=True)
    spec = NamedSharding(mesh, P("dp", "sp", None, None))
    re = jax.device_put(x.real.astype(np.float32), spec)
    im = jax.device_put(x.imag.astype(np.float32), spec)
    rr, ii = fwd(re, im)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    ref = np.fft.fftn(x.astype(np.complex128), axes=(1, 2, 3))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
    br, bi = inv(rr, ii)
    rt = np.asarray(br) + 1j * np.asarray(bi)
    assert np.abs(rt - x).max() / np.abs(x).max() < 2e-6


def test_dist_fft_df64_parity():
    """Distributed complex128 (double-float) 1D FFT at the c128 gate."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pyfft_tpu.ops.df64 import split_f64
    from pyfft_tpu.parallel.dist import make_dist_fft_df64

    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs).reshape(2, 4), ("dp", "sp"))
    n = 1024
    rng = np.random.RandomState(8)
    x = (rng.standard_normal((4, n))
         + 1j * rng.standard_normal((4, n))).astype(np.complex128)
    fwd = make_dist_fft_df64(mesh, n)
    inv = make_dist_fft_df64(mesh, n, sign=+1, normalize=True)
    spec = NamedSharding(mesh, P("dp", "sp"))
    rh, rl = split_f64(x.real)
    ih, il = split_f64(x.imag)
    quad = tuple(jax.device_put(p.astype(np.float32), spec)
                 for p in (rh, rl, ih, il))
    out = fwd(*quad)
    got = (np.asarray(out[0], np.float64) + np.asarray(out[1], np.float64)
           + 1j * (np.asarray(out[2], np.float64)
                   + np.asarray(out[3], np.float64)))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11
    back = inv(*out)
    rt = (np.asarray(back[0], np.float64) + np.asarray(back[1], np.float64)
          + 1j * (np.asarray(back[2], np.float64)
                  + np.asarray(back[3], np.float64)))
    assert np.abs(rt - x).max() / np.abs(x).max() < 1e-11
