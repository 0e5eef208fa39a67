"""De/re-interleave selection-contraction kernels (ops/interleave.py).

Reference behavior: interleaved (re,im)-adjacent storage was a
template-time load/store format in every reference kernel (SURVEY.md
§2.5, §3.4); here it is a pair of streaming MXU selection passes that
must be BIT-exact (0/1 contraction under Precision.HIGHEST).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyfft_tpu.ops import interleave as il


def _pairs(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape, dtype=np.float32)


@pytest.mark.parametrize("shape", [(8, 256), (4, 1024), (2, 8, 512),
                                   (128, 256), (1, 4096)])
def test_deinterleave_bit_exact(shape):
    v = _pairs(shape)
    re, im = il.deinterleave(jnp.asarray(v))
    np.testing.assert_array_equal(np.asarray(re), v[..., 0::2])
    np.testing.assert_array_equal(np.asarray(im), v[..., 1::2])


@pytest.mark.parametrize("shape", [(8, 128), (4, 512), (2, 8, 256)])
def test_interleave_bit_exact(shape):
    re = _pairs(shape, 1)
    im = _pairs(shape, 2)
    v = il.interleave(jnp.asarray(re), jnp.asarray(im))
    assert v.shape == shape[:-1] + (2 * shape[-1],)
    np.testing.assert_array_equal(np.asarray(v)[..., 0::2], re)
    np.testing.assert_array_equal(np.asarray(v)[..., 1::2], im)


def test_roundtrip_and_jit_composable():
    v = jnp.asarray(_pairs((16, 512)))

    @jax.jit
    def rt(x):
        r, i = il.deinterleave(x)
        return il.interleave(r, i)

    np.testing.assert_array_equal(np.asarray(rt(v)), np.asarray(v))


@pytest.mark.parametrize("factors", [(8, 8, 64), (8, 2, 64), (4, 4, 2, 64),
                                     (2, 128), (8, 32), (64, 4)])
@pytest.mark.parametrize("sign", [-1, 1])
def test_packed_row_kernel_parity(factors, sign):
    """tile_fft_packed through every stage kind (radix-2/4/8 butterflies,
    MXU contraction, twiddle rounds) on the interleaved bitcast view."""
    import math

    from pyfft_tpu.ops import pallas_local as pk

    n = math.prod(factors)
    rng = np.random.default_rng(3)
    z = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
    z64 = z.astype(np.complex64)
    v = z64.view(np.float32)                       # (8, 2n) interleaved
    out = pk.fft_rows_interleaved(jnp.asarray(v), sign, factors=factors,
                                  packed=True, interpret=True)
    got = np.asarray(out).view(np.complex64)
    ref = np.fft.fft(z, axis=-1) if sign < 0 else np.fft.ifft(z, axis=-1) * n
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 2e-6


def test_supported_predicate():
    assert il.supported((8, 256))
    assert il.supported((3, 512))          # row extent unconstrained
    assert not il.supported((8, 128))      # minor below one 256-lane chunk
    assert not il.supported((8, 255))      # not whole chunks
    assert not il.supported(())


def test_supported_rejects_f64():
    # c128 plans present f64 interleaved views; Mosaic has no f64
    # dot_general so the kernel must decline (plan falls back to XLA).
    import jax.numpy as jnp
    assert not il.supported((8, 256), jnp.float64)
    assert il.supported((8, 256), jnp.float32)
