"""n-dimensional transform tests (beyond parity — the reference is 1-D).

Oracle: np.fft.  Every axis kind is covered: smooth (MXU stage engine),
non-smooth/prime (chirp-Z path), mixed, batched, both dtypes.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pffft_tpu as pf


RNG = np.random.default_rng(77)


def _rand_c(shape, dtype=np.complex64):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(dtype)


@pytest.mark.parametrize("shape", [(32, 64), (17, 30), (64, 101)])
def test_fft2_matches_numpy(shape):
    x = _rand_c(shape)
    got = np.asarray(pf.fft2(x))
    ref = np.fft.fft2(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-6


def test_fftn_3d_batched_mixed_axes():
    x = _rand_c((2, 9, 17, 30))  # batch of 2; axes: 9 (odd smooth-ish via
    got = np.asarray(pf.fftn(x, (9, 17, 30)))  # bluestein), 17 prime, 30 smooth
    ref = np.fft.fftn(x, axes=(-3, -2, -1))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-6


def test_fftn_f64():
    x = _rand_c((13, 21), np.complex128)
    got = np.asarray(pf.fftn(x, dtype="float64"))
    ref = np.fft.fftn(x)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_roundtrip_unscaled():
    x = _rand_c((24, 50))
    back = np.asarray(pf.ifft2(pf.fft2(x))) / x.size
    assert np.abs(back - x).max() < 3e-6 * max(1.0, np.abs(x).max())


def test_fftn_split_planar():
    nd = pf.fftn_setup((16, 48))
    x = _rand_c((3, 16, 48))
    rr, ri = pf.fftn_split(nd, (jnp.asarray(x.real, jnp.float32),
                                jnp.asarray(x.imag, jnp.float32)))
    ref = np.fft.fftn(x, axes=(-2, -1))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-6


@pytest.mark.parametrize("shape", [(12, 25), (8, 9, 10)])
def test_rfftn_matches_numpy(shape):
    x = RNG.standard_normal(shape).astype(np.float32)
    got = np.asarray(pf.rfftn(x))
    ref = np.fft.rfftn(x)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-6


@pytest.mark.parametrize("shape", [(12, 25), (6, 15, 8)])
def test_irfftn_roundtrip(shape):
    x = RNG.standard_normal(shape).astype(np.float32)
    y = np.asarray(pf.irfftn(pf.rfftn(x), shape)) / int(np.prod(shape))
    assert np.abs(y - x).max() < 5e-6


def test_plan_sharing_equal_extents():
    nd = pf.fftn_setup((48, 48))
    assert nd.plans[0] is nd.plans[1]


def test_error_paths():
    with pytest.raises(ValueError, match="at least one"):
        pf.fftn_setup(())
    with pytest.raises(ValueError, match=">= 2"):
        pf.fftn_setup((8, 1))
    nd = pf.fftn_setup((8, 12))
    with pytest.raises(ValueError, match="trailing axes"):
        pf.fftn_split(nd, (jnp.zeros((8, 10)), jnp.zeros((8, 10))))
    with pytest.raises(ValueError, match="does not"):
        pf.irfftn(jnp.zeros((4, 5), jnp.complex64), (4, 12))


def test_2d_impulse_is_flat():
    """A centered impulse transforms to a pure phase ramp of unit
    magnitude — a structure-free sanity check on axis ordering."""

    x = np.zeros((16, 20), np.complex64)
    x[3, 7] = 1.0
    g = np.asarray(pf.fft2(x))
    assert np.abs(np.abs(g) - 1.0).max() < 1e-5
    ref = np.fft.fft2(x)
    assert np.abs(g - ref).max() < 1e-5
