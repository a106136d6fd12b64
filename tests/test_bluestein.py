"""Arbitrary-N (Bluestein chirp-Z) transform tests.

Beyond-parity coverage: the reference rejects non-2/3/5-smooth sizes
(pffft_priv_impl.h:1062-1078); pffft_tpu.bluestein accepts any N >= 2.
Validated against np.fft (an oracle the engine itself never uses on the
device path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pffft_tpu as pf
from pffft_tpu import bluestein as bs


RNG = np.random.default_rng(1234)


def _rand_c(shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape))


@pytest.mark.parametrize("n", [2, 3, 7, 17, 31, 97, 105, 241, 997, 4099])
def test_forward_matches_numpy_f32(n):
    p = bs.BluesteinPlan(n)
    x = _rand_c((4, n))
    got = np.asarray(pf.transform_ordered(p, jnp.asarray(x.astype(np.complex64))))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.parametrize("n", [13, 101, 1009])
def test_forward_matches_numpy_f64(n):
    p = bs.BluesteinPlan(n, "float64")
    x = _rand_c((2, n))
    got = np.asarray(pf.transform_ordered(p, jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.parametrize("n", [5, 19, 129, 677])
def test_roundtrip_unscaled(n):
    """Library convention parity: backward(forward(x)) == N * x."""

    p = bs.BluesteinPlan(n)
    x = _rand_c((3, n)).astype(np.complex64)
    fwd = pf.transform_ordered(p, jnp.asarray(x), pf.FORWARD)
    back = np.asarray(pf.transform_ordered(p, fwd, pf.BACKWARD))
    assert np.abs(back / n - x).max() < 2e-6 * max(1.0, np.abs(x).max())


def test_split_planar_path():
    n = 37
    p = bs.BluesteinPlan(n)
    x = _rand_c((2, 3, n))
    rr, ri = pf.transform_ordered_split(
        p, (jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32)))
    ref = np.fft.fft(x, axis=-1)
    got = np.asarray(rr) + 1j * np.asarray(ri)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


def test_new_setup_any_dispatch():
    assert isinstance(pf.new_setup_any(100), pf.Plan)  # smooth, non-strict
    assert isinstance(pf.new_setup_any(1024), pf.Plan)
    assert isinstance(pf.new_setup_any(101), pf.BluesteinPlan)
    assert isinstance(pf.new_setup_any(2 * 3 * 7), pf.BluesteinPlan)
    # smooth even real still goes through the packed engine
    assert isinstance(pf.new_setup_any(96, pf.REAL), pf.Plan)
    with pytest.raises(ValueError, match="rfft_any"):
        pf.new_setup_any(101, pf.REAL)


def test_next_smooth_size():
    assert pf.next_smooth_size(1) == 2
    assert pf.next_smooth_size(97) == 100
    assert pf.next_smooth_size(2048) == 2048
    for n in (7, 11, 1000, 4097):
        m = pf.next_smooth_size(n)
        assert m >= n
        pf.Plan.create(m, pf.COMPLEX, strict=False)  # smooth by construction


@pytest.mark.parametrize("n", [8, 9, 34, 101, 240])
def test_rfft_any_matches_numpy(n):
    x = RNG.standard_normal((3, n))
    got = np.asarray(pf.rfft_any(x))
    ref = np.fft.rfft(x, axis=-1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.parametrize("n", [10, 33, 101])
def test_irfft_roundtrip(n):
    x = RNG.standard_normal((2, n)).astype(np.float32)
    y = np.asarray(pf.irfft_any(pf.rfft_any(x), n)) / n
    assert np.abs(y - x).max() < 2e-6


def test_error_paths():
    with pytest.raises(ValueError, match="N >= 2"):
        bs.BluesteinPlan(1)
    with pytest.raises(ValueError):
        bs.BluesteinPlan(17, m=20)  # m < 2N-1
    with pytest.raises(ValueError):
        bs.BluesteinPlan(17, m=37)  # not smooth
    p = bs.BluesteinPlan(17)
    with pytest.raises(ValueError, match="last axis"):
        pf.transform_ordered_split(
            p, (jnp.zeros((2, 16)), jnp.zeros((2, 16))))
    with pytest.raises(ValueError, match="expected"):
        pf.irfft_any(jnp.zeros(5, jnp.complex64), 12)


def test_tone_detection_prime_n():
    """A pure carrier at a prime length lands on exactly one bin."""

    n = 499
    k = 123
    t = np.arange(n)
    x = np.exp(2j * np.pi * k * t / n).astype(np.complex64)
    p = bs.BluesteinPlan(n)
    spec = np.abs(np.asarray(pf.transform_ordered(p, jnp.asarray(x))))
    assert spec.argmax() == k
    rest = np.delete(spec, k)
    # float32 chirp-Z leakage floor (~120 dB below the carrier)
    assert rest.max() < spec[k] * 1e-5
