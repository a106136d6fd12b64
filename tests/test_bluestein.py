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


@pytest.mark.parametrize("n", [8, 9, 34, 101, 240, 96, 4096])
def test_rfft_any_matches_numpy(n):
    # 8/96/240/4096: smooth even -> packed REAL engine fast path;
    # 9/34/101: chirp-Z path
    x = RNG.standard_normal((3, n))
    got = np.asarray(pf.rfft_any(x))
    ref = np.fft.rfft(x, axis=-1)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.parametrize("n", [10, 33, 101, 96])
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


# --------------------------------------------------------------------------
# General CZT / spectral zoom
# --------------------------------------------------------------------------

scipy_signal = pytest.importorskip("scipy.signal")


def test_czt_default_is_dft():
    n = 37
    x = _rand_c((2, n)).astype(np.complex64)
    p = bs.CztPlan(n)
    got = np.asarray(bs.czt(p, jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


def test_czt_general_vs_direct_sum_f64():
    n, m = 53, 29
    wp, ap = 0.013, 0.21
    x = _rand_c((3, n))
    p = bs.CztPlan(n, m, w_phase=wp, a_phase=ap, dtype="float64")
    got = np.asarray(bs.czt(p, jnp.asarray(x)))
    j, k = np.arange(n), np.arange(m)
    mat = (np.exp(2j * np.pi * ap) ** (-j))[None, :] * (
        np.exp(-2j * np.pi * wp) ** np.outer(k, j))
    ref = x @ mat.T
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_czt_vs_scipy():
    x = _rand_c(100)
    wp, ap = 0.0061, -0.083
    p = bs.CztPlan(100, 57, w_phase=wp, a_phase=ap, dtype="float64")
    got = np.asarray(bs.czt(p, x))
    ref = scipy_signal.czt(x, 57, w=np.exp(-2j * np.pi * wp),
                           a=np.exp(2j * np.pi * ap))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.parametrize("endpoint", [False, True])
@pytest.mark.parametrize("fn", [0.31, (0.25, 0.40)])
def test_zoom_fft_vs_scipy(fn, endpoint):
    x = RNG.standard_normal(640)
    got = np.asarray(pf.zoom_fft(x, fn, 333, fs=2.0, endpoint=endpoint,
                                 dtype="float64"))
    ref = scipy_signal.zoom_fft(x, list(fn) if isinstance(fn, tuple) else fn,
                                333, fs=2.0, endpoint=endpoint)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-12


def test_zoom_fft_resolves_close_tones():
    """The zoom's use case: two tones ~2.5 coarse bins apart evaluated on
    a 50x finer grid across a 1% band — distinct, sharply-located peaks
    the coarse FFT grid straddles."""

    n, fs = 512, 2.0
    t = np.arange(n)
    f1, f2 = 0.3010, 0.3110  # > Rayleigh limit fs/n = 0.0039
    x = np.cos(2 * np.pi * f1 * t / fs) + np.cos(2 * np.pi * f2 * t / fs)
    lo, hi, m = 0.295, 0.317, 256
    spec = np.abs(np.asarray(pf.zoom_fft(x, (lo, hi), m, fs=fs,
                                         dtype="float64")))
    # count well-separated local maxima above half the global peak
    peaks = [i for i in range(1, m - 1)
             if spec[i] > spec[i - 1] and spec[i] > spec[i + 1]
             and spec[i] > spec.max() * 0.5]
    assert len(peaks) == 2
    freqs = lo + np.array(peaks) * (hi - lo) / m
    assert abs(freqs[0] - f1) < 2 * (hi - lo) / m
    assert abs(freqs[1] - f2) < 2 * (hi - lo) / m


def test_czt_exact_phase_helper():
    # scale = 3/8 exactly; phases must be bit-exact rationals mod 2
    ph = bs._exact_phase_mod2(0.375, [0, 1, 2, 7, 16, 10 ** 9 + 1])
    assert ph.tolist() == [0.0, 0.375, 0.75, 0.625, 0.0, 0.375]


def test_czt_error_paths():
    with pytest.raises(ValueError):
        bs.CztPlan(0)
    p = bs.CztPlan(16, 8)
    with pytest.raises(ValueError, match="last axis"):
        bs.czt_split(p, (jnp.zeros((2, 15)), jnp.zeros((2, 15))))


def test_new_setup_any_caching_and_custom_m():
    a = pf.new_setup_any(101)
    assert a is pf.new_setup_any(101)  # cached instance
    b = pf.new_setup_any(101, m=540)   # custom inner length, fresh plan
    assert isinstance(b, bs.BluesteinPlan) and b.m == 540 and b is not a
    x = _rand_c((2, 101)).astype(np.complex64)
    ga = np.asarray(pf.transform_ordered(a, jnp.asarray(x)))
    gb = np.asarray(pf.transform_ordered(b, jnp.asarray(x)))
    assert np.abs(ga - gb).max() / np.abs(ga).max() < 1e-5


def test_transform_ordered_rejects_foreign_plan_types():
    with pytest.raises(TypeError, match="CztPlan"):
        pf.transform_ordered(bs.CztPlan(8), jnp.ones(8, jnp.complex64))
    with pytest.raises(TypeError, match="unsupported plan type"):
        pf.transform_ordered_split(
            bs.CztPlan(8), (jnp.ones(8), jnp.zeros(8)))


def test_rfft_any_length_one():
    x = np.array([[3.0], [2.5]], np.float32)
    g = np.asarray(pf.rfft_any(x))
    assert g.shape == (2, 1) and np.abs(g - x).max() == 0
    y = np.asarray(pf.irfft_any(g, 1))
    assert np.abs(y - x).max() == 0


def test_freq_grid_helpers_match_numpy():
    for n in (8, 9, 101, 4096):
        assert np.allclose(pf.fftfreq(n, 0.25), np.fft.fftfreq(n, 0.25))
        assert np.allclose(pf.rfftfreq(n, 0.25), np.fft.rfftfreq(n, 0.25))
    x = np.arange(24).reshape(4, 6)
    assert (np.asarray(pf.fftshift(x)) == np.fft.fftshift(x)).all()
    assert (np.asarray(pf.ifftshift(pf.fftshift(x))) == x).all()
    assert (np.asarray(pf.fftshift(x, 1)) == np.fft.fftshift(x, axes=1)).all()
    x5 = np.arange(5)  # odd length: shift/ishift must be exact inverses
    assert (np.asarray(pf.ifftshift(pf.fftshift(x5))) == x5).all()


def test_czt_m_greater_than_n_interpolates():
    """m > n with w = 1/m == zero-padded m-point FFT (spectral interp)."""

    n, m = 96, 384
    x = _rand_c(n).astype(np.complex64)
    p = bs.CztPlan(n, m, w_phase=1.0 / m)
    got = np.asarray(bs.czt(p, x))
    ref = np.fft.fft(x, m)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6
