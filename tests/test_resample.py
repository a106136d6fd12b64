"""Polyphase resampler tests vs the direct upsample-filter-decimate oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from pffft_tpu.resample import Resampler, resample


def _rng(seed=0):
    return np.random.default_rng(seed)


def _direct(x, h, l, m, n_out):
    """y[n] = conv(upsample(x, L), h)[n*M] (full conv, zero padded)."""

    u = np.zeros(len(x) * l)
    u[::l] = x
    full = np.convolve(u, h)
    return np.array([full[n * m] if n * m < len(full) else 0.0 for n in range(n_out)])


@pytest.mark.parametrize("l,m", [(3, 2), (2, 3), (5, 4), (1, 4), (4, 1), (7, 5)])
def test_resampler_matches_direct(l, m):
    r = _rng(l * 10 + m)
    x = r.standard_normal(400).astype(np.float32)
    rs = Resampler(l, m, taps_per_phase=8)
    got = np.asarray(rs(jnp.asarray(x)))
    # taps_rev[k', phi] = proto[(P-1-k')*L + phi] -> un-reverse k' and flatten
    proto = np.asarray(rs.taps_rev)[::-1].reshape(-1)
    ref = _direct(x.astype(np.float64), proto, rs.up, rs.down, got.shape[-1])
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_gcd_reduction():
    rs = Resampler(4, 6)
    assert (rs.up, rs.down) == (2, 3)


def test_tone_frequency_scaling():
    """A tone at f0 must appear at f0 * M/L of the new rate's spectrum."""

    fs = 1000.0
    t = np.arange(8000) / fs
    x = np.sin(2 * np.pi * 50.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 3, 2, taps_per_phase=24))
    # new rate 1500 Hz; tone still at 50 Hz absolute
    spec = np.abs(np.fft.rfft(y[200:200 + 4096] * np.hanning(4096)))
    f = np.fft.rfftfreq(4096, 2.0 / (3.0 * fs))
    assert abs(f[spec.argmax()] - 50.0) < 1.0


def test_batched_rows():
    r = _rng(9)
    x = r.standard_normal((3, 500)).astype(np.float32)
    rs = Resampler(2, 5, taps_per_phase=8)
    got = np.asarray(rs(jnp.asarray(x)))
    for i in range(3):
        row = np.asarray(rs(jnp.asarray(x[i])))
        np.testing.assert_allclose(got[i], row, atol=1e-6)


def test_length_contract():
    x = jnp.zeros(1000)
    y = resample(x, 3, 7)
    assert y.shape[-1] == (1000 * 3) // 7
