"""Device DCT/DST vs the FFTPACK-convention oracle (all six transforms)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pffft_tpu import dct as d
from pffft_tpu import oracle


def _rng(seed=0):
    return np.random.default_rng(seed)


# smooth internal FFT lengths (2(N-1), 2(N+1), N) ride the stage engine;
# the non-smooth tail sizes exercise the chirp-Z fallback (any-N support)
DCT1_N = [9, 25, 65, 121, 30, 98]   # 2(N-1): 16..240, then 58/194 via czt
DST1_N = [7, 24, 63, 127, 34, 101]  # 2(N+1): 16..256, then 70/204* via czt
Q_N = [8, 16, 60, 128, 480, 15, 45, 135, 375, 7, 97, 101]  # + prime N


@pytest.mark.parametrize("n", DCT1_N)
def test_dct1_matches_oracle(n):
    x = _rng(n).standard_normal((3, n)).astype(np.float32)
    got = np.asarray(d.dct1(jnp.asarray(x)))
    ref = oracle.dct1(x)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("n", DST1_N)
def test_dst1_matches_oracle(n):
    x = _rng(n).standard_normal((3, n)).astype(np.float32)
    got = np.asarray(d.dst1(jnp.asarray(x)))
    ref = oracle.dst1(x)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("n", Q_N)
@pytest.mark.parametrize("name", ["dct2", "dct3", "dst2", "dst3"])
def test_quarterwave_matches_oracle(n, name):
    x = _rng(n).standard_normal((2, n)).astype(np.float32)
    got = np.asarray(getattr(d, name)(jnp.asarray(x)))
    ref = getattr(oracle, name)(x)
    assert np.abs(got - ref).max() < 2e-4 * max(1.0, np.abs(ref).max()), name


def test_inverse_pairs():
    n = 96
    x = _rng(1).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(d.dct3(d.dct2(xj))) / (2 * n), x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.dst3(d.dst2(xj))) / (2 * n), x, atol=1e-4)


def test_involutions():
    x = _rng(2).standard_normal(65).astype(np.float32)  # 2(N-1)=128 smooth
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(d.dct1(d.dct1(xj))) / (2 * 64), x, atol=1e-4)
    y = _rng(3).standard_normal(63).astype(np.float32)  # 2(N+1)=128 smooth
    yj = jnp.asarray(y)
    np.testing.assert_allclose(np.asarray(d.dst1(d.dst1(yj))) / (2 * 64), y, atol=1e-4)


def test_fftpack_names():
    assert d.cost is d.dct1 and d.sint is d.dst1
    assert d.cosqf is d.dct3 and d.sinqf is d.dst3
    # backward quarter-wave transforms carry FFTPACK's factor 4:
    # cosqb(cosqf(x)) == 4N x (fftpack.h cosqb doc)
    x = _rng(11).standard_normal(64).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(
        np.asarray(d.cosqb(d.cosqf(xj))) / (4 * 64), x, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(d.sinqb(d.sinqf(xj))) / (4 * 64), x, atol=1e-4
    )


def test_odd_n_quarterwave_inverse_pairs():
    # odd N accepted since round 3 (oracle cosq/sinq always accepted it)
    n = 45
    x = _rng(7).standard_normal(n).astype(np.float32)
    xj = jnp.asarray(x)
    np.testing.assert_allclose(np.asarray(d.dct3(d.dct2(xj))) / (2 * n), x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d.dst3(d.dst2(xj))) / (2 * n), x, atol=1e-4)
