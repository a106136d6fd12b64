"""Cross-validate the oracle's FFTPACK conventions against scipy.

The reference ships the literal 1985 FFTPACK with its self-test
(/root/reference/src/fftpack.c:2655, tests/CMakeLists.txt:1-9); our oracle
*declares* those conventions, and this module pins them to an external
implementation (scipy.fftpack is itself a descendant of FFTPACK, and
scipy.fft provides the standard-convention DCT/DST).  VERDICT.md round-1
flagged exactly one mismatch — the quarter-wave backward scaling — which
is now fixed and locked down here.
"""

import numpy as np
import pytest

scipy_fftpack = pytest.importorskip("scipy.fftpack")
import scipy.fft as sfft  # noqa: E402

from pffft_tpu import oracle  # noqa: E402


def _x(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n)


@pytest.mark.parametrize("n", [8, 12, 15, 64, 100, 243])
def test_cfft_matches_scipy(n):
    z = _x(n) + 1j * _x(n, 1)
    np.testing.assert_allclose(oracle.cfftf(z), scipy_fftpack.fft(z), rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(
        oracle.cfftb(z), scipy_fftpack.ifft(z) * n, rtol=1e-10, atol=1e-9
    )


@pytest.mark.parametrize("n", [8, 12, 15, 64, 101])
def test_rfft_packing_matches_scipy_fftpack(n):
    """scipy.fftpack.rfft uses the FFTPACK packed layout [r0, r1, i1, ...]."""

    x = _x(n, 2)
    np.testing.assert_allclose(oracle.rfftf(x), scipy_fftpack.rfft(x), rtol=1e-10, atol=1e-9)
    p = _x(n, 3)
    np.testing.assert_allclose(
        oracle.rfftb(p), scipy_fftpack.irfft(p) * n, rtol=1e-10, atol=1e-8
    )


@pytest.mark.parametrize("n", [8, 16, 33, 64])
def test_dct_dst_match_scipy(n):
    x = _x(n, 4)
    # standard-convention families (scipy.fft, norm=None == FFTPACK-style 2x)
    np.testing.assert_allclose(oracle.dct1(x), sfft.dct(x, type=1), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.dst1(x), sfft.dst(x, type=1), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.dct2(x), sfft.dct(x, type=2), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.dct3(x), sfft.dct(x, type=3), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.dst2(x), sfft.dst(x, type=2), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.dst3(x), sfft.dst(x, type=3), rtol=1e-9, atol=1e-8)


@pytest.mark.parametrize("n", [8, 16, 64])
def test_fftpack_quarterwave_contracts(n):
    """The documented FFTPACK roundtrip scalings (fftpack.h):
    cosqb(cosqf(x)) == 4n x;  sinqb(sinqf(x)) == 4n x;
    cost(cost(x)) == 2(n-1) x;  sint(sint(x)) == 2(n+1) x."""

    x = _x(n, 5)
    np.testing.assert_allclose(oracle.cosqb(oracle.cosqf(x)), 4 * n * x, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.sinqb(oracle.sinqf(x)), 4 * n * x, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.cost(oracle.cost(x)), 2 * (n - 1) * x, rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.sint(oracle.sint(x)), 2 * (n + 1) * x, rtol=1e-9, atol=1e-8)
    # and against scipy.fftpack's own fftpack-convention entry points
    # (scipy normalizes these; compare shape-for-shape via DCT identities)
    np.testing.assert_allclose(oracle.cosqf(x), sfft.dct(x, type=3), rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(oracle.cosqb(x), 2 * sfft.dct(x, type=2), rtol=1e-9, atol=1e-8)
