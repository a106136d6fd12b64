"""Tests for the Fft object API (pffft.hpp analog) and the validation
oracle (fftpack analog), mirroring tests/test_pffft.cpp's all-4-types sweep
and the oracle-comparison protocol of bench_pffft --validate (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu import oracle
from pffft_tpu.wrapper import Fft


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Fft wrapper over all 4 types (test_pffft.cpp:59-104 analog)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.complex64, np.complex128])
@pytest.mark.parametrize("n", [64, 512, 1280])
def test_fft_wrapper_roundtrip_all_types(dtype, n):
    f = Fft(dtype, n)
    r = _rng(n)
    if f.is_complex_transform:
        x = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(dtype)
    else:
        x = r.standard_normal(n).astype(dtype)
    spec = f.forward(jnp.asarray(x))
    assert spec.shape[-1] == f.spectrum_size
    back = np.asarray(f.inverse(spec)) / f.length
    tol = 1e-5 if np.dtype(dtype).itemsize <= 8 and dtype in (np.float32, np.complex64) else 1e-12
    assert np.abs(back - x).max() < tol * max(1.0, np.abs(x).max()) * np.log2(n)


@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_fft_wrapper_internal_layout_and_convolve(dtype):
    n = 256
    f = Fft(dtype, n)
    r = _rng(1)
    if f.is_complex_transform:
        a = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(dtype)
        b = (r.standard_normal(n) + 1j * r.standard_normal(n)).astype(dtype)
    else:
        a = r.standard_normal(n).astype(dtype)
        b = r.standard_normal(n).astype(dtype)
    za = f.forward_to_internal_layout(jnp.asarray(a))
    zb = f.forward_to_internal_layout(jnp.asarray(b))
    # internal -> canonical reorder matches ordered forward
    np.testing.assert_allclose(
        np.asarray(f.reorder_spectrum(za, pf.FORWARD)),
        np.asarray(f.forward(jnp.asarray(a))),
        atol=1e-4,
    )
    zc = f.convolve(za, zb, 1.0 / n)
    y = np.asarray(f.inverse_from_internal_layout(zc))
    # circular convolution oracle
    af = oracle.cfftf(np.asarray(a, dtype=np.complex128))
    bf = oracle.cfftf(np.asarray(b, dtype=np.complex128))
    # y = ifft_unscaled(A*B/n) = cfftb(A*B)/n = circular convolution of a, b
    ref = oracle.cfftb(af * bf) / n
    ref = np.real(ref) if not f.is_complex_transform else ref
    assert np.abs(y - ref).max() < 1e-3


def test_fft_wrapper_replan_and_factories():
    f = Fft(np.float32)
    with pytest.raises(RuntimeError):
        _ = f.length
    f.prepare_length(1024)
    assert f.length == 1024 and f.spectrum_size == 512
    f.prepareLength(2048)
    assert f.length == 2048
    v = f.value_vector(3)
    s = f.spectrum_vector(3)
    assert v.shape == (3, 2048) and v.dtype == jnp.float32
    assert s.shape == (3, 1024) and s.dtype == jnp.complex64
    assert f.internal_layout_size == 2048


def test_fft_wrapper_statics():
    assert Fft.is_valid_size(1024, np.float32)
    assert not Fft.is_valid_size(1000, np.float32)
    assert Fft.nearest_transform_size(1000, np.float32, True) >= 1000
    with pytest.raises(TypeError):
        Fft(np.int32)


# ---------------------------------------------------------------------------
# Oracle self-validation (vs numpy.fft, an implementation it shares no code
# with) + engine-vs-oracle (the --validate protocol, bench_pffft.c:291-455)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [16, 60, 125, 256, 2592])
def test_oracle_cfft_vs_numpy(n):
    r = _rng(n)
    x = r.standard_normal(n) + 1j * r.standard_normal(n)
    np.testing.assert_allclose(oracle.cfftf(x), np.fft.fft(x), atol=1e-9 * n)
    np.testing.assert_allclose(oracle.cfftb(x), np.fft.ifft(x) * n, atol=1e-9 * n)


@pytest.mark.parametrize("n", [16, 60, 256, 255])
def test_oracle_rfft_roundtrip_and_numpy(n):
    r = _rng(n)
    x = r.standard_normal(n)
    p = oracle.rfftf(x)
    np.testing.assert_allclose(oracle.rfftb(p) / n, x, atol=1e-11)
    spec = np.fft.rfft(x)
    assert abs(p[0] - spec[0].real) < 1e-9
    if n % 2 == 0:
        assert abs(p[-1] - spec[-1].real) < 1e-9
        np.testing.assert_allclose(p[1:-1:2], spec[1:-1].real, atol=1e-9)
        np.testing.assert_allclose(p[2::2], spec[1:-1].imag, atol=1e-9)


def test_engine_vs_oracle_mixed_sizes():
    """pffft_validate analog: engine vs oracle on pow2 and non-pow2 N."""

    for n in [32, 64, 2400, 9216]:
        r = _rng(n)
        x = r.standard_normal(n).astype(np.float32)
        plan = pf.new_setup(n, pf.REAL)
        got = np.asarray(pf.transform_ordered(plan, jnp.asarray(x), pf.FORWARD))
        ref = oracle.packed_spectrum(x)
        # tolerance from bench_pffft.c:372: 1e-3 * max|ref|
        assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()


@pytest.mark.parametrize("n", [8, 17, 64])
def test_oracle_dct_dst_definitions(n):
    r = _rng(n)
    x = r.standard_normal(n)
    j = np.arange(n)
    k = np.arange(n)[:, None]
    # DCT-I definition
    ref1 = x[0] + ((-1.0) ** k[:, 0]) * x[-1] + 2 * (
        x[1:-1] * np.cos(np.pi * j[1:-1] * k / (n - 1))
    ).sum(-1)
    np.testing.assert_allclose(oracle.cost(x), ref1, atol=1e-9)
    # DST-I definition
    refs = 2 * (x * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1))).sum(-1)
    np.testing.assert_allclose(oracle.sint(x), refs, atol=1e-9)
    # DCT-II definition; FFTPACK cosqb carries a factor 4 (fftpack.h:
    # x(i) = sum 4*x(k)*cos(...)), i.e. cosqb = 2 * DCT-II, roundtrip 4n
    ref2 = 2 * (x * np.cos(np.pi * k * (2 * j + 1) / (2 * n))).sum(-1)
    np.testing.assert_allclose(oracle.dct2(x), ref2, atol=1e-9)
    np.testing.assert_allclose(oracle.cosqb(x), 2 * ref2, atol=1e-9)
    np.testing.assert_allclose(oracle.cosqf(oracle.cosqb(x)) / (4.0 * n), x, atol=1e-9)
    # DST-II definition and the FFTPACK sinqb factor
    ref4 = 2 * (x * np.sin(np.pi * (k + 1) * (2 * j + 1) / (2 * n))).sum(-1)
    np.testing.assert_allclose(oracle.dst2(x), ref4, atol=1e-9)
    np.testing.assert_allclose(oracle.sinqb(x), 2 * ref4, atol=1e-9)
    np.testing.assert_allclose(oracle.sinqf(oracle.sinqb(x)) / (4.0 * n), x, atol=1e-9)


def test_oracle_dct1_involution():
    """FFTPACK cost is its own inverse up to 2(N-1)."""

    x = _rng(5).standard_normal(33)
    np.testing.assert_allclose(oracle.cost(oracle.cost(x)) / (2 * (33 - 1)), x, atol=1e-9)


def test_oracle_dst1_involution():
    x = _rng(6).standard_normal(31)
    np.testing.assert_allclose(oracle.sint(oracle.sint(x)) / (2 * (31 + 1)), x, atol=1e-9)
