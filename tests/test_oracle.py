"""Oracle comparison tests vs numpy.fft (the FFTPACK-oracle analog).

Mirrors the protocol of ``bench_pffft --validate``
(/root/reference/benchmarks/bench_pffft.c:291-455): pffft vs oracle on a
mixed pow2/non-pow2 size set, unordered==reorder-roundtrip identity, and
frequency-domain convolution vs direct spectral product, with the
reference's tolerances (|delta| < 1e-3 * max|ref| forward, 1e-5 conv).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import pffft_tpu as pf

# bench_pffft.c Ntest set (minus sizes invalid for each kind)
SIZES = [16, 32, 64, 96, 128, 160, 512, 2048, 2400, 2592, 4000, 4096, 12000, 36864]

FWD_TOL = 1e-3
CONV_TOL = 1e-5


def _rand(n, cplx, rng):
    if cplx:
        return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    return rng.standard_normal(n).astype(np.float32)


def _packed_rfft_ref(x):
    r = np.fft.rfft(x)
    out = r[..., :-1].astype(np.complex128).copy()
    out[..., 0] = r[..., 0].real + 1j * r[..., -1].real
    return out


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_forward_vs_numpy(n, cplx):
    kind = pf.COMPLEX if cplx else pf.REAL
    if not pf.is_valid_size(n, kind):
        pytest.skip(f"N={n} not valid for {kind}")
    plan = pf.new_setup(n, kind)
    rng = np.random.default_rng(n)
    x = _rand(n, cplx, rng)
    y = np.asarray(pf.transform_ordered(plan, jnp.asarray(x)))
    ref = np.fft.fft(x) if cplx else _packed_rfft_ref(x)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(y - ref)) < FWD_TOL * scale


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_backward_vs_numpy(n, cplx):
    kind = pf.COMPLEX if cplx else pf.REAL
    if not pf.is_valid_size(n, kind):
        pytest.skip(f"N={n} not valid for {kind}")
    plan = pf.new_setup(n, kind)
    rng = np.random.default_rng(n + 1)
    x = _rand(n, cplx, rng)
    spec = pf.transform_ordered(plan, jnp.asarray(x), pf.FORWARD)
    back = np.asarray(pf.transform_ordered(plan, spec, pf.BACKWARD)) / n
    assert np.max(np.abs(back - x)) < FWD_TOL * max(np.max(np.abs(x)), 1.0)


@pytest.mark.parametrize("n", [64, 96, 2048, 2400])
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_zreorder_roundtrip_identity(n, cplx):
    """unordered + zreorder(FWD) == ordered; zreorder(BWD) inverts it
    (bench_pffft.c:340-380 identity checks)."""

    kind = pf.COMPLEX if cplx else pf.REAL
    if not pf.is_valid_size(n, kind):
        pytest.skip("invalid size")
    plan = pf.new_setup(n, kind)
    rng = np.random.default_rng(7)
    x = jnp.asarray(_rand(n, cplx, rng))
    unord = pf.transform(plan, x, pf.FORWARD)
    ordered = pf.transform_ordered(plan, x, pf.FORWARD)
    reord = pf.zreorder(plan, unord, pf.FORWARD)
    np.testing.assert_array_equal(np.asarray(reord), np.asarray(ordered))
    back = pf.zreorder(plan, reord, pf.BACKWARD)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(unord))
    # and the backward transform from internal layout matches
    xa = np.asarray(pf.transform(plan, unord, pf.BACKWARD)) / n
    np.testing.assert_allclose(xa, np.asarray(x), atol=2e-6 * max(1, np.max(np.abs(np.asarray(x)))))


@pytest.mark.parametrize("n", [64, 128, 2048, 2400])
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_zconvolve_vs_spectral_square(n, cplx):
    """zconvolve(a, a) in internal layout == |spectrum|^2-style direct product
    computed on the canonical oracle spectrum (bench_pffft.c:385-425)."""

    kind = pf.COMPLEX if cplx else pf.REAL
    if not pf.is_valid_size(n, kind):
        pytest.skip("invalid size")
    plan = pf.new_setup(n, kind)
    rng = np.random.default_rng(11)
    x = _rand(n, cplx, rng)
    scale = 0.5
    a = pf.transform(plan, jnp.asarray(x), pf.FORWARD)
    ab = pf.zconvolve_no_accu(plan, a, a, scale)
    got = np.asarray(pf.zreorder(plan, ab, pf.FORWARD))

    if cplx:
        ref_spec = np.fft.fft(x)
        ref = ref_spec * ref_spec * scale
    else:
        ref_spec = _packed_rfft_ref(x)
        ref = ref_spec * ref_spec * scale
        # packed bin0: component-wise (DC*DC, Nyq*Nyq)
        ref[0] = ref_spec[0].real ** 2 * scale + 1j * (ref_spec[0].imag ** 2 * scale)
    tol = CONV_TOL * np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < tol

    # accumulate variant: ab + a*b*scale (pffft.h:196)
    acc0 = jnp.asarray(np.full(got.shape, 2.0 + 0j, dtype=got.dtype))
    acc = np.asarray(pf.zreorder(plan, pf.zconvolve_accumulate(plan, a, a, pf.zreorder(plan, acc0, pf.BACKWARD), scale), pf.FORWARD))
    assert np.max(np.abs(acc - (np.asarray(acc0) + ref))) < tol + 1e-5


@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_spectrum_pack_unpack(cplx):
    n = 256
    plan = pf.new_setup(n, pf.REAL)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    packed = pf.transform_ordered(plan, jnp.asarray(x))
    un = np.asarray(pf.spectrum_unpack(packed))
    ref = np.fft.rfft(x)
    assert un.shape[-1] == n // 2 + 1
    np.testing.assert_allclose(un, ref, atol=1e-3 * np.max(np.abs(ref)))
    rp = np.asarray(pf.spectrum_pack(jnp.asarray(un)))
    np.testing.assert_allclose(rp, np.asarray(packed), atol=1e-6 * np.max(np.abs(ref)))


def test_unscaled_convention():
    """backward(forward(x)) == N * x exactly in structure (pffft.h:134)."""

    n = 1024
    for kind in [pf.REAL, pf.COMPLEX]:
        plan = pf.new_setup(n, kind)
        rng = np.random.default_rng(5)
        x = _rand(n, kind == pf.COMPLEX, rng)
        y = pf.transform_ordered(plan, jnp.asarray(x))
        z = np.asarray(pf.transform_ordered(plan, y, pf.BACKWARD))
        np.testing.assert_allclose(z, n * x, atol=2e-3 * n * np.max(np.abs(x)) * 1e-3 + 1e-2)


def test_competitor_planar_radix2_vs_numpy():
    """The --compare column's independent on-chip competitor
    (benchmarks/competitor_jnp.py) must itself be a correct FFT."""

    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"))
    from competitor_jnp import planar_fft_radix2

    rng = np.random.default_rng(11)
    for n in (16, 256, 2048):
        x = rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
        r, i = planar_fft_radix2(
            np.float32(x.real).copy(), np.float32(x.imag).copy()
        )
        got = np.asarray(r, np.float64) + 1j * np.asarray(i, np.float64)
        ref = np.fft.fft(x)
        assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
        br, _ = planar_fft_radix2(r, i, backward=True)
        assert np.abs(np.asarray(br) / n - x.real).max() < 1e-5 * np.abs(x).max()
