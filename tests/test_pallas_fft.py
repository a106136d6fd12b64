"""Fused Pallas FFT kernel tests (interpret mode on CPU).

The interpret-mode equality check against the XLA engine is the framework's
analog of the reference's SIMD macro self-validation
(validate_pffft_simd_ex, pffft_priv_impl.h:1889-2225; SURVEY.md §4.5): the
hand-written kernel must agree with the portable engine lane-for-lane.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu.ops import pallas_fft as pk


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("n", [64, 240, 1024, 1920])
def test_pallas_matches_numpy_forward(n):
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=5, strict=False)
    assert pk.supported(plan)
    r = _rng(n)
    b = 128
    re = r.standard_normal((n, b)).astype(np.float32)
    im = r.standard_normal((n, b)).astype(np.float32)
    rr, ri = pk.cfft_pallas_tmajor(plan, jnp.asarray(re), jnp.asarray(im), interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ri)
    ref = np.fft.fft((re.astype(np.float64) + 1j * im.astype(np.float64)).T).T
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()


def test_pallas_matches_engine_exactly_shaped():
    """Same plan through kernel and XLA engine: results agree to f32 noise."""

    n, b = 480, 256
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=5, strict=False)
    r = _rng(1)
    re = r.standard_normal((n, b)).astype(np.float32)
    im = r.standard_normal((n, b)).astype(np.float32)
    kr, ki = pk.cfft_pallas_tmajor(plan, jnp.asarray(re), jnp.asarray(im), interpret=True)
    er, ei = pf.fft.transform_ordered_split(plan, (jnp.asarray(re.T), jnp.asarray(im.T)))
    scale = float(jnp.abs(er).max())
    np.testing.assert_allclose(np.asarray(kr).T, np.asarray(er), atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(ki).T, np.asarray(ei), atol=2e-6 * scale)


def test_pallas_backward_roundtrip_unscaled():
    n, b = 1024, 128
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=5)
    r = _rng(2)
    re = jnp.asarray(r.standard_normal((n, b)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((n, b)).astype(np.float32))
    fr, fi = pk.cfft_pallas_tmajor(plan, re, im, interpret=True)
    br, bi = pk.cfft_pallas_tmajor(plan, fr, fi, backward=True, interpret=True)
    np.testing.assert_allclose(np.asarray(br) / n, np.asarray(re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(bi) / n, np.asarray(im), atol=2e-5)


def test_pallas_batch_major_wrapper():
    n, b = 256, 128
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=5)
    r = _rng(3)
    re = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    rr, ri = pk.cfft_pallas(plan, re, im, interpret=True)
    ref = np.fft.fft(np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64))
    got = np.asarray(rr) + 1j * np.asarray(ri)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()


def test_pallas_rejects_bad_shapes():
    plan = pf.new_setup(1024, pf.COMPLEX, max_factor=5)
    x = jnp.zeros((1024, 100), jnp.float32)  # batch not a tile multiple
    with pytest.raises(ValueError):
        pk.cfft_pallas_tmajor(plan, x, x, interpret=True)
    y = jnp.zeros((512, 128), jnp.float32)  # wrong length
    with pytest.raises(ValueError):
        pk.cfft_pallas_tmajor(plan, y, y, interpret=True)


def test_dispatch_registry():
    """Engine dispatcher (pf_conv_dispatcher analog): selection + forcing."""

    from pffft_tpu.ops import dispatch as dp

    plan5 = pf.new_setup(1024, pf.COMPLEX, max_factor=5)
    plan64 = pf.new_setup(1024, pf.COMPLEX, max_factor=64)
    # radix<=5 plan, tile-aligned time-major batch -> both engines
    assert dp.available_engines(plan5, 256, True) == ("xla", "pallas")
    # fat MXU factors reroute through a derived thin-chain plan (the
    # ordered spectrum is factorization-independent), so pallas is
    # available time-major for them too
    assert dp.available_engines(plan64, 256, True) == ("xla", "pallas")
    # misaligned batch / batch-major -> xla only (batch-major would need
    # transposes in and out of the kernel's native layout)
    assert dp.available_engines(plan5, 100, True) == ("xla",)
    assert dp.available_engines(plan5, 256, False) == ("xla",)

    assert dp.select_engine(plan5, 256, True) == "xla"  # measured default
    dp.set_engine("pallas")
    try:
        assert dp.select_engine(plan5, 256, True) == "pallas"
        assert dp.select_engine(plan64, 256, True) == "pallas"
        with pytest.raises(ValueError):
            dp.select_engine(plan64, 256, False)  # batch-major: unavailable
    finally:
        dp.set_engine(None)
    with pytest.raises(ValueError):
        dp.set_engine("cuda")


def test_dispatch_results_agree():
    from pffft_tpu.ops import dispatch as dp

    plan = pf.new_setup(512, pf.COMPLEX, max_factor=5)
    r = _rng(9)
    re = jnp.asarray(r.standard_normal((512, 128)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((512, 128)).astype(np.float32))
    xr, xi = dp.cfft_dispatch(plan, re, im, time_major=True)
    ref = np.fft.fft(np.asarray(re).astype(np.float64).T + 1j * np.asarray(im).astype(np.float64).T).T
    got = np.asarray(xr) + 1j * np.asarray(xi)
    assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()


def test_dispatch_thin_plan_reroute_matches():
    """A measured-table 'pallas' entry must serve a FAT-stage plan via a
    derived thin-chain plan with identical ordered output (the route the
    TPU table takes at N=1024 time-major, engines_r3.csv)."""

    import jax

    from pffft_tpu.ops import dispatch as dp

    n = 512
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=32)  # fat stages
    assert any(st.r > 5 for st in plan.stages)
    backend = jax.default_backend()
    key = (backend, n, True)
    prev = dp._MEASURED_TABLE.get(key)
    dp.record_engine(backend, n, "pallas", time_major=True)
    try:
        assert dp.select_engine(plan, 128, True) == "pallas"
        r = _rng(11)
        re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        xr, xi = dp.cfft_dispatch(plan, re, im, time_major=True)
        ref = np.fft.fft(
            np.asarray(re).astype(np.float64).T
            + 1j * np.asarray(im).astype(np.float64).T
        ).T
        got = np.asarray(xr) + 1j * np.asarray(xi)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
        # backward through the same route: unscaled inverse identity
        br, bi = dp.cfft_dispatch(plan, xr, xi, backward=True, time_major=True)
        assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-4
    finally:
        if prev is None:
            dp._MEASURED_TABLE.pop(key, None)
        else:
            dp._MEASURED_TABLE[key] = prev
