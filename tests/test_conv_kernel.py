"""Fused spectral-convolution kernel (ops/conv_kernel.py) vs numpy.

Interpret-mode on CPU — the same self-validation strategy as the FFT
kernel tests (the reference's SIMD self-validation analog, SURVEY §4.5).
The kernel computes IFFT(FFT(x) * Hf) per time-major column with the 1/N
scale folded into Hf, i.e. the circular convolution of each column with
the zero-padded filter (pffastconv_apply's per-block spectral step,
/root/reference/src/pffastconv.c:185-196).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu.ops import conv_kernel as ck
from pffft_tpu.ops import pallas_fft as pk


def _mk_plan(n):
    f = pk.thin_factors(n)
    return pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)


def _circ(x, h):
    n = len(x)
    hp = np.zeros(n, np.complex128)
    hp[: len(h)] = h
    return np.fft.ifft(np.fft.fft(x.astype(np.complex128)) * np.fft.fft(hp))


@pytest.mark.parametrize("n", [64, 256, 480])
def test_zconv_matches_circular_convolution(n):
    rng = np.random.default_rng(7)
    plan = _mk_plan(n)
    b, flen = 256, 17
    h = rng.standard_normal(flen) + 1j * rng.standard_normal(flen)
    hfr, hfi = ck.filter_spectrum(plan, h)
    re = rng.standard_normal((n, b)).astype(np.float32)
    im = rng.standard_normal((n, b)).astype(np.float32)
    yr, yi = ck.zconv_pallas_tmajor(
        plan, re, im, hfr, hfi, tb=128, interpret=True
    )
    got = np.asarray(yr) + 1j * np.asarray(yi)
    for c in (0, 1, b - 1):
        ref = _circ(re[:, c] + 1j * im[:, c], h)
        assert np.abs(got[:, c] - ref).max() <= 2e-4 * max(1.0, np.abs(ref).max())


def test_two_real_frames_per_complex_pass():
    """Real filter + re=a, im=b packing => (h*a, h*b) exactly (Hermitian Hf)."""

    rng = np.random.default_rng(3)
    n, b, flen = 128, 128, 9
    plan = _mk_plan(n)
    h = rng.standard_normal(flen)
    hfr, hfi = ck.filter_spectrum(plan, h)
    a = rng.standard_normal((n, b)).astype(np.float32)
    bb = rng.standard_normal((n, b)).astype(np.float32)
    yr, yi = ck.zconv_pallas_tmajor(plan, a, bb, hfr, hfi, tb=128, interpret=True)
    for c in (0, b // 2):
        ra = _circ(a[:, c].astype(np.complex128), h).real
        rb = _circ(bb[:, c].astype(np.complex128), h).real
        assert np.abs(np.asarray(yr)[:, c] - ra).max() < 2e-4 * max(1.0, np.abs(ra).max())
        assert np.abs(np.asarray(yi)[:, c] - rb).max() < 2e-4 * max(1.0, np.abs(rb).max())


def test_matches_engine_fft_mul_ifft():
    """Bit-level strategy check vs the XLA engine composition."""

    rng = np.random.default_rng(11)
    n, b = 256, 128
    plan = _mk_plan(n)
    h = rng.standard_normal(33) + 1j * rng.standard_normal(33)
    hfr, hfi = ck.filter_spectrum(plan, h)
    re = rng.standard_normal((n, b)).astype(np.float32)
    im = rng.standard_normal((n, b)).astype(np.float32)
    yr, yi = ck.zconv_pallas_tmajor(plan, re, im, hfr, hfi, tb=128, interpret=True)

    import jax.numpy as jnp

    sr, si = pf.fft.transform_ordered_split_tmajor(plan, (jnp.asarray(re), jnp.asarray(im)), pf.FORWARD)
    mr = sr * hfr[:, None] - si * hfi[:, None]
    mi = sr * hfi[:, None] + si * hfr[:, None]
    br, bi = pf.fft.transform_ordered_split_tmajor(plan, (mr, mi), pf.BACKWARD)
    assert np.abs(np.asarray(yr) - np.asarray(br)).max() < 1e-3
    assert np.abs(np.asarray(yi) - np.asarray(bi)).max() < 1e-3


def test_fastconv_fused_route_matches_xla_pipeline():
    """FastConv routed through the fused kernel == the XLA pipeline ==
    np.convolve 'valid' (the route is framing + packing + kernel; this
    exercises the whole overlap-save path, odd/even block counts and the
    column padding)."""

    rng = np.random.default_rng(5)
    for flen, length in ((17, 3000), (63, 5000)):
        h = rng.standard_normal(flen).astype(np.float32)
        x = rng.standard_normal(length).astype(np.float32)
        wants = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")

        off = pf.conv.FastConv(h, flags=pf.conv.ConvFlags.NONE)
        off._force_conv_kernel = False
        on = pf.conv.FastConv(h, flags=pf.conv.ConvFlags.NONE)
        on._force_conv_kernel = True
        assert on._jitted_fused_stream(8, True) is not None, "route not taken"

        y_off, c_off = off.apply(x, flush=True)
        y_on, c_on = on.apply(x, flush=True)
        assert c_on == c_off
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=2e-3)
        scale = max(1.0, np.abs(wants).max())
        assert np.abs(np.asarray(y_on) - wants[: c_on]).max() <= 2e-4 * scale


def test_fastconv_fused_route_complex_stream():
    """CPLX_INP_OUT rides the same real pipelines (I and Q) through the
    fused kernel."""

    rng = np.random.default_rng(9)
    h = rng.standard_normal(31).astype(np.float32)
    x = (rng.standard_normal(2500) + 1j * rng.standard_normal(2500)).astype(np.complex64)
    on = pf.conv.FastConv(h, flags=pf.conv.ConvFlags.CPLX_INP_OUT)
    on._force_conv_kernel = True
    off = pf.conv.FastConv(h, flags=pf.conv.ConvFlags.CPLX_INP_OUT)
    off._force_conv_kernel = False
    y_on, c1 = on.apply(x, flush=True)
    y_off, c2 = off.apply(x, flush=True)
    assert c1 == c2
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=4e-3)


def test_fastconv_fused_route_single_fft_stream():
    """CPLX_INP_OUT|CPLX_SINGLE_FFT reaches the routed stream pipelines
    (the gate checks cplx_filter/dtype/nfft but not single_fft): the
    stride-2 filter embedding must survive the fused kernel and the
    composed time-major route (round-3 ADVICE: this production-reachable
    combination was unverified)."""

    rng = np.random.default_rng(23)
    h = rng.standard_normal(31).astype(np.float32)
    x = (rng.standard_normal(2500) + 1j * rng.standard_normal(2500)).astype(
        np.complex64
    )
    flags = pf.conv.ConvFlags.CPLX_INP_OUT | pf.conv.ConvFlags.CPLX_SINGLE_FFT
    off = pf.conv.FastConv(h, flags=flags)
    off._force_conv_kernel = False
    y_off, c_off = off.apply(x, flush=True)
    for force in (True, "tmajor"):
        on = pf.conv.FastConv(h, flags=flags)
        on._force_conv_kernel = force
        assert on._jitted_fused_stream(64, force) is not None, "route not taken"
        y_on, c_on = on.apply(x, flush=True)
        assert c_on == c_off
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=4e-3)


def test_fused_choice_rejection_falls_through_to_tmajor(monkeypatch):
    """When the table routes 'fused' but conv_kernel_choice rejects every
    tile on column-padding waste (tiny streams), the builder must fall
    through to the composed time-major route — which also beats the
    batch-major XLA pipeline at these lengths — instead of returning
    None (round-3 ADVICE)."""

    from pffft_tpu.ops import dispatch as dp

    rng = np.random.default_rng(29)
    h = rng.standard_normal(17).astype(np.float32)  # nfft = 64
    cv = pf.conv.FastConv(h)
    backend = __import__("jax").default_backend()
    monkeypatch.setitem(dp._CONV_TABLE, (backend, cv.nfft), "fused")
    nb = 8  # cols = 4: padding waste 124/128 > 1/3 at every tile
    assert dp.conv_kernel_choice(cv.nfft, (nb + 1) // 2) is None
    fn = cv._jitted_fused_stream(nb)
    assert fn is not None, "expected tmajor fallthrough, got XLA fallback"
    x = rng.standard_normal((nb + 1) * cv.num_out_per_block).astype(np.float32)
    got = np.asarray(fn(jnp.asarray(x)))
    want = np.convolve(
        x.astype(np.float64), h.astype(np.float64), "valid"
    )[: nb * cv.num_out_per_block]
    assert np.abs(got - want).max() <= 1e-4 * max(1.0, np.abs(want).max())


def test_conv_route_pallas_force_respects_recorded_false():
    """PFFFT_TPU_ENGINE=pallas defaults a table MISS to the fused kernel,
    but an explicitly recorded False (e.g. the kernel crashes the remote
    compiler at this length) must stay disabled (round-3 ADVICE)."""

    import jax

    from pffft_tpu.ops import dispatch as dp

    backend = jax.default_backend()
    key = (backend, 1 << 20)
    try:
        dp.set_engine("pallas")
        assert dp.conv_route_mode(1 << 20) == "fused"  # miss -> default
        dp.record_conv_route(backend, 1 << 20, False)
        assert dp.conv_route_mode(1 << 20) is None  # recorded False sticks
    finally:
        dp.set_engine(None)
        dp._CONV_TABLE.pop(key, None)


def test_fastconv_tmajor_route_matches_xla_pipeline():
    """The composed time-major route (kernel-free: dispatch transforms +
    XLA Hf multiply) == the batch-major pipeline == np.convolve."""

    rng = np.random.default_rng(13)
    h = rng.standard_normal(100).astype(np.float32)  # nfft = 256
    x = rng.standard_normal(6000).astype(np.float32)
    want = np.convolve(x.astype(np.float64), h.astype(np.float64), "valid")

    off = pf.conv.FastConv(h)
    off._force_conv_kernel = False
    on = pf.conv.FastConv(h)
    on._force_conv_kernel = "tmajor"
    assert on._jitted_fused_stream(8, "tmajor") is not None

    y_off, c_off = off.apply(x, flush=True)
    y_on, c_on = on.apply(x, flush=True)
    assert c_on == c_off
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), atol=2e-3)
    scale = max(1.0, np.abs(want).max())
    assert np.abs(np.asarray(y_on) - want[:c_on]).max() <= 2e-4 * scale


def test_fused_route_built_inside_outer_trace():
    """Regression: the route builder is lru-cached; when its first call
    happens inside an OUTER jit trace (e.g. a caller looping
    _conv_stream under fori_loop, as bench_pipeline does), build-time
    jnp constants would be tracers and leak into every later trace."""

    import jax

    rng = np.random.default_rng(21)
    h = rng.standard_normal(17).astype(np.float32)
    x = np.asarray(rng.standard_normal(1000).astype(np.float32))
    cv = pf.conv.FastConv(h)
    cv._force_conv_kernel = True
    total = 1000 - cv.nfft + 1
    total = (total // cv.num_out_per_block) * cv.num_out_per_block
    y1 = jax.jit(lambda v: cv._conv_stream(v, total))(x)       # builds in-trace
    y2 = jax.jit(lambda v: cv._conv_stream(v, total) * 2.0)(x)  # fresh trace
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-6)


def test_conv_route_mode_table():
    from pffft_tpu.ops import dispatch as dp

    # no cpu entries -> None in auto mode; force overrides
    assert dp.conv_route_mode(256) is None
    assert dp.conv_route_mode(256, force=True) == "fused"
    assert dp.conv_route_mode(256, force="tmajor") == "tmajor"
    assert dp.conv_route_mode(256, force=False) is None
    dp.record_conv_route("cpu", 96, "tmajor")
    try:
        assert dp.conv_route_mode(96) == "tmajor"
    finally:
        dp.record_conv_route("cpu", 96, False)
    with pytest.raises(ValueError):
        dp.record_conv_route("cpu", 96, "nope")


def test_conv_kernel_choice_gating():
    """Dispatch gate: measured table off-backend, force flag, tile/waste."""

    from pffft_tpu.ops import dispatch as dp

    # CPU backend has no measured route entry -> None without force
    assert dp.conv_kernel_choice(256, 4096) is None
    got = dp.conv_kernel_choice(256, 4096, force=True)
    assert got is not None and got[1] == 1024  # widest measured tile
    # padding waste > 1/3 -> smaller tile or (unforced) nothing
    plan, tb = dp.conv_kernel_choice(256, 1500, force=True)
    assert tb == 512
    # force always returns a tile, even for tiny batches
    plan, tb = dp.conv_kernel_choice(256, 8, force=True)
    assert tb == 128
    assert dp.conv_kernel_choice(256, 8, force=False) is None


def test_validation_errors():
    plan = _mk_plan(256)
    rng = np.random.default_rng(0)
    re = rng.standard_normal((256, 100)).astype(np.float32)
    hfr, hfi = ck.filter_spectrum(plan, np.ones(4))
    with pytest.raises(ValueError):
        ck.zconv_pallas_tmajor(plan, re, re, hfr, hfi, tb=128, interpret=True)
    bad = pf.new_setup(4096, pf.COMPLEX, factors=(64, 64), strict=False)
    assert not ck.supported(bad)  # dense r=64 stages are engine-only
    x = rng.standard_normal((bad.n, 128)).astype(np.float32)
    hr, hi = ck.filter_spectrum(bad, np.ones(4))
    with pytest.raises(ValueError):
        ck.zconv_pallas_tmajor(bad, x, x, hr, hi, tb=128, interpret=True)


def test_conv_scratch_kernel_matches_unrolled():
    """The fused conv kernel's scratch chain (doubled fwd+bwd stages
    through VMEM ping-pong refs — the round-4 route to nfft>=1024) is
    bit-identical to the unrolled chain in interpret mode."""

    rng = np.random.default_rng(31)
    for nfft in (256, 1024):
        plan = pf.new_setup(
            nfft, pf.COMPLEX, factors=pk.thin_factors(nfft), strict=False
        )
        h = rng.standard_normal(nfft // 4).astype(np.float32)
        hfr, hfi = ck.filter_spectrum(plan, h)
        re = jnp.asarray(rng.standard_normal((nfft, 128)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((nfft, 128)).astype(np.float32))
        a = ck.zconv_pallas_tmajor(
            plan, re, im, jnp.asarray(hfr), jnp.asarray(hfi), interpret=True)
        b = ck.zconv_pallas_tmajor(
            plan, re, im, jnp.asarray(hfr), jnp.asarray(hfi), interpret=True,
            scratch=True)
        assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
