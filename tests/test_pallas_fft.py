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
    # ragged batches are ACCEPTED since r5 (masked edge block) — the
    # ragged column must still be exact
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1024, 100)).astype(
            np.float32))
    sr, si = pk.cfft_pallas_tmajor(plan, x, x, tb=128, interpret=True)
    ref = np.fft.fft(
        np.asarray(x[:, -1]).astype(np.float64) * (1 + 1j))
    got = np.asarray(sr[:, -1]).astype(np.float64) + 1j * np.asarray(
        si[:, -1])
    assert np.abs(got - ref).max() < 2e-5 * np.abs(ref).max()
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


def test_tb_policy():
    """Per-N measured tile policy (pallas_tb2_r3.txt): best first, VMEM
    gate folded in, None when no candidate divides the batch."""

    assert pk.tb_candidates(256)[0] == 1024
    assert pk.tb_candidates(512)[0] == 512  # front_r5.txt: 0.801 med
    # round 4 (vmem_r4.txt): the scoped-VMEM limit raise unlocked wide
    # tiles across the band — the compile ceiling is n*tb <= 1M elements
    assert pk.tb_candidates(1024)[0] == 1024
    assert pk.tb_candidates(2048)[0] == 512
    assert pk.tb_candidates(4096)[0] == 512  # wall tile, arb127 config
    assert pk.tb_candidates(8192) == (128,)
    assert pk.best_tb(256, 4096) == 1024
    assert pk.best_tb(256, 512) == 512       # fallback down the list
    assert pk.best_tb(512, 128 * 5) == 128   # 384 nor 256 divide 640
    assert pk.best_tb(1024, 100) is None     # not lane-tile aligned
    # unmeasured length: conservative n*tb envelope (floored at one lane
    # tile), lane-tile multiples only
    cands = pk.tb_candidates(160)
    assert cands[0] * 160 <= pk._SAFE_ELEMS and all(c % 128 == 0 for c in cands)


def test_wide_tile_matches_engine():
    """The wide measured tiles must produce identical spectra (interpret
    mode exercises the same kernel trace Mosaic compiles)."""

    from pffft_tpu.ops import split as sp

    for n, tb in ((256, 1024), (512, 384)):
        plan = pf.new_setup(n, pf.COMPLEX, max_factor=5)
        r = _rng(n)
        re = jnp.asarray(r.standard_normal((n, tb)).astype(np.float32))
        im = jnp.asarray(r.standard_normal((n, tb)).astype(np.float32))
        kr, ki = pk.cfft_pallas_tmajor(plan, re, im, tb=tb, interpret=True)
        er, ei = sp.cfft_stages_split_tmajor(
            re, im, plan.stages, backward=False, ordered=True)
        scale = float(jnp.abs(er).max())
        assert float(jnp.abs(kr - er).max()) < 1e-5 * scale
        assert float(jnp.abs(ki - ei).max()) < 1e-5 * scale


def test_set_engine_invalidates_jit_cache(monkeypatch):
    """Regression: the engine choice is baked in at trace time, so the
    public transforms' jit caches must key on the dispatch state — else
    set_engine after a first call silently keeps the old engine (and any
    forced-engine A/B compares an executable against itself)."""

    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk_mod

    n = 256
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=5)
    r = _rng(5)
    re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))

    calls = {"pallas": 0}
    real_kernel = pk_mod.cfft_pallas_tmajor

    def counting(*a, **k):
        calls["pallas"] += 1
        return real_kernel(*a, **k)

    monkeypatch.setattr(dp._pk, "cfft_pallas_tmajor", counting)
    dp.set_engine("pallas")
    try:
        pf.fft.transform_ordered_split_tmajor(plan, (re, im), pf.FORWARD)
        assert calls["pallas"] == 1
    finally:
        dp.set_engine(None)
    # default on CPU is xla: a fresh trace must NOT reuse the pallas one
    before = calls["pallas"]
    pf.fft.transform_ordered_split_tmajor(plan, (re, im), pf.FORWARD)
    assert calls["pallas"] == before


def test_cmul_mode_invalidates_jit_cache():
    """Regression: set_cmul_mode must yield a fresh executable through the
    cached public transforms (same trace-time-global hazard as engines)."""

    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp

    plan = pf.new_setup(256, pf.COMPLEX)
    k0 = dp.state_key()
    f0 = pf.fft._jitted_split(plan, False, True, k0)
    forced = "gauss" if sp.cmul_mode() != "gauss" else "4mul"
    sp.set_cmul_mode(forced)
    try:
        k1 = dp.state_key()
        assert k1 != k0
        assert pf.fft._jitted_split(plan, False, True, k1) is not f0
    finally:
        sp.set_cmul_mode(None)
    assert pf.fft._jitted_split(plan, False, True, dp.state_key()) is f0


@pytest.mark.parametrize("n", [512, 2048, 1920])
def test_real_tmajor_matches_batch_major(n):
    """Time-major REAL transforms: same packed spectrum as the batch-major
    path (transposed) and unscaled roundtrip; the half-length complex
    engine rides the time-major dispatch (pallas-routable at N<=2048)."""

    plan = pf.new_setup(n, pf.REAL)
    r = _rng(n)
    x = r.standard_normal((n, 16)).astype(np.float32)
    sr, si = pf.fft.transform_ordered_split_tmajor(plan, jnp.asarray(x), pf.FORWARD)
    br, bi = pf.fft.transform_ordered_split(plan, jnp.asarray(x.T), pf.FORWARD)
    scale = float(jnp.abs(br).max())
    assert float(jnp.abs(sr - br.T).max()) < 1e-5 * scale
    assert float(jnp.abs(si - bi.T).max()) < 1e-5 * scale
    back = pf.fft.transform_ordered_split_tmajor(plan, (sr, si), pf.BACKWARD)
    assert float(jnp.abs(back / n - x).max()) < 1e-5


def test_real_tmajor_forced_pallas_matches():
    """The REAL time-major route through the forced pallas engine must
    match the xla route bin-for-bin (interpret mode on CPU)."""

    from pffft_tpu.ops import dispatch as dp

    n = 512
    plan = pf.new_setup(n, pf.REAL)
    r = _rng(77)
    x = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    ar, ai = pf.fft.transform_ordered_split_tmajor(plan, x, pf.FORWARD)
    dp.set_engine("pallas")
    try:
        pr, pi = pf.fft.transform_ordered_split_tmajor(plan, x, pf.FORWARD)
    finally:
        dp.set_engine(None)
    scale = float(jnp.abs(ar).max())
    assert float(jnp.abs(pr - ar).max()) < 2e-5 * scale
    assert float(jnp.abs(pi - ai).max()) < 2e-5 * scale


def test_real_tmajor_shape_errors():
    plan = pf.new_setup(512, pf.REAL)
    with pytest.raises(ValueError):
        pf.fft.transform_ordered_split_tmajor(
            plan, jnp.zeros((511, 4), jnp.float32), pf.FORWARD)
    with pytest.raises(ValueError):
        pf.fft.transform_ordered_split_tmajor(
            plan, (jnp.zeros((512, 4), jnp.float32),) * 2, pf.BACKWARD)


@pytest.mark.parametrize("n", [128, 1024, 768, 640])
def test_radix16_chain_matches_numpy(n):
    """Radix-16/8 kernel chains (fewest VMEM traversals) vs numpy, both
    directions, incl. mixed radices."""

    f = pk.thin_factors(n, radix16=True)
    assert 16 in f or 8 in f
    plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
    assert pk.supported(plan)
    r = _rng(n)
    re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    z = np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
    for backward in (False, True):
        kr, ki = pk.cfft_pallas_tmajor(plan, re, im, backward=backward, interpret=True)
        ref = np.fft.ifft(z, axis=0) * n if backward else np.fft.fft(z, axis=0)
        err = np.abs((np.asarray(kr) + 1j * np.asarray(ki)) - ref).max()
        assert err < 1e-5 * np.abs(ref).max(), (n, backward)


def test_chain_pref_switches_thin_plan():
    """set_chain_pref must invalidate the thin-plan cache and the public
    jit caches (state key)."""

    from pffft_tpu.ops import dispatch as dp

    n = 256
    p0 = dp._thin_plan(n)
    assert p0 is not None and max(p0.factors) <= 5
    k0 = dp.state_key()
    dp.set_chain_pref(n, True)
    try:
        p1 = dp._thin_plan(n)
        assert p1.factors == (16, 16)
        assert dp.state_key() != k0
    finally:
        dp.set_chain_pref(n, False)
    assert max(dp._thin_plan(n).factors) <= 5


@pytest.mark.parametrize("n,b", [(2048, 128), (4096, 64)])
def test_ksplit_matches_numpy(n, b):
    """Hybrid kernel+combine engine: length-m sub-FFTs in the VPU kernel,
    one XLA radix-r stage finishing ordered (dispatch.cfft_ksplit_tmajor)."""

    from pffft_tpu.ops import dispatch as dp

    plan = pf.new_setup(n, pf.COMPLEX)
    conf = dp._ksplit_conf(n)
    assert conf is not None and conf[0] * conf[1] == n
    r = _rng(n)
    re = jnp.asarray(r.standard_normal((n, b)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((n, b)).astype(np.float32))
    z = np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
    kr, ki = dp.cfft_ksplit_tmajor(plan, re, im, interpret=True)
    ref = np.fft.fft(z, axis=0)
    err = np.abs((np.asarray(kr) + 1j * np.asarray(ki)) - ref).max()
    assert err < 1e-5 * np.abs(ref).max(), n
    # unscaled backward through the same hybrid
    br, bi = dp.cfft_ksplit_tmajor(plan, kr, ki, backward=True, interpret=True)
    assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-4, n


def test_ksplit_dispatch_route():
    """A measured-table 'ksplit' entry must serve the public time-major
    path; availability requires the kernel tile to divide r*batch."""

    import jax

    from pffft_tpu.ops import dispatch as dp

    n = 2048
    plan = pf.new_setup(n, pf.COMPLEX)
    assert "ksplit" in dp.available_engines(plan, 128, True)
    assert "ksplit" not in dp.available_engines(plan, 100, True)
    assert "ksplit" not in dp.available_engines(plan, 128, False)
    backend = jax.default_backend()
    key = (backend, n, True)
    prev = dp._MEASURED_TABLE.get(key)
    dp.record_engine(backend, n, "ksplit", time_major=True)
    try:
        assert dp.select_engine(plan, 128, True) == "ksplit"
        r = _rng(77)
        re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        xr, xi = dp.cfft_dispatch(plan, re, im, time_major=True)
        ref = np.fft.fft(
            np.asarray(re).astype(np.float64)
            + 1j * np.asarray(im).astype(np.float64),
            axis=0,
        )
        got = np.asarray(xr) + 1j * np.asarray(xi)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
    finally:
        if prev is None:
            dp._MEASURED_TABLE.pop(key, None)
        else:
            dp._MEASURED_TABLE[key] = prev


def test_ksplit_conf_override():
    """set_ksplit_conf records a measured split and bumps the state key."""

    from pffft_tpu.ops import dispatch as dp

    assert dp._ksplit_conf(4096) == (1024, 4)
    k0 = dp.state_key()
    dp.set_ksplit_conf(4096, 512, 8)
    try:
        assert dp._ksplit_conf(4096) == (512, 8)
        assert dp.state_key() != k0
        plan = pf.new_setup(4096, pf.COMPLEX)
        r = _rng(5)
        re = jnp.asarray(r.standard_normal((4096, 32)).astype(np.float32))
        im = jnp.asarray(r.standard_normal((4096, 32)).astype(np.float32))
        kr, ki = dp.cfft_ksplit_tmajor(plan, re, im, interpret=True)
        z = np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
        ref = np.fft.fft(z, axis=0)
        err = np.abs((np.asarray(kr) + 1j * np.asarray(ki)) - ref).max()
        assert err < 1e-5 * np.abs(ref).max()
    finally:
        dp._KSPLIT_CONF.pop(4096, None)
    with pytest.raises(ValueError):
        dp.set_ksplit_conf(4096, 512, 4)


def test_real_tmajor_ksplit_route():
    """Real time-major N=4096 rides the half-length (2048) complex engine:
    a recorded ksplit@2048 entry must serve it with correct spectra."""

    import jax

    from pffft_tpu.ops import dispatch as dp

    n = 4096
    plan = pf.new_setup(n, pf.REAL)
    assert plan.engine_n == 2048
    backend = jax.default_backend()
    key = (backend, 2048, True)
    prev = dp._MEASURED_TABLE.get(key)
    dp.record_engine(backend, 2048, "ksplit", time_major=True)
    try:
        r = _rng(3)
        x = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        sr, si = pf.fft.transform_ordered_split_tmajor(plan, x, pf.FORWARD)
        ref = np.fft.rfft(np.asarray(x).astype(np.float64), axis=0)
        got = np.asarray(sr).astype(np.float64) + 1j * np.asarray(si).astype(np.float64)
        # packed bin0 = DC + i*Nyquist
        assert np.abs(got[0].real - ref[0].real).max() < 1e-3
        assert np.abs(got[0].imag - ref[n // 2].real).max() < 1e-3
        scale = np.abs(ref).max()
        assert np.abs(got[1:] - ref[1 : n // 2]).max() < 1e-5 * scale
        back = pf.fft.transform_ordered_split_tmajor(plan, (sr, si), pf.BACKWARD)
        assert np.abs(np.asarray(back) / n - np.asarray(x)).max() < 1e-4
    finally:
        if prev is None:
            dp._MEASURED_TABLE.pop(key, None)
        else:
            dp._MEASURED_TABLE[key] = prev


@pytest.mark.parametrize("n", [256, 1024, 8192])
def test_scratch_kernel_matches_unrolled(n):
    """The scratch ping-pong chain (VMEM-ref stage outputs — the round-4
    route past the Mosaic live-SSA ceiling at N>=8192) must be
    bit-identical to the unrolled value chain in interpret mode."""

    plan = pf.new_setup(
        n, pf.COMPLEX, factors=pk.thin_factors(n, radix16=True), strict=False
    )
    r = _rng(n)
    re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
    for backward in (False, True):
        ur, ui = pk.cfft_pallas_tmajor(
            plan, re, im, backward=backward, interpret=True)
        sr, si = pk.cfft_pallas_tmajor(
            plan, re, im, backward=backward, interpret=True, scratch=True)
        assert np.array_equal(np.asarray(ur), np.asarray(sr))
        assert np.array_equal(np.asarray(ui), np.asarray(si))


def test_use_scratch_policy():
    assert not pk.use_scratch(1024, 1024)  # measured tie: unrolled ships
    assert pk.use_scratch(8192, 128)  # unrolled cannot compile there
    assert pk.use_scratch(6000, 256)  # unmeasured past the r3 envelope
    assert not pk.use_scratch(192, 128)  # small tiles keep the r3 form


def test_ksplit2_in_kernel_combine_matches_numpy():
    """The in-kernel-combine hybrid (dispatch.cfft_ksplit2_tmajor,
    measured-not-adopted — ksplit2_r4.txt) must stay correct: lane-concat
    sub-FFT chain + lane-sliced twiddled combine, one HBM pass."""

    from pffft_tpu.ops import dispatch as dp

    rng = _rng(41)
    n, b = 4096, 256
    plan = pf.new_setup(n, pf.COMPLEX)
    re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    for conf in ((2048, 2), (1024, 4)):
        sr, si = dp.cfft_ksplit2_tmajor(
            plan, re, im, conf=conf, interpret=True)
        got = (np.asarray(sr[:, :2]).astype(np.float64)
               + 1j * np.asarray(si[:, :2]))
        ref = np.fft.fft(
            np.asarray(re[:, :2]).astype(np.float64)
            + 1j * np.asarray(im[:, :2]), axis=0)
        assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()


@pytest.mark.parametrize("n,conf", [(1024, (128, 8)), (2048, (128, 16)),
                                    (640, (128, 5))])
def test_kern2_two_pass_matches_numpy(n, conf):
    """Two-kernel-pass engine (round 5): pass A = wide-tile length-m kernel
    over the free [m, r*B] DIT view, pass B = the Pallas combine kernel
    (dispatch.cfft_kern2_tmajor).  Correct ordered spectra both directions."""

    from pffft_tpu.ops import dispatch as dp

    b = 128
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = _rng(n)
    re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    kr, ki = dp.cfft_kern2_tmajor(plan, re, im, conf=conf, interpret=True,
                                  tb_a=128)
    z = np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
    ref = np.fft.fft(z, axis=0)
    err = np.abs((np.asarray(kr) + 1j * np.asarray(ki)) - ref).max()
    assert err < 1e-5 * np.abs(ref).max(), n
    br, bi = dp.cfft_kern2_tmajor(plan, kr, ki, backward=True, conf=conf,
                                  interpret=True, tb_a=128)
    assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-4, n


def test_kern2_dispatch_route():
    """A measured-table 'kern2' entry must serve the public time-major path;
    availability needs a kernel-covered m and lane-tile-aligned batch."""

    import jax

    from pffft_tpu.ops import dispatch as dp

    n = 8192
    plan = pf.new_setup(n, pf.COMPLEX)
    assert dp._kern2_conf(n) is not None
    assert "kern2" in dp.available_engines(plan, 128, True)
    assert "kern2" not in dp.available_engines(plan, 100, True)
    assert "kern2" not in dp.available_engines(plan, 128, False)
    assert dp._kern2_conf(4096) is None  # direct kernel covers it
    backend = jax.default_backend()
    key = (backend, n, True)
    prev = dp._MEASURED_TABLE.get(key)
    dp.record_engine(backend, n, "kern2", time_major=True)
    try:
        assert dp.select_engine(plan, 128, True) == "kern2"
        r = _rng(78)
        re = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        im = jnp.asarray(r.standard_normal((n, 128)).astype(np.float32))
        xr, xi = dp.cfft_dispatch(plan, re, im, time_major=True)
        ref = np.fft.fft(
            np.asarray(re[:, :4]).astype(np.float64)
            + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        got = np.asarray(xr[:, :4]) + 1j * np.asarray(xi[:, :4])
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
    finally:
        if prev is None:
            dp._MEASURED_TABLE.pop(key, None)
        else:
            dp._MEASURED_TABLE[key] = prev


def test_kern2_conf_override_and_state_key():
    """set_kern2_conf records a measured split and bumps the state key."""

    from pffft_tpu.ops import dispatch as dp

    prior = dp._kern2_conf(16384)
    assert prior == (2048, 8)  # kern2d_r5.txt measured winner
    k0 = dp.state_key()
    dp.set_kern2_conf(16384, 1024, 16)
    try:
        assert dp._kern2_conf(16384) == (1024, 16)
        assert dp.state_key() != k0
    finally:
        dp.set_kern2_conf(16384, *prior)
    with pytest.raises(ValueError):
        dp.set_kern2_conf(16384, 1024, 8)


def test_combine_tile_policy():
    """Combine-kernel tiles divide (m, b) and respect the element budget."""

    mk, tb = pk._combine_tiles(1024, 8, 2048, None, None)
    assert 1024 % mk == 0 and 2048 % tb == 0
    assert mk * 8 * tb <= pk._COMBINE_ELEMS
    mk, tb = pk._combine_tiles(2048, 16, 384, None, None)
    assert tb in (128, 256) and 384 % tb == 0
    assert 2048 % mk == 0


def test_packed_input_kernel_matches_planar():
    """The packed [H, 2B] entry (zero-copy real pack) == planar pair."""

    import jax.numpy as jnp

    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp

    rng = np.random.default_rng(3)
    n, b = 512, 256
    plan = dp._thin_plan(n)
    x = jnp.asarray(rng.standard_normal((2 * n, b)).astype(np.float32))
    zr, zi = sp.pack_real_input_split_tmajor(x)
    ar, ai = pk.cfft_pallas_tmajor_packed(
        plan, x.reshape(n, 2 * b), interpret=True, tb=128)
    br, bi = pk.cfft_pallas_tmajor(plan, zr, zi, tb=128, interpret=True)
    assert float(jnp.abs(ar - br).max()) == 0.0
    assert float(jnp.abs(ai - bi).max()) == 0.0


@pytest.mark.parametrize("n", [512, 2048])
def test_fused_real_kernel_matches_composed(n):
    """One-pass fused real fwd/bwd (FFT chain + split via the roll-network
    mirror) == packed kernel + flat jnp split, within fp32 tolerance."""

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp

    rng = np.random.default_rng(9)
    h, b = n // 2, 256
    rplan = pf.new_setup(n, pf.REAL)
    pplan = dp._thin_plan(h)
    x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    y = x.reshape(h, 2 * b)

    # forward: fused vs pack + kernel + flat split
    fr, fi = pk.rfft_pallas_tmajor_fused(
        pplan, y, rplan.real_twiddle, tb=128, interpret=True)
    zr, zi = sp.pack_real_input_split_tmajor(x)
    kr, ki = pk.cfft_pallas_tmajor(pplan, zr, zi, tb=128, interpret=True)
    er, ei = sp.real_forward_split_planar_tmajor_flat(
        kr, ki, rplan.real_twiddle)
    scale = float(jnp.abs(er).max())
    assert float(jnp.abs(fr - er).max()) < 1e-5 * scale
    assert float(jnp.abs(fi - ei).max()) < 1e-5 * scale

    # backward: fused vs flat split + kernel
    br, bi = pk.rfft_bwd_pallas_tmajor_fused(
        pplan, fr, fi, rplan.real_twiddle, tb=128, interpret=True)
    pr, pi = sp.real_backward_split_planar_tmajor_flat(
        er, ei, rplan.real_twiddle)
    qr, qi = pk.cfft_pallas_tmajor(
        pplan, pr, pi, backward=True, tb=128, interpret=True)
    scale = float(jnp.abs(qr).max())
    assert float(jnp.abs(br - qr).max()) < 1e-5 * scale
    assert float(jnp.abs(bi - qi).max()) < 1e-5 * scale
    # roundtrip: interleave(bwd(fwd(x))) == 2 * H * x (engine conventions)
    xr = sp.interleave_to_real_split_tmajor(br, bi)
    assert float(jnp.abs(xr / n - x).max()) < 1e-4


@pytest.mark.parametrize("backward", [False, True])
@pytest.mark.parametrize("blocked", [False, True])
def test_real_split_kernel_matches_flat(backward, blocked):
    """The standalone one-pass split kernel == the flat jnp form, in
    both the full-column and the blocked 3-view (wall-avoiding) forms."""

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp

    rng = np.random.default_rng(11)
    n, b = 2048, 256
    h = n // 2
    rplan = pf.new_setup(n, pf.REAL)
    zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    if blocked:
        from pffft_tpu.ops import split as _s

        twr, twi = _s._split_real_tw(rplan.real_twiddle)
        call = pk._build_real_split_blocked(
            h, h // 4, 128, backward, True,
            np.ascontiguousarray(twr, np.float32).tobytes(),
            np.ascontiguousarray(twi, np.float32).tobytes())
        kr, ki = call(zr, zi)
    else:
        kr, ki = pk.real_split_tmajor_pallas(
            zr, zi, rplan.real_twiddle, backward=backward, tb=128,
            interpret=True)
    flat = (
        sp.real_backward_split_planar_tmajor_flat
        if backward
        else sp.real_forward_split_planar_tmajor_flat
    )
    fr, fi = flat(zr, zi, rplan.real_twiddle)
    scale = float(jnp.abs(fr).max())
    assert float(jnp.abs(kr - fr).max()) < 1e-5 * scale
    assert float(jnp.abs(ki - fi).max()) < 1e-5 * scale


def test_real_measured_table_overrides_complex_row():
    """A real-plan row in _MEASURED_TABLE_REAL wins over the complex row
    at the same engine length; complex plans never see it."""

    import jax

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp

    h = 256
    rplan = pf.new_setup(2 * h, pf.REAL)
    cplan = pf.new_setup(h, pf.COMPLEX)
    backend = jax.default_backend()
    assert "pallas" in dp.available_engines(cplan, 1024, True)
    dp.record_engine(backend, h, "pallas", time_major=True)
    dp.record_engine_real(backend, h, "xla", time_major=True)
    try:
        assert dp.select_engine(cplan, 1024, True) == "pallas"
        assert dp.select_engine(rplan, 1024, True) == "xla"
    finally:
        del dp._MEASURED_TABLE[(backend, h, True)]
        del dp._MEASURED_TABLE_REAL[(backend, h, True)]
        dp._TABLE_VERSION += 1


@pytest.mark.parametrize("n,conf", [(1024, (128, 8)), (640, (128, 5))])
def test_packed_kern2_matches_pack_plus_kern2(n, conf):
    """The packed [H, 2B] kern2 entry (pass-A slab index maps) == the
    planar pack followed by the two-pass engine, bit for bit."""

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp

    rng = np.random.default_rng(5)
    b = 256
    plan = pf.new_setup(n, pf.COMPLEX, strict=False)
    x = jnp.asarray(rng.standard_normal((2 * n, b)).astype(np.float32))
    zr, zi = sp.pack_real_input_split_tmajor(x)
    ar, ai = dp.cfft_kern2_tmajor_packed(
        plan, x.reshape(n, 2 * b), conf=conf, interpret=True)
    br, bi = dp.cfft_kern2_tmajor(plan, zr, zi, conf=conf, interpret=True)
    assert float(jnp.abs(ar - br).max()) == 0.0
    assert float(jnp.abs(ai - bi).max()) == 0.0
