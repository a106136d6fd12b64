"""Carrier-injection accuracy tests (port of /root/reference/tests/test_pffft.c).

For each N and each carrier bin k (stepping N/16), inject a pure cosine /
complex carrier of amplitude {1.0, 1.1} and known phase, transform, and
assert the reference's bounds (test_pffft.c:52-67,239):

  * spectral dynamic range >= 140 dB (fp32) / 215 dB (fp64)
  * phase error < 1e-4 degrees
  * magnitude error < 1e-6
  * roundtrip ifft(fft(x))/N mean-square error <= 1e-7 * N

All carrier bins for one N are batched into a single transform call
(batching is the TPU-native execution model).
"""

import numpy as np
import pytest
import jax.numpy as jnp

import pffft_tpu as pf

# every pow2 32..65536, matching the reference's sweep (test_pffft.c:333-353)
# — 512/2048/8192/32768 sit exactly at fat-stage factor-shape transitions
# and were skipped in round 1 (VERDICT.md weak #6)
POW2_SIZES = [1 << k for k in range(5, 17)]
NONPOW2_SIZES = [96, 160, 480, 2400, 9216]

DYN_RANGE_DB = {"float32": 140.0, "float64": 215.0}
DEG_ERR_LIMIT = 1e-4
MAG_ERR_LIMIT = 1e-6


def _carrier_batch(n, cplx, dtype):
    """Build the test_pffft.c carrier sweep as a batch: returns
    (X [nbins, n], ks, amps, phi0s)."""

    ks = list(range(0, (n if cplx else n // 2 + 1), max(1, n // 16)))
    xs, amps, phis = [], [], []
    for m, k in enumerate(ks):
        amp = 1.0 if (m % 3) == 0 else 1.1
        phi0 = (m % 4) * 0.125 * np.pi
        freq = (k if k < n / 2 else k - n) / n
        phi = phi0 + 2.0 * np.pi * freq * np.arange(n, dtype=np.float64)
        if cplx:
            xs.append(amp * np.exp(1j * phi))
        else:
            xs.append(amp * np.cos(phi))
        amps.append(amp)
        phis.append(phi0)
    x = np.stack(xs)
    x = x.astype(np.complex64 if dtype == "float32" else np.complex128) if cplx else x.astype(dtype)
    return x, np.array(ks), np.array(amps), np.array(phis)


def _bin_powers(y, n, cplx):
    """Per-row bin power array following the reference's indexing
    (test_pffft.c:167-183): real spectra are packed, bin0 = DC + i*Nyq."""

    if cplx:
        return np.abs(y) ** 2
    nb = n // 2 + 1
    p = np.empty(y.shape[:-1] + (nb,))
    p[..., 0] = np.real(y[..., 0]) ** 2
    p[..., nb - 1] = np.imag(y[..., 0]) ** 2
    p[..., 1 : nb - 1] = np.abs(y[..., 1:]) ** 2
    return p


def _run_case(n, cplx, ordered, dtype, dyn_bound=None):
    kind = pf.COMPLEX if cplx else pf.REAL
    plan = pf.new_setup(n, kind, dtype=dtype)
    x, ks, amps, phi0s = _carrier_batch(n, cplx, dtype)
    xj = jnp.asarray(x)

    if ordered:
        y = pf.transform_ordered(plan, xj, pf.FORWARD)
        z = pf.transform_ordered(plan, y, pf.BACKWARD)
        y_ord = np.asarray(y)
    else:
        r = pf.transform(plan, xj, pf.FORWARD)
        y_ord = np.asarray(pf.zreorder(plan, r, pf.FORWARD))
        z = pf.transform(plan, r, pf.BACKWARD)
    z = np.asarray(z)

    pwr = _bin_powers(y_ord, n, cplx)
    if dyn_bound is None:
        dyn_bound = DYN_RANGE_DB[dtype]

    for row, k in enumerate(ks):
        amp, phi0 = amps[row], phi0s[row]
        p = pwr[row].copy()
        pwr_car = p[k]
        p[k] = 0.0
        pwr_other = max(p.max(), 1e-300)
        dyn = 10.0 * np.log10(pwr_car / pwr_other)
        assert dyn >= dyn_bound, (
            f"N={n} cplx={cplx} ordered={ordered} {dtype} bin {k}: "
            f"dynamic range {dyn:.1f} dB < {dyn_bound} dB"
        )

        if k > 0 and k != n // 2:
            ybin = y_ord[row, k]
            phase = np.arctan2(np.imag(ybin), np.real(ybin))
            assert abs(phase - phi0) <= DEG_ERR_LIMIT * np.pi / 180.0, (
                f"N={n} bin {k}: phase {np.degrees(phase):.6f} deg != {np.degrees(phi0):.6f}"
            )

        expected_mag = amp if cplx else (amp if (k == 0 or k == n // 2) else amp / 2)
        mag = np.sqrt(pwr_car) / n
        assert abs(mag - expected_mag) <= MAG_ERR_LIMIT, (
            f"N={n} bin {k}: mag {mag} != {expected_mag}"
        )

    # roundtrip: backward(forward(x))/N == x, MSE bound (test_pffft.c:239)
    err = (np.asarray(x).view(np.float64 if dtype == "float64" else np.float32).astype(np.float64)
           if cplx else x.astype(np.float64))
    zz = (z.view(np.float64 if dtype == "float64" else np.float32).astype(np.float64)
          if cplx else z.astype(np.float64))
    err_sum = np.sum((err - zz / n) ** 2, axis=-1)
    assert np.all(err_sum <= n * 1e-7), f"N={n}: roundtrip errSum {err_sum.max()} > {n*1e-7}"


@pytest.mark.parametrize("n", POW2_SIZES)
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
@pytest.mark.parametrize("ordered", [True, False], ids=["ordered", "unordered"])
def test_carrier_pow2_f32(n, cplx, ordered):
    _run_case(n, cplx, ordered, "float32")


@pytest.mark.parametrize("n", NONPOW2_SIZES)
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_carrier_nonpow2_f32(n, cplx):
    _run_case(n, cplx, True, "float32")


@pytest.mark.parametrize("n", [32, 256, 4096, 65536])
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_carrier_f64(n, cplx):
    _run_case(n, cplx, True, "float64")


@pytest.mark.slow
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_carrier_2pow20_f64(cplx):
    """N = 2^20 carrier accuracy (the local-split / long-transform policy
    regime; round 1 tested nothing above 65536 although plans accept
    2^26).  fp64 so the bound is meaningful under every stage policy.
    The reference's 215 dB bound applies to N <= 65536; fp64 rounding
    decays ~2-3 dB per size doubling beyond that (measured 206.3 dB at
    2^20), so this beyond-reference size pins a 200 dB regression floor."""

    _run_case(1 << 20, cplx, True, "float64", dyn_bound=200.0)


@pytest.mark.parametrize("n", [480, 1024])
@pytest.mark.parametrize("cplx", [False, True], ids=["real", "cplx"])
def test_batch_shapes(n, cplx):
    """Leading batch dims are preserved and broadcast correctly."""

    kind = pf.COMPLEX if cplx else pf.REAL
    plan = pf.new_setup(n, kind)
    rng = np.random.default_rng(42)
    shape = (2, 3, n)
    x = rng.standard_normal(shape).astype(np.float32)
    if cplx:
        x = (x + 1j * rng.standard_normal(shape).astype(np.float32)).astype(np.complex64)
    y = pf.transform_ordered(plan, jnp.asarray(x))
    assert y.shape == (2, 3, plan.spectrum_size)
    # batch consistency: same as transforming each row (up to f32 rounding;
    # XLA may pick different reduction orders for different batch shapes)
    y0 = pf.transform_ordered(plan, jnp.asarray(x[0, 0]))
    tol = 1e-5 * float(np.max(np.abs(np.asarray(y0))))
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(y0), rtol=0, atol=tol)


def test_local_fourstep_split_path():
    """The local four-step split (fat-stage policy, large N) must match the
    stage-chain engine and numpy, both directions and both layouts."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    n = 65536  # > 128^2 triggers local_split at max_factor=128
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=128)
    assert plan.local_split is not None and plan.factors == (256, 256)
    r = np.random.default_rng(0)
    re = jnp.asarray(r.standard_normal(n).astype(np.float32))
    im = jnp.asarray(r.standard_normal(n).astype(np.float32))
    fr, fi = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
    ref = np.fft.fft(np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()
    # internal layout + zreorder contract
    ir_, ii_ = sp.cfft_plan_split(plan, re, im, backward=False, ordered=False)
    from pffft_tpu.ops import stages as st
    rr = st.reorder_spectrum(ir_, plan.factors, to_canonical=True)
    assert np.abs(np.asarray(rr) - np.asarray(fr)).max() < 2e-2
    # unscaled roundtrip
    br, bi = sp.cfft_plan_split(plan, fr, fi, backward=True, ordered=True)
    assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-3
    assert np.abs(np.asarray(bi) / n - np.asarray(im)).max() < 1e-3


def test_local_fourstep_real_transform():
    import jax.numpy as jnp
    import pffft_tpu as pf

    n = 1 << 16
    plan = pf.new_setup(n, pf.REAL, max_factor=128)
    assert plan.local_split is not None
    r = np.random.default_rng(1)
    x = r.standard_normal(n).astype(np.float32)
    sr, si = pf.transform_ordered_split(plan, jnp.asarray(x))
    ref = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(sr) + 1j * np.asarray(si)
    packed = ref[:-1].copy()
    packed[0] = ref[0].real + 1j * ref[-1].real
    assert np.abs(got - packed).max() < 1e-3 * np.abs(ref).max()
    back = pf.transform_ordered_split(plan, (sr, si), pf.BACKWARD)
    assert np.abs(np.asarray(back) / n - x).max() < 1e-3


def test_local_fourstep_internal_roundtrip():
    """Internal-layout forward -> internal backward through the four-step
    must be the unscaled identity (the zconvolve-path layout contract)."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    n = 65536
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=128)
    assert plan.local_split is not None
    r = np.random.default_rng(2)
    re = jnp.asarray(r.standard_normal(n).astype(np.float32))
    im = jnp.asarray(r.standard_normal(n).astype(np.float32))
    ur, ui = sp.cfft_plan_split(plan, re, im, backward=False, ordered=False)
    br, bi = sp.cfft_plan_split(plan, ur, ui, backward=True, ordered=False)
    assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-3
    assert np.abs(np.asarray(bi) / n - np.asarray(im)).max() < 1e-3


def test_gauss_cmul_matches_4mul():
    """Gauss 3-matmul contraction (the TPU default) vs the 4-matmul form:
    same transform up to ~1 extra bit of rounding, on stage chains, fat
    stages and the local four-step."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    r = np.random.default_rng(3)
    try:
        for n, mf in [(1024, 5), (4096, 64), (65536, 128)]:
            plan = pf.new_setup(n, pf.COMPLEX, max_factor=mf)
            re = jnp.asarray(r.standard_normal(n).astype(np.float32))
            im = jnp.asarray(r.standard_normal(n).astype(np.float32))
            sp.set_cmul_mode("4mul")
            r4r, r4i = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            sp.set_cmul_mode("gauss")
            rgr, rgi = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            scale = float(np.abs(np.asarray(r4r)).max())
            assert np.abs(np.asarray(rgr) - np.asarray(r4r)).max() < 2e-5 * scale
            assert np.abs(np.asarray(rgi) - np.asarray(r4i)).max() < 2e-5 * scale
            # gauss vs fp64 numpy: still well inside the oracle tolerance
            ref = np.fft.fft(
                np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
            )
            got = np.asarray(rgr) + 1j * np.asarray(rgi)
            assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
    finally:
        sp.set_cmul_mode(None)


def test_concat_cmul_matches_4mul():
    """Lane-concat contraction ([ar|ai] @ [[Wr,Wi],[-Wi,Wr]], the TPU
    default for stages with r <= 64) vs the 4-matmul form: same
    accumulation class, so agreement to a few ulps; auto mode mixes
    concat (r <= 64) and gauss (r >= 128) per stage."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    r = np.random.default_rng(5)
    try:
        for n, factors in [(1024, (64, 16)), (4096, (64, 64)),
                           (65536, (64, 64, 16)), (960, (8, 8, 15)),
                           (65536, (256, 64, 4))]:
            plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
            re = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            im = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            sp.set_cmul_mode("4mul")
            r4r, r4i = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            scale = float(np.abs(np.asarray(r4r)).max())
            ref = np.fft.fft(
                np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
            )
            for mode in ("concat", "auto"):
                sp.set_cmul_mode(mode)
                rcr, rci = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
                assert np.abs(np.asarray(rcr) - np.asarray(r4r)).max() < 2e-5 * scale
                assert np.abs(np.asarray(rci) - np.asarray(r4i)).max() < 2e-5 * scale
                got = np.asarray(rcr) + 1j * np.asarray(rci)
                assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
                # roundtrip through the same mode
                br, bi = sp.cfft_plan_split(plan, rcr, rci, backward=True, ordered=True)
                assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-5 * scale
    finally:
        sp.set_cmul_mode(None)


def test_spec2_chain_matches_classic():
    """The transpose-free ordered 2-stage formulation (spec2, the default)
    vs the classic Stockham loop: same transform to a few ulps, both
    directions, all cmul modes."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    r = np.random.default_rng(13)
    try:
        for n, factors in [(1024, (32, 32)), (4096, (64, 64)), (960, (48, 20))]:
            plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
            re = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            im = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            for mode in (None, "concat", "gauss"):
                sp.set_cmul_mode(mode)
                sp.set_spec2(False)
                cr, ci = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
                sp.set_spec2(True)
                nr, ni = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
                scale = float(np.abs(np.asarray(cr)).max())
                assert np.abs(np.asarray(nr) - np.asarray(cr)).max() < 2e-5 * scale
                assert np.abs(np.asarray(ni) - np.asarray(ci)).max() < 2e-5 * scale
                br, bi = sp.cfft_plan_split(plan, nr, ni, backward=True, ordered=True)
                assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-5 * scale
    finally:
        sp.set_cmul_mode(None)
        sp.set_spec2(True)


def test_cstack_engine_matches_4mul():
    """Stacked-channel chain engine (cmul mode 'cstack'): one einsum per
    middle stage contracting (channel, r); first/last stages consume/emit
    the separate planes.  Same accumulation class as 4mul/concat."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    r = np.random.default_rng(9)
    try:
        for n, factors in [(1024, (32, 32)), (4096, (64, 64)),
                           (960, (8, 8, 15)), (65536, (128, 128, 4))]:
            plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
            re = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            im = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
            sp.set_cmul_mode("4mul")
            r4r, r4i = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            scale = float(np.abs(np.asarray(r4r)).max())
            sp.set_cmul_mode("cstack")
            rcr, rci = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            assert np.abs(np.asarray(rcr) - np.asarray(r4r)).max() < 2e-5 * scale
            assert np.abs(np.asarray(rci) - np.asarray(r4i)).max() < 2e-5 * scale
            ref = np.fft.fft(
                np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64)
            )
            got = np.asarray(rcr) + 1j * np.asarray(rci)
            assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max()
            br, bi = sp.cfft_plan_split(plan, rcr, rci, backward=True, ordered=True)
            assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-5 * scale
            # unordered layout contract identical to the pair engine
            ur, ui = sp.cfft_plan_split(plan, re, im, backward=False, ordered=False)
            sp.set_cmul_mode("4mul")
            vr, vi = sp.cfft_plan_split(plan, re, im, backward=False, ordered=False)
            assert np.abs(np.asarray(ur) - np.asarray(vr)).max() < 2e-5 * scale
    finally:
        sp.set_cmul_mode(None)


def test_split_twiddle_tables_match_dense():
    """Forcing the split twiddle factorization (T = A*B, used for large-N
    tables that would otherwise be giant jit constants) must reproduce the
    dense-table transform to ~1 ulp, on chains and the four-step, both
    directions."""

    import jax.numpy as jnp
    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    r = np.random.default_rng(5)
    orig_min = sp._TW_SPLIT_MIN
    try:
        for n, mf in [(65536, 128), (65536, 256), (1 << 18, 128)]:
            re = jnp.asarray(r.standard_normal(n).astype(np.float32))
            im = jnp.asarray(r.standard_normal(n).astype(np.float32))
            plan = pf.new_setup(n, pf.COMPLEX, max_factor=mf)

            sp._TW_SPLIT_MIN = orig_min
            sp._stage_consts.cache_clear()
            sp._fourstep_tw_consts.cache_clear()
            dr, di_ = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)

            sp._TW_SPLIT_MIN = 1 << 12  # force the split form everywhere
            sp._stage_consts.cache_clear()
            sp._fourstep_tw_consts.cache_clear()
            xr, xi = sp.cfft_plan_split(plan, re, im, backward=False, ordered=True)
            scale = float(np.abs(np.asarray(dr)).max())
            assert np.abs(np.asarray(xr) - np.asarray(dr)).max() < 3e-6 * scale
            assert np.abs(np.asarray(xi) - np.asarray(di_)).max() < 3e-6 * scale
            br, bi = sp.cfft_plan_split(plan, xr, xi, backward=True, ordered=True)
            assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 2e-3
    finally:
        sp._TW_SPLIT_MIN = orig_min
        sp._stage_consts.cache_clear()
        sp._fourstep_tw_consts.cache_clear()


def test_inplace_donated_matches_fresh():
    """In-place (donated-buffer) == out-of-place, the reference bench's
    own assertion (/root/reference/benchmarks/bench_pffft.c:340-360)."""

    import jax.numpy as jnp

    import pffft_tpu as pf

    n = 1024
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = np.random.default_rng(7)
    re_np = rng.standard_normal((4, n)).astype(np.float32)
    im_np = rng.standard_normal((4, n)).astype(np.float32)
    fresh = pf.transform_ordered_split(plan, (jnp.asarray(re_np), jnp.asarray(im_np)))
    fr, fi = np.asarray(fresh[0]), np.asarray(fresh[1])
    # donated call: pass freshly-created device buffers (they are consumed)
    don = pf.transform_ordered_split_inplace(
        plan, (jnp.asarray(re_np), jnp.asarray(im_np))
    )
    assert np.array_equal(fr, np.asarray(don[0]))
    assert np.array_equal(fi, np.asarray(don[1]))
    # internal-layout variant too
    fresh_u = pf.transform_split(plan, (jnp.asarray(re_np), jnp.asarray(im_np)))
    don_u = pf.transform_split_inplace(plan, (jnp.asarray(re_np), jnp.asarray(im_np)))
    assert np.array_equal(np.asarray(fresh_u[0]), np.asarray(don_u[0]))
    assert np.array_equal(np.asarray(fresh_u[1]), np.asarray(don_u[1]))


def test_tmajor_engine_matches_batch_major():
    """Time-major [N, B] engine == batch-major [B, N] engine (all layouts)."""

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp

    rng = np.random.default_rng(3)
    for n, factors in [(512, (32, 16)), (1024, (16, 8, 8)), (240, (15, 16))]:
        plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
        b = 8
        re = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        for backward in (False, True):
            for ordered in (False, True):
                ar, ai = sp.cfft_stages_split(
                    re, im, plan.stages, backward=backward, ordered=ordered
                )
                tr, ti = sp.cfft_stages_split_tmajor(
                    re.T, im.T, plan.stages, backward=backward, ordered=ordered
                )
                assert np.allclose(np.asarray(ar), np.asarray(tr).T, atol=1e-3), (
                    n, factors, backward, ordered)
                assert np.allclose(np.asarray(ai), np.asarray(ti).T, atol=1e-3)
