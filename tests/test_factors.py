"""Size-validity contract tests.

Mirrors /root/reference/tests/test_fft_factors.c:18-66: for a sweep of N,
``is_valid_size(N) <=> plan creation succeeds``, and
``nearest_transform_size`` works in both directions.  Plus helper parity
(next_power_of_two / is_power_of_two, pffft_common.c:25-40) and
factorization invariants of the TPU plan policy.
"""

import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu.plan import decompose_smooth, plan_factors


@pytest.mark.parametrize("kind", [pf.REAL, pf.COMPLEX])
def test_validity_matches_setup(kind):
    m = pf.min_fft_size(kind)
    step = max(1, m // 2)
    for n in range(step, 12 * m + 1, step):
        valid = pf.is_valid_size(n, kind)
        ok = True
        try:
            pf.new_setup(n, kind)
        except ValueError:
            ok = False
        assert ok == valid, f"N={n} kind={kind}: is_valid_size={valid} but setup={'ok' if ok else 'fail'}"


@pytest.mark.parametrize("kind", [pf.REAL, pf.COMPLEX])
def test_valid_sizes_examples(kind):
    m = pf.min_fft_size(kind)
    # multiples of min with 2/3/5-smooth cofactor are valid
    for c in [1, 2, 3, 4, 5, 6, 8, 9, 10, 12, 15, 16, 20, 25, 27]:
        assert pf.is_valid_size(m * c, kind)
    # non-smooth cofactors are not
    for c in [7, 11, 13, 14, 21, 22]:
        assert not pf.is_valid_size(m * c, kind)
    # not multiples of min size
    assert not pf.is_valid_size(m + 1, kind)
    assert not pf.is_valid_size(m // 2, kind)
    # overflow guard (pffft_priv_impl.h:1069)
    assert not pf.is_valid_size(1 << 27, kind)


@pytest.mark.parametrize("kind", [pf.REAL, pf.COMPLEX])
def test_nearest_transform_size(kind):
    m = pf.min_fft_size(kind)
    for n in [1, m - 1, m, m + 1, 1000, 10000, 12345]:
        hi = pf.nearest_transform_size(n, kind, True)
        lo = pf.nearest_transform_size(n, kind, False)
        assert pf.is_valid_size(hi, kind) and hi >= min(n, hi)
        assert pf.is_valid_size(lo, kind)
        if n >= m:
            assert lo <= n <= hi
        else:
            assert hi == m and lo == m
        # nearest of a valid size is itself
        assert pf.nearest_transform_size(hi, kind, True) == hi
        assert pf.nearest_transform_size(hi, kind, False) == hi


def test_power_of_two_helpers():
    for n, expect in [(1, 1), (2, 2), (3, 4), (5, 8), (17, 32), (1023, 1024), (1024, 1024)]:
        assert pf.next_power_of_two(n) == expect
    assert pf.is_power_of_two(64)
    assert not pf.is_power_of_two(96)
    assert not pf.is_power_of_two(0)


def test_decompose_smooth():
    assert decompose_smooth(2400) == (2, 2, 2, 2, 2, 3, 5, 5)
    assert decompose_smooth(1) == ()
    with pytest.raises(ValueError):
        decompose_smooth(14)


def test_plan_factors_product_and_cap():
    for n in [16, 32, 48, 480, 1024, 2400, 9216, 65536, 1 << 20]:
        for cap in [5, 8, 64, 128]:
            fs = plan_factors(n, max_factor=cap)
            assert int(np.prod(fs)) == n
            assert all(f <= cap for f in fs)


def test_plan_repr_and_metadata():
    p = pf.new_setup(1024, pf.REAL)
    assert p.n == 1024 and p.is_real and p.engine_n == 512
    assert p.spectrum_size == 512
    assert pf.simd_size() == 4
    assert "tpu" in pf.simd_arch()


def test_plan_cache_identity():
    a = pf.new_setup(1024, pf.COMPLEX)
    b = pf.new_setup(1024, pf.COMPLEX)
    assert a is b  # read-only, shared (pffft.h:102-106 shareability analog)


def test_plan_serialization_roundtrip(tmp_path):
    """save_plan/load_plan restore every table bit-exactly (the checkpoint
    analog, SURVEY.md §5.4) and the restored plan transforms identically."""

    import io

    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.plan import load_plan, save_plan

    for n, kind, mf in [(4096, pf.COMPLEX, 64), (8192, pf.REAL, 5), (65536, pf.COMPLEX, 128)]:
        plan = pf.new_setup(n, kind, max_factor=mf)
        buf = io.BytesIO()
        save_plan(plan, buf)
        buf.seek(0)
        back = load_plan(buf)
        assert back.n == plan.n and back.kind == plan.kind
        assert back.factors == plan.factors
        assert len(back.stages) == len(plan.stages)
        for a, b in zip(plan.stages, back.stages):
            assert (a.r, a.l, a.m) == (b.r, b.l, b.m)
            np.testing.assert_array_equal(a.dft, b.dft)
            np.testing.assert_array_equal(a.twiddle, b.twiddle)
        if plan.real_twiddle is not None:
            np.testing.assert_array_equal(plan.real_twiddle, back.real_twiddle)
        assert (plan.local_split is None) == (back.local_split is None)
        rng = np.random.default_rng(n)
        if kind == pf.COMPLEX:
            x = jnp.asarray((rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64))
        else:
            x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ya = np.asarray(pf.transform_ordered(plan, x))
        yb = np.asarray(pf.transform_ordered(back, x))
        np.testing.assert_array_equal(ya, yb)

    # file-path form
    plan = pf.new_setup(1024, pf.COMPLEX)
    path = tmp_path / "plan.npz"
    save_plan(plan, str(path))
    assert load_plan(str(path)).factors == plan.factors
