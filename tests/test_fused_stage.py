"""Fused two-stage MXU kernel vs the XLA stage engine (interpret mode).

The SIMD-self-validation analog (SURVEY.md §4.5): the hand kernel must
reproduce the reference engine bit-closely on every layout/direction
combination, including non-square factor pairs.
"""

import numpy as np
import pytest


def _mk(n, max_factor):
    import pffft_tpu as pf

    return pf.new_setup(n, pf.COMPLEX, max_factor=max_factor)


@pytest.mark.parametrize("n,mf", [(1024, 32), (2048, 64), (4096, 64), (1536, 48)])
@pytest.mark.parametrize("ordered", [True, False])
@pytest.mark.parametrize("backward", [False, True])
@pytest.mark.parametrize("cmul", ["concat", "gauss"])
def test_fused2_matches_engine(n, mf, ordered, backward, cmul):
    import jax.numpy as jnp

    from pffft_tpu.ops import fused_stage as fs
    from pffft_tpu.ops import split as sp

    plan = _mk(n, mf)
    if not fs.supported(plan):
        pytest.skip(f"plan {plan.factors} not two-fat-stage")
    rng = np.random.default_rng(n)
    b = 8
    re = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    kr, ki = fs.cfft_fused2(
        plan, re, im, backward=backward, ordered=ordered, tb=8, interpret=True,
        cmul=cmul,
    )
    sp.set_cmul_mode("gauss")  # match the kernel's arithmetic
    try:
        er, ei = sp.cfft_plan_split(plan, re, im, backward=backward, ordered=ordered)
    finally:
        sp.set_cmul_mode(None)
    scale = float(np.abs(np.asarray(er)).max())
    np.testing.assert_allclose(np.asarray(kr), np.asarray(er), atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(ki), np.asarray(ei), atol=2e-5 * scale, rtol=0)


def test_fused2_roundtrip_and_numpy():
    import jax.numpy as jnp

    from pffft_tpu.ops import fused_stage as fs

    n = 4096
    plan = _mk(n, 64)
    rng = np.random.default_rng(7)
    re = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    fr, fi = fs.cfft_fused2(plan, re, im, tb=8, interpret=True)
    ref = np.fft.fft(np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64))
    got = np.asarray(fr) + 1j * np.asarray(fi)
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    br, bi = fs.cfft_fused2(plan, fr, fi, backward=True, tb=8, interpret=True)
    assert np.abs(np.asarray(br) / n - np.asarray(re)).max() < 1e-4
    assert np.abs(np.asarray(bi) / n - np.asarray(im)).max() < 1e-4


def test_fused2_rejects_bad_shapes():
    import jax.numpy as jnp
    import pffft_tpu as pf

    from pffft_tpu.ops import fused_stage as fs

    plan = _mk(4096, 64)
    re = jnp.zeros((6, 4096), np.float32)
    with pytest.raises(ValueError):
        fs.cfft_fused2(plan, re, re, tb=4, interpret=True)  # 6 % 4 != 0
    p3 = pf.new_setup(1 << 15, pf.COMPLEX, max_factor=32)  # 3 stages or split
    assert not fs.supported(p3) or p3.local_split is not None
