"""One-pass Pallas real split-step kernel (ops/real_kernel.py) vs the jnp
composition — interpret mode on CPU, the SIMD-self-validation pattern
(SURVEY §4.5).  The kernel is the TPU analog of the reference's fused
REAL_FINALIZE / REAL_PREPROCESS (pffft_priv_impl.h:1273-1462)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu import fft as pff
from pffft_tpu.ops import real_kernel as rk
from pffft_tpu.ops import split as sp


@pytest.mark.parametrize("n,b", [(1 << 15, 4), (1 << 16, 6), (3 * (1 << 14), 2)])
def test_split_kernel_matches_jnp_composition(n, b):
    rng = np.random.default_rng(n)
    h = n // 2
    plan = pf.new_setup(n, pf.REAL)
    tw = plan.real_twiddle
    zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    for backward in (False, True):
        if backward:
            r1, i1 = sp.real_backward_split_planar(zr, zi, tw)
        else:
            r1, i1 = sp.real_forward_split_planar(zr, zi, tw)
        r2, i2 = rk.real_split_pallas(zr, zi, tw, backward=backward)
        scale = float(jnp.abs(r1).max())
        err = max(float(jnp.abs(r1 - r2).max()), float(jnp.abs(i1 - i2).max()))
        assert err <= 2e-6 * max(1.0, scale), (backward, err)


def test_flat_split_forms_match_classic():
    """The flat-FMA split forms (the shipped TPU route after Mosaic's
    missing `rev` blocked the one-pass kernel) == the classic e/o
    composition, both layouts and directions."""

    rng = np.random.default_rng(3)
    n = 1 << 12
    h = n // 2
    plan = pf.new_setup(n, pf.REAL)
    tw = plan.real_twiddle
    zr = jnp.asarray(rng.standard_normal((3, h)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((3, h)).astype(np.float32))
    for cls, flat in (
        (sp.real_forward_split_planar, sp.real_forward_split_planar_flat),
        (sp.real_backward_split_planar, sp.real_backward_split_planar_flat),
    ):
        r1, i1 = cls(zr, zi, tw)
        r2, i2 = flat(zr, zi, tw)
        e = max(float(jnp.abs(r1 - r2).max()), float(jnp.abs(i1 - i2).max()))
        assert e < 2e-5 * max(1.0, float(jnp.abs(r1).max()))
    trt, tit = zr.T.copy(), zi.T.copy()
    for cls, flat in (
        (sp.real_forward_split_planar_tmajor,
         sp.real_forward_split_planar_tmajor_flat),
        (sp.real_backward_split_planar_tmajor,
         sp.real_backward_split_planar_tmajor_flat),
    ):
        r1, i1 = cls(trt, tit, tw)
        r2, i2 = flat(trt, tit, tw)
        e = max(float(jnp.abs(r1 - r2).max()), float(jnp.abs(i1 - i2).max()))
        assert e < 2e-5 * max(1.0, float(jnp.abs(r1).max()))


def test_routed_real_transform_with_flat_split(monkeypatch):
    """Force the fft.py route through the flat split step (the TPU
    route): the full real forward/backward must still match numpy and
    round-trip."""

    monkeypatch.setattr(pff, "_use_flat_split", lambda p: True)
    n, b = 1 << 15, 4
    plan = pf.new_setup(n, pf.REAL)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((b, n)).astype(np.float32)
    sr, si = pf.fft.transform_ordered_split(plan, jnp.asarray(x), pf.FORWARD)
    ref = np.fft.rfft(x[0].astype(np.float64))
    got = np.asarray(sr[0]).astype(np.float64) + 1j * np.asarray(si[0])
    # packed bin0: DC + i*Nyq
    assert abs(got[0].real - ref[0].real) < 1e-2
    assert abs(got[0].imag - ref[-1].real) < 1e-2
    scale = np.abs(ref).max()
    assert np.abs(got[1:] - ref[1:-1]).max() < 1e-5 * scale
    back = pf.fft.transform_ordered_split(plan, (sr, si), pf.BACKWARD)
    assert np.abs(np.asarray(back) / n - x).max() < 1e-5


def test_pick_blocks_policy():
    assert rk.pick_blocks(4, 1 << 13) is None       # small H: jnp path
    bt, hb = rk.pick_blocks(4, 1 << 19)
    assert (1 << 19) % hb == 0 and bt * hb <= (1 << 18)
    bt, hb = rk.pick_blocks(128, 1 << 15)
    assert 128 % bt == 0 and bt * hb <= (1 << 18)
    assert rk.pick_blocks(7, 1 << 15)[0] == 1       # odd batch: bt=1


def test_folded_real_chain_matches_composed(monkeypatch):
    """The fold (de-interleave into stage 1, interleave into the last
    backward stage) must reproduce the composed pack->engine->split path
    exactly through the public API (forced on: the fold is the TPU
    route, real_anatomy2/3_r4)."""

    import pffft_tpu.ops.dispatch as dp

    rng = np.random.default_rng(7)
    for n in (256, 1 << 14):
        plan = pf.new_setup(n, pf.REAL)
        x = rng.standard_normal((4, n)).astype(np.float32)
        sr0, si0 = pf.fft.transform_ordered_split(plan, jnp.asarray(x))
        monkeypatch.setattr(pff, "_use_flat_split", lambda p: True)
        monkeypatch.setattr(
            pff, "_use_fold",
            lambda p, b: p.local_split is None
            and dp.select_engine(p, b, False) == "xla",
        )
        sr1, si1 = pf.fft.transform_ordered_split(
            plan, jnp.asarray(x), pf.FORWARD
        )
        scale = float(jnp.abs(sr0).max())
        assert float(jnp.abs(sr1 - sr0).max()) < 3e-6 * scale
        assert float(jnp.abs(si1 - si0).max()) < 3e-6 * scale
        back = pf.fft.transform_ordered_split(plan, (sr1, si1), pf.BACKWARD)
        assert np.abs(np.asarray(back) / n - x).max() < 1e-5
        monkeypatch.undo()
