"""Measured plan selection (the FFTW-measure analog, pffft_tpu.tune)."""

import numpy as np
import pytest

import pffft_tpu as pf
from pffft_tpu import tune


def test_candidates_distinct_shapes():
    cands = tune.candidate_max_factors(1024, pf.COMPLEX)
    assert len(cands) >= 1
    shapes = set()
    for mf in cands:
        p = pf.new_setup(1024, pf.COMPLEX, max_factor=mf)
        shapes.add((p.factors, p.local_split is None))
    assert len(shapes) == len(cands)  # deduped by produced shape


def test_tuned_setup_returns_valid_plan_and_caches(tmp_path, monkeypatch):
    tune.clear_tune_cache()
    monkeypatch.setenv("PFFFT_TPU_TUNE_CACHE", str(tmp_path / "tune.json"))
    plan = tune.tuned_setup(512, pf.COMPLEX, batch=8, iters=3)
    assert plan.n == 512 and plan.kind == pf.COMPLEX
    import jax.numpy as jnp

    x = (np.random.default_rng(0).standard_normal(512)
         + 1j * np.random.default_rng(1).standard_normal(512)).astype(np.complex64)
    y = np.asarray(pf.transform_ordered(plan, jnp.asarray(x)))
    ref = np.fft.fft(x.astype(np.complex128))
    assert np.abs(y - ref).max() < 1e-3 * np.abs(ref).max()
    # second call hits the in-process cache (no re-measurement): instant
    import time as _t

    t0 = _t.perf_counter()
    plan2 = tune.tuned_setup(512, pf.COMPLEX)
    assert _t.perf_counter() - t0 < 0.5
    assert plan2.factors == plan.factors
    # disk cache round-trip
    tune.clear_tune_cache()
    plan3 = tune.tuned_setup(512, pf.COMPLEX)
    assert plan3.factors == plan.factors


def test_tuned_setup_real_kind():
    tune.clear_tune_cache()
    plan = tune.tuned_setup(1024, pf.REAL, batch=8, iters=3)
    assert plan.kind == pf.REAL and plan.n == 1024
