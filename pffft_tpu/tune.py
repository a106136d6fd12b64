"""Measured plan selection — the FFTW-measure-mode analog.

The reference's benchmark treats FFTW's ESTIMATE vs MEASURE planning as
two distinct competitors (/root/reference/benchmarks/bench_pffft.c:128-151
"FFTW (estim)" / "FFTW (auto)"); this framework's equivalent axis is the
stage policy (``max_factor`` — how fat the MXU contraction stages are,
chain vs four-step).  :func:`tuned_setup` times a handful of candidate
policies on the *current backend* with the deferred-execution-safe
discipline of benchmarks/timing.py (device-chained iterations, forced
fetch, two-point slope) and returns the fastest plan, caching the winner
per (backend, n, kind, dtype) — in-process and optionally on disk
(PFFFT_TPU_TUNE_CACHE=path).

``new_setup`` (the default, policy-table-driven) is the ESTIMATE analog;
``tuned_setup`` is MEASURE.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence, Tuple

import numpy as np

from . import fft as _fft
from . import plan as _plan

__all__ = ["tuned_setup", "candidate_max_factors", "clear_tune_cache"]

_MEM_CACHE: dict = {}


def candidate_max_factors(n: int, kind) -> Tuple[int, ...]:
    """Distinct-stage-shape candidate policies for this size/backend."""

    import jax

    engine_n = n // 2 if _plan._coerce_kind(kind) == _plan.REAL else n
    if jax.default_backend() != "tpu":
        cands = [5, 64]
    else:
        cands = [512, 256, 128]
        if engine_n <= 4096:
            cands.append(64)
    # dedupe by the factor tuple each policy actually produces
    seen = {}
    for mf in cands:
        try:
            p = _plan.Plan.create(n, kind, max_factor=mf, strict=False)
        except ValueError:
            continue
        key = (p.factors, p.local_split is None)
        if key not in seen:
            seen[key] = mf
    return tuple(seen.values())


def _time_plan(n: int, kind, dtype, mf: int, batch: int, iters: int) -> float:
    """Seconds per batched forward transform of the policy's complex
    engine (deferred-runtime-safe: device-chained loop, full-reduction
    fetch, two-point slope).  REAL plans add a fixed policy-independent
    split step, so the engine at engine_n is what gets timed."""

    import jax
    import jax.numpy as jnp

    engine_n = n // 2 if _plan._coerce_kind(kind) == _plan.REAL else n
    eng = _plan.Plan.create(engine_n, _plan.COMPLEX, dtype, max_factor=mf, strict=False)
    rng = np.random.default_rng(0)
    rdt = np.dtype(dtype)  # probe with the plan's real dtype, not always f32
    re = jnp.asarray(rng.standard_normal((batch, eng.engine_n)).astype(rdt))
    im = jnp.asarray(rng.standard_normal((batch, eng.engine_n)).astype(rdt))

    def looped(k):
        @jax.jit
        def run(r, i):
            def body(_, c):
                rr, ii = _fft.transform_ordered_split(eng, (c[0], c[1]), _plan.FORWARD)
                return jax.lax.optimization_barrier((rr, ii))

            out = jax.lax.fori_loop(0, k, body, (r, i))
            return jnp.sum(out[0]) + jnp.sum(out[1])

        return run

    k1, k2 = 2, 2 + iters
    r1, r2 = looped(k1), looped(k2)
    float(r1(re, im))  # compile + warm
    float(r2(re, im))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(r1(re, im))
        t1 = time.perf_counter()
        float(r2(re, im))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
        if slope > 0:
            best = min(best, slope)
    return best


def _disk_cache_path() -> Optional[str]:
    return os.environ.get("PFFFT_TPU_TUNE_CACHE") or None


def clear_tune_cache() -> None:
    _MEM_CACHE.clear()


def tuned_setup(
    n: int,
    kind=_plan.COMPLEX,
    dtype="float32",
    *,
    batch: int = 64,
    iters: int = 8,
    candidates: Optional[Sequence[int]] = None,
) -> _plan.Plan:
    """Measure candidate stage policies on the current backend and return
    the fastest plan (cached).  The MEASURE-mode constructor; plans are
    identical in semantics to :func:`pffft_tpu.new_setup`."""

    import jax

    kind = _plan._coerce_kind(kind)
    key = (jax.default_backend(), int(n), kind.value, np.dtype(dtype).name)
    if key in _MEM_CACHE:
        return _plan.Plan.create(n, kind, dtype, max_factor=_MEM_CACHE[key])

    path = _disk_cache_path()
    skey = ":".join(map(str, key))
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                disk = json.load(f)
            if skey in disk:
                _MEM_CACHE[key] = int(disk[skey])
                return _plan.Plan.create(n, kind, dtype, max_factor=_MEM_CACHE[key])
        except Exception:
            pass

    cands = tuple(candidates) if candidates else candidate_max_factors(n, kind)
    best_mf, best_t = None, float("inf")
    for mf in cands:
        t = _time_plan(n, kind, dtype, mf, batch, iters)
        if t < best_t:
            best_mf, best_t = mf, t
    if best_mf is None:  # pragma: no cover
        return _plan.Plan.create(n, kind, dtype)

    _MEM_CACHE[key] = best_mf
    if path:
        try:
            disk = {}
            if os.path.exists(path):
                with open(path) as f:
                    disk = json.load(f)
            disk[skey] = best_mf
            with open(path, "w") as f:
                json.dump(disk, f, indent=1)
        except Exception:
            pass
    return _plan.Plan.create(n, kind, dtype, max_factor=best_mf)
