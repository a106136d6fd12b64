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

__all__ = [
    "tuned_setup",
    "tune_engine",
    "candidate_max_factors",
    "candidate_policies",
    "clear_tune_cache",
]

_MEM_CACHE: dict = {}


def candidate_max_factors(n: int, kind) -> Tuple[int, ...]:
    """Distinct-stage-shape max_factor candidates for this size/backend."""

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


def candidate_policies(n: int, kind) -> Tuple[tuple, ...]:
    """Candidate plan policies: explicit stage CHAINS plus the four-step
    split variants reachable through max_factor.

    Each candidate is ("chain", factors) or ("mf", max_factor).  Chains
    are enumerated by grouping the smooth factorization at several stage
    caps (the MXU-bound sweet spot is r~32-128 under HIGHEST precision,
    measured in benchmarks/results/factors_r3.csv), deduped by the factor
    tuple; chains longer than 5 stages are dropped (pass overhead
    dominates well before that).
    """

    import jax

    kind = _plan._coerce_kind(kind)
    engine_n = n // 2 if kind == _plan.REAL else n
    out: dict = {}
    if jax.default_backend() != "tpu":
        for mf in (5, 64):
            try:
                p = _plan.Plan.create(n, kind, max_factor=mf, strict=False)
            except ValueError:
                continue
            out.setdefault((p.factors, p.local_split is None), ("mf", mf))
        return tuple(out.values())
    # the measured-table entry (plan._TPU_FACTOR_TABLE) is always a
    # candidate — it may not be reachable via any cap (e.g. (128,128,8))
    table = _plan._tpu_table_factors(int(engine_n))
    if table is not None:
        out.setdefault((tuple(table), True), ("chain", tuple(table)))
    for cap in (512, 256, 128, 96, 64, 48, 32, 16):
        if cap * cap < engine_n and cap < 64:
            continue  # tiny caps at large N => long chains, never win
        try:
            chain = _plan.plan_factors(engine_n, max_factor=cap)
        except ValueError:
            continue
        if len(chain) > 5:
            continue
        out.setdefault((chain, True), ("chain", chain))
    # four-step split variants (local_split plans), via the mf path
    for mf in (128, 64):
        try:
            p = _plan.Plan.create(n, kind, max_factor=mf, strict=False)
        except ValueError:
            continue
        if p.local_split is not None:
            out.setdefault((p.factors, False), ("mf", mf))
    return tuple(out.values())


def _policy_plan(n: int, kind, dtype, policy) -> _plan.Plan:
    tag, val = policy
    if tag == "chain":
        return _plan.Plan.create(n, kind, dtype, factors=tuple(val), strict=False)
    return _plan.Plan.create(n, kind, dtype, max_factor=int(val), strict=False)


def _time_plan(n: int, kind, dtype, policy, batch: int, iters: int) -> float:
    """Seconds per batched forward transform of the policy's complex
    engine (deferred-runtime-safe: device-chained loop, full-reduction
    fetch, two-point slope).  REAL plans add a fixed policy-independent
    split step, so the engine at engine_n is what gets timed."""

    import jax
    import jax.numpy as jnp

    engine_n = n // 2 if _plan._coerce_kind(kind) == _plan.REAL else n
    eng = _policy_plan(engine_n, _plan.COMPLEX, dtype, policy)
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


def tune_engine(
    n: int,
    batch: int,
    *,
    time_major: bool = True,
    dtype="float32",
    iters: int = 8,
    rounds: int = 3,
) -> str:
    """Race the AVAILABLE engines (ops/dispatch registry) for this exact
    (N, batch, layout) on the current backend, record the winner in the
    measured dispatch table (``record_engine``), and return its name.

    The engine-level MEASURE mode: ``tuned_setup`` picks the stage chain
    for the XLA engine; this picks between engines (xla / fused2 /
    pallas kernel) for the caller's real workload shape.  Interleaved
    rounds, median decides.  Requires the jit caches to key on
    ``dispatch.state_key()`` — forcing an engine must produce a fresh
    trace (the round-3 cache-poisoning fix)."""

    import jax
    import jax.numpy as jnp

    from .ops import dispatch as _dispatch

    plan = _plan.Plan.create(n, _plan.COMPLEX, dtype, strict=False)
    avail = _dispatch.available_engines(plan, batch, time_major)
    if len(avail) == 1:
        return avail[0]

    rng = np.random.default_rng(0)
    rdt = np.dtype(dtype)
    shape = (n, batch) if time_major else (batch, n)
    re = jnp.asarray(rng.standard_normal(shape).astype(rdt))
    im = jnp.asarray(rng.standard_normal(shape).astype(rdt))

    def timed(engine: str) -> float:
        _dispatch.set_engine(engine)
        try:
            def looped(k):
                @jax.jit
                def run(r, i):
                    def body(_, c):
                        if time_major:
                            rr, ii = _fft.transform_ordered_split_tmajor(
                                plan, (c[0], c[1]), _plan.FORWARD)
                        else:
                            rr, ii = _fft.transform_ordered_split(
                                plan, (c[0], c[1]), _plan.FORWARD)
                        return jax.lax.optimization_barrier((rr, ii))

                    out = jax.lax.fori_loop(0, k, body, (r, i))
                    return jnp.sum(out[0]) + jnp.sum(out[1])

                return run

            k1, k2 = 2, 2 + iters
            r1, r2 = looped(k1), looped(k2)
            float(r1(re, im))
            float(r2(re, im))
            t0 = time.perf_counter()
            float(r1(re, im))
            t1 = time.perf_counter()
            float(r2(re, im))
            t2 = time.perf_counter()
            slope = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
            return slope if slope > 0 else float("inf")
        except Exception:
            return float("inf")
        finally:
            _dispatch.set_engine(None)

    times = {e: [] for e in avail}
    for _ in range(max(1, rounds)):
        for e in avail:
            times[e].append(timed(e))
    med = {e: sorted(ts)[len(ts) // 2] for e, ts in times.items()}
    winner = min(med, key=med.get)
    if med[winner] < float("inf"):
        _dispatch.record_engine(
            jax.default_backend(), plan.engine_n, winner, time_major
        )
    return winner


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
        return _policy_plan(n, kind, dtype, _MEM_CACHE[key])

    path = _disk_cache_path()
    skey = ":".join(map(str, key))
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                disk = json.load(f)
            if skey in disk:
                _MEM_CACHE[key] = _coerce_policy(disk[skey])
                return _policy_plan(n, kind, dtype, _MEM_CACHE[key])
        except Exception:
            pass

    if candidates:
        # legacy surface: a sequence of max_factor ints, or policy tuples
        cands = tuple(
            c if isinstance(c, tuple) and c and c[0] in ("mf", "chain") else ("mf", int(c))
            for c in candidates
        )
    else:
        cands = candidate_policies(n, kind)
    best_pol, best_t = None, float("inf")
    for pol in cands:
        t = _time_plan(n, kind, dtype, pol, batch, iters)
        if t < best_t:
            best_pol, best_t = pol, t
    if best_pol is None:  # pragma: no cover
        return _plan.Plan.create(n, kind, dtype)

    _MEM_CACHE[key] = best_pol
    if path:
        try:
            disk = {}
            if os.path.exists(path):
                with open(path) as f:
                    disk = json.load(f)
            disk[skey] = list(best_pol if best_pol[0] == "mf" else ("chain", list(best_pol[1])))
            with open(path, "w") as f:
                json.dump(disk, f, indent=1)
        except Exception:
            pass
    return _policy_plan(n, kind, dtype, best_pol)


def _coerce_policy(v) -> tuple:
    """Disk-cache value -> policy tuple (back-compat: bare ints = mf)."""

    if isinstance(v, (int, float)):
        return ("mf", int(v))
    tag, val = v
    if tag == "chain":
        return ("chain", tuple(int(x) for x in val))
    return ("mf", int(val))
