"""Engine dispatch: select the kernel variant per backend/plan/shape.

The reference selects kernels three ways (SURVEY.md §2.8): compile-time
SIMD headers, link-time multi-arch libraries with a runtime dispatcher
(benchmarks/pf_conv_dispatcher.cpp:18-60), and gcc target_clones ifunc
(src/fmv.h).  The TPU analog is a plan-time registry choosing between

  * ``xla``    — the split-format stage engine (ops/split.py) with the
    backend-tuned stage policy (plan.default_max_factor) and Gauss
    3-matmul contractions (ops/split.py:cmul_mode); the default.
  * ``fused2`` — the fused two-stage MXU kernel (ops/fused_stage.py):
    whole transform in one VMEM pass, lane-concat stage matmuls; covers
    the production two-fat-stage plans, batch-major, B % TB == 0.
  * ``pallas`` — the radix<=5 VPU butterfly kernel (ops/pallas_fft.py),
    time-major; covers thin-stage (CPU-policy) plans only.

Measured guidance on TPU v5e (benchmarks/results/concat_r3.txt,
engines_r*.csv; median-of-interleaved-trials): the XLA stage path with
the auto cmul policy (lane-concat contraction for r<=64 stages,
ops/split.py:cmul_mode) is the winner at every measured size and is the
default; the registry exists so kernels can be forced (``set_engine`` /
PFFFT_TPU_ENGINE) and so the measured table (``record_engine``) can
reroute per (backend, N) without touching call sites.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .. import plan as _plan
from . import fused_stage as _fs
from . import pallas_fft as _pk
from . import split as _split

__all__ = ["available_engines", "select_engine", "set_engine", "cfft_dispatch"]

_FORCED: Optional[str] = None

# VMEM budget for the fused kernels' block (bytes); beyond it Mosaic OOMs.
_PALLAS_VMEM_BUDGET = 12 << 20


def available_engines(plan: _plan.Plan, batch: int, time_major: bool) -> Tuple[str, ...]:
    out = ["xla"]
    if (
        _fs.supported(plan)
        and not time_major
        and batch % _fs.DEFAULT_TB == 0
        # in + out + ~2 live intermediates per plane pair
        and 8 * plan.engine_n * _fs.DEFAULT_TB * 4 <= _PALLAS_VMEM_BUDGET
    ):
        out.append("fused2")
    if (
        _pk.supported(plan)
        and time_major
        and batch % _pk.DEFAULT_TB == 0
        # ~6x the block plane (in + out + live intermediates, double-buffered)
        and 6 * plan.engine_n * _pk.DEFAULT_TB * 4 * 2 <= _PALLAS_VMEM_BUDGET
    ):
        out.append("pallas")
    return tuple(out)


def set_engine(name: Optional[str]) -> None:
    """Force an engine globally ('xla', 'fused2', 'pallas', or None)."""

    global _FORCED
    if name not in (None, "xla", "fused2", "pallas"):
        raise ValueError(f"unknown engine {name!r}")
    _FORCED = name


_WARNED_ENV_FALLBACK = set()

# Measured engine table: (backend, n) -> engine, filled from the archived
# interleaved-round comparisons (benchmarks/bench_engines.py ->
# benchmarks/results/engines_r*.csv).  The analog of the reference's
# runtime dispatcher table (/root/reference/benchmarks/pf_conv_dispatcher.cpp:18-60).
# Round-2/3 measurements: the XLA stage engine wins every size on this
# backend (the fused kernel pays 4/3 MXU work for its single HBM pass and
# the radix kernel is VPU-bound), so the shipped table is all-xla; the
# mechanism is live so a future backend can reroute without code changes.
_MEASURED_TABLE: dict = {
    ("tpu", 1024): "xla",
    ("tpu", 4096): "xla",
}


def record_engine(backend: str, n: int, engine: str) -> None:
    """Record a measured winner (used by bench_engines --apply and tests)."""

    if engine not in ("xla", "fused2", "pallas"):
        raise ValueError(f"unknown engine {engine!r}")
    _MEASURED_TABLE[(backend, int(n))] = engine


def select_engine(plan: _plan.Plan, batch: int, time_major: bool) -> str:
    avail = available_engines(plan, batch, time_major)
    if _FORCED is not None:
        # programmatic force: hard error when unavailable (caller opted in)
        if _FORCED not in avail:
            raise ValueError(
                f"forced engine {_FORCED!r} unavailable for plan {plan} "
                f"(batch={batch}, time_major={time_major}); available: {avail}"
            )
        return _FORCED
    env = os.environ.get("PFFFT_TPU_ENGINE") or None
    if env is not None:
        # env-var force: fall back to 'xla' with a one-time warning — a
        # global env var must not turn every unsupported call site (odd
        # batch, time_major mismatch) into a ValueError (ADVICE r2)
        if env in avail:
            return env
        key = (env, plan.n, batch, time_major)
        if key not in _WARNED_ENV_FALLBACK:
            _WARNED_ENV_FALLBACK.add(key)
            import warnings

            warnings.warn(
                f"PFFFT_TPU_ENGINE={env!r} unavailable for plan {plan} "
                f"(batch={batch}, time_major={time_major}); falling back to 'xla'",
                RuntimeWarning,
                stacklevel=2,
            )
        return "xla"
    # measured table first (per backend + engine length), then the
    # measured default: the XLA Gauss fat-stage path wins on current
    # hardware (scripts/r2_perf1.py, engines_r3; the fused kernel's
    # concat matmuls cost 4/3 the MXU work — see benchmarks/results/)
    measured = _MEASURED_TABLE.get((jax.default_backend(), plan.engine_n))
    if measured is not None and measured in avail:
        return measured
    return "xla"


def cfft_dispatch(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    time_major: bool = False,
):
    """Complex FFT through the selected engine (split format).

    time_major: planes are [N, B] (the VPU kernel's native layout);
    otherwise [..., N].
    """

    batch = re.shape[-1] if time_major else int(re.size // re.shape[-1])
    engine = select_engine(plan, batch, time_major)
    # Mosaic only compiles on TPU; elsewhere the kernels run interpreted
    interp = jax.default_backend() != "tpu"
    if engine == "pallas":
        return _pk.cfft_pallas_tmajor(plan, re, im, backward=backward, interpret=interp)
    if engine == "fused2":
        lead = re.shape[:-1]
        n = re.shape[-1]
        rr, ii = _fs.cfft_fused2(
            plan, re.reshape(-1, n), im.reshape(-1, n),
            backward=backward, ordered=True, interpret=interp,
        )
        return rr.reshape(*lead, n), ii.reshape(*lead, n)
    if time_major:
        if plan.local_split is None and re.ndim == 2:
            # native time-major engine: batch stays on the lanes end-to-end
            return _split.cfft_stages_split_tmajor(
                re, im, plan.stages, backward=backward, ordered=True
            )
        rr, ii = _split.cfft_plan_split(plan, re.T, im.T, backward=backward, ordered=True)
        return rr.T, ii.T
    return _split.cfft_plan_split(plan, re, im, backward=backward, ordered=True)
