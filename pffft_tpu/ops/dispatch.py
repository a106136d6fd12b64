"""Engine dispatch: select the kernel variant per backend/plan/shape.

The reference selects kernels three ways (SURVEY.md §2.8): compile-time
SIMD headers, link-time multi-arch libraries with a runtime dispatcher
(benchmarks/pf_conv_dispatcher.cpp:18-60), and gcc target_clones ifunc
(src/fmv.h).  The TPU analog is a plan-time registry choosing between

  * ``xla``    — the split-format stage engine (ops/split.py), with the
    backend-tuned stage policy (plan.default_max_factor); the default.
  * ``pallas`` — the fused all-stages-in-VMEM radix kernel
    (ops/pallas_fft.py), usable when the plan's factors are all <= 5, the
    batch is tile-aligned and the block fits VMEM.

Measured guidance on TPU v5e (see benchmarks/, commit history): the MXU
fat-stage XLA path is fastest for the supported range, so it is the
default everywhere; the registry exists so future kernels (and users, via
``set_engine``) can reroute without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from .. import plan as _plan
from . import pallas_fft as _pk
from . import split as _split

__all__ = ["available_engines", "select_engine", "set_engine", "cfft_dispatch"]

_FORCED: Optional[str] = None

# VMEM budget for the fused kernel block (bytes); beyond it Mosaic OOMs.
_PALLAS_VMEM_BUDGET = 12 << 20


def available_engines(plan: _plan.Plan, batch: int, time_major: bool) -> Tuple[str, ...]:
    out = ["xla"]
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
    """Force an engine globally ('xla', 'pallas', or None for auto)."""

    global _FORCED
    if name not in (None, "xla", "pallas"):
        raise ValueError(f"unknown engine {name!r}")
    _FORCED = name


def select_engine(plan: _plan.Plan, batch: int, time_major: bool) -> str:
    avail = available_engines(plan, batch, time_major)
    if _FORCED is not None:
        if _FORCED not in avail:
            raise ValueError(
                f"forced engine {_FORCED!r} unavailable for plan {plan} "
                f"(batch={batch}, time_major={time_major}); available: {avail}"
            )
        return _FORCED
    # measured default: the MXU fat-stage XLA path wins on current hardware
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

    time_major: planes are [N, B] (the fused kernel's native layout);
    otherwise [..., N].
    """

    batch = re.shape[-1] if time_major else int(re.size // re.shape[-1])
    engine = select_engine(plan, batch, time_major)
    if engine == "pallas":
        return _pk.cfft_pallas_tmajor(plan, re, im, backward=backward)
    if time_major:
        rr, ii = _split.cfft_plan_split(plan, re.T, im.T, backward=backward, ordered=True)
        return rr.T, ii.T
    return _split.cfft_plan_split(plan, re, im, backward=backward, ordered=True)
