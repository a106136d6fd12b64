"""Multi-dimensional transforms composed from the 1-D engine.

BEYOND PARITY: the reference is strictly one-dimensional (pffft.h has no
n-d surface).  This module builds fft2/fftn from per-axis ordered
transforms: each axis is moved to the minor position (a transpose XLA
fuses into the neighboring contraction where possible) and run through
the measured 1-D dispatcher.  Per-axis plans come from
:func:`pffft_tpu.bluestein.new_setup_any`, so ANY extent works — smooth
sizes ride the MXU stage engine, awkward ones the chirp-Z path.

Convention matches the 1-D library: unscaled, so
``ifftn(fftn(x)) == prod(shape) * x``.

TPU-native: planar (re, im) planes throughout (`fftn_split`); the
complex-dtype entry points are CPU-side conveniences.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bluestein as _bs
from . import fft as _fft
from . import plan as _plan
from .ops import dispatch as _dispatch

__all__ = ["NdPlan", "fftn_setup", "fftn_split", "fftn", "ifftn",
           "fft2", "ifft2", "rfftn", "irfftn"]


class NdPlan:
    """Per-axis plan bundle for an n-dimensional complex transform.

    ``shape`` are the transformed extents (the trailing ``len(shape)``
    axes of the operand; anything before them is batch).  Each axis gets
    its own 1-D plan via new_setup_any — equal extents share one plan.
    """

    def __init__(self, shape: Sequence[int], dtype="float32"):
        self.shape = tuple(int(s) for s in shape)
        if not self.shape:
            raise ValueError("fftn needs at least one axis")
        if any(s < 2 for s in self.shape):
            raise ValueError(f"every transformed extent must be >= 2: {self.shape}")
        self.dtype = np.dtype(dtype)
        # new_setup_any caches BluesteinPlans per (n, dtype) and Plan.create
        # caches smooth plans, so repeated NdPlan construction (the fftn
        # convenience path) reuses tables and jitted pipelines
        self.plans = tuple(
            _bs.new_setup_any(s, _plan.COMPLEX, self.dtype.name)
            for s in self.shape
        )

    @property
    def size(self) -> int:
        out = 1
        for s in self.shape:
            out *= s
        return out

    def __repr__(self) -> str:  # pragma: no cover
        return f"NdPlan(shape={self.shape}, {self.dtype.name})"


def fftn_setup(shape: Sequence[int], dtype="float32") -> NdPlan:
    """Plan an n-dimensional complex transform over the given extents."""

    return NdPlan(shape, dtype)


def _axis_transform(p, planes, backward: bool):
    """1-D ordered transform along the LAST axis, either plan type."""

    d = _plan.BACKWARD if backward else _plan.FORWARD
    if isinstance(p, _plan.Plan):
        return _fft.transform_ordered_split(p, planes, d)
    return _bs.transform_any_split(p, planes, d)


def fftn_split(ndplan: NdPlan, x, direction=_plan.FORWARD):
    """Planar n-d transform: (re, im) [..., *shape] -> (re, im).

    Axes are processed minor-to-major; each non-minor axis is swapped to
    the minor position and back (moveaxis = transpose; the engine's
    batch dimension absorbs everything else).
    """

    d = _plan._coerce_direction(direction)
    backward = d == _plan.BACKWARD
    re, im = x
    re = jnp.asarray(re, dtype=ndplan.dtype.type)
    im = jnp.asarray(im, dtype=ndplan.dtype.type)
    nd = len(ndplan.shape)
    if re.shape[-nd:] != ndplan.shape:
        raise ValueError(
            f"trailing axes {re.shape[-nd:]} do not match plan shape "
            f"{ndplan.shape}")
    for k in range(nd):
        ax = -1 - k  # minor-to-major
        p = ndplan.plans[nd - 1 - k]
        if ax != -1:
            re = jnp.moveaxis(re, ax, -1)
            im = jnp.moveaxis(im, ax, -1)
        re, im = _axis_transform(p, (re, im), backward)
        if ax != -1:
            re = jnp.moveaxis(re, -1, ax)
            im = jnp.moveaxis(im, -1, ax)
    return re, im


def fftn(x, shape: Sequence[int] | None = None, dtype="float32"):
    """Complex-dtype n-d forward transform over the trailing ``shape``
    axes (default: all axes).  CPU-side convenience."""

    x = jnp.asarray(x)
    nd = NdPlan(shape if shape is not None else x.shape, dtype)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(nd.dtype.type) + 0j
    rr, ri = fftn_split(nd, (x.real, x.imag), _plan.FORWARD)
    return rr + 1j * ri


def ifftn(x, shape: Sequence[int] | None = None, dtype="float32"):
    """Unscaled n-d backward transform (ifftn(fftn(x)) == size * x)."""

    x = jnp.asarray(x)
    nd = NdPlan(shape if shape is not None else x.shape, dtype)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(nd.dtype.type) + 0j
    rr, ri = fftn_split(nd, (x.real, x.imag), _plan.BACKWARD)
    return rr + 1j * ri


def fft2(x, dtype="float32"):
    """2-D forward transform over the trailing two axes."""

    x = jnp.asarray(x)
    return fftn(x, x.shape[-2:], dtype)


def ifft2(x, dtype="float32"):
    """Unscaled 2-D backward transform over the trailing two axes."""

    x = jnp.asarray(x)
    return ifftn(x, x.shape[-2:], dtype)


def rfftn(x, dtype="float32"):
    """Real-input n-d forward: np.fft.rfftn bin layout (last axis halved
    to N//2+1), unscaled.  Built as rfft_any on the minor axis followed
    by complex transforms on the rest."""

    x = jnp.asarray(x)
    half = _bs.rfft_any(x, dtype)  # [..., n_last//2 + 1] complex
    rest = x.shape[:-1]
    if not rest:
        return half
    nd = NdPlan(rest, dtype)
    rr, ri = fftn_split(nd, (jnp.moveaxis(half.real, -1, 0),
                             jnp.moveaxis(half.imag, -1, 0)),
                        _plan.FORWARD)
    return jnp.moveaxis(rr + 1j * ri, 0, -1)


def irfftn(s, shape: Sequence[int], dtype="float32"):
    """Inverse of :func:`rfftn` for a real result of extents ``shape``
    (unscaled: irfftn(rfftn(x), x.shape) == prod(shape) * x)."""

    s = jnp.asarray(s)
    shape = tuple(int(v) for v in shape)
    rest, n_last = shape[:-1], shape[-1]
    if s.shape[-len(shape):-1] != rest or s.shape[-1] != n_last // 2 + 1:
        raise ValueError(
            f"spectrum trailing shape {s.shape[-len(shape):]} does not "
            f"match rfftn of {shape}")
    if rest:
        nd = NdPlan(rest, dtype)
        rr, ri = fftn_split(nd, (jnp.moveaxis(s.real, -1, 0),
                                 jnp.moveaxis(s.imag, -1, 0)),
                            _plan.BACKWARD)
        s = jnp.moveaxis(rr + 1j * ri, 0, -1)
    return _bs.irfft_any(s, n_last, dtype)
