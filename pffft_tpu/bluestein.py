"""Arbitrary-N transforms via the Bluestein chirp-Z algorithm.

BEYOND PARITY: the reference rejects every N that is not 2/3/5-smooth
(pffft_new_setup validation, pffft_priv_impl.h:1062-1078; the size
contract is documented at pffft.h:74-80 and enforced by
pffft_is_valid_size).  This module accepts ANY length N >= 2 — primes
included — by embedding the length-N DFT in a cyclic convolution of
2/3/5-smooth length M >= 2N-1 (Bluestein 1968):

    jk = (j^2 + k^2 - (k-j)^2) / 2
    X[k] = e^{s i pi k^2/N} * sum_j (x[j] e^{s i pi j^2/N}) e^{-s i pi (k-j)^2/N}

with s = -1 forward / +1 backward (unscaled, so backward(forward(x)) ==
N*x, matching the library convention).  The convolution rides the
existing split-format MXU engine in its INTERNAL (unordered) layout —
pointwise multiply against the precomputed kernel spectrum, no reorder
pass — exactly the zconvolve composition FastConv uses (conv.py).

Chirp phases are computed with EXACT integer arithmetic, pi*((j*j) mod
2N)/N, so the table stays accurate at large N where float j^2 would
lose the low bits that matter after mod 2pi.

TPU-native: planar (re, im) throughout; complex-dtype conveniences are
CPU-side sugar like the rest of the package.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import plan as _plan
from .ops import dispatch as _dispatch
from .ops import split as _split

__all__ = [
    "BluesteinPlan",
    "next_smooth_size",
    "new_setup_any",
    "transform_any",
    "transform_any_split",
    "rfft_any",
    "irfft_any",
]


def next_smooth_size(n: int) -> int:
    """Smallest 2/3/5-smooth integer >= n (no SIMD-granularity contract —
    this is the inner-engine size, not a pffft_is_valid_size size)."""

    m = max(int(n), 2)
    while True:
        try:
            _plan.decompose_smooth(m)
            return m
        except ValueError:
            m += 1


def _chirp_tables(n: int, m: int, dtype: np.dtype):
    """Forward-direction chirp and cyclic kernel, exact integer phases.

    Returns (c_re, c_im) [n] with c[j] = e^{-i pi j^2 / n} and
    (b_re, b_im) [m] with the conjugate chirp laid out cyclically
    (B[j] = B[m-j] = e^{+i pi j^2 / n}, zero in the dead middle).
    The backward direction is the elementwise conjugate of both.
    """

    two_n = 2 * n
    ph = np.array([(j * j) % two_n for j in range(n)], dtype=np.float64)
    ph *= math.pi / n
    c_re = np.cos(ph)
    c_im = -np.sin(ph)
    b_re = np.zeros(m, dtype=np.float64)
    b_im = np.zeros(m, dtype=np.float64)
    b_re[:n] = c_re
    b_im[:n] = -c_im
    # wrap negative lags: kernel index (k - j) mod m for k < n, j < n
    b_re[m - n + 1:] = c_re[1:][::-1]
    b_im[m - n + 1:] = -c_im[1:][::-1]
    return (
        c_re.astype(dtype),
        c_im.astype(dtype),
        b_re.astype(dtype),
        b_im.astype(dtype),
    )


class BluesteinPlan:
    """Chirp-Z plan: complex transform of ANY length n >= 2.

    Mirrors the Plan surface where it makes sense (n, dtype, kind,
    spectrum_size, transform entry points below); the convolution engine
    is an ordinary smooth COMPLEX :class:`pffft_tpu.plan.Plan` of length
    ``m = next_smooth_size(2n-1)`` (``inner``).
    """

    kind = _plan.COMPLEX

    def __init__(self, n: int, dtype="float32", *, m: int | None = None):
        n = int(n)
        if n < 2:
            raise ValueError(f"N={n}: Bluestein transform needs N >= 2")
        if n > (1 << 25):
            raise ValueError(
                f"N={n} exceeds the 2^25 Bluestein cap (inner length 2N)")
        self.n = n
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
            raise ValueError(f"unsupported dtype {dtype}")
        self.m = int(m) if m is not None else next_smooth_size(2 * n - 1)
        if self.m < 2 * n - 1:
            raise ValueError(f"m={self.m} < 2N-1={2 * n - 1}")
        _plan.decompose_smooth(self.m)  # raises if a custom m is not smooth
        self.inner = _plan.Plan.create(
            self.m, _plan.COMPLEX, self.dtype, strict=False)
        c_re, c_im, b_re, b_im = _chirp_tables(n, self.m, self.dtype)
        self._chirp = (jnp.asarray(c_re), jnp.asarray(c_im))
        # kernel spectrum in the inner engine's INTERNAL layout (one-time)
        self._bhat = _fft.transform_split(
            self.inner, (jnp.asarray(b_re), jnp.asarray(b_im)), _plan.FORWARD)

    @property
    def spectrum_size(self) -> int:
        return self.n

    def __repr__(self) -> str:  # pragma: no cover
        return (f"BluesteinPlan(N={self.n}, m={self.m}, "
                f"{self.dtype.name})")


@functools.lru_cache(maxsize=256)
def _jitted_any(bplan: BluesteinPlan, backward: bool, ekey=None):
    n, m = bplan.n, bplan.m
    inner = bplan.inner
    inv_m = 1.0 / m

    def fn(re, im, c_re, c_im, bh_re, bh_im):
        # conjugate both tables for the backward direction
        if backward:
            c_im, bh_im = -c_im, -bh_im
        ar, ai = _split.split_mul((re, im), (c_re, c_im))
        pad = [(0, 0)] * (ar.ndim - 1) + [(0, m - n)]
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)
        sr, si = _fft.transform_split(inner, (ar, ai), _plan.FORWARD)
        sr, si = _split.split_mul((sr, si), (bh_re, bh_im))
        cr, ci = _fft.transform_split(inner, (sr, si), _plan.BACKWARD)
        cr = cr[..., :n] * inv_m
        ci = ci[..., :n] * inv_m
        return _split.split_mul((cr, ci), (c_re, c_im))

    return jax.jit(fn)


def transform_any_split(bplan: BluesteinPlan, x, direction=_plan.FORWARD):
    """Split-format ordered transform for any-N plans.

    x = (re, im) planes [..., N] -> (re, im) planes [..., N].
    Unscaled: backward(forward(x)) == N * x.
    """

    d = _plan._coerce_direction(direction)
    re, im = x
    re = jnp.asarray(re, dtype=bplan.dtype.type)
    im = jnp.asarray(im, dtype=bplan.dtype.type)
    if re.shape[-1] != bplan.n or im.shape[-1] != bplan.n:
        raise ValueError(
            f"last axis must be N={bplan.n}, got {re.shape[-1]}/{im.shape[-1]}")
    c_re, c_im = bplan._chirp
    bh_re, bh_im = bplan._bhat
    return _jitted_any(bplan, d == _plan.BACKWARD, _dispatch.state_key())(
        re, im, c_re, c_im, bh_re, bh_im)


def transform_any(bplan: BluesteinPlan, x, direction=_plan.FORWARD):
    """Complex-dtype convenience for :func:`transform_any_split`
    (CPU-side sugar — complex dtypes do not exist on the TPU backend)."""

    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(bplan.dtype.type) + 0j
    rr, ri = transform_any_split(bplan, (x.real, x.imag), direction)
    return rr + 1j * ri


def new_setup_any(n: int, kind=_plan.COMPLEX, dtype="float32", **kw):
    """new_setup for ANY length: a smooth (strict=False) Plan when the
    engine supports N directly, a :class:`BluesteinPlan` otherwise.

    Both returned types work with transform_ordered /
    transform_ordered_split.  REAL kind requires a smooth even N (use
    :func:`rfft_any` for arbitrary-length real input).
    """

    kind = _plan._coerce_kind(kind)
    try:
        return _plan.Plan.create(n, kind, dtype, strict=False, **kw)
    except ValueError:
        if kind == _plan.REAL:
            raise ValueError(
                f"N={n} is not 2/3/5-smooth-even; arbitrary-N real input "
                f"goes through rfft_any / irfft_any (Bluestein)")
        return BluesteinPlan(n, dtype, **kw)


def rfft_any(x, dtype="float32"):
    """Forward real transform of ANY length: [..., N] real ->
    [..., N//2 + 1] complex bins (scipy rfft convention, unscaled).

    Convenience built on the complex Bluestein path; for smooth even N
    the packed-format Plan(REAL) engine is the fast path.
    """

    x = jnp.asarray(x)
    n = x.shape[-1]
    bplan = _bluestein_cached(n, np.dtype(dtype).name)
    zr = x.astype(bplan.dtype.type)
    rr, ri = transform_any_split(bplan, (zr, jnp.zeros_like(zr)),
                                 _plan.FORWARD)
    h = n // 2 + 1
    return rr[..., :h] + 1j * ri[..., :h]


def irfft_any(s, n: int, dtype="float32"):
    """Backward of :func:`rfft_any`: [..., N//2+1] complex -> [..., N]
    real.  Unscaled (irfft_any(rfft_any(x), N) == N * x)."""

    s = jnp.asarray(s)
    n = int(n)
    h = n // 2 + 1
    if s.shape[-1] != h:
        raise ValueError(f"expected {h} bins for N={n}, got {s.shape[-1]}")
    bplan = _bluestein_cached(n, np.dtype(dtype).name)
    # rebuild the full Hermitian spectrum: X[n-k] = conj(X[k]), k=1..n-h
    sr = s.real.astype(bplan.dtype.type)
    si = s.imag.astype(bplan.dtype.type)
    tail = slice(1, n - h + 1)
    fr = jnp.concatenate([sr, jnp.flip(sr[..., tail], axis=-1)], axis=-1)
    fi = jnp.concatenate([si, -jnp.flip(si[..., tail], axis=-1)], axis=-1)
    rr, _ = transform_any_split(bplan, (fr, fi), _plan.BACKWARD)
    return rr


@functools.lru_cache(maxsize=64)
def _bluestein_cached(n: int, dtype: str) -> BluesteinPlan:
    return BluesteinPlan(n, dtype)
