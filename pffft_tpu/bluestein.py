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
    "CztPlan",
    "czt",
    "czt_split",
    "zoom_fft",
    "zoom_fft_setup",
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
    # exact in int64: j^2 <= (2^25)^2 = 2^50 < 2^63 under the N cap
    j = np.arange(n, dtype=np.int64)
    ph = ((j * j) % two_n).astype(np.float64)
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


def new_setup_any(n: int, kind=_plan.COMPLEX, dtype="float32", *,
                  m: int | None = None, **plan_kw):
    """new_setup for ANY length: a smooth (strict=False) Plan when the
    engine supports N directly, a :class:`BluesteinPlan` otherwise.

    Both returned types work with transform_ordered /
    transform_ordered_split.  REAL kind requires a smooth even N (use
    :func:`rfft_any` for arbitrary-length real input).  ``m`` forces the
    Bluestein path with that smooth inner length; other keywords
    (max_factor, factors) apply to the smooth-plan path only.
    """

    kind = _plan._coerce_kind(kind)
    if m is None:
        try:
            return _plan.Plan.create(n, kind, dtype, strict=False, **plan_kw)
        except ValueError:
            pass
    if kind == _plan.REAL:
        raise ValueError(
            f"N={n} is not 2/3/5-smooth-even; arbitrary-N real input "
            f"goes through rfft_any / irfft_any (Bluestein)")
    if m is not None:
        return BluesteinPlan(n, dtype, m=m)
    # cached: repeated setup of the same (n, dtype) must reuse the
    # chirp tables, the kernel spectrum, and the jitted pipeline
    return _bluestein_cached(int(n), np.dtype(dtype).name)


def _real_plan_or_none(n: int, dtype: str):
    """Smooth-even-N packed REAL plan, or None (then Bluestein it is)."""

    try:
        return _plan.Plan.create(n, _plan.REAL, dtype, strict=False)
    except ValueError:
        return None


def rfft_any(x, dtype="float32"):
    """Forward real transform of ANY length: [..., N] real ->
    [..., N//2 + 1] complex bins (scipy rfft convention, unscaled).

    Smooth even N rides the half-length packed REAL engine (one
    N/2-point transform); everything else the complex Bluestein path.
    """

    x = jnp.asarray(x)
    n = int(x.shape[-1])
    dtype = np.dtype(dtype).name
    if n == 1:  # degenerate length (np.fft.rfft parity): X[0] = x[0]
        return x.astype(np.complex128 if dtype == "float64" else np.complex64)
    p = _real_plan_or_none(n, dtype)
    if p is not None:
        s = _fft.transform_ordered(p, x.astype(p.dtype.type), _plan.FORWARD)
        return _fft.spectrum_unpack(s)
    bplan = _bluestein_cached(n, dtype)
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
    dtype = np.dtype(dtype).name
    if n == 1:  # unscaled inverse of the degenerate forward
        return s.real.astype(dtype)
    p = _real_plan_or_none(n, dtype)
    if p is not None:
        return _fft.transform_ordered(p, _fft.spectrum_pack(s.astype(p.cdtype.type)),
                                      _plan.BACKWARD)
    bplan = _bluestein_cached(n, dtype)
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


# --------------------------------------------------------------------------
# General chirp-Z transform (CZT) and spectral zoom
# --------------------------------------------------------------------------

def _exact_phase_mod2(scale: float, idx: np.ndarray) -> np.ndarray:
    """(scale * idx) mod 2, computed exactly.

    ``scale`` (a float) is exactly the binary rational p/2^k, so the
    product and the mod-2 reduction can be done in integer arithmetic —
    no precision loss at large idx (float64 j^2 phases lose ~2^-13 of a
    turn by j ~ 2^20, far above the f32 noise floor).
    """

    frac = float(scale).as_integer_ratio()
    p, q = frac
    two_q = 2 * q
    out = np.empty(len(idx), dtype=np.float64)
    for i, j in enumerate(idx):
        out[i] = ((p * int(j)) % two_q) / q
    return out


def _chirp_planes(phase_turns: np.ndarray, dtype: np.dtype):
    ang = math.pi * phase_turns  # phase_turns is in half-turn units mod 2
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


class CztPlan:
    """Chirp-Z transform along the unit circle (Rabiner-Schafer-Rader).

        X[k] = sum_j x[j] * A^{-j} * W^{jk},   k = 0..m-1

    with W = e^{-2 pi i w_phase} and A = e^{+2 pi i a_phase} — the
    unit-modulus CZT (scipy.signal.czt with |w| = |a| = 1; off-circle
    chirps grow exponentially and have no TPU-sane use).  Defaults give
    the ordinary DFT (w_phase = 1/n, a_phase = 0, m = n).

    Implementation: Bluestein factorization jk = (j^2 + k^2 - (k-j)^2)/2
    turns the sum into a linear convolution of length n+m-1, run as a
    cyclic convolution of smooth length M on the split-format engine in
    its internal layout (same composition as :class:`BluesteinPlan`).
    Chirp phases w_phase * j^2 / 2 are reduced mod 2 in EXACT integer
    arithmetic (a float w_phase is exactly p/2^k).
    """

    kind = _plan.COMPLEX

    def __init__(self, n: int, m: int | None = None, *,
                 w_phase: float | None = None, a_phase: float = 0.0,
                 dtype="float32"):
        self.n = int(n)
        self.m_out = int(m) if m is not None else self.n
        if self.n < 1 or self.m_out < 1:
            raise ValueError("CZT needs n >= 1 and m >= 1")
        if self.n * self.m_out > (1 << 44):
            raise ValueError("CZT size cap exceeded")
        self.w_phase = float(w_phase) if w_phase is not None else 1.0 / self.n
        self.a_phase = float(a_phase)
        self.dtype = np.dtype(dtype)
        n_, m_ = self.n, self.m_out
        self.m = next_smooth_size(n_ + m_ - 1)
        self.inner = _plan.Plan.create(
            self.m, _plan.COMPLEX, self.dtype, strict=False)

        j = np.arange(max(n_, m_), dtype=object)
        # chirp phase (w_phase/2) * j^2, exact mod 2
        sq = _exact_phase_mod2(self.w_phase, [int(v) * int(v) for v in j])
        # pre[j] = A^{-j} W^{j^2/2}: phase = -(a_phase*j) - (w/2) j^2 turns
        lin = _exact_phase_mod2(2.0 * self.a_phase, [int(v) for v in j[:n_]])
        pre_turns = (-lin - sq[:n_]) % 2.0
        self._pre = tuple(map(jnp.asarray, _chirp_planes(pre_turns, self.dtype)))
        # post[k] = W^{k^2/2}: phase = -(w/2) k^2 turns
        post_turns = (-sq[:m_]) % 2.0
        self._post = tuple(map(jnp.asarray, _chirp_planes(post_turns, self.dtype)))
        # kernel v[d] = W^{-d^2/2} (phase +(w/2) d^2), d = -(n-1)..(m-1),
        # laid out cyclically: V[d mod M]
        vr = np.zeros(self.m, dtype=np.float64)
        vi = np.zeros(self.m, dtype=np.float64)
        kr, ki = _chirp_planes(sq, np.float64)
        vr[:m_], vi[:m_] = kr[:m_], ki[:m_]
        if n_ > 1:
            vr[-(n_ - 1):] = kr[1:n_][::-1]
            vi[-(n_ - 1):] = ki[1:n_][::-1]
        self._vhat = _fft.transform_split(
            self.inner,
            (jnp.asarray(vr.astype(self.dtype)),
             jnp.asarray(vi.astype(self.dtype))),
            _plan.FORWARD)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"CztPlan(n={self.n}, m={self.m_out}, w={self.w_phase!r}, "
                f"a={self.a_phase!r}, {self.dtype.name})")


@functools.lru_cache(maxsize=256)
def _jitted_czt(cplan: CztPlan, ekey=None):
    n, m_out, m = cplan.n, cplan.m_out, cplan.m
    inner = cplan.inner
    inv_m = 1.0 / m

    def fn(re, im, pr, pi, vr, vi, qr, qi):
        ar, ai = _split.split_mul((re, im), (pr, pi))
        pad = [(0, 0)] * (ar.ndim - 1) + [(0, m - n)]
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)
        sr, si = _fft.transform_split(inner, (ar, ai), _plan.FORWARD)
        sr, si = _split.split_mul((sr, si), (vr, vi))
        cr, ci = _fft.transform_split(inner, (sr, si), _plan.BACKWARD)
        cr = cr[..., :m_out] * inv_m
        ci = ci[..., :m_out] * inv_m
        return _split.split_mul((cr, ci), (qr, qi))

    return jax.jit(fn)


def czt_split(cplan: CztPlan, x):
    """Split-format CZT: (re, im) planes [..., n] -> (re, im) [..., m]."""

    re, im = x
    re = jnp.asarray(re, dtype=cplan.dtype.type)
    im = jnp.asarray(im, dtype=cplan.dtype.type)
    if re.shape[-1] != cplan.n:
        raise ValueError(f"last axis must be n={cplan.n}, got {re.shape[-1]}")
    pr, pi = cplan._pre
    vr, vi = cplan._vhat
    qr, qi = cplan._post
    return _jitted_czt(cplan, _dispatch.state_key())(
        re, im, pr, pi, vr, vi, qr, qi)


def czt(cplan: CztPlan, x):
    """Complex-dtype CZT convenience (CPU-side sugar)."""

    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = x.astype(cplan.dtype.type) + 0j
    rr, ri = czt_split(cplan, (x.real, x.imag))
    return rr + 1j * ri


def zoom_fft_setup(n: int, fn, m: int | None = None, *, fs: float = 2.0,
                   endpoint: bool = False, dtype="float32") -> CztPlan:
    """Spectral-zoom plan (scipy.signal.zoom_fft conventions).

    Evaluates the DTFT of an n-sample signal at m frequencies spanning
    [f0, f1] (``fn`` scalar means [0, fn]) for sample rate ``fs``:
    bin k sits at f0 + k*(f1-f0)/m (or /(m-1) with endpoint=True).
    """

    if np.ndim(fn) == 0:
        f0, f1 = 0.0, float(fn)
    else:
        f0, f1 = (float(v) for v in fn)
    m = int(m) if m is not None else int(n)
    step = (f1 - f0) / (m - 1 if endpoint and m > 1 else m)
    return CztPlan(n, m, w_phase=step / fs, a_phase=f0 / fs, dtype=dtype)


def zoom_fft(x, fn, m: int | None = None, *, fs: float = 2.0,
             endpoint: bool = False, dtype="float32"):
    """One-shot spectral zoom of x along its last axis (complex out)."""

    x = jnp.asarray(x)
    cplan = _zoom_cached(int(x.shape[-1]),
                         float(fn) if np.ndim(fn) == 0 else (float(fn[0]), float(fn[1])),
                         None if m is None else int(m), float(fs),
                         bool(endpoint), np.dtype(dtype).name)
    return czt(cplan, x)


@functools.lru_cache(maxsize=64)
def _zoom_cached(n, fn, m, fs, endpoint, dtype) -> CztPlan:
    return zoom_fft_setup(n, fn, m, fs=fs, endpoint=endpoint, dtype=dtype)
