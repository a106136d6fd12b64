"""Device DCT/DST transforms through the batched FFT engine.

The reference carries DCT/DST only inside its FFTPACK oracle
(cost/sint/cosqf/..., /root/reference/src/fftpack.h:72-86); here they are
first-class batched device transforms built on the split-format engine, so
they run on TPU (no complex dtypes; all reorderings are slice/flip/concat
constructions, no gathers).

Conventions match FFTPACK / pffft_tpu.oracle exactly (unnormalized):

  dct1 (cost): X[k] = x[0] + (-1)^k x[N-1] + 2 sum_{0<j<N-1} x[j] cos(pi j k/(N-1))
  dst1 (sint): X[k] = 2 sum_j x[j] sin(pi (j+1)(k+1)/(N+1))
  dct2 (cosqb): X[k] = 2 sum_j x[j] cos(pi k (2j+1) / 2N)
  dct3 (cosqf): X[k] = x[0] + 2 sum_{j>=1} x[j] cos(pi j (2k+1) / 2N)
  dst2 (sinqb): X[k] = 2 sum_j x[j] sin(pi (k+1)(2j+1) / 2N)
  dst3 (sinqf): X[k] = (-1)^k x[N-1] + 2 sum_{j<N-1} x[j] sin(pi (j+1)(2k+1)/2N)

Inverse pairs: dct1 involutary up to 2(N-1); dst1 up to 2(N+1);
dct3(dct2(x)) == dst3(dst2(x)) == 2N x.

Constructions (each verified against the oracle in tests/test_dct.py):
  dct1: N-term even extension -> 2(N-1)-point FFT real part.
  dst1: odd extension -> 2(N+1)-point FFT, -imag part.
  dct2: Makhoul even-odd permutation v = [x0, x2, .., x3, x1] ->
        N-point FFT -> modulate by e^{-i pi k/2N}.
  dct3: exact inverse of the dct2 construction (A[k] = x[k] - i x[N-k],
        V = e^{+i pi k/2N} A, unscaled backward FFT, un-permute).
  dst2(x) = flip(dct2(x * (-1)^n));  dst3(x) = (-1)^k * dct3(flip(x)).

Size support: ANY N.  Smooth internal FFT lengths (2(N-1), 2(N+1), N)
ride the stage engine; non-smooth ones fall back to the chirp-Z engine
(bluestein.py) — full parity with the FFTPACK oracle's any-N
cost/sint/cosq/sinq surface.  The Makhoul permutation and its inverse
are slice/concat constructions valid for any N, odd included.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import plan as _plan
from .ops import split as _split

__all__ = ["dct1", "dst1", "dct2", "dct3", "dst2", "dst3",
           "cost", "sint", "cosqb", "cosqf", "sinqb", "sinqf"]


def _cfft_split(re, im, n, dtype, backward=False):
    try:
        p = _plan.Plan.create(n, _plan.COMPLEX, np.dtype(dtype).name,
                              strict=False)
    except ValueError:
        # non-smooth internal length -> chirp-Z engine: the DCT/DST
        # constructions then accept ANY N (the FFTPACK oracle's parity)
        from . import bluestein as _bs

        bp = _bs.new_setup_any(n, _plan.COMPLEX, np.dtype(dtype).name)
        d = _plan.BACKWARD if backward else _plan.FORWARD
        return _bs.transform_any_split(bp, (re, im), d)
    return _split.cfft_plan_split(p, re, im, backward=backward, ordered=True)


@functools.lru_cache(maxsize=256)
def _halfsec_tables(n: int, dtype_str: str) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin(pi k / 2N) for k = 0..N-1 (float64 host conditioning)."""

    k = np.arange(n, dtype=np.float64)
    ang = np.pi * k / (2.0 * n)
    dt = np.dtype(dtype_str)
    return np.cos(ang).astype(dt), np.sin(ang).astype(dt)


def _sgn(n: int, dtype) -> jax.Array:
    return jnp.asarray(((-1.0) ** np.arange(n)).astype(np.dtype(dtype).name))


def dct1(x: jax.Array) -> jax.Array:
    """DCT-I (FFTPACK cost), batched over leading axes."""

    n = x.shape[-1]
    ext = jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)  # even extension, 2(N-1)
    re, _ = _cfft_split(ext, jnp.zeros_like(ext), 2 * (n - 1), x.dtype)
    return re[..., :n]


def dst1(x: jax.Array) -> jax.Array:
    """DST-I (FFTPACK sint), batched."""

    n = x.shape[-1]
    lead = x.shape[:-1]
    zero = jnp.zeros((*lead, 1), dtype=x.dtype)
    ext = jnp.concatenate([zero, x, zero, -x[..., ::-1]], axis=-1)  # 2(N+1)
    _, im = _cfft_split(ext, jnp.zeros_like(ext), 2 * (n + 1), x.dtype)
    return -im[..., 1 : n + 1]


def dct2(x: jax.Array) -> jax.Array:
    """DCT-II (FFTPACK cosqb), batched.  Any 2/3/5-smooth N: the Makhoul
    even-odd permutation [x0, x2, .., x_last_even, .., x3, x1] and the
    e^{-i pi k/2N} modulation are valid for odd N too (odd N just makes
    the even-index half one element longer)."""

    n = x.shape[-1]
    v = jnp.concatenate([x[..., 0::2], x[..., 1::2][..., ::-1]], axis=-1)
    vr, vi = _cfft_split(v, jnp.zeros_like(v), n, x.dtype)
    cr, sr = _halfsec_tables(n, np.dtype(x.dtype).name)
    # C[k] = 2 Re(e^{-i pi k/2N} V[k]) = 2 (cos*Re + sin*Im)
    return 2.0 * (jnp.asarray(cr) * vr + jnp.asarray(sr) * vi)


def dct3(x: jax.Array) -> jax.Array:
    """DCT-III (FFTPACK cosqf), batched; dct3(dct2(x)) == 2N x.  Any
    2/3/5-smooth N (see dct2; the un-permute interleave handles the odd
    case's extra even-index element)."""

    n = x.shape[-1]
    cr, sr = _halfsec_tables(n, np.dtype(x.dtype).name)
    cr = jnp.asarray(cr)
    sr = jnp.asarray(sr)
    # A[k] = x[k] - i x[N-k] (x[N] := 0);  V[k] = e^{+i pi k/2N} A[k]
    xs = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :0:-1]], axis=-1)
    vr = cr * x + sr * xs
    vi = sr * x - cr * xs
    br, _ = _cfft_split(vr, vi, n, x.dtype, backward=True)  # unscaled IDFT * N
    # un-permute: out[2j] = v[j] (ceil(N/2) terms), out[2j+1] = v[N-1-j]
    nh = (n + 1) // 2
    ev = br[..., :nh]
    od = br[..., nh:][..., ::-1]
    pairs = jnp.stack([ev[..., : n // 2], od], axis=-1).reshape(
        *x.shape[:-1], 2 * (n // 2)
    )
    if n % 2 == 0:
        return pairs
    return jnp.concatenate([pairs, ev[..., -1:]], axis=-1)


def dst2(x: jax.Array) -> jax.Array:
    """DST-II (FFTPACK sinqb): dst2(x) = flip(dct2(x * (-1)^n))."""

    n = x.shape[-1]
    return dct2(x * _sgn(n, x.dtype))[..., ::-1]


def dst3(x: jax.Array) -> jax.Array:
    """DST-III (FFTPACK sinqf): dst3(x) = (-1)^k * dct3(flip(x))."""

    n = x.shape[-1]
    return _sgn(n, x.dtype) * dct3(x[..., ::-1])


# FFTPACK names.  cosqf/sinqf are exactly DCT-III/DST-III; the backward
# quarter-wave transforms carry FFTPACK's factor 4 so cosqb(cosqf(x)) ==
# 4N*x (fftpack.h cosqb/sinqb docs; cross-validated vs scipy.fftpack in
# tests/test_oracle_scipy.py).
cost = dct1
sint = dst1
cosqf = dct3
sinqf = dst3


def cosqb(x: jax.Array) -> jax.Array:
    """FFTPACK cosqb = 2 * DCT-II (roundtrip cosqb(cosqf(x)) == 4N x)."""

    return 2.0 * dct2(x)


def sinqb(x: jax.Array) -> jax.Array:
    """FFTPACK sinqb = 2 * DST-II (roundtrip sinqb(sinqf(x)) == 4N x)."""

    return 2.0 * dst2(x)
