"""Double-float (two-float32) FFT engine for the TPU MXU.

The reference ships a full-speed double engine (pffft_double.c:113-145 with
the 4-lane AVX kernels in simd/pf_avx_double.h); this backend has no hardware
f64 — XLA soft-floats it at 2-4 GF/s (sweep_r4_f64.csv), ~300x below the f32
engine.  This module gives the pffftd_ surface a native-speed path:

  * Each plane is an unevaluated f32 PAIR (hi, lo) — hi = f32(x),
    lo = f32(x - hi) — carrying a ~49-bit significand (2^-49 ~ 1.8e-15,
    comfortably past the 215 dB / 1.8e-11 accuracy bound and at the same
    level as the f64 soft-float path's measured 3.9e-15).

  * Stage contractions run on the MXU via an Ozaki-style EXACT-slice
    scheme.  Plain bf16 chunking cannot exceed f32 accuracy (the leading
    chunk product's f32 accumulation/output rounding is ~2^-24 of the
    result), so the slices are EXPONENT-ALIGNED fixed-point digits:
    every operand row (over the contraction axis) is normalized by its
    max-exponent power of two, then peeled into 7-bit slices on a common
    grid.  Slice x slice products have <= 15 significant bits on a shared
    grid, so the MXU's f32 accumulation over r <= 512 terms is EXACT
    (15 + 9 < 24 bits) — each cross-term matmul contributes NO rounding.
    Only the truncation tail (terms with i + j >= TAU, ~2^-7*TAU) and the
    final double-float accumulation (~2^-49) remain.

  * Twiddles apply on the VPU in Dekker/Knuth double-float arithmetic
    (TwoSum / Veltkamp split / TwoProd — no FMA needed).

Cost model: TAU=7 keeps 28 one-pass bf16 matmuls per stage vs the f32
engine's 18 effective bf16 passes (3 Gauss einsums x 6-pass HIGHEST) —
~1.6x the f32 MXU work for ~49-bit accuracy, vs ~300x for soft-float.

Layout/semantics mirror ops/split.py's batch-major ordered chain
(cfft_stages_split): planar [..., N] pairs in, ordered spectrum out,
unscaled in both directions (pffft.h:134).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "df_from_f64",
    "df_to_f64",
    "df64_cfft_split",
    "DF_CHUNKS",
    "MAT_CHUNKS",
    "TAU",
]

_W = 7  # slice width in bits (7-bit digits keep products exact in bf16)


def _slice_dtype():
    """bf16 on TPU (the one-pass MXU mode); f32 elsewhere (CPU XLA has no
    BF16xBF16=F32 dot).  Exactness is identical — slices carry <= 8
    significant bits either way."""

    return (
        jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    )
import os as _os

# Slice/term budget.  Default TAU=6 (21 matmuls/stage) measured on chip:
# 242.1 dB at N=4096, 240.2 at 32768, 239.2 at 262144 (df64b_r5.txt,
# df64c_r5.txt) — a stable ~24 dB margin over the 215 dB f64 bound at
# 1.15-1.27x the TAU=7 throughput.  PFFFT_TPU_DF64_TAU=7 (28 matmuls)
# restores the ~281 dB setting; TAU=5 measures 197.7 dB and FAILS the
# bound.  DF_CHUNKS=6 matches (the tail is tau-limited: 6/6 and 6/7
# measure the same 242.1 dB; 6/6 peels one fewer digit).
DF_CHUNKS = int(_os.environ.get("PFFFT_TPU_DF64_CHUNKS", "6"))
MAT_CHUNKS = max(DF_CHUNKS, 8)  # matrix slices (host f64 tables): 56 bits
TAU = int(_os.environ.get("PFFFT_TPU_DF64_TAU", "6"))


# ---------------------------------------------------------------------------
# Double-float VPU primitives (error-free transforms, no FMA)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly."""

    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _fast_two_sum(a, b):
    """Dekker FastTwoSum (requires |a| >= |b| or same exponent class)."""

    s = a + b
    return s, b - (s - a)


def _vsplit(a):
    """Veltkamp split of f32 into two 12-bit halves (exact product parts)."""

    c = a * 4097.0  # 2^12 + 1
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (f32, no FMA)."""

    p = a * b
    ah, al = _vsplit(a)
    bh, bl = _vsplit(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_add(x, y):
    """(h, l) + (h, l) -> (h, l), ~2 ulp."""

    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _fast_two_sum(s, e)


def df_add_f32(x, b):
    """(h, l) + f32 -> (h, l)."""

    s, e = _two_sum(x[0], b)
    return _fast_two_sum(s, e + x[1])


def df_mul(x, y):
    """(h, l) * (h, l) -> (h, l)."""

    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _fast_two_sum(p, e)


def df_neg(x):
    return -x[0], -x[1]


def _df_cmul(ar, ai, wr, wi):
    """Complex double-float multiply: (ar + i ai) * (wr + i wi).

    Each operand is an (h, l) pair; 4 df_mul + 2 df_add (the 4-mul form —
    Gauss saves nothing here since df_add costs like df_mul)."""

    rr = df_add(df_mul(ar, wr), df_neg(df_mul(ai, wi)))
    ri = df_add(df_mul(ar, wi), df_mul(ai, wr))
    return rr, ri


def _df_prod_const(zh, zhh, zhl, zl, w):
    """z * w for a CONSTANT w = (wh, wl, whh, whl) with the Veltkamp
    split of wh precomputed host-side and the split of zh shared by the
    caller across products: p + e ~ z*w to df accuracy."""

    wh, wl, whh, whl = w
    p = zh * wh
    e = ((zhh * whh - p) + zhh * whl + zhl * whh) + zhl * whl
    e = e + (zh * wl + zl * wh)
    return _fast_two_sum(p, e)


def _df_cmul_const(ar, ai, wr4, wi4):
    """Complex df multiply by a CONSTANT twiddle: the zh Veltkamp splits
    are computed once per operand (not once per product) and the
    constant-side splits come precomputed — ~40% fewer VPU ops than the
    generic 4x df_mul form."""

    arh, arl = ar
    aih, ail = ai
    arhh, arhl = _vsplit(arh)
    aihh, aihl = _vsplit(aih)
    t1 = _df_prod_const(arh, arhh, arhl, arl, wr4)  # ar*wr
    t2 = _df_prod_const(aih, aihh, aihl, ail, wi4)  # ai*wi
    t3 = _df_prod_const(arh, arhh, arhl, arl, wi4)  # ar*wi
    t4 = _df_prod_const(aih, aihh, aihl, ail, wr4)  # ai*wr
    rr = df_add(t1, df_neg(t2))
    ri = df_add(t3, t4)
    return rr, ri


# ---------------------------------------------------------------------------
# Exponent-aligned slice peeling (the exact-product Ozaki step)
# ---------------------------------------------------------------------------


def _peel_aligned(
    h: jax.Array, l: jax.Array, axis: int, k: int
) -> Tuple[List[jax.Array], jax.Array]:
    """Split an (hi, lo) f32 pair into k exponent-aligned bf16 slices.

    Normalizes each row (over ``axis``, the contraction axis) by the
    power of two just above its max magnitude, then peels round-to-nearest
    7-bit digits on the common grid 2^(-7(i+1)).  Every peel subtraction
    is exact; each slice has <= 8 significant bits (round-up margin), so
    slice x slice MXU products are exact on a shared grid.

    Returns (slices, scale) with sum(slices) * scale ~ h + l (tail
    2^-7k)."""

    m = jnp.max(jnp.abs(h), axis=axis, keepdims=True)
    # scale = 2^(e+1) with m = frexp-mantissa * 2^e: normalized rows
    # land in [0, 1/2], so digit 0 has <= 7 significant bits (1 carry
    # bit of margin on top keeps every slice bf16-exact).
    _, e = jnp.frexp(m)
    scale = jnp.exp2(e.astype(h.dtype))
    inv = jnp.where(m > 0, 1.0 / scale, 1.0)
    # hi and lo peel SEPARATELY on the shared grid (hi*inv + lo*inv
    # would round lo away); per-grid digits then merge exactly (both
    # are grid multiples, sum <= 8 significant bits).
    rh = h * inv  # exact: * by a power of two
    rl = l * inv
    out = []
    for i in range(k):
        g = float(2.0 ** (_W * (i + 1)))
        ch = jnp.round(rh * g) / g
        cl = jnp.round(rl * g) / g
        rh = rh - ch  # exact: c is r rounded to a coarser aligned grid
        rl = rl - cl
        out.append((ch + cl).astype(_slice_dtype()))
    return out, scale


def _peel_aligned_host(a: np.ndarray, axis: int, k: int):
    """Host-side exact aligned peeling of an f64 table (numpy mirror)."""

    a = np.asarray(a, dtype=np.float64)
    m = np.max(np.abs(a), axis=axis, keepdims=True)
    _, e = np.frexp(m)
    scale = np.exp2(e.astype(np.float64))
    r = np.where(m > 0, a / scale, a)
    out = []
    for i in range(k):
        g = 2.0 ** (_W * (i + 1))
        c = np.round(r * g) / g
        out.append(c.astype(np.float32))  # <= 8 significant bits: exact
        r = r - c
    return out, scale.astype(np.float32)


def df_from_f64(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host split of an f64 array into an (hi, lo) f32 pair."""

    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to_f64(h, l) -> np.ndarray:
    return np.asarray(h, dtype=np.float64) + np.asarray(l, dtype=np.float64)


# ---------------------------------------------------------------------------
# Chunked MXU contraction
# ---------------------------------------------------------------------------


def _df_contract(
    x_sl: Sequence[jax.Array],
    x_scale: jax.Array,
    m_sl: Sequence[np.ndarray],
    m_scale: np.ndarray,
    sub: str,
    tau: int,
):
    """y = x @ M in double-float via exact aligned-slice cross products.

    Terms with the same level s = i + j share the grid 2^(-7(s+2)), so
    the in-level f32 adds are (near-)exact; levels then accumulate in
    double-float from the largest scale down.  The row/column scales are
    powers of two — reapplying them is exact."""

    levels = []
    for s in range(tau):
        acc = None
        for i in range(min(s + 1, len(x_sl))):
            j = s - i
            if j >= len(m_sl):
                continue
            t = jnp.einsum(
                sub,
                x_sl[i],
                jnp.asarray(m_sl[j], dtype=_slice_dtype()),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
        if acc is not None:
            levels.append(acc)
    # output of 'blrm,rt->btlm': [b, t, l, m]; x_scale is [b, l, 1, m]
    # (keepdims over r), m_scale is [1, t] (keepdims over r)
    sx = jnp.transpose(x_scale, (0, 2, 1, 3))  # -> [b, 1, l, m]
    sm = jnp.asarray(m_scale.reshape(1, -1, 1, 1))
    s_all = sx * sm  # exact: product of powers of two
    levels = [lv * s_all for lv in levels]
    h, l = levels[0], jnp.zeros_like(levels[0])
    for lev in levels[1:]:
        h, l = df_add_f32((h, l), lev)
    return h, l


# ---------------------------------------------------------------------------
# Host-side per-stage tables (f64 -> aligned slices / df pairs)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _stage_mat_slices(stage, backward: bool):
    """Aligned slices of the [2r, 2t] concat-form contraction matrix
    [[Dr, Di], [-Di, Dr]] built from the stage's f64 DFT table."""

    dft = np.asarray(stage.dft, dtype=np.complex128)
    if backward:
        dft = np.conj(dft)
    dr, di = dft.real, dft.imag
    m = np.block([[dr, di], [-di, dr]])
    sl, scale = _peel_aligned_host(m, 0, MAT_CHUNKS)
    return tuple(sl), scale  # scale: [1, 2t]


def _vsplit_host(a: np.ndarray):
    """Host mirror of the device Veltkamp split (f32 arithmetic)."""

    a = np.asarray(a, dtype=np.float32)
    c = (a * np.float32(4097.0)).astype(np.float32)
    hi = (c - (c - a)).astype(np.float32)
    return hi, (a - hi).astype(np.float32)


@functools.lru_cache(maxsize=1024)
def _stage_tw_df(stage, backward: bool):
    """Dense [l, r] twiddle table as (wh, wl, whh, whl) f32 4-tuples per
    re/im plane — the hi part's Veltkamp split precomputed host-side for
    the constant-twiddle complex multiply."""

    tw = np.asarray(stage.twiddle, dtype=np.complex128)
    if backward:
        tw = np.conj(tw)
    out = []
    for part in (tw.real, tw.imag):
        wh, wl = df_from_f64(part)
        whh, whl = _vsplit_host(wh)
        out.append((wh, wl, whh, whl))
    return tuple(out)


# ---------------------------------------------------------------------------
# The chain
# ---------------------------------------------------------------------------


def df64_cfft_split(
    re: Tuple[jax.Array, jax.Array],
    im: Tuple[jax.Array, jax.Array],
    stages: Sequence,
    *,
    backward: bool,
) -> Tuple[Tuple[jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Ordered batch-major complex FFT over the last axis, df64 planes.

    re/im are (hi, lo) f32 pairs shaped [..., N]; returns the same
    structure holding the ordered spectrum (unscaled both directions,
    pffft.h:134).  Semantics mirror ops/split.cfft_stages_split's
    ordered 'blrm,rt->btlm' Stockham chain."""

    arh, arl = re
    aih, ail = im
    lead = arh.shape[:-1]
    n = arh.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    shape = (b, 1, n)
    arh, arl = arh.reshape(shape), arl.reshape(shape)
    aih, ail = aih.reshape(shape), ail.reshape(shape)
    for st in stages:
        l, r, m = st.l, st.r, st.m
        if r == 1:
            continue
        s4 = (b, l, r, m)
        arh, arl = arh.reshape(s4), arl.reshape(s4)
        aih, ail = aih.reshape(s4), ail.reshape(s4)
        if l > 1:
            (twr, twi) = _stage_tw_df(st, backward)
            wsh = (1, l, r, 1)
            wr4 = tuple(jnp.asarray(t).reshape(wsh) for t in twr)
            wi4 = tuple(jnp.asarray(t).reshape(wsh) for t in twi)
            (arh, arl), (aih, ail) = _df_cmul_const(
                (arh, arl), (aih, ail), wr4, wi4
            )
        # concat re/im along the r axis -> one [2r, 2t] contraction
        xh = jnp.concatenate([arh, aih], axis=2)
        xl = jnp.concatenate([arl, ail], axis=2)
        x_sl, x_scale = _peel_aligned(xh, xl, 2, DF_CHUNKS)
        m_sl, m_scale = _stage_mat_slices(st, backward)
        yh, yl = _df_contract(
            x_sl, x_scale, m_sl, m_scale, "blrm,rt->btlm", TAU
        )
        t = r
        arh, arl = yh[:, :t], yl[:, :t]
        aih, ail = yh[:, t:], yl[:, t:]
        ns = (b, l * r, m)
        arh, arl = arh.reshape(ns), arl.reshape(ns)
        aih, ail = aih.reshape(ns), ail.reshape(ns)
    out = (*lead, n)
    return (
        (arh.reshape(out), arl.reshape(out)),
        (aih.reshape(out), ail.reshape(out)),
    )
