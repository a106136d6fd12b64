"""Split-format (planar re/im) complex arithmetic + FFT stage engine.

The TPU compute path works on PAIRS of real arrays instead of complex
dtypes, for two reasons:

  1. TPU-native design: the MXU multiplies real matrices; a complex
     contraction is 4 real contractions, and planar re/im keeps every
     elementwise op a clean VPU op.  This is the direct analog of the
     reference's choice to hand-roll VCPLXMUL over real SIMD lanes instead
     of using C99 _Complex (/root/reference/src/simd/pf_float.h:75-81).
  2. The axon TPU runtime used for benching does not implement complex
     dtypes at all; split format is the only executable representation.

The complex-dtype engine in stages.py delegates here, so the CPU test
suite (which runs the complex API) exercises exactly the arithmetic the
TPU runs.

A split pair is a tuple ``(re, im)`` of equal-shape float arrays.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST  # fp32 MXU passes; bf16 default would
# break the 140 dB dynamic-range bound of tests/test_pffft.c:52-61.

SplitPair = Tuple[jax.Array, jax.Array]


def to_split(x: jax.Array) -> SplitPair:
    """Complex array -> (re, im) planes."""

    return jnp.real(x), jnp.imag(x)


def from_split(p: SplitPair, cdtype=None) -> jax.Array:
    re, im = p
    z = jax.lax.complex(re, im)
    return z.astype(cdtype) if cdtype is not None else z


def split_mul(a: SplitPair, b: SplitPair) -> SplitPair:
    """(a.re + i a.im) * (b.re + i b.im), elementwise."""

    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def split_conj_mul(a: SplitPair, b: SplitPair) -> SplitPair:
    """a * conj(b), elementwise (VCPLXMULCONJ analog, pf_float.h:79)."""

    ar, ai = a
    br, bi = b
    return ar * br + ai * bi, ai * br - ar * bi


@functools.lru_cache(maxsize=4096)
def _stage_consts(stage, backward: bool):
    """Host-side split of a stage's complex tables (cached per plan stage)."""

    dft = stage.dft
    tw = stage.twiddle
    if backward:
        dft = np.conj(dft)
        tw = np.conj(tw)
    return (
        np.ascontiguousarray(dft.real),
        np.ascontiguousarray(dft.imag),
        np.ascontiguousarray(tw.real),
        np.ascontiguousarray(tw.imag),
    )


def cfft_stages_split(
    re: jax.Array,
    im: jax.Array,
    stages: Sequence,
    *,
    backward: bool,
    ordered: bool,
) -> SplitPair:
    """Run the staged complex FFT over the last axis, planar format.

    [..., N] x2 -> [..., N] x2.  Same Stockham derivation as stages.py;
    unscaled in both directions (pffft.h:134).
    """

    lead = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    ar = re.reshape(b, 1, n)
    ai = im.reshape(b, 1, n)
    nstages = len(stages)
    for idx, st in enumerate(stages):
        l, r, m = st.l, st.r, st.m
        if r == 1:
            continue
        dr, di, twr, twi = _stage_consts(st, backward)
        ar = ar.reshape(b, l, r, m)
        ai = ai.reshape(b, l, r, m)
        if l > 1:
            wr = jnp.asarray(twr, dtype=ar.dtype)[None, :, :, None]
            wi = jnp.asarray(twi, dtype=ar.dtype)[None, :, :, None]
            ar, ai = ar * wr - ai * wi, ar * wi + ai * wr
        last = idx == nstages - 1
        sub = "blrm,rt->bltm" if (last and not ordered) else "blrm,rt->btlm"
        jdr = jnp.asarray(dr, dtype=ar.dtype)
        jdi = jnp.asarray(di, dtype=ar.dtype)
        nr = (
            jnp.einsum(sub, ar, jdr, precision=_PRECISION)
            - jnp.einsum(sub, ai, jdi, precision=_PRECISION)
        )
        ni = (
            jnp.einsum(sub, ar, jdi, precision=_PRECISION)
            + jnp.einsum(sub, ai, jdr, precision=_PRECISION)
        )
        shape = (b, l * r, m)
        ar, ai = nr.reshape(shape), ni.reshape(shape)
    return ar.reshape(*lead, n), ai.reshape(*lead, n)


@functools.lru_cache(maxsize=256)
def _split_tw_consts(key, backward: bool):
    tw = key.a
    if backward:
        tw = np.conj(tw)
    return np.ascontiguousarray(tw.real), np.ascontiguousarray(tw.imag)


def cfft_plan_split(
    plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool,
    ordered: bool,
) -> SplitPair:
    """Plan-level complex FFT over the last axis, planar format.

    Dispatches between the stage-chain engine and the plan's local
    four-step split (plan.local_split): N = N1*N2 as two sub-FFT phases
    around on-chip transposes — the single-chip miniature of
    parallel/fourstep.py, chosen on TPU for engine_n beyond two fat stages
    (measured ~2x at N=65536).  Layout contract matches the 2-stage chain
    with factors (N1, N2): ordered = canonical bins, internal = k1-major.
    """

    if plan.local_split is None:
        return cfft_stages_split(re, im, plan.stages, backward=backward, ordered=ordered)

    p1, p2, tw = plan.local_split
    n1, n2 = plan.factors
    lead = re.shape[:-1]
    twr_np, twi_np = _split_tw_consts(_HashableArray(tw), backward)
    twr = jnp.asarray(twr_np, dtype=re.dtype)
    twi = jnp.asarray(twi_np, dtype=re.dtype)

    def fft_axis2(ar, ai, sub, bwd):
        # FFT along axis -2 via transpose (on-chip relayout, XLA-fused)
        ar = jnp.swapaxes(ar, -1, -2)
        ai = jnp.swapaxes(ai, -1, -2)
        ar, ai = cfft_plan_split(sub, ar, ai, backward=bwd, ordered=True)
        return jnp.swapaxes(ar, -1, -2), jnp.swapaxes(ai, -1, -2)

    if not backward:
        ar = re.reshape(*lead, n1, n2)
        ai = im.reshape(*lead, n1, n2)
        ar, ai = fft_axis2(ar, ai, p1, False)      # column FFTs over n1
        ar, ai = ar * twr - ai * twi, ar * twi + ai * twr
        ar, ai = cfft_plan_split(p2, ar, ai, backward=False, ordered=True)  # rows
        if ordered:                                 # Y[k1,k2] -> k = k1 + n1*k2
            ar = jnp.swapaxes(ar, -1, -2)
            ai = jnp.swapaxes(ai, -1, -2)
        return ar.reshape(*lead, plan.engine_n), ai.reshape(*lead, plan.engine_n)

    # backward: exact mirror
    if ordered:
        ar = re.reshape(*lead, n2, n1)
        ai = im.reshape(*lead, n2, n1)
        ar = jnp.swapaxes(ar, -1, -2)
        ai = jnp.swapaxes(ai, -1, -2)
    else:
        ar = re.reshape(*lead, n1, n2)
        ai = im.reshape(*lead, n1, n2)
    ar, ai = cfft_plan_split(p2, ar, ai, backward=True, ordered=True)  # rows
    ar, ai = ar * twr - ai * twi, ar * twi + ai * twr  # conj(tw) folded in consts
    ar, ai = fft_axis2(ar, ai, p1, True)                # column IFFTs
    return ar.reshape(*lead, plan.engine_n), ai.reshape(*lead, plan.engine_n)


# ---------------------------------------------------------------------------
# Real transform split steps (planar mirror of ops/real.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=512)
def _real_tw_consts(key):
    # key is the id-carrying tuple (ndarray wrapped) -- see caller
    tw = key[0]
    return np.ascontiguousarray(tw.real), np.ascontiguousarray(tw.imag)


class _HashableArray:
    """Identity-hash wrapper so lru_cache can key on a numpy table."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def __hash__(self):
        return id(self.a)

    def __eq__(self, other):
        return isinstance(other, _HashableArray) and other.a is self.a

    def __getitem__(self, i):
        return self.a if i == 0 else None


def _split_real_tw(real_twiddle: np.ndarray):
    return _real_tw_consts(_HashableArray(real_twiddle))


def _reverse_conj_split(zr: jax.Array, zi: jax.Array) -> SplitPair:
    """y[k] = conj(z[(H - k) mod H]) along the last axis.

    roll(flip(z), 1) == [z0, z_{H-1}, .., z1], built from slices+concat.
    """

    return (
        jnp.concatenate([zr[..., 0:1], zr[..., :0:-1]], axis=-1),
        -jnp.concatenate([zi[..., 0:1], zi[..., :0:-1]], axis=-1),
    )


def pack_real_input_split(x: jax.Array) -> SplitPair:
    """[..., N] real -> planar [..., N/2]: z[m] = x[2m] + i x[2m+1]."""

    lead = x.shape[:-1]
    n = x.shape[-1]
    xz = x.reshape(*lead, n // 2, 2)
    return xz[..., 0], xz[..., 1]


def _set_bin0(x: jax.Array, v: jax.Array) -> jax.Array:
    """x.at[..., 0].set(v) as a slice+concat (scatters serialize on TPU)."""

    return jnp.concatenate([v[..., None], x[..., 1:]], axis=-1)


def real_forward_split_planar(zr, zi, real_twiddle: np.ndarray) -> SplitPair:
    """Planar mirror of ops/real.py real_forward_split (pffft bin0 packing)."""

    cr, ci = _reverse_conj_split(zr, zi)
    er, ei = 0.5 * (zr + cr), 0.5 * (zi + ci)
    # o = -0.5j (z - zc):  or = 0.5*(zi - ci), oi = -0.5*(zr - cr)
    orr, oi = 0.5 * (zi - ci), -0.5 * (zr - cr)
    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=zr.dtype)
    wi = jnp.asarray(twi, dtype=zr.dtype)
    xr = er + wr * orr - wi * oi
    xi = ei + wr * oi + wi * orr
    dc = zr[..., 0] + zi[..., 0]
    nyq = zr[..., 0] - zi[..., 0]
    return _set_bin0(xr, dc), _set_bin0(xi, nyq)


def real_backward_split_planar(sr, si, real_twiddle: np.ndarray) -> SplitPair:
    """Planar mirror of ops/real.py real_backward_split (returns 2*Z)."""

    dc = sr[..., 0]
    nyq = si[..., 0]
    zero = jnp.zeros_like(nyq)
    xar = sr  # Re xa[0] == dc already
    xai = _set_bin0(si, zero)
    # xb = roll(flip(xa), 1) with xb[0] overridden: build by concat directly
    xbr = jnp.concatenate([nyq[..., None], xar[..., :0:-1]], axis=-1)
    xbi = jnp.concatenate([zero[..., None], xai[..., :0:-1]], axis=-1)
    # xbc = conj(xb)
    er, ei = xar + xbr, xai - xbi
    dr, di = xar - xbr, xai + xbi
    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=sr.dtype)
    wi = jnp.asarray(twi, dtype=sr.dtype)
    # o = conj(w) * d
    orr = wr * dr + wi * di
    oi = wr * di - wi * dr
    # z2 = e + i*o
    return er - oi, ei + orr


def interleave_to_real_split(wr: jax.Array, wi: jax.Array) -> jax.Array:
    """Planar [..., H] x2 -> [..., N] real: x[2m] = re, x[2m+1] = im."""

    lead = wr.shape[:-1]
    h = wr.shape[-1]
    return jnp.stack([wr, wi], axis=-1).reshape(*lead, 2 * h)
