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


# Above this many elements a twiddle table is factored into split tables
# T[k, i] = A[k_hi, i] * B[k_lo, i] (k = k_hi*_TW_SPLIT_LO + k_lo) instead
# of being embedded whole: giant jit constants blow the axon HTTP compile
# limit (CLAUDE.md: HTTP 413) and cost an N-sized HBM read per stage,
# while the split factors are KB-sized and the product fuses into the
# elementwise consumer.  Exponents reduce exactly in integers host-side,
# so A*B == T up to one extra f32/f64 rounding.
_TW_SPLIT_MIN = 1 << 21
_TW_SPLIT_LO = 128


@functools.lru_cache(maxsize=4096)
def _stage_consts(stage, backward: bool):
    """Host-side split of a stage's complex tables (cached per plan stage).

    Returns (dft_re, dft_im, dft_sum, dft_diff, tw) where ``dft_sum = re +
    im`` and ``dft_diff = im - re`` are the precombined matrices of Gauss's
    3-multiplication complex product (see :func:`_contract_stage`), and
    ``tw`` is either ("dense", re, im) or ("split", lo, Ar, Ai, Br, Bi)
    per the size policy above.
    """

    dft = stage.dft
    if backward:
        dft = np.conj(dft)
    dr = np.ascontiguousarray(dft.real)
    di = np.ascontiguousarray(dft.imag)
    tw = stage.twiddle  # stored forward-sign; the builder conjugates
    twc = _tw_consts_from_table(tw, tw.shape[0] * tw.shape[1], backward)
    return (
        dr,
        di,
        np.ascontiguousarray(dr + di),
        np.ascontiguousarray(di - dr),
        twc,
    )


def _tw_consts_from_table(tw: np.ndarray, period: int, backward: bool):
    """Dense or split constants for a product-exponent table
    T[a, b] = exp(-2i pi a b / period) (already conjugated if the stored
    table carries the backward sign — ``backward`` conjugates here)."""

    if backward:
        tw = np.conj(tw)
    l, r = tw.shape
    if l * r >= _TW_SPLIT_MIN and l % _TW_SPLIT_LO == 0:
        lo = _TW_SPLIT_LO
        sign = 1 if backward else -1
        hi_k = (np.arange(l // lo, dtype=np.int64)[:, None] * lo) % period
        lo_k = np.arange(lo, dtype=np.int64)[:, None]
        i = np.arange(r, dtype=np.int64)[None, :]
        ang_a = (2.0 * np.pi / period) * ((hi_k * i) % period).astype(np.float64)
        ang_b = (2.0 * np.pi / period) * ((lo_k * i) % period).astype(np.float64)
        dt = tw.real.dtype
        return (
            "split",
            lo,
            np.cos(ang_a).astype(dt), (np.sin(ang_a) * sign).astype(dt),
            np.cos(ang_b).astype(dt), (np.sin(ang_b) * sign).astype(dt),
        )
    return (
        "dense",
        np.ascontiguousarray(tw.real),
        np.ascontiguousarray(tw.imag),
    )


def cmul_mode() -> str:
    """Complex-contraction strategy: ``"gauss"`` (3 real matmuls via Gauss's
    trick), ``"4mul"`` (textbook 4 real matmuls), ``"concat"`` (one
    lane-concat real matmul [ar|ai] @ [[Wr,Wi],[-Wi,Wr]]), or ``"auto"``
    (per-stage: concat when r <= 64, else gauss).

    On the MXU each stage is HIGHEST-precision matmul-bound (6 bf16 passes
    per f32 matmul) and the systolic array contracts 128 lanes per pass, so
    a K<128 matmul pads its contraction dim and wastes the array.  Cost per
    element per stage in padded bf16 flops:

        gauss   3 matmuls * max(r, 128)   (k1=(ar+ai)Wre, k2, k3 — the
                TPU-era analog of the reference's VCPLXMUL hand-tuning,
                pf_float.h:75-81; 25% fewer MACs than 4mul pre-padding)
        concat  1 matmul  * max(2r, 128)  (full complex product in one
                K=2r contraction; for r <= 64 this is the ONLY form that
                fills all 128 MXU lanes: 3x less padded work than gauss)

    There is also ``"cstack"``: the stacked-channel chain engine
    (_cfft_stages_split_cstack) — one einsum per middle stage contracting
    (channel, r), no concat/slice relayout.

    Measured regime dependence (v5e, benchmarks/results/cstack_r3.txt +
    batch_r3.txt): in the HONEST large-payload plateau regime
    (>= 64 MB/plane, +-1% reproducible trials) gauss wins or ties every
    shape — concat is ~25% WORSE at (64,64) because its materialized
    concat+slice is real HBM traffic, and cstack ties gauss at r <= 128
    but loses at r = 256 and 3-stage chains (2 einsums at K=2r cost 4r
    vs gauss's 3r).  The concat advantages measured at 16-34 MB/plane
    payloads flip-flop between windows (that regime's timing is
    partially optimistic, CLAUDE.md payload law).  So the TPU default is
    GAUSS; ``auto`` (concat for r <= 64) remains selectable for
    small-payload streaming workloads.  Accuracy: all modes hold
    >= 150 dB carrier dynrange on-chip (bound 140).  Overridable via
    PFFFT_TPU_CMUL=gauss|4mul|concat|auto|cstack or set_cmul_mode.
    """

    if _CMUL_FORCED is not None:
        return _CMUL_FORCED
    import os

    env = os.environ.get("PFFFT_TPU_CMUL")
    if env in ("gauss", "4mul", "concat", "auto", "cstack"):
        return env
    # Backend policy, like plan.default_max_factor: gauss per the plateau
    # measurements above.  CPU keeps 4mul (true f32 FMA; Gauss's growth
    # costs ~1 bit and measured 139.4 dB at N=160 — just under the
    # reference's 140 dB carrier bound).
    return "gauss" if jax.default_backend() == "tpu" else "4mul"


_CMUL_FORCED = None

# spec2: transpose-free ordered 2-stage chain formulation (see
# _cfft_spec2_chain).  Measured (benchmarks/results/spec2_r3.txt):
# despite the anatomy probe suggesting the "->btlm" transposed write
# dominates, the full-transform A/B has the classic loop winning or
# tying every reproducible shape (6/6 at 65536-plateau, 0.149-vs-0.117
# at 16384) — XLA evidently schedules the transposed einsum write
# better than the decomposition implied.  Default OFF; selectable via
# PFFFT_TPU_SPEC2=1 / set_spec2 for layout experiments.
import os as _os

_SPEC2_ENABLED = _os.environ.get("PFFFT_TPU_SPEC2", "0") == "1"


def set_spec2(enabled: bool) -> None:
    global _SPEC2_ENABLED
    _SPEC2_ENABLED = bool(enabled)


# Inter-stage materialization barrier: the stage twiddle is an
# elementwise PRODUCER of the next stage's einsum operand; if XLA fuses
# it into the contraction it is recomputed per output tile read (the
# channelizer decomposition found a 2.7x composition blowup from this
# producer-into-contraction pattern, chan_decomp_r3.txt).  A
# lax.optimization_barrier after the twiddle forces one materialization.
# Default off pending the engine A/B (PFFFT_TPU_STAGE_BARRIER=1).
_STAGE_BARRIER = _os.environ.get("PFFFT_TPU_STAGE_BARRIER", "0") == "1"


def set_stage_barrier(enabled: bool) -> None:
    global _STAGE_BARRIER
    _STAGE_BARRIER = bool(enabled)


def set_cmul_mode(mode) -> None:
    global _CMUL_FORCED
    if mode not in (None, "gauss", "4mul", "concat", "auto", "cstack"):
        raise ValueError(f"unknown cmul mode {mode!r}")
    _CMUL_FORCED = mode


def _contract_stage(ar, ai, consts, sub: str) -> SplitPair:
    """One stage's complex DFT-matrix contraction, planar.

    ``sub`` is the full einsum subscript string contracting index ``r``
    against the [r, t] DFT matrix.  Uses Gauss's 3-multiplication form or
    the 4-multiplication form per :func:`cmul_mode`.
    """

    dr, di, dsum, ddiff, _ = consts
    mode = cmul_mode()
    if mode in ("auto", "cstack"):
        # cstack only changes the CHAIN engine's layout; paths that land
        # here (single-stage, spectator-axis, tmajor) use the auto rule
        mode = "concat" if dr.shape[0] <= 64 else "gauss"
    if mode == "concat":
        # One K=2r matmul: [.. ar|ai ..] @ [[Wr, Wi], [-Wi, Wr]] -> re|im
        # stacked along the output t axis.  For r <= 64 the doubled
        # contraction dim fills the 128-lane MXU that gauss/4mul would pad.
        in0 = sub.split(",", 1)[0]
        out = sub.split("->", 1)[1]
        r_ax, t_ax = in0.index("r"), out.index("t")
        t = dr.shape[1]
        m = jnp.asarray(
            np.block([[dr, di], [-di, dr]]), dtype=ar.dtype
        )
        y = jnp.einsum(sub, jnp.concatenate([ar, ai], axis=r_ax), m,
                       precision=_PRECISION)
        idx = [slice(None)] * y.ndim
        idx[t_ax] = slice(0, t)
        yr = y[tuple(idx)]
        idx[t_ax] = slice(t, 2 * t)
        return yr, y[tuple(idx)]
    if mode == "gauss":
        jdr = jnp.asarray(dr, dtype=ar.dtype)
        jdsum = jnp.asarray(dsum, dtype=ar.dtype)
        jddiff = jnp.asarray(ddiff, dtype=ar.dtype)
        k1 = jnp.einsum(sub, ar + ai, jdr, precision=_PRECISION)
        k2 = jnp.einsum(sub, ar, jddiff, precision=_PRECISION)
        k3 = jnp.einsum(sub, ai, jdsum, precision=_PRECISION)
        return k1 - k3, k1 + k2
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
    return nr, ni


def _apply_twiddle(ar, ai, twc, l_axis: int) -> SplitPair:
    """Elementwise product-twiddle multiply T[a, b] on axes (l_axis,
    l_axis+1) of planar data, where ``twc`` is the ("dense", ...) or
    ("split", ...) tuple from the table builders.

    Split form: the data's l-axis is viewed as (l_hi, lo) and two complex
    multiplies apply A[l_hi, r] then B[lo, r] — A*B == T exactly up to one
    rounding, with KB-sized constants instead of an l*r-sized table.
    """

    shape = ar.shape
    nd = len(shape)
    l_axis %= nd
    r_axis = l_axis + 1
    l, r = shape[l_axis], shape[r_axis]
    if twc[0] == "dense":
        _, twr, twi = twc
        b = [1] * nd
        b[l_axis], b[r_axis] = l, r
        wr = jnp.asarray(twr, dtype=ar.dtype).reshape(b)
        wi = jnp.asarray(twi, dtype=ar.dtype).reshape(b)
        return ar * wr - ai * wi, ar * wi + ai * wr
    _, lo, a_r, a_i, b_r, b_i = twc
    hi = l // lo
    ns = shape[:l_axis] + (hi, lo) + shape[l_axis + 1 :]
    xr = ar.reshape(ns)
    xi = ai.reshape(ns)
    ba = [1] * (nd + 1)
    ba[l_axis], ba[r_axis + 1] = hi, r
    bb = [1] * (nd + 1)
    bb[l_axis + 1], bb[r_axis + 1] = lo, r
    war = jnp.asarray(a_r, dtype=ar.dtype).reshape(ba)
    wai = jnp.asarray(a_i, dtype=ar.dtype).reshape(ba)
    wbr = jnp.asarray(b_r, dtype=ar.dtype).reshape(bb)
    wbi = jnp.asarray(b_i, dtype=ar.dtype).reshape(bb)
    xr, xi = xr * war - xi * wai, xr * wai + xi * war
    xr, xi = xr * wbr - xi * wbi, xr * wbi + xi * wbr
    return xr.reshape(shape), xi.reshape(shape)


@functools.lru_cache(maxsize=4096)
def _stage_cmatrix(stage, backward: bool):
    """[2, r, 2, t] complex-contraction tensor for the cstack engine:
    contracting (c, r) of a stacked planar array against this tensor is
    ONE K=2r matmul computing the full complex DFT product (the
    lane-concat arithmetic without materialized concat/slice passes)."""

    dft = stage.dft
    if backward:
        dft = np.conj(dft)
    r, t = dft.shape
    m = np.empty((2, r, 2, t), dtype=dft.real.dtype)
    m[0, :, 0, :] = dft.real
    m[1, :, 0, :] = -dft.imag
    m[0, :, 1, :] = dft.imag
    m[1, :, 1, :] = dft.real
    return m


def _apply_twiddle_stacked(x: jax.Array, twc) -> jax.Array:
    """Product-twiddle multiply on a STACKED array [2, b, l, r, m]
    (leading axis = re/im channel): a 2x2 channel rotation, elementwise
    in (l, r).  Mirrors :func:`_apply_twiddle` for both table forms."""

    _, bb, l, r, mm = x.shape
    sign = jnp.asarray(np.asarray([-1.0, 1.0], x.dtype).reshape(2, 1, 1, 1, 1))
    if twc[0] == "dense":
        _, twr, twi = twc
        wr = jnp.asarray(twr, dtype=x.dtype).reshape(1, 1, l, r, 1)
        wi = jnp.asarray(twi, dtype=x.dtype).reshape(1, 1, l, r, 1)
        return x * wr + x[::-1] * (wi * sign)
    _, lo, a_r, a_i, b_r, b_i = twc
    hi = l // lo
    xs = x.reshape(2, bb, hi, lo, r, mm)
    sign6 = sign.reshape(2, 1, 1, 1, 1, 1)
    war = jnp.asarray(a_r, dtype=x.dtype).reshape(1, 1, hi, 1, r, 1)
    wai = jnp.asarray(a_i, dtype=x.dtype).reshape(1, 1, hi, 1, r, 1)
    wbr = jnp.asarray(b_r, dtype=x.dtype).reshape(1, 1, 1, lo, r, 1)
    wbi = jnp.asarray(b_i, dtype=x.dtype).reshape(1, 1, 1, lo, r, 1)
    xs = xs * war + xs[::-1] * (wai * sign6)
    xs = xs * wbr + xs[::-1] * (wbi * sign6)
    return xs.reshape(2, bb, l, r, mm)


def _cfft_stages_split_cstack(
    re: jax.Array,
    im: jax.Array,
    stages: Sequence,
    *,
    backward: bool,
    ordered: bool,
) -> SplitPair:
    """Stacked-channel chain engine (cmul mode "cstack"), batch-major.

    The re/im planes ride a leading channel axis between stages, so each
    middle stage is ONE einsum contracting (c, r) — K=2r on the MXU, no
    concat or slice relayout — and the whole intermediate makes exactly
    one HBM write + read per stage.  The first stage consumes the two
    input planes directly (two K=r matmuls into the stacked layout) and
    the last stage emits the two output planes directly (two K=2r
    matmuls), so no stack/unstack pass exists anywhere.  Minimum-traffic
    analog of the reference's fused finalize idea
    (pffft_priv_impl.h:1195-1270): passes = #stages, the floor for a
    matmul-staged transform.
    """

    lead = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    active = [st for st in stages if st.r > 1]
    nstages = len(active)
    x = None  # stacked [2, b, l*r, m] between stages
    ar = re.reshape(b, 1, n)
    ai = im.reshape(b, 1, n)
    for idx, st in enumerate(active):
        l, r, m = st.l, st.r, st.m
        consts = _stage_consts(st, backward)
        cm = _stage_cmatrix(st, backward)
        first = idx == 0
        last = idx == nstages - 1
        # einsum output index order along the transform axis
        tail = "ltm" if (last and not ordered) else "tlm"
        if first:
            ar = ar.reshape(b, l, r, m)
            ai = ai.reshape(b, l, r, m)
            if l > 1:
                ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
            m0 = jnp.asarray(cm[0], dtype=ar.dtype)  # [r, 2, t]
            m1 = jnp.asarray(cm[1], dtype=ar.dtype)
            if last:
                # single active stage: plain pair contraction
                sub = f"blrm,rt->b{tail}"
                return _contract_stage_pair_out(ar, ai, consts, sub, lead, n)
            x = (
                jnp.einsum("blrm,rdt->dbtlm", ar, m0, precision=_PRECISION)
                + jnp.einsum("blrm,rdt->dbtlm", ai, m1, precision=_PRECISION)
            ).reshape(2, b, l * r, m)
            continue
        x = x.reshape(2, b, l, r, m)
        if l > 1:
            x = _apply_twiddle_stacked(x, consts[4])
            if _STAGE_BARRIER:
                x = jax.lax.optimization_barrier(x)
        cmj = jnp.asarray(cm, dtype=x.dtype)  # [2, r, 2, t]
        if last:
            nr = jnp.einsum(
                f"cblrm,crt->b{tail}", x, cmj[:, :, 0, :], precision=_PRECISION
            )
            ni = jnp.einsum(
                f"cblrm,crt->b{tail}", x, cmj[:, :, 1, :], precision=_PRECISION
            )
            return nr.reshape(*lead, n), ni.reshape(*lead, n)
        x = jnp.einsum(
            "cblrm,crdt->dbtlm", x, cmj, precision=_PRECISION
        ).reshape(2, b, l * r, m)
    # all stages had r == 1 (n == 1 plans)
    return re, im


def _contract_stage_pair_out(ar, ai, consts, sub, lead, n) -> SplitPair:
    nr, ni = _contract_stage(ar, ai, consts, sub)
    return nr.reshape(*lead, n), ni.reshape(*lead, n)


def _apply_twiddle_T(ar, ai, twc) -> SplitPair:
    """Stage twiddle T[l, r] applied to data laid out [b, r, l] (the
    spec2 chain's transposed orientation).  Dense and split forms."""

    b, r, l = ar.shape
    if twc[0] == "dense":
        _, twr, twi = twc
        wr = jnp.asarray(twr.T, dtype=ar.dtype).reshape(1, r, l)
        wi = jnp.asarray(twi.T, dtype=ar.dtype).reshape(1, r, l)
        return ar * wr - ai * wi, ar * wi + ai * wr
    _, lo, a_r, a_i, b_r, b_i = twc
    hi = l // lo
    xr = ar.reshape(b, r, hi, lo)
    xi = ai.reshape(b, r, hi, lo)
    war = jnp.asarray(a_r.T, dtype=ar.dtype).reshape(1, r, hi, 1)
    wai = jnp.asarray(a_i.T, dtype=ar.dtype).reshape(1, r, hi, 1)
    wbr = jnp.asarray(b_r.T, dtype=ar.dtype).reshape(1, r, 1, lo)
    wbi = jnp.asarray(b_i.T, dtype=ar.dtype).reshape(1, r, 1, lo)
    xr, xi = xr * war - xi * wai, xr * wai + xi * war
    xr, xi = xr * wbr - xi * wbi, xr * wbi + xi * wbr
    return xr.reshape(b, r, l), xi.reshape(b, r, l)


def _cfft_spec2_chain(
    re: jax.Array,
    im: jax.Array,
    st1,
    st2,
    *,
    backward: bool,
) -> SplitPair:
    """Transpose-free ORDERED 2-stage chain (the "spec2" formulation).

    The standard Stockham loop's last stage writes "->btlm" with m=1 — a
    transposed output that measures 2-3x the cost of a spectator-form
    einsum on this backend (benchmarks/results/anatomy_r3.txt: stage2 at
    4-6 memory-pass equivalents vs stage1's 1.8).  Instead: stage 1
    emits its NATURAL matmul order [b, j2, t1]; the twiddle T[t1, j2]
    applies in that transposed orientation; stage 2 contracts j2 on the
    sublane axis with t1 riding as the minor spectator, so its natural
    output [b, t2, t1] IS the canonical ordered layout (k = t1 + r1*t2).
    Both stages are the cheap einsum class; no transposed write exists.
    """

    lead = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    r1, r2 = st1.r, st2.r
    ar = re.reshape(b, r1, r2)
    ai = im.reshape(b, r1, r2)
    c1 = _stage_consts(st1, backward)
    # stage 1: contract j1, natural output [b, j2, t1]
    ar, ai = _contract_stage(ar, ai, c1, "brm,rt->bmt")
    c2 = _stage_consts(st2, backward)
    ar, ai = _apply_twiddle_T(ar, ai, c2[4])
    # stage 2: contract j2 (sublane axis), spectator t1 minor -> ordered
    ar, ai = _contract_stage(ar, ai, c2, "brl,rt->btl")
    return ar.reshape(*lead, n), ai.reshape(*lead, n)


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

    active = [st for st in stages if st.r > 1]
    if ordered and len(active) == 2 and _SPEC2_ENABLED:
        return _cfft_spec2_chain(
            re, im, active[0], active[1], backward=backward
        )

    if cmul_mode() == "cstack" and sum(1 for st in stages if st.r > 1) >= 2:
        return _cfft_stages_split_cstack(
            re, im, stages, backward=backward, ordered=ordered
        )

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
        consts = _stage_consts(st, backward)
        ar = ar.reshape(b, l, r, m)
        ai = ai.reshape(b, l, r, m)
        if l > 1:
            ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
            if _STAGE_BARRIER:
                ar, ai = jax.lax.optimization_barrier((ar, ai))
        last = idx == nstages - 1
        sub = "blrm,rt->bltm" if (last and not ordered) else "blrm,rt->btlm"
        nr, ni = _contract_stage(ar, ai, consts, sub)
        shape = (b, l * r, m)
        ar, ai = nr.reshape(shape), ni.reshape(shape)
    return ar.reshape(*lead, n), ai.reshape(*lead, n)


def cfft_stages_split_tmajor(
    re: jax.Array,
    im: jax.Array,
    stages: Sequence,
    *,
    backward: bool,
    ordered: bool,
) -> SplitPair:
    """Staged complex FFT in TIME-MAJOR layout: planes [N, B] -> [N, B].

    Mirror of :func:`cfft_stages_split` with the batch as the MINOR axis:
    every intermediate keeps B on the vector lanes (full 128-lane
    utilization regardless of the stage's remaining span m, which in the
    batch-major layout becomes the minor axis and shrinks to 1 by the last
    stage).  The DFT contraction runs over the sublane-side r axis; all
    twiddle broadcasts are lane-uniform.  Same Stockham indexing, same
    tables, same internal/ordered layout contract along the N axis.
    """

    n, b = re.shape
    ar = re.reshape(1, n, b)
    ai = im.reshape(1, n, b)
    nstages = len(stages)
    for idx, st in enumerate(stages):
        l, r, m = st.l, st.r, st.m
        if r == 1:
            continue
        consts = _stage_consts(st, backward)
        ar = ar.reshape(l, r, m, b)
        ai = ai.reshape(l, r, m, b)
        if l > 1:
            ar, ai = _apply_twiddle(ar, ai, consts[4], 0)
            if _STAGE_BARRIER:
                ar, ai = jax.lax.optimization_barrier((ar, ai))
        last = idx == nstages - 1
        sub = "lrmb,rt->ltmb" if (last and not ordered) else "lrmb,rt->tlmb"
        nr, ni = _contract_stage(ar, ai, consts, sub)
        shape = (l * r, m, b)
        ar, ai = nr.reshape(shape), ni.reshape(shape)
    return ar.reshape(n, b), ai.reshape(n, b)


def _stages_axis2_split(
    ar: jax.Array,
    ai: jax.Array,
    stages: Sequence,
    *,
    backward: bool,
) -> SplitPair:
    """Staged complex FFT along axis -2 of [b, n, x], planar, canonical bins.

    The trailing spectator axis ``x`` rides through every einsum, so the
    column FFTs of the local four-step need no data transpose: XLA folds
    the relayout into the contraction's read/write pattern.  Always
    "ordered" along the transformed axis (the four-step twiddle indexes
    canonical k1).
    """

    b, n, x = ar.shape
    for st in stages:
        l, r, m = st.l, st.r, st.m
        if r == 1:
            continue
        consts = _stage_consts(st, backward)
        ar = ar.reshape(b, l, r, m, x)
        ai = ai.reshape(b, l, r, m, x)
        if l > 1:
            ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
            if _STAGE_BARRIER:
                ar, ai = jax.lax.optimization_barrier((ar, ai))
        nr, ni = _contract_stage(ar, ai, consts, "blrmx,rt->btlmx")
        shape = (b, l * r, m, x)
        ar, ai = nr.reshape(shape), ni.reshape(shape)
    return ar.reshape(b, n, x), ai.reshape(b, n, x)


def _stages_lead_spec_split(
    ar: jax.Array,
    ai: jax.Array,
    stages: Sequence,
    *,
    backward: bool,
    move_spectator: bool,
) -> SplitPair:
    """Staged complex FFT along the LAST axis of [b, y, n] with spectator
    ``y`` at axis -2, planar, canonical bins.

    With ``move_spectator`` the FINAL stage's einsum emits the spectator
    axis last — output [b, n, y] — folding the four-step's output transpose
    into the last contraction instead of a materialized swapaxes pass (the
    round-1 large-N cliff: VERDICT.md "transposes dominate").
    """

    b, y, n = ar.shape
    nstages = sum(1 for st in stages if st.r > 1)
    seen = 0
    for st in stages:
        l, r, m = st.l, st.r, st.m
        if r == 1:
            continue
        seen += 1
        consts = _stage_consts(st, backward)
        ar = ar.reshape(b, y, l, r, m)
        ai = ai.reshape(b, y, l, r, m)
        if l > 1:
            ar, ai = _apply_twiddle(ar, ai, consts[4], 2)
        if seen == nstages and move_spectator:
            nr, ni = _contract_stage(ar, ai, consts, "bylrm,rt->btlmy")
            return nr.reshape(b, n, y), ni.reshape(b, n, y)
        nr, ni = _contract_stage(ar, ai, consts, "bylrm,rt->bytlm")
        shape = (b, y, l * r, m)
        ar, ai = nr.reshape(shape), ni.reshape(shape)
    return ar.reshape(b, y, n), ai.reshape(b, y, n)


@functools.lru_cache(maxsize=256)
def _split_tw_consts(key, backward: bool):
    tw = key.a
    if backward:
        tw = np.conj(tw)
    return np.ascontiguousarray(tw.real), np.ascontiguousarray(tw.imag)


@functools.lru_cache(maxsize=256)
def _fourstep_tw_consts(key, backward: bool, transposed: bool):
    """Four-step twiddle constants (dense or split), optionally for the
    transposed [j2, k1] layout — the product-exponent structure is
    symmetric, so the same split applies either way."""

    tw = key.a.T if transposed else key.a
    return _tw_consts_from_table(
        np.ascontiguousarray(tw), tw.shape[0] * tw.shape[1], backward
    )


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
    b = int(np.prod(lead)) if lead else 1
    ne = plan.engine_n

    if p1.local_split is None and p2.local_split is None:
        # Transpose-free four-step: every phase is a spectator-axis einsum,
        # so the inter-phase relayouts ride the matmul read/write patterns
        # instead of materialized swapaxes passes (round-1 N>=32768 cliff).
        def twiddle_mul(ar, ai, transposed: bool):
            twc = _fourstep_tw_consts(_HashableArray(tw), backward, transposed)
            return _apply_twiddle(ar, ai, twc, -2)

        if not backward:
            ar = re.reshape(b, n1, n2)
            ai = im.reshape(b, n1, n2)
            # columns: FFT over j1 (axis -2), spectator j2 -> canonical k1
            ar, ai = _stages_axis2_split(ar, ai, p1.stages, backward=False)
            ar, ai = twiddle_mul(ar, ai, transposed=False)  # W_N^{k1 j2} [n1,n2]
            # rows: FFT over j2 (last), spectator k1; ordered output moves
            # the spectator last -> (b, k2, k1), flat = k1 + n1*k2
            ar, ai = _stages_lead_spec_split(
                ar, ai, p2.stages, backward=False, move_spectator=ordered
            )
            return ar.reshape(*lead, ne), ai.reshape(*lead, ne)

        if ordered:  # input (b, k2, k1): k = k1 + n1*k2
            ar = re.reshape(b, n2, n1)
            ai = im.reshape(b, n2, n1)
            # inverse rows over k2 (axis -2), spectator k1 -> (b, j2, k1)
            ar, ai = _stages_axis2_split(ar, ai, p2.stages, backward=True)
            ar, ai = twiddle_mul(ar, ai, transposed=True)  # conj tw at [j2, k1]
            # inverse columns over k1 (last), spectator j2 moved last
            ar, ai = _stages_lead_spec_split(
                ar, ai, p1.stages, backward=True, move_spectator=True
            )
            return ar.reshape(*lead, ne), ai.reshape(*lead, ne)

        ar = re.reshape(b, n1, n2)  # internal: (b, k1, k2), k1-major
        ai = im.reshape(b, n1, n2)
        ar, ai = _stages_lead_spec_split(
            ar, ai, p2.stages, backward=True, move_spectator=False
        )  # inverse rows over k2 -> (b, k1, j2)
        ar, ai = twiddle_mul(ar, ai, transposed=False)  # conj tw at [k1, j2]
        ar, ai = _stages_axis2_split(ar, ai, p1.stages, backward=True)
        return ar.reshape(*lead, ne), ai.reshape(*lead, ne)

    # Fallback (nested local splits): transpose-based four-step.
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


def _flip_last(x: jax.Array) -> jax.Array:
    """flip along the last axis; for large H the flat lax.rev serializes on
    this backend (measured: real transforms collapsed to 0.01 SoL at
    N>=2^19), so reverse a [H/n2, n2] view on both axes instead —
    identical result ((n1-1-i)*n2 + (n2-1-j) == H-1-(i*n2+j))."""

    h = x.shape[-1]
    if h >= (1 << 15):
        for n2 in (512, 256, 1024, 128, 64):
            if h % n2 == 0:
                lead = x.shape[:-1]
                z = x.reshape(*lead, h // n2, n2)
                return z[..., ::-1, ::-1].reshape(*lead, h)
    return x[..., ::-1]


def _reverse_conj_split(zr: jax.Array, zi: jax.Array) -> SplitPair:
    """y[k] = conj(z[(H - k) mod H]) along the last axis.

    roll(flip(z), 1) == [z0, z_{H-1}, .., z1], built from slices+concat.
    """

    fr = _flip_last(zr)
    fi = _flip_last(zi)
    return (
        jnp.concatenate([zr[..., 0:1], fr[..., :-1]], axis=-1),
        -jnp.concatenate([zi[..., 0:1], fi[..., :-1]], axis=-1),
    )


def _bin0_mask(h: int, dtype) -> jax.Array:
    m = np.zeros((h,), dtype=np.float32)
    m[0] = 1.0
    return jnp.asarray(m, dtype=dtype)


def real_forward_split_planar_flat(zr, zi, real_twiddle: np.ndarray) -> SplitPair:
    """Flat-FMA form of :func:`real_forward_split_planar` (same math).

    The classic e/o composition materializes intermediates XLA refuses
    to fuse past the flip, and the bin0 slice+concat is a full extra
    pass (real_anatomy_r4.txt: the jnp split step costs ~5 HBM passes).
    Expanding x = e + w*o into four FMA coefficients per plane and
    handling bin0 with a where-mask leaves: one flip pass + one fused
    elementwise pass.

        xr =  A*zr + B*zi + C*fr + B*fi
        xi = -B*zr + A*zi + B*fr - C*fi
        A = (1+wi)/2, B = wr/2, C = (1-wi)/2;  f = roll-flip(z)
    """

    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=zr.dtype)
    wi = jnp.asarray(twi, dtype=zr.dtype)
    a = 0.5 * (1.0 + wi)
    b = 0.5 * wr
    c = 0.5 * (1.0 - wi)
    fr, nfi = _reverse_conj_split(zr, zi)
    fi = -nfi  # fi[k] = zi[(H-k) mod H]
    xr = a * zr + b * zi + c * fr + b * fi
    xi = -b * zr + a * zi + b * fr - c * fi
    m = _bin0_mask(zr.shape[-1], zr.dtype)
    xr = (1.0 - m) * xr + m * (zr + zi)
    xi = (1.0 - m) * xi + m * (zr - zi)
    return xr, xi


def real_backward_split_planar_flat(sr, si, real_twiddle: np.ndarray) -> SplitPair:
    """Flat-FMA form of :func:`real_backward_split_planar` (returns 2*Z).

        zr = P*xar - R*xai + Q*xbr - R*xbi
        zi = R*xar + P*xai - R*xbr - Q'*xbi
        P = 1+wi, Q = 1-wi, R = wr, Q' = 1-wi ... with
        xa = (sr, si*(1-m)), xb = ((1-m)*fsr + m*si, (1-m)*fsi)
    """

    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=sr.dtype)
    wi = jnp.asarray(twi, dtype=sr.dtype)
    m = _bin0_mask(sr.shape[-1], sr.dtype)
    fsr, nfsi = _reverse_conj_split(sr, si)
    fsi = -nfsi
    xar = sr
    xai = (1.0 - m) * si
    xbr = (1.0 - m) * fsr + m * si
    xbi = (1.0 - m) * fsi
    p = 1.0 + wi
    q = 1.0 - wi
    r = wr
    zr = p * xar - r * xai + q * xbr - r * xbi
    zi = r * xar + p * xai - r * xbr + (wi - 1.0) * xbi
    return zr, zi


def pack_real_input_split(x: jax.Array) -> SplitPair:
    """[..., N] real -> planar [..., N/2]: z[m] = x[2m] + i x[2m+1]."""

    lead = x.shape[:-1]
    n = x.shape[-1]
    xz = x.reshape(*lead, n // 2, 2)
    return xz[..., 0], xz[..., 1]


def real_chain_fwd_folded(x: jax.Array, stages) -> SplitPair:
    """Half-length complex chain with the DE-INTERLEAVE folded into the
    first stage's contraction: [..., N=2H] real -> [..., H] planes.

    The interleaved->planar conversion costs ~65% of the real transform
    at production geometries (real_anatomy2/3_r4 — the strided minor-2
    reads serialize and the engine re-reads force materialization).
    Here the first stage reads x.reshape(b, r, m, 2) ONCE through a
    single [r*2 -> 2t] concat-style contraction (M carries both the
    re/im selector and the DFT matrix), so no packed planes ever hit
    HBM.  Numerics = the concat cmul mode (>=150 dB measured)."""

    lead = x.shape[:-1]
    n = x.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    active = [st for st in stages if st.r > 1]
    st0 = active[0]
    assert st0.l == 1, "first stage must open the chain"
    r0, m0 = st0.r, st0.m
    c0 = _stage_consts(st0, False)
    dr, di = c0[0], c0[1]  # [r, t]
    t0 = dr.shape[1]
    m = np.zeros((r0, 2, 2 * t0), dtype=dr.dtype)
    m[:, 0, :t0] = dr   # zr -> yr
    m[:, 1, :t0] = -di  # zi -> yr
    m[:, 0, t0:] = di   # zr -> yi
    m[:, 1, t0:] = dr   # zi -> yi
    x6 = x.reshape(b, r0, m0, 2)
    y = jnp.einsum(
        "brmc,rcu->bum", x6, jnp.asarray(m, dtype=x.dtype),
        precision=_PRECISION,
    )
    ar = y[:, :t0].reshape(b, t0, m0)
    ai = y[:, t0:].reshape(b, t0, m0)
    h = n // 2
    # remaining stages: the standard ordered chain loop
    for st in active[1:]:
        l, r, mm = st.l, st.r, st.m
        consts = _stage_consts(st, False)
        ar = ar.reshape(b, l, r, mm)
        ai = ai.reshape(b, l, r, mm)
        ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
        if _STAGE_BARRIER:
            ar, ai = jax.lax.optimization_barrier((ar, ai))
        nr, ni = _contract_stage(ar, ai, consts, "blrm,rt->btlm")
        ar, ai = nr.reshape(b, l * r, mm), ni.reshape(b, l * r, mm)
    return ar.reshape(*lead, h), ai.reshape(*lead, h)


def real_chain_bwd_folded(zr: jax.Array, zi: jax.Array, stages) -> jax.Array:
    """Backward half-length chain with the INTERLEAVE folded into the
    last stage: [..., H] planes -> [..., N=2H] real.

    The final contraction emits [b, t, l, m, 2] directly (the re/im
    selector rides the output axis of two summed einsums), so the
    planar->interleaved conversion never materializes separately —
    its relayout fuses into the contraction's output write."""

    lead = zr.shape[:-1]
    h = zr.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    active = [st for st in stages if st.r > 1]
    ar = zr.reshape(b, 1, h)
    ai = zi.reshape(b, 1, h)
    for st in active[:-1]:
        l, r, mm = st.l, st.r, st.m
        consts = _stage_consts(st, True)
        ar = ar.reshape(b, l, r, mm)
        ai = ai.reshape(b, l, r, mm)
        if l > 1:
            ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
            if _STAGE_BARRIER:
                ar, ai = jax.lax.optimization_barrier((ar, ai))
        nr, ni = _contract_stage(ar, ai, consts, "blrm,rt->btlm")
        ar, ai = nr.reshape(b, l * r, mm), ni.reshape(b, l * r, mm)
    st = active[-1]
    l, r, mm = st.l, st.r, st.m
    consts = _stage_consts(st, True)
    ar = ar.reshape(b, l, r, mm)
    ai = ai.reshape(b, l, r, mm)
    if l > 1:
        ar, ai = _apply_twiddle(ar, ai, consts[4], 1)
        if _STAGE_BARRIER:
            ar, ai = jax.lax.optimization_barrier((ar, ai))
    dr, di = consts[0], consts[1]  # already conjugated (backward)
    t = dr.shape[1]
    # M_a[r, t, c]: ar -> (wr, wi); M_b: ai -> (wr, wi)
    ma = np.stack([dr, di], axis=-1)    # ar@dr -> wr ; ar@di -> wi
    mb = np.stack([-di, dr], axis=-1)   # -ai@di -> wr ; ai@dr -> wi
    y = jnp.einsum("blrm,rtc->btlmc", ar, jnp.asarray(ma, dtype=ar.dtype),
                   precision=_PRECISION)
    y = y + jnp.einsum("blrm,rtc->btlmc", ai,
                       jnp.asarray(mb, dtype=ai.dtype),
                       precision=_PRECISION)
    return y.reshape(*lead, 2 * h)


def pack_real_input_split_mxu(x: jax.Array) -> SplitPair:
    """De-interleave via an identity-pair einsum (TPU route).

    The strided minor-2 slices of :func:`pack_real_input_split` serialize
    on this backend (pack_r4.txt: the pack+interleave roundtrip costs
    7.85 ms at N=2^21 B=8 — more than the whole FFT engine; the einsum
    form is 1.9x faster).  Contraction with the 2x2 identity is EXACT at
    HIGHEST precision (each output is one input * 1.0)."""

    lead = x.shape[:-1]
    n = x.shape[-1]
    xz = x.reshape(*lead, n // 2, 2)
    sel = jnp.asarray(np.eye(2, dtype=np.float32), dtype=x.dtype)
    t = jnp.einsum("...ht,tu->u...h", xz, sel, precision=_PRECISION)
    return t[0], t[1]


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
    xbr = jnp.concatenate([nyq[..., None], _flip_last(xar)[..., :-1]], axis=-1)
    xbi = jnp.concatenate([zero[..., None], _flip_last(xai)[..., :-1]], axis=-1)
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


def interleave_to_real_split_mxu(wr: jax.Array, wi: jax.Array) -> jax.Array:
    """Interleave via a leading stack + identity-pair einsum (TPU route —
    see :func:`pack_real_input_split_mxu`)."""

    lead = wr.shape[:-1]
    h = wr.shape[-1]
    t = jnp.stack([wr, wi], axis=0)  # [2, ..., H] — leading stack is cheap
    sel = jnp.asarray(np.eye(2, dtype=np.float32), dtype=wr.dtype)
    y = jnp.einsum("u...h,ut->...ht", t, sel, precision=_PRECISION)
    return y.reshape(*lead, 2 * h)


# ---------------------------------------------------------------------------
# Time-major real path: planes [H, B] (axis-0 mirrors of the functions
# above).  Lets the real transform ride the time-major engine dispatch —
# the half-length complex engine (engine_n = N/2) is exactly the size
# class where the pallas VPU kernel wins (routed_tb_r3.txt), so real
# N <= 2048 gets the kernel's single HBM pass.  The axis-0 flips here are
# sublane relayouts, not the minor-axis rev that serializes (_flip_last).
# ---------------------------------------------------------------------------


def pack_real_input_split_tmajor(x: jax.Array) -> SplitPair:
    """[N, B] real -> planar [N/2, B] x2: z[m] = x[2m] + i x[2m+1].

    LANE form (r5): ``x.reshape(H, 2B)`` is free (row 2h||2h+1 becomes one
    row [x[2h,:] | x[2h+1,:]]), so the de-interleave is two ALIGNED lane
    slices instead of a sublane-stride-2 relayout — the conversion that
    cost ~65% of the real pair at production geometries (real_anatomy3)
    becomes tile-granular lane traffic that XLA fuses into the first
    stage's reads."""

    n, b = x.shape
    y = x.reshape(n // 2, 2 * b)
    return y[:, :b], y[:, b:]


def _reverse_conj_split_tmajor(zr: jax.Array, zi: jax.Array) -> SplitPair:
    """y[k] = conj(z[(H - k) mod H]) along axis 0.

    BLOCKED form (r5): reshape to [H/k, k, B], reverse BOTH leading axes
    (sublane-block relayout), then roll by one row for the mod-H shift —
    measured 4x the concat form at H=8192 (realanat_r5.txt: 0.032 vs
    0.136 ms; the concat([z[:1], z[::-1][:-1]]) form materializes the
    reversed copy AND the concat).  Exact: roll(flip(z), 1)[k] =
    flip(z)[k-1] = z[H-k] for k >= 1, and [0] = flip(z)[H-1] = z[0]."""

    h, b = zr.shape[0], zr.shape[-1]
    k = 1
    while k < 64 and h % (2 * k) == 0:
        k *= 2
    if k == 1:  # odd H: keep the concat form (rare, small)
        return (
            jnp.concatenate([zr[:1], zr[::-1][:-1]], axis=0),
            -jnp.concatenate([zi[:1], zi[::-1][:-1]], axis=0),
        )
    shape = zr.shape

    def flip(v):
        w = v.reshape(h // k, k, -1)[::-1, ::-1].reshape(shape)
        return jnp.roll(w, 1, axis=0)

    return flip(zr), -flip(zi)


def real_forward_split_planar_tmajor(zr, zi, real_twiddle: np.ndarray) -> SplitPair:
    """Time-major mirror of :func:`real_forward_split_planar`."""

    cr, ci = _reverse_conj_split_tmajor(zr, zi)
    er, ei = 0.5 * (zr + cr), 0.5 * (zi + ci)
    orr, oi = 0.5 * (zi - ci), -0.5 * (zr - cr)
    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=zr.dtype)[:, None]
    wi = jnp.asarray(twi, dtype=zr.dtype)[:, None]
    xr = er + wr * orr - wi * oi
    xi = ei + wr * oi + wi * orr
    dc = zr[0] + zi[0]
    nyq = zr[0] - zi[0]
    return (
        jnp.concatenate([dc[None], xr[1:]], axis=0),
        jnp.concatenate([nyq[None], xi[1:]], axis=0),
    )


def real_backward_split_planar_tmajor(sr, si, real_twiddle: np.ndarray) -> SplitPair:
    """Time-major mirror of :func:`real_backward_split_planar` (returns 2*Z)."""

    nyq = si[0]
    zero = jnp.zeros_like(nyq)
    xar = sr
    xai = jnp.concatenate([zero[None], si[1:]], axis=0)
    xbr = jnp.concatenate([nyq[None], xar[::-1][:-1]], axis=0)
    xbi = jnp.concatenate([zero[None], xai[::-1][:-1]], axis=0)
    er, ei = xar + xbr, xai - xbi
    dr, di = xar - xbr, xai + xbi
    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=sr.dtype)[:, None]
    wi = jnp.asarray(twi, dtype=sr.dtype)[:, None]
    orr = wr * dr + wi * di
    oi = wr * di - wi * dr
    return er - oi, ei + orr


def real_forward_split_planar_tmajor_flat(zr, zi, real_twiddle) -> SplitPair:
    """Time-major mirror of :func:`real_forward_split_planar_flat`."""

    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=zr.dtype)[:, None]
    wi = jnp.asarray(twi, dtype=zr.dtype)[:, None]
    a = 0.5 * (1.0 + wi)
    b = 0.5 * wr
    c = 0.5 * (1.0 - wi)
    fr, nfi = _reverse_conj_split_tmajor(zr, zi)
    fi = -nfi
    xr = a * zr + b * zi + c * fr + b * fi
    xi = -b * zr + a * zi + b * fr - c * fi
    m = _bin0_mask(zr.shape[0], zr.dtype)[:, None]
    xr = (1.0 - m) * xr + m * (zr + zi)
    xi = (1.0 - m) * xi + m * (zr - zi)
    return xr, xi


def real_backward_split_planar_tmajor_flat(sr, si, real_twiddle) -> SplitPair:
    """Time-major mirror of :func:`real_backward_split_planar_flat`."""

    twr, twi = _split_real_tw(real_twiddle)
    wr = jnp.asarray(twr, dtype=sr.dtype)[:, None]
    wi = jnp.asarray(twi, dtype=sr.dtype)[:, None]
    m = _bin0_mask(sr.shape[0], sr.dtype)[:, None]
    fsr, nfsi = _reverse_conj_split_tmajor(sr, si)
    fsi = -nfsi
    xar = sr
    xai = (1.0 - m) * si
    xbr = (1.0 - m) * fsr + m * si
    xbi = (1.0 - m) * fsi
    p = 1.0 + wi
    q = 1.0 - wi
    r = wr
    zr = p * xar - r * xai + q * xbr - r * xbi
    zi = r * xar + p * xai - r * xbr + (wi - 1.0) * xbi
    return zr, zi


def interleave_to_real_split_tmajor(wr: jax.Array, wi: jax.Array) -> jax.Array:
    """Planar [H, B] x2 -> [N, B] real: x[2m] = re[m], x[2m+1] = im[m].

    LANE form (r5): concat along lanes to [H, 2B] (aligned, one pass)
    then a free reshape to [2H, B] — no sublane interleave relayout."""

    h, b = wr.shape
    return jnp.concatenate([wr, wi], axis=1).reshape(2 * h, b)
