"""Fused Pallas FFT kernel: all butterfly stages in VMEM, one HBM pass.

This is the framework's hand-written hot kernel — the TPU counterpart of
the reference's SIMD engine (/root/reference/src/pffft_priv_impl.h): where
the reference holds 4 lanes in SSE registers across a radix pass, this
kernel holds a [N, TB] tile (TB batch columns on the 128-lane axis, the
transform index on sublanes) in VMEM across ALL passes, so the whole
mixed-radix pipeline costs one HBM read + one write.

Layout choice (the core TPU-first decision): **batch on lanes**.  Every
butterfly is then an elementwise op over [l, m, TB] slabs — full VPU
utilization, no lane shuffles; the Stockham merges are pure relabels of the
sublane axis.  Radix-2/4 butterflies are add/sub only; radix-3/5 use
exact-rational/±sqrt constants (same constants as radf3/radf5,
pffft_priv_impl.h:386-807, derived independently from the DFT matrix);
radix-8/16 nest radix-4 with constant twiddles — fat stages mean fewer
full-tile VMEM traversals (a (16,16,4) chain at N=1024 makes 3 passes
over the tile where (4,4,4,4,4) makes 5).

The kernel consumes/produces TIME-MAJOR data: planes [N, B] (transform
index first).  This is the engine's natural layout — the batched analog of
pffft's "internal" layout story (pffft.h:126-132): the layout the hardware
likes is the default; converting to batch-major [B, N] is an explicit
transpose the caller opts into.  fft.py wraps both.

Stockham invariant (same derivation as stages.py): after stages with
completed length L, the value has shape [L, M, TB], M = N / L, holding
A[k, j, b] = sum_{p in [L]} x[p*M + j, b] * W_L^{p k}.  A radix-r stage
maps [L, r*M', TB] -> view [L, r, M', TB] -> twiddle T[k, i] = W_{Lr}^{ik}
-> butterfly over i -> stack t above k -> [r*L, M', TB].  Output after the
last stage ([N, 1, TB]) is in canonical bin order — Stockham needs no
bit-reversal and no zreorder.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import plan as _plan

__all__ = [
    "supported",
    "cfft_pallas_tmajor",
    "cfft_pallas",
    "cfft_combine_tmajor",
    "DEFAULT_TB",
    "best_tb",
]

DEFAULT_TB = 128  # batch columns per grid step (one f32 lane tile)

# Measured tile-batch preference per engine length (v5e, interleaved
# rounds at plateau payloads — benchmarks/results/pallas_tb2_r3.txt for
# N<=512; vmem_r4.txt / scratch_r4.txt for N>=1024 after the scoped-VMEM
# limit raise): wider lane tiles amortize grid steps and roughly TRIPLE
# the kernel's throughput (N=256: 0.86 SoL at tb=1024 vs 0.26 at 128;
# N=2048: 0.61-1.00 at tb=512 vs 0.26 at 128).  With the limit at 100 MB
# the compile ceiling is n*tb <= 1M elements (4 MB/plane) at every
# measured N — 2M-element shapes fail in the remote compiler even with
# the scratch ping-pong chain (vmem2_r4.txt).
_TB_PREF = {
    128: (512, 2048, 1024, 256, 128),
    256: (1024, 512, 256, 128),
    # 512's r3-era tiles predate the VMEM-limit raise; front_r5.txt
    # (b=32768, 8 interleaved trials): tb512 0.801 med, tb1024 0.751,
    # tb2048 0.750, tb256 0.538 — the old routed tb256 left 1.5x
    512: (512, 1024, 2048, 384, 256, 128),
    1024: (1024, 512, 256, 128),
    2048: (512, 256, 128),
    # tb=512 is a WALL tile (2M elements): ships in the arb127 config
    # (wall_r4.txt: 2/2 compiles, 0.477 med SoL plateau vs 0.331 at 256),
    # protected by the fft.py compile-retry fallback.  The other wall
    # tiles measured worse than their safe neighbours (1024/tb2048:
    # 0.70 vs 0.77; 2048/tb1024: 0.71 vs 0.67 — inside noise) and are
    # not listed.
    4096: (512, 256, 128),
    8192: (128,),
    # non-pow2 measured tiles (non2{,b}_r5.txt); unlisted non-pow2 sizes
    # fall back to the envelope arithmetic below
    480: (512, 1024, 2176, 128),
    640: (768, 1536, 384, 128),
    768: (256, 1280, 128),
    800: (640, 1280, 256, 128),
    2400: (384, 128),
}
# For unmeasured lengths: largest lane-tile multiple with n*tb inside the
# envelope every measured length compiles at (the 1M-element ceiling).
_SAFE_ELEMS = 1024 * 1024


def tb_candidates(n: int) -> Tuple[int, ...]:
    """Tile-batch candidates for engine length ``n``, best first.

    Empty when even one lane tile exceeds the measured compile envelope
    (n > 1M/128 elements — 16384/tb128 = 2M fails, scratch_r4.txt); the
    dispatcher then keeps the XLA engine."""

    pref = _TB_PREF.get(n)
    if pref is not None:
        return pref
    if n * 128 > _SAFE_ELEMS:
        return ()
    top = max(128, (_SAFE_ELEMS // max(n, 1)) // 128 * 128)
    out = []
    tb = top
    while tb > 128:
        out.append(tb)
        tb = max(128, (tb // 2) // 128 * 128)
    out.append(128)
    return tuple(out)


# Tiles whose remote compile failed IN THIS PROCESS: (n, tb).  At the
# n*tb ~ 2M-element wall the remote compiler fails STOCHASTICALLY
# (vmem2_r4.txt: 4096/tb512 failed twice under probe load, then compiled
# clean twice serially at 0.55 SoL) — the public tmajor path catches the
# compile error, records the tile here, and re-traces with the next
# candidate (fft.py).  dispatch.state_key() includes tb_fail_version()
# so the retry gets a fresh jit cache entry.
_TB_FAILED: set = set()
_TB_FAIL_VERSION = 0


def record_tb_fail(n: int, tb: int) -> None:
    global _TB_FAIL_VERSION
    _TB_FAILED.add((int(n), int(tb)))
    _TB_FAIL_VERSION += 1


def tb_fail_version() -> int:
    return _TB_FAIL_VERSION


def best_tb(n: int, batch: int) -> int | None:
    """Best measured tile for (n, batch), or None if no candidate divides
    the batch (the dispatcher then keeps the XLA engine).  Tiles whose
    compile failed this process (record_tb_fail) are skipped."""

    for tb in tb_candidates(n):
        if batch % tb == 0 and (n, tb) not in _TB_FAILED:
            return tb
    return None


def best_tb_ragged(n: int, batch: int) -> int | None:
    """Best tile for a batch NO candidate divides: the grid gets a
    masked edge block (Mosaic pads partial blocks; the FFT is column-
    independent so padding lanes never contaminate data lanes).  Prefers
    the widest tile that keeps edge waste under ~25% of the batch."""

    for tb in tb_candidates(n):
        if (n, tb) in _TB_FAILED:
            continue
        waste = (-batch) % tb
        if waste * 4 <= batch:
            return tb
    return None


# Measured scratch-vs-unrolled preference (scratch_r4.txt): the ping-pong
# chain TIES the unrolled chain at N<=4096 (medians within noise) and is
# REQUIRED at N>=8192, where the unrolled chain's live SSA values blow the
# compile even at tb=128 (4-stage chain).  Unmeasured lengths take the
# scratch form whenever the tile exceeds the round-3 safe envelope — it
# is never slower and compiles strictly more shapes.
_SCRATCH_PREF = {1024: False, 2048: False, 4096: False, 8192: True}


def use_scratch(n: int, tb: int) -> bool:
    """Whether the dispatcher should run the scratch ping-pong kernel."""

    if n * tb > _SAFE_ELEMS:
        # wall tiles (beyond the reliably-compiling envelope): only the
        # scratch chain has ever compiled there (vmem2_r4.txt)
        return True
    pref = _SCRATCH_PREF.get(n)
    if pref is not None:
        return pref
    return n * tb > 128 * 1024


# Measured chain preference per engine length: True = the radix-16/8
# chain (fewest VMEM traversals), False = the radix<=5 chain.  Round-4
# measurement (vmem_r4.txt, interleaved at plateau payloads): the r16
# chain ties r5 at the narrow tiles (2048/tb128: 0.261 vs 0.263;
# 4096/tb128: 0.227 vs 0.238) and is the only chain raced/compiling at
# the winning wide tiles (1024/tb1024 0.66-0.77, 2048/tb512 0.61-1.00,
# 4096/tb256 0.32-0.34), so N>=1024 routes the r16 chain.
_CHAIN_PREF: dict = {1024: True, 2048: True, 4096: True, 8192: True}


def chain_pref(n: int) -> bool:
    return _CHAIN_PREF.get(n, False)

_SQRT3_2 = math.sqrt(3.0) / 2.0
# radix-5 constants: cos/sin of 2pi/5, 4pi/5 (cf. radf5_ps tr11/ti11/tr12/ti12,
# pffft_priv_impl.h:633 — same algebra, derived from the DFT matrix)
_C51, _S51 = math.cos(2 * math.pi / 5), math.sin(2 * math.pi / 5)
_C52, _S52 = math.cos(4 * math.pi / 5), math.sin(4 * math.pi / 5)


def _butterfly(r: int, a, sign: float):
    """Radix-r DFT of r planar slabs a[i] = (re, im); returns r slabs.

    sign = -1 forward, +1 backward.  y[t] = sum_i W_r^{sign*i*t} a[i].
    """

    if r == 2:
        (x0r, x0i), (x1r, x1i) = a
        return [(x0r + x1r, x0i + x1i), (x0r - x1r, x0i - x1i)]
    if r == 4:
        (x0r, x0i), (x1r, x1i), (x2r, x2i), (x3r, x3i) = a
        t0r, t0i = x0r + x2r, x0i + x2i
        t1r, t1i = x0r - x2r, x0i - x2i
        t2r, t2i = x1r + x3r, x1i + x3i
        t3r, t3i = x1r - x3r, x1i - x3i
        # forward (sign=-1): y1 = t1 - i t3, y3 = t1 + i t3
        if sign < 0:
            y1 = (t1r + t3i, t1i - t3r)
            y3 = (t1r - t3i, t1i + t3r)
        else:
            y1 = (t1r - t3i, t1i + t3r)
            y3 = (t1r + t3i, t1i - t3r)
        return [(t0r + t2r, t0i + t2i), y1, (t0r - t2r, t0i - t2i), y3]
    if r == 3:
        (x0r, x0i), (x1r, x1i), (x2r, x2i) = a
        sr, si = x1r + x2r, x1i + x2i       # symmetric sum
        dr, di = x1r - x2r, x1i - x2i       # antisymmetric
        mr, mi = x0r - 0.5 * sr, x0i - 0.5 * si
        s3 = sign * _SQRT3_2
        # y1 = m + i*s3*d ; y2 = m - i*s3*d
        return [
            (x0r + sr, x0i + si),
            (mr - s3 * di, mi + s3 * dr),
            (mr + s3 * di, mi - s3 * dr),
        ]
    if r == 5:
        (x0r, x0i), (x1r, x1i), (x2r, x2i), (x3r, x3i), (x4r, x4i) = a
        s1r, s1i = x1r + x4r, x1i + x4i
        d1r, d1i = x1r - x4r, x1i - x4i
        s2r, s2i = x2r + x3r, x2i + x3i
        d2r, d2i = x2r - x3r, x2i - x3i
        y0 = (x0r + s1r + s2r, x0i + s1i + s2i)
        out = [y0, None, None, None, None]
        for t, (ca, cb, sa, sb) in (
            (1, (_C51, _C52, _S51, _S52)),
            (2, (_C52, _C51, _S52, -_S51)),
        ):
            er = x0r + ca * s1r + cb * s2r
            ei = x0i + ca * s1i + cb * s2i
            fr = sign * (sa * d1r + sb * d2r)
            fi = sign * (sa * d1i + sb * d2i)
            # y_t = e + i*f ; y_{r-t} = e - i*f
            out[t] = (er - fi, ei + fr)
            out[5 - t] = (er + fi, ei - fr)
        return out
    if r == 8:
        # i = 2a + b: radix-4 over a per parity b, then a twiddled radix-2
        # over b — y[c+4d] = A0[c] + W8^{sign*c} * (-1)^d * A1[c].
        ev = _butterfly(4, a[0::2], sign)
        od = _butterfly(4, a[1::2], sign)
        out = [None] * 8
        for c in range(4):
            er, ei = ev[c]
            xr, xi = od[c]
            if c:
                ang = 2 * math.pi * c / 8
                wr, wi = math.cos(ang), sign * math.sin(ang)
                xr, xi = xr * wr - xi * wi, xr * wi + xi * wr
            out[c] = (er + xr, ei + xi)
            out[c + 4] = (er - xr, ei - xi)
        return out
    if r == 16:
        # i = 4a + b: radix-4 over a per residue b, constant twiddles
        # W16^{sign*b*c}, then a radix-4 over b — y[c+4d] = R4_d(W^{bc} A_b[c]).
        cols = [_butterfly(4, a[b::4], sign) for b in range(4)]
        out = [None] * 16
        for c in range(4):
            slabs = []
            for b in range(4):
                xr, xi = cols[b][c]
                if b and c:
                    ang = 2 * math.pi * b * c / 16
                    wr, wi = math.cos(ang), sign * math.sin(ang)
                    xr, xi = xr * wr - xi * wi, xr * wi + xi * wr
                slabs.append((xr, xi))
            ys = _butterfly(4, slabs, sign)
            for d in range(4):
                out[c + 4 * d] = ys[d]
        return out
    if r == 32:
        # i = 4a + b: radix-8 over a per residue b, twiddles W32^{sign*b*c},
        # then a radix-4 over b — y[c + 8d] = R4_d(W32^{bc} A_b[c]).
        cols = [_butterfly(8, a[b::4], sign) for b in range(4)]
        out = [None] * 32
        for c in range(8):
            slabs = []
            for b in range(4):
                xr, xi = cols[b][c]
                if b and c:
                    ang = 2 * math.pi * b * c / 32
                    wr, wi = math.cos(ang), sign * math.sin(ang)
                    xr, xi = xr * wr - xi * wi, xr * wi + xi * wr
                slabs.append((xr, xi))
            ys = _butterfly(4, slabs, sign)
            for d in range(4):
                out[c + 8 * d] = ys[d]
        return out
    raise ValueError(f"unsupported radix {r}")


def _stage_values(ar, ai, l: int, r: int, m: int, twr, twi, sign: float):
    """One Stockham stage on planar values shaped [l, r*m, TB]."""

    tb = ar.shape[-1]
    a4r = ar.reshape(l, r, m, tb)
    a4i = ai.reshape(l, r, m, tb)
    slabs = []
    for i in range(r):
        sr_, si_ = a4r[:, i], a4i[:, i]  # [l, m, TB]
        if l > 1 and i > 0:  # T[k,0] == 1
            wr = twr[:, i].reshape(l, 1, 1)
            wi = twi[:, i].reshape(l, 1, 1)
            sr_, si_ = sr_ * wr - si_ * wi, sr_ * wi + si_ * wr
        slabs.append((sr_, si_))
    ys = _butterfly(r, slabs, sign)
    outr = jnp.stack([y[0] for y in ys], axis=0)  # [r, l, m, TB]
    outi = jnp.stack([y[1] for y in ys], axis=0)
    return outr.reshape(r * l, m, tb), outi.reshape(r * l, m, tb)


def _make_kernel(n: int, stages: Sequence, backward: bool, inner: int = 0):
    """Kernel fn (twiddle refs ..., re_ref, im_ref, or_ref, oi_ref).

    inner > 0: process the [n, tb] block in sequential column chunks of
    ``inner`` — the live stage values then scale with ``inner`` instead of
    ``tb``, trading unrolled chain width for a smaller Mosaic scoped-VMEM
    stack (the gate that kills tb>128 compiles at N=1024).
    """

    sign = 1.0 if backward else -1.0
    active = [s for s in stages if s.r != 1]

    def chain(ar, ai, tw):
        for idx, st in enumerate(active):
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            ar, ai = _stage_values(ar, ai, st.l, st.r, st.m, twr, twi, sign)
        return ar, ai

    def kernel(*refs):
        ntw = len(active)
        tw = [r_[:] for r_ in refs[: 2 * ntw]]
        re_ref, im_ref, or_ref, oi_ref = refs[2 * ntw :]
        tb = re_ref.shape[-1]
        if not inner or inner >= tb:
            ar = re_ref[:].reshape(1, n, tb)
            ai = im_ref[:].reshape(1, n, tb)
            ar, ai = chain(ar, ai, tw)
            or_ref[:] = ar.reshape(n, tb)
            oi_ref[:] = ai.reshape(n, tb)
            return
        for c in range(tb // inner):
            sl = slice(c * inner, (c + 1) * inner)
            ar = re_ref[:, sl].reshape(1, n, inner)
            ai = im_ref[:, sl].reshape(1, n, inner)
            ar, ai = chain(ar, ai, tw)
            or_ref[:, sl] = ar.reshape(n, inner)
            oi_ref[:, sl] = ai.reshape(n, inner)

    return kernel


def _make_kernel_scratch(n: int, stages: Sequence, backward: bool):
    """Ping-pong kernel: each stage stores its full [n, tb] result to a
    VMEM ref and the next stage reloads it.

    The unrolled value-chain kernel keeps every stage's output alive as
    SSA values, so Mosaic's scoped-VMEM stack grows with BOTH n*tb and
    the stage count (the round-3 ceiling).  Routing the dataflow through
    two explicit scratch refs caps the live set at ~3 plane pairs
    (src + dst + in-flight butterfly slabs) regardless of chain length —
    VMEM-internal traffic the TPU's register-file-class bandwidth
    absorbs, in exchange for single-HBM-pass coverage at large N."""

    sign = 1.0 if backward else -1.0
    active = [s for s in stages if s.r != 1]
    s = len(active)

    def kernel(*refs):
        ntw = 2 * s
        tw = [r_[:] for r_ in refs[:ntw]]
        re_ref, im_ref, or_ref, oi_ref, sr_ref, si_ref = refs[ntw:]
        tb = re_ref.shape[-1]
        src = (re_ref, im_ref)
        for idx, st in enumerate(active):
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            ar = src[0][:].reshape(st.l, st.r * st.m, tb)
            ai = src[1][:].reshape(st.l, st.r * st.m, tb)
            ar, ai = _stage_values(ar, ai, st.l, st.r, st.m, twr, twi, sign)
            dst = (
                (or_ref, oi_ref)
                if (s - 1 - idx) % 2 == 0
                else (sr_ref, si_ref)
            )
            dst[0][:] = ar.reshape(n, tb)
            dst[1][:] = ai.reshape(n, tb)
            src = dst

    return kernel


# ---------------------------------------------------------------------------
# In-kernel reversal (round 5).  Mosaic has no `rev` lowering, but
# reversal = XOR of the index with (n-1), and XOR with one bit s is
# y[i] = x[i XOR s] = select(bit s of i, roll(x, s), roll(x, -s)) —
# log2(n) roll-pairs + selects, all VMEM-resident.  Measured on chip
# (revroll_r5.txt): lowers on BOTH axes, bit-exact, and the full [8192,
# 1024] sublane-reversal kernel runs AT the stream-copy ceiling (0.438
# vs 0.42) — the network is free next to the HBM traffic.  This unlocks
# the fused real transform below (the reference's REAL_FINALIZE /
# REAL_PREPROCESS folded into the SIMD pipeline,
# /root/reference/src/pffft_priv_impl.h:1273-1462).
# ---------------------------------------------------------------------------


def _rev_roll(x, n: int, axis: int):
    """Reverse pow2-sized ``axis`` of x via the XOR roll network."""

    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < n:
        hi = pltpu.roll(x, (n - s) % n, axis)   # x[i + s]
        lo = pltpu.roll(x, s, axis)             # x[i - s]
        x = jnp.where((idx & s) != 0, lo, hi)
        s *= 2
    return x


def _mirror_rows(x, n: int):
    """y[k] = x[(n - k) % n] along axis 0 (rev network + roll by one)."""

    return pltpu.roll(_rev_roll(x, n, 0), 1, 0)


def _fwd_split_block(zr, zi, wr, wi, n: int):
    """REAL_FINALIZE combine on a full-column [n, tb] block (flat form of
    split.real_forward_split_planar_tmajor_flat, mirror via rolls)."""

    a = 0.5 * (1.0 + wi)
    b = 0.5 * wr
    c = 0.5 * (1.0 - wi)
    fr = _mirror_rows(zr, n)
    fi = _mirror_rows(zi, n)
    xr = a * zr + b * zi + c * fr + b * fi
    xi = -b * zr + a * zi + b * fr - c * fi
    is0 = lax.broadcasted_iota(jnp.int32, zr.shape, 0) == 0
    return (
        jnp.where(is0, zr + zi, xr),
        jnp.where(is0, zr - zi, xi),
    )


def _bwd_prep_block(sr, si, wr, wi, n: int):
    """REAL_PREPROCESS combine on a full-column [n, tb] block."""

    fsr = _mirror_rows(sr, n)
    fsi = _mirror_rows(si, n)
    is0 = lax.broadcasted_iota(jnp.int32, sr.shape, 0) == 0
    xar = sr
    xai = jnp.where(is0, 0.0, si)
    xbr = jnp.where(is0, si, fsr)
    xbi = jnp.where(is0, 0.0, fsi)
    p = 1.0 + wi
    q = 1.0 - wi
    r_ = wr
    zr = p * xar - r_ * xai + q * xbr - r_ * xbi
    zi = r_ * xar + p * xai - r_ * xbr - q * xbi
    return zr, zi


def _make_kernel_real_fused(n: int, stages: Sequence, backward: bool,
                            scratch: bool):
    """FFT chain + real split step in ONE kernel ([n, tb] blocks).

    Forward: half-length complex FFT stages, then the REAL_FINALIZE
    combine (flat form of split.real_forward_split_planar_tmajor_flat)
    with the Hermitian mirror done in-VMEM via the roll network — the
    packed real spectrum leaves in the same HBM pass as the transform.
    Backward: the REAL_PREPROCESS combine on the input spectrum, then
    the backward stages (planar output pair; the caller interleaves).
    ``wr``/``wi`` arrive as [n, 1] refs (the real split twiddles)."""

    sign = 1.0 if backward else -1.0
    active = [s for s in stages if s.r != 1]
    ns = len(active)

    def fwd_split(zr, zi, wr, wi):
        return _fwd_split_block(zr, zi, wr, wi, n)

    def bwd_prep(sr, si, wr, wi):
        return _bwd_prep_block(sr, si, wr, wi, n)

    def run_chain(ar, ai, tw):
        ar = ar.reshape(1, n, ar.shape[-1])
        ai = ai.reshape(1, n, ai.shape[-1])
        for idx, st in enumerate(active):
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            ar, ai = _stage_values(ar, ai, st.l, st.r, st.m, twr, twi, sign)
        tb = ar.shape[-1]
        return ar.reshape(n, tb), ai.reshape(n, tb)

    def kernel(*refs):
        tw = [r_[:] for r_ in refs[: 2 * ns]]
        wr_ref, wi_ref = refs[2 * ns], refs[2 * ns + 1]
        re_ref, im_ref, or_ref, oi_ref = refs[2 * ns + 2 : 2 * ns + 6]
        scr = refs[2 * ns + 6 :]
        wr = wr_ref[:]                     # [n, 1] broadcast over lanes
        wi = wi_ref[:]
        if backward:
            zr, zi = bwd_prep(re_ref[:], im_ref[:], wr, wi)
            if scratch:
                # stage the prepped planes through scratch so the chain
                # reads refs (capped live set), not giant SSA values
                scr[0][:] = zr
                scr[1][:] = zi
                src = (scr[0], scr[1])
                tb = zr.shape[-1]
                for idx, st in enumerate(active):
                    twr, twi = tw[2 * idx], -tw[2 * idx + 1]
                    ar = src[0][:].reshape(st.l, st.r * st.m, tb)
                    ai = src[1][:].reshape(st.l, st.r * st.m, tb)
                    ar, ai = _stage_values(
                        ar, ai, st.l, st.r, st.m, twr, twi, sign)
                    dst = (
                        (or_ref, oi_ref)
                        if (ns - 1 - idx) % 2 == 0
                        else (scr[2], scr[3])
                    )
                    dst[0][:] = ar.reshape(n, tb)
                    dst[1][:] = ai.reshape(n, tb)
                    src = dst
            else:
                ar, ai = run_chain(zr, zi, tw)
                or_ref[:] = ar
                oi_ref[:] = ai
            return
        if scratch:
            src = (re_ref, im_ref)
            tb = re_ref.shape[-1]
            for idx, st in enumerate(active):
                twr, twi = tw[2 * idx], tw[2 * idx + 1]
                ar = src[0][:].reshape(st.l, st.r * st.m, tb)
                ai = src[1][:].reshape(st.l, st.r * st.m, tb)
                ar, ai = _stage_values(
                    ar, ai, st.l, st.r, st.m, twr, twi, sign)
                dst = (scr[0], scr[1]) if idx % 2 == 0 else (scr[2], scr[3])
                dst[0][:] = ar.reshape(n, tb)
                dst[1][:] = ai.reshape(n, tb)
                src = dst
            zr, zi = src[0][:], src[1][:]
        else:
            zr, zi = run_chain(re_ref[:], im_ref[:], tw)
        xr, xi = fwd_split(zr, zi, wr, wi)
        or_ref[:] = xr
        oi_ref[:] = xi

    return kernel


@functools.lru_cache(maxsize=128)
def _build_real_fused(plan, backward: bool, tb: int, interpret: bool,
                      lpb: int, scratch: bool, twr_b: bytes, twi_b: bytes,
                      vmem_limit: int | None, arbitrary_grid: bool):
    n = plan.engine_n
    active = [s for s in plan.stages if s.r != 1]
    tw_inputs = []
    tw_specs = []
    for st in active:
        tw = st.twiddle
        tw_inputs.append(np.ascontiguousarray(tw.real, dtype=np.float32))
        tw_inputs.append(np.ascontiguousarray(tw.imag, dtype=np.float32))
        spec = pl.BlockSpec((st.l, st.r), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
        tw_specs.extend([spec, spec])
    wr = np.frombuffer(twr_b, dtype=np.float32).reshape(n, 1)
    wi = np.frombuffer(twi_b, dtype=np.float32).reshape(n, 1)
    w_spec = pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, tb), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    if backward:
        re_spec = im_spec = out_spec        # planar spectrum inputs
    else:
        # packed real input: re at lane blocks [0, lpb), im at [lpb, 2lpb)
        re_spec = pl.BlockSpec((n, tb), lambda j: (0, j),
                               memory_space=pltpu.VMEM)
        im_spec = pl.BlockSpec((n, tb), lambda j: (0, j + lpb),
                               memory_space=pltpu.VMEM)
    kernel = _make_kernel_real_fused(n, plan.stages, backward, scratch)
    scratch_shapes = (
        [pltpu.VMEM((n, tb), jnp.float32)] * 4 if scratch else []
    )

    def call(*args):
        b = lpb * tb
        grid = (b // tb,)
        out_shape = [
            jax.ShapeDtypeStruct((n, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ]
        params = {}
        if not interpret and (vmem_limit or arbitrary_grid):
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit) if vmem_limit else None,
                dimension_semantics=("arbitrary",) if arbitrary_grid
                else None,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*tw_specs, w_spec, w_spec, re_spec, im_spec],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(8 * n * math.log2(max(n, 2)) * b + 16 * n * b),
                bytes_accessed=4 * 4 * n * b, transcendentals=0),
            **params,
        )(*[jnp.asarray(t) for t in tw_inputs],
          jnp.asarray(wr), jnp.asarray(wi), *args)

    return call


def rfft_pallas_tmajor_fused(
    plan, y: jax.Array, real_twiddle, *, tb: int | None = None,
    interpret: bool = False, scratch: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """ONE-pass real forward: packed [H, 2B] buffer (the free
    ``x.reshape(H, 2B)`` of the interleaved real stream) -> packed real
    spectrum planes ([H, B]) x2.  FFT stages + REAL_FINALIZE split in a
    single HBM pass; requires pow2 H (the roll-network mirror)."""

    n, b2 = y.shape
    b = b2 // 2
    if n & (n - 1):
        raise ValueError(f"fused real kernel needs pow2 H, got {n}")
    if tb is None:
        tb = best_tb(n, b) or DEFAULT_TB
    if b % tb:
        raise ValueError(f"half-batch {b} must be a multiple of tile {tb}")
    if scratch is None:
        # ALWAYS scratch: the split step's mirror/FMA adds live values on
        # top of the chain — the unrolled form stalled the remote compile
        # at (1024, tb1024) where the plain chain compiles (fusedreal r5)
        scratch = True
    vmem_limit, arbitrary_grid = VMEM_LIMIT, False
    if is_wall_tile(n, tb):
        arbitrary_grid = True
        scratch = True
        vmem_limit = WALL_VMEM_LIMIT
    from . import split as _split

    twr, twi = _split._split_real_tw(real_twiddle)
    call = _build_real_fused(
        plan, False, tb, interpret, b // tb, scratch,
        np.ascontiguousarray(twr, np.float32).tobytes(),
        np.ascontiguousarray(twi, np.float32).tobytes(),
        vmem_limit, arbitrary_grid)
    return call(y, y)


def rfft_bwd_pallas_tmajor_fused(
    plan, sr: jax.Array, si: jax.Array, real_twiddle, *,
    tb: int | None = None, interpret: bool = False,
    scratch: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """ONE-pass real backward core: packed spectrum planes [H, B] x2 ->
    the planar pre-interleave pair ([H, B]) x2 (REAL_PREPROCESS split +
    backward FFT stages fused; caller interleaves to [N, B])."""

    n, b = sr.shape
    if n & (n - 1):
        raise ValueError(f"fused real kernel needs pow2 H, got {n}")
    if tb is None:
        tb = best_tb(n, b) or DEFAULT_TB
    if b % tb:
        raise ValueError(f"batch {b} must be a multiple of tile {tb}")
    if scratch is None:
        scratch = True  # see forward entry: the split adds live values
    vmem_limit, arbitrary_grid = VMEM_LIMIT, False
    if is_wall_tile(n, tb):
        arbitrary_grid = True
        scratch = True
        vmem_limit = WALL_VMEM_LIMIT
    from . import split as _split

    twr, twi = _split._split_real_tw(real_twiddle)
    call = _build_real_fused(
        plan, True, tb, interpret, b // tb, scratch,
        np.ascontiguousarray(twr, np.float32).tobytes(),
        np.ascontiguousarray(twi, np.float32).tobytes(),
        vmem_limit, arbitrary_grid)
    return call(sr, si)


@functools.lru_cache(maxsize=128)
def _build_real_split(n: int, tb: int, backward: bool, interpret: bool,
                      twr_b: bytes, twi_b: bytes,
                      vmem_limit: int | None, arbitrary_grid: bool):
    wr = np.frombuffer(twr_b, dtype=np.float32).reshape(n, 1)
    wi = np.frombuffer(twi_b, dtype=np.float32).reshape(n, 1)
    w_spec = pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((n, tb), lambda j: (0, j), memory_space=pltpu.VMEM)
    step = _bwd_prep_block if backward else _fwd_split_block

    def kernel(wr_ref, wi_ref, ar_ref, ai_ref, or_ref, oi_ref):
        xr, xi = step(ar_ref[:], ai_ref[:], wr_ref[:], wi_ref[:], n)
        or_ref[:] = xr
        oi_ref[:] = xi

    def call(ar, ai):
        b = ar.shape[-1]
        grid = (b // tb,)
        params = {}
        if not interpret and (vmem_limit or arbitrary_grid):
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit) if vmem_limit else None,
                dimension_semantics=("arbitrary",) if arbitrary_grid
                else None,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[w_spec, w_spec, d_spec, d_spec],
            out_specs=[d_spec, d_spec],
            out_shape=[jax.ShapeDtypeStruct((n, b), jnp.float32)] * 2,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=16 * n * b, bytes_accessed=4 * 4 * n * b,
                transcendentals=0),
            **params,
        )(jnp.asarray(wr), jnp.asarray(wi), ar, ai)

    return call


@functools.lru_cache(maxsize=128)
def _build_real_split_blocked(n: int, hb: int, tb: int, backward: bool,
                              interpret: bool, twr_b: bytes, twi_b: bytes):
    """Blocked-row split kernel: [hb, tb] blocks, the mirror built from
    the two back row-blocks (the 3-view scheme of ops/real_kernel.py on
    the SUBLANE axis) — hb*tb stays inside the compile envelope where
    the full-column kernel is a failing 2M wall tile (H >= 16384)."""

    nb = n // hb
    wr = np.frombuffer(twr_b, dtype=np.float32).reshape(n, 1)
    wi = np.frombuffer(twi_b, dtype=np.float32).reshape(n, 1)
    w_spec = pl.BlockSpec((hb, 1), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    front = pl.BlockSpec((hb, tb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    back1 = pl.BlockSpec((hb, tb), lambda i, j: (nb - 1 - i, j),
                         memory_space=pltpu.VMEM)
    back2 = pl.BlockSpec((hb, tb), lambda i, j: ((nb - i) % nb, j),
                         memory_space=pltpu.VMEM)

    def kernel(wr_ref, wi_ref, fr_ref, fi_ref, b1r, b1i, b2r, b2i,
               or_ref, oi_ref):
        i = pl.program_id(0)
        catr = jnp.concatenate([b1r[:], b2r[:]], axis=0)  # [2hb, tb]
        cati = jnp.concatenate([b1i[:], b2i[:]], axis=0)
        # mirror[t] = z[(H - (i*hb + t)) mod H] = rev(cat[1 : hb+1])
        mr = _rev_roll(catr[1 : hb + 1], hb, 0)
        mi = _rev_roll(cati[1 : hb + 1], hb, 0)
        wr_ = wr_ref[:]
        wi_ = wi_ref[:]
        row = lax.broadcasted_iota(jnp.int32, fr_ref.shape, 0)
        is0 = (row == 0) & (i == 0)
        if backward:
            sr = fr_ref[:]
            si = fi_ref[:]
            xar = sr
            xai = jnp.where(is0, 0.0, si)
            xbr = jnp.where(is0, si, mr)
            xbi = jnp.where(is0, 0.0, mi)
            p = 1.0 + wi_
            q = 1.0 - wi_
            r_ = wr_
            or_ref[:] = p * xar - r_ * xai + q * xbr - r_ * xbi
            oi_ref[:] = r_ * xar + p * xai - r_ * xbr - q * xbi
        else:
            zr = fr_ref[:]
            zi = fi_ref[:]
            a = 0.5 * (1.0 + wi_)
            b_ = 0.5 * wr_
            c = 0.5 * (1.0 - wi_)
            xr = a * zr + b_ * zi + c * mr + b_ * mi
            xi = -b_ * zr + a * zi + b_ * mr - c * mi
            or_ref[:] = jnp.where(is0, zr + zi, xr)
            oi_ref[:] = jnp.where(is0, zr - zi, xi)

    def call(ar, ai):
        b = ar.shape[-1]
        grid = (nb, b // tb)
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(VMEM_LIMIT))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[w_spec, w_spec, front, front,
                      back1, back1, back2, back2],
            out_specs=[front, front],
            out_shape=[jax.ShapeDtypeStruct((n, b), jnp.float32)] * 2,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=16 * n * b, bytes_accessed=8 * 4 * n * b,
                transcendentals=0),
            **params,
        )(jnp.asarray(wr), jnp.asarray(wi), ar, ai, ar, ai, ar, ai)

    return call


def real_split_tmajor_pallas(
    zr: jax.Array, zi: jax.Array, real_twiddle, *, backward: bool = False,
    tb: int | None = None, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """ONE-pass real split step on tmajor planes [H, B] (pow2 H).

    The whole transform column sits in VMEM per grid step, so the
    Hermitian mirror is a free in-VMEM roll network — one read + one
    write per plane where the flat jnp form costs ~2.7 passes
    (realanat_r5.txt).  Serves the kern2-routed sizes (H >= 8192) whose
    FFT passes can't absorb the split.  Forward == flat forward; backward
    == flat backward (returns the same 2*Z convention)."""

    n, b = zr.shape
    if n & (n - 1):
        raise ValueError(f"split kernel needs pow2 H, got {n}")
    if tb is None:
        tb = 128 if b % 128 == 0 else None
        if tb is None:
            raise ValueError(f"batch {b} must be a multiple of 128")
    from . import split as _split

    twr, twi = _split._split_real_tw(real_twiddle)
    twr_b = np.ascontiguousarray(twr, np.float32).tobytes()
    twi_b = np.ascontiguousarray(twi, np.float32).tobytes()
    if is_wall_tile(n, tb):
        # full-column tiles past the envelope FAIL the remote compile
        # (realsplit2_r5: HTTP 500 at H=16384/tb128 even with the wall
        # config) — the blocked 3-view form stays inside it
        hb = n
        while hb * tb > _SAFE_ELEMS // 2 and hb % 2 == 0:
            hb //= 2
        call = _build_real_split_blocked(
            n, hb, tb, backward, interpret, twr_b, twi_b)
        return call(zr, zi)
    call = _build_real_split(
        n, tb, backward, interpret, twr_b, twi_b, VMEM_LIMIT, False)
    return call(zr, zi)


def supported(plan: _plan.Plan) -> bool:
    """Whether the fused kernel covers this plan (complex engine factors)."""

    return (
        plan.local_split is None
        and len(plan.stages) > 0
        and all(st.r in (1, 2, 3, 4, 5, 8, 16) for st in plan.stages)
    )


def thin_factors(n: int, radix16: bool = True) -> Tuple[int, ...] | None:
    """A kernel-supported stage chain for engine length ``n``.

    radix16=True prefers fat 16/8 stages (fewest VMEM traversals — each
    stage is a full pass over the [N, TB] tile in VMEM, so a (16,16,4)
    chain at N=1024 does 3 passes where the radix<=5 (4,4,4,4,4) chain
    does 5); False gives the radix<=5 chain.  None if n is not
    2/3/5-smooth."""

    a = 0
    m = n
    while m % 2 == 0:
        m //= 2
        a += 1
    out = []
    if radix16:
        while a >= 4:
            out.append(16)
            a -= 4
        if a == 3:
            out.append(8)
            a = 0
    while a >= 2:
        out.append(4)
        a -= 2
    if a:
        out.append(2)
    while m % 5 == 0:
        out.append(5)
        m //= 5
    while m % 3 == 0:
        out.append(3)
        m //= 3
    if m != 1:
        return None
    return tuple(out)


# Mosaic's *scoped* VMEM limit defaults to 16 MB, far below the 128 MB of
# physical VMEM on v5e.  The unrolled stage chain's live values are what
# blow past 16 MB at N>=2048 (and N=1024 tb>=256); raising the scoped
# limit via compiler params is the direct fix — the kernel still only
# *uses* what its dataflow needs, the limit is a compile-time gate.
VMEM_LIMIT = 100 * 1024 * 1024

# Wall tiles (n*tb above the pipelined-grid envelope _SAFE_ELEMS) compile
# RELIABLY only with dimension_semantics=('arbitrary',) — no grid I/O
# double-buffering — and the limit at 127 MB (wall_r4.txt: scr100 0/2,
# arb127 2/2 at 4096/tb512 and 2048/tb1024; 4096/tb512 then measures
# 0.477 med SoL at the plateau vs 0.331 for tb256).
WALL_VMEM_LIMIT = 127 * 1024 * 1024


def is_wall_tile(n: int, tb: int) -> bool:
    return n * tb > _SAFE_ELEMS


@functools.lru_cache(maxsize=256)
def _build(plan: _plan.Plan, backward: bool, tb: int, interpret: bool,
           inner: int = 0, vmem_limit: int | None = VMEM_LIMIT,
           scratch: bool = False, arbitrary_grid: bool = False):
    n = plan.engine_n
    active = [s for s in plan.stages if s.r != 1]
    tw_inputs = []
    tw_specs = []
    for st in active:
        tw = st.twiddle  # [l, r] complex (forward sign)
        tw_inputs.append(np.ascontiguousarray(tw.real, dtype=np.float32))
        tw_inputs.append(np.ascontiguousarray(tw.imag, dtype=np.float32))
        spec = pl.BlockSpec((st.l, st.r), lambda j: (0, 0), memory_space=pltpu.VMEM)
        tw_specs.extend([spec, spec])

    data_spec = pl.BlockSpec((n, tb), lambda j: (0, j), memory_space=pltpu.VMEM)
    scratch_shapes = []
    if scratch:
        kernel = _make_kernel_scratch(n, plan.stages, backward)
        scratch_shapes = [pltpu.VMEM((n, tb), jnp.float32)] * 2
    else:
        kernel = _make_kernel(n, plan.stages, backward, inner)

    def call(re, im):
        b = re.shape[-1]
        # ragged batches get a masked edge block (grid = ceil(b/tb));
        # the chain is column-independent so padding lanes stay inert
        grid = (-(-b // tb),)
        out_shape = [
            jax.ShapeDtypeStruct((n, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ]
        flops = int(8 * n * math.log2(max(n, 2)) * b)
        ntw = len(tw_inputs)
        params = {}
        if not interpret and (vmem_limit or arbitrary_grid):
            # 'arbitrary' stops Mosaic from double-buffering the I/O
            # blocks across grid steps — at the n*tb compile wall the
            # pipelining buffers are ~half the VMEM budget
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit) if vmem_limit else None,
                dimension_semantics=("arbitrary",) if arbitrary_grid else None,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*tw_specs, data_spec, data_spec],
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            # in-place: halves the HBM footprint and the VMEM I/O staging
            # (without it N=4096 TB=128 exceeds the 16 MB scoped limit)
            input_output_aliases={ntw: 0, ntw + 1: 1},
            interpret=interpret,
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * 4 * n * b, transcendentals=0
            ),
            **params,
        )(*[jnp.asarray(t) for t in tw_inputs], re, im)

    return call


def cfft_pallas_tmajor(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    tb: int = DEFAULT_TB,
    interpret: bool = False,
    inner: int = 0,
    vmem_limit: int | None = VMEM_LIMIT,
    scratch: bool = False,
    arbitrary_grid: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batched complex FFT of TIME-MAJOR planes [N, B] (B % tb == 0).

    Unscaled both directions; canonical bin order (Stockham autosort).
    inner > 0 processes each [N, tb] block in sequential ``inner``-column
    chunks (smaller Mosaic scoped-VMEM stack at wide tiles).
    scratch=True routes stage outputs through explicit VMEM ping-pong
    refs instead of SSA values — the live set stops scaling with stage
    count (single-pass coverage at large N; see _make_kernel_scratch).
    """

    if not supported(plan):
        raise ValueError(f"plan {plan} has unsupported factors for the fused kernel")
    n, b = re.shape[-2], re.shape[-1]
    if n != plan.engine_n:
        raise ValueError(f"data length {n} != plan engine length {plan.engine_n}")
    # b % tb != 0 is allowed: the grid gets a masked edge block (see
    # _build.call) — the dispatcher gates ragged routing separately
    if inner and tb % inner:
        raise ValueError(f"tile {tb} must be a multiple of inner chunk {inner}")
    if is_wall_tile(n, tb):
        # the reliable wall config (wall_r4.txt): no grid double-buffer,
        # limit at 127 MB, scratch chain
        arbitrary_grid = True
        scratch = True
        if vmem_limit == VMEM_LIMIT:
            vmem_limit = WALL_VMEM_LIMIT
    call = _build(plan, backward, tb, interpret, inner, vmem_limit, scratch,
                  arbitrary_grid)
    return call(re, im)


# ---------------------------------------------------------------------------
# Combine kernel (pass B of the two-kernel-pass engine, round 5).
#
# The engine's compile wall is n*tb <= 1M elements per kernel tile
# (vmem2_r4.txt) — a DIRECT single-pass kernel above N=8192 cannot hold a
# full-length column tile in VMEM.  The two-pass engine splits N = m*r the
# ksplit way: time-major [N, B] reshaped [m, r*B] is a FREE decimation-in-
# time split (lane column (c, b) holds x[c::r]), pass A runs the wide-tile
# length-m kernel over it (the 0.5-0.8 SoL regime), and this kernel is
# pass B — the twiddled radix-r combine X[t*m + k] = sum_c W_N^{ck} W_r^{ct}
# Z_c[k], tiled over BOTH the spectrum index k (sublanes, mk rows/step) and
# the batch (lanes, tb cols/step).  Every relayout lives at the BlockSpec
# I/O level: the input block is mk*r CONTIGUOUS rows of the pass-A output
# (state [m, r, B] row-major), the output block writes r stripes of a
# [r, m, B] buffer whose flat view IS the canonical [N, B] spectrum.  No
# in-kernel lane slicing or concat — the relayout traffic that made the
# one-pass ksplit2 form lose (ksplit2_r4.txt).
# ---------------------------------------------------------------------------


def _make_combine_kernel(r: int, backward: bool):
    sign = 1.0 if backward else -1.0

    def kernel(twr_ref, twi_ref, re_ref, im_ref, or_ref, oi_ref):
        mk = twr_ref.shape[0]
        tb = re_ref.shape[-1]
        twr = twr_ref[:]                                   # [mk, r]
        twi = -twi_ref[:] if backward else twi_ref[:]
        ar = re_ref[:].reshape(mk, r, tb)                  # sublane split
        ai = im_ref[:].reshape(mk, r, tb)
        slabs = []
        for i in range(r):
            sr_, si_ = ar[:, i], ai[:, i]                  # [mk, tb]
            if i > 0:                                      # T[k, 0] == 1
                wr = twr[:, i].reshape(mk, 1)
                wi = twi[:, i].reshape(mk, 1)
                sr_, si_ = sr_ * wr - si_ * wi, sr_ * wi + si_ * wr
            slabs.append((sr_, si_))
        ys = _butterfly(r, slabs, sign)
        for t in range(r):
            or_ref[t] = ys[t][0]
            oi_ref[t] = ys[t][1]

    return kernel


def _make_combine_kernel_v2(r: int, backward: bool):
    """Per-slab-ref combine: the r sub-spectra arrive as r separate input
    blocks (the SAME HBM buffer passed r times with per-slab index maps),
    so the kernel never does v1's stride-r sublane re-slicing — the only
    in-kernel work is the twiddle multiply and the butterfly."""

    sign = 1.0 if backward else -1.0

    def kernel(*refs):
        twr_ref, twi_ref = refs[0], refs[1]
        re_refs = refs[2 : 2 + r]
        im_refs = refs[2 + r : 2 + 2 * r]
        or_ref, oi_ref = refs[2 + 2 * r], refs[3 + 2 * r]
        mk = twr_ref.shape[0]
        twr = twr_ref[:]
        twi = -twi_ref[:] if backward else twi_ref[:]
        slabs = []
        for c in range(r):
            sr_, si_ = re_refs[c][:], im_refs[c][:]        # [mk, tb]
            if c > 0:                                      # T[k, 0] == 1
                wr = twr[:, c].reshape(mk, 1)
                wi = twi[:, c].reshape(mk, 1)
                sr_, si_ = sr_ * wr - si_ * wi, sr_ * wi + si_ * wr
            slabs.append((sr_, si_))
        ys = _butterfly(r, slabs, sign)
        for t in range(r):
            or_ref[t] = ys[t][0]
            oi_ref[t] = ys[t][1]

    return kernel


@functools.lru_cache(maxsize=128)
def _build_combine_v2(n: int, m: int, r: int, mk: int, tb: int, b: int,
                      backward: bool, interpret: bool, twr_b, twi_b):
    """v2 feeds the WIDE [m, r*B] view (pass A's native output — slab c
    is the contiguous lane range [c*B, (c+1)*B)): each sub-spectrum
    arrives as its own aligned 2D lane block, no squeezed block dims and
    no in-kernel stride-r re-slicing."""

    twr = np.frombuffer(twr_b, dtype=np.float32).reshape(m, r)
    twi = np.frombuffer(twi_b, dtype=np.float32).reshape(m, r)
    kernel = _make_combine_kernel_v2(r, backward)
    tw_spec = pl.BlockSpec((mk, r), lambda ki, j: (ki, 0),
                           memory_space=pltpu.VMEM)
    lanes_per_slab = b // tb
    slab_specs = [
        pl.BlockSpec(
            (mk, tb),
            lambda ki, j, c=c: (ki, c * lanes_per_slab + j),
            memory_space=pltpu.VMEM,
        )
        for c in range(r)
    ]
    out_spec = pl.BlockSpec((r, mk, tb), lambda ki, j: (0, ki, j),
                            memory_space=pltpu.VMEM)

    def call(re, im):
        rew = re.reshape(m, r * b)
        imw = im.reshape(m, r * b)
        grid = (m // mk, b // tb)
        out_shape = [
            jax.ShapeDtypeStruct((r, m, b), jnp.float32),
            jax.ShapeDtypeStruct((r, m, b), jnp.float32),
        ]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(VMEM_LIMIT))
        orr, oii = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tw_spec, tw_spec] + slab_specs + slab_specs,
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(8 * r * math.log2(max(r, 2)) * m * b),
                bytes_accessed=4 * 4 * n * b, transcendentals=0),
            **params,
        )(jnp.asarray(twr), jnp.asarray(twi), *([rew] * r), *([imw] * r))
        return orr.reshape(n, b), oii.reshape(n, b)

    return call


@functools.lru_cache(maxsize=128)
def _build_packed(plan, backward: bool, tb: int, interpret: bool,
                  lpb: int, scratch: bool, slabs: int = 1,
                  vmem_limit: int | None = VMEM_LIMIT,
                  arbitrary_grid: bool = False):
    """Kernel build whose re/im input tiles come from ONE packed buffer.

    ``slabs=1``: buffer [n, 2B] with re at lanes :B, im at B: (the
    time-major real pack x.reshape(H, 2B)); ``lpb`` = B//tb lane blocks
    per plane.  The pack never materializes: the DMA engine pulls each
    plane's tile straight from the packed buffer.

    ``slabs=r > 1`` (kern2 pass A): buffer [m, r*2B] — the free
    x.reshape(m, r*2B) wide view of the same pack, where DIT slab j's re
    lanes sit at [j*2B, j*2B+B) and its im lanes at [j*2B+B, (j+1)*2B).
    The grid walks slab-major lane tiles; outputs are the PLANAR pass-A
    state [m, r*B] x2, ready for the combine kernel.  Outputs planar in
    both modes (no aliasing — input/output shapes differ)."""

    n = plan.engine_n
    active = [s for s in plan.stages if s.r != 1]
    tw_inputs = []
    tw_specs = []
    for st in active:
        tw = st.twiddle
        tw_inputs.append(np.ascontiguousarray(tw.real, dtype=np.float32))
        tw_inputs.append(np.ascontiguousarray(tw.imag, dtype=np.float32))
        spec = pl.BlockSpec((st.l, st.r), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
        tw_specs.extend([spec, spec])
    re_spec = pl.BlockSpec(
        (n, tb), lambda j: (0, (j // lpb) * (2 * lpb) + (j % lpb)),
        memory_space=pltpu.VMEM)
    im_spec = pl.BlockSpec(
        (n, tb), lambda j: (0, (j // lpb) * (2 * lpb) + lpb + (j % lpb)),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, tb), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    scratch_shapes = []
    if scratch:
        kernel = _make_kernel_scratch(n, plan.stages, backward)
        scratch_shapes = [pltpu.VMEM((n, tb), jnp.float32)] * 2
    else:
        kernel = _make_kernel(n, plan.stages, backward, 0)

    def call(y):
        b = slabs * lpb * tb
        grid = (b // tb,)
        out_shape = [
            jax.ShapeDtypeStruct((n, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ]
        params = {}
        if not interpret and (vmem_limit or arbitrary_grid):
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(vmem_limit) if vmem_limit else None,
                dimension_semantics=("arbitrary",) if arbitrary_grid
                else None,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*tw_specs, re_spec, im_spec],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(8 * n * math.log2(max(n, 2)) * b),
                bytes_accessed=4 * 4 * n * b, transcendentals=0),
            **params,
        )(*[jnp.asarray(t) for t in tw_inputs], y, y)

    return call


def cfft_pallas_tmajor_packed(
    plan, y: jax.Array, *, backward: bool = False, tb: int | None = None,
    interpret: bool = False, scratch: bool | None = None, slabs: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Complex FFT of a PACKED time-major buffer -> planar pair.

    slabs=1: y [n, 2B] with lanes :B re, B: im — exactly
    ``x.reshape(H, 2B)`` of an interleaved real stream -> ([n, B]) x2.
    slabs=r: y [n, r*2B] — the kern2 pass-A wide view
    ``x.reshape(m, r*2B)``; each DIT slab's re/im lanes DMA from their
    packed offsets -> the planar pass-A state ([n, r*B]) x2.
    The pack costs zero HBM passes either way."""

    n, bw = y.shape
    b = bw // (2 * slabs)
    if n != plan.engine_n:
        raise ValueError(f"data length {n} != plan engine length {n}")
    if tb is None:
        tb = best_tb(n, slabs * b) or DEFAULT_TB
    if b % tb:
        raise ValueError(f"half-batch {b} must be a multiple of tile {tb}")
    if scratch is None:
        scratch = use_scratch(n, tb)
    vmem_limit, arbitrary_grid = VMEM_LIMIT, False
    if is_wall_tile(n, tb):
        # the reliable wall config (wall_r4.txt): no grid double-buffer,
        # limit at 127 MB, scratch chain
        arbitrary_grid = True
        scratch = True
        vmem_limit = WALL_VMEM_LIMIT
    call = _build_packed(plan, backward, tb, interpret, b // tb, scratch,
                         slabs, vmem_limit, arbitrary_grid)
    return call(y)


def stream_copy_pallas(re: jax.Array, im: jax.Array, *, rows: int = 512,
                       tb: int = 512, interpret: bool = False):
    """Pure-copy Pallas pass over [N, B] planes — the per-pass stream
    ceiling of a geometry (probe tool; kern2b_r5)."""

    n, b = re.shape
    while rows > 8 and n % rows:
        rows //= 2
    while tb > 128 and b % tb:
        tb //= 2

    def kernel(re_ref, im_ref, or_ref, oi_ref):
        or_ref[:] = re_ref[:]
        oi_ref[:] = im_ref[:]

    spec = pl.BlockSpec((rows, tb), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(VMEM_LIMIT))
    return pl.pallas_call(
        kernel,
        grid=(n // rows, b // tb),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, b), jnp.float32)] * 2,
        interpret=interpret,
        **params,
    )(re, im)


# Combine-kernel tile policy: mk rows x tb lanes per grid step.  The live
# set is ~4 blocks of mk*r*tb elements (in + out plane pairs) plus grid
# double-buffering; 256K elements/block keeps it ~8 MB — far inside the
# 100 MB scoped limit, no wall semantics needed.
_COMBINE_ELEMS = 256 * 1024


def _combine_tiles(m: int, r: int, b: int,
                   mk: int | None, tb: int | None) -> Tuple[int, int]:
    if tb is None:
        tb = 512
        while tb > 128 and b % tb:
            tb //= 2
    if mk is None:
        # largest DIVISOR of m within the block budget, multiples of 8
        # preferred (sublane granularity); non-pow2 m (e.g. 3072, 600)
        # must not fall out of divisibility (the old halving loop could
        # exit at a non-divisor)
        cap = min(m, max(8, _COMBINE_ELEMS // (r * tb)))
        mk = None
        for cand in range(8, cap + 1, 8):
            if m % cand == 0:
                mk = cand
        if mk is None:
            mk = max(d for d in range(1, cap + 1) if m % d == 0)
    return mk, tb


@functools.lru_cache(maxsize=128)
def _build_combine(n: int, m: int, r: int, mk: int, tb: int,
                   backward: bool, interpret: bool, twr_b, twi_b):
    twr = np.frombuffer(twr_b, dtype=np.float32).reshape(m, r)
    twi = np.frombuffer(twi_b, dtype=np.float32).reshape(m, r)
    kernel = _make_combine_kernel(r, backward)
    tw_spec = pl.BlockSpec((mk, r), lambda ki, j: (ki, 0),
                           memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((mk * r, tb), lambda ki, j: (ki, j),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((r, mk, tb), lambda ki, j: (0, ki, j),
                            memory_space=pltpu.VMEM)

    def call(re, im):
        b = re.shape[-1]
        grid = (m // mk, b // tb)
        out_shape = [
            jax.ShapeDtypeStruct((r, m, b), jnp.float32),
            jax.ShapeDtypeStruct((r, m, b), jnp.float32),
        ]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(VMEM_LIMIT))
        orr, oii = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tw_spec, tw_spec, in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=int(8 * r * math.log2(max(r, 2)) * m * b),
                bytes_accessed=4 * 4 * n * b, transcendentals=0),
            **params,
        )(jnp.asarray(twr), jnp.asarray(twi), re, im)
        return orr.reshape(n, b), oii.reshape(n, b)

    return call


def cfft_combine_tmajor(
    last_stage,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    mk: int | None = None,
    tb: int | None = None,
    interpret: bool = False,
    variant: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Twiddled radix-r combine of the ksplit state (pass B).

    ``last_stage``: the l=m, radix-r, m'=1 StageTables of the full plan
    (dispatch._build_ksplit); planes are [N, B] holding the pass-A state
    [m, r, B] row-major.  Returns the canonical ordered spectrum [N, B].
    variant 2 (default) feeds the r sub-spectra as separate per-slab
    input blocks (no in-kernel stride-r re-slicing); 1 is the original
    single-block form (kern2b_r5 A/B).
    """

    m, r = last_stage.l, last_stage.r
    n, b = re.shape
    if n != m * r:
        raise ValueError(f"data length {n} != combine {m}*{r}")
    mk, tb = _combine_tiles(m, r, b, mk, tb)
    if m % mk or b % tb:
        raise ValueError(f"tiles ({mk},{tb}) must divide ({m},{b})")
    tw = last_stage.twiddle
    twr_b = np.ascontiguousarray(tw.real, dtype=np.float32).tobytes()
    twi_b = np.ascontiguousarray(tw.imag, dtype=np.float32).tobytes()
    if variant == 1:
        call = _build_combine(n, m, r, mk, tb, backward, interpret,
                              twr_b, twi_b)
    else:
        call = _build_combine_v2(n, m, r, mk, tb, b, backward, interpret,
                                 twr_b, twi_b)
    return call(re, im)


def cfft_pallas(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    tb: int = DEFAULT_TB,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Batch-major convenience: [B, N] planes (one transpose each way)."""

    rr, ri = cfft_pallas_tmajor(
        plan, re.T, im.T, backward=backward, tb=tb, interpret=interpret
    )
    return rr.T, ri.T
