"""Pallas real-FFT split-step kernels (batch-major [B, H] planes).

The TPU analog of the reference's fused REAL_FINALIZE / REAL_PREPROCESS
stages (/root/reference/src/pffft_priv_impl.h:1273-1462): the reference
folds the real<->complex split step into the SIMD pipeline so it never
costs a separate memory pass; here XLA refuses to fuse the Hermitian
mirror (a flip) into the elementwise combine, and the composed jnp split
step measures ~5 HBM passes (real_anatomy_r4.txt: 0.093 SoL at N=2^20-21
— the post-step costs 70% of the half-length engine itself).

**Backend status (round 5):** UNBLOCKED.  Mosaic still has no `rev`
primitive, but reversal = XOR of the index with (hb-1), emulated with
log2(hb) roll-pairs + selects (pallas_fft._rev_roll) — measured on chip
to lower on both axes and run at the stream-copy ceiling
(revroll_r5.txt).  The mirror below now uses the roll network; the
time-major path additionally gets the FULLY fused FFT+split kernels
(pallas_fft.rfft_*_tmajor_fused, routed at H=512..4096) and the
standalone one-pass split kernel (real_split_tmajor_pallas) — this
batch-major 3-view kernel serves the batch-major layout at H >= 2^14.

This kernel does the whole step in one pass.  The Hermitian pairing
k <-> (H - k) mod H is block-misaligned by exactly one column, so each
grid step reads THREE views of each input plane — its own block j plus
the two back blocks (nb-1-j) and ((nb-j) % nb) — and builds the mirror
with an in-VMEM concat+slice+lane-reverse:

    cat = [block(nb-1-j) | block((nb-j) % nb)]      # global [H-(j+1)h, H-jh+h)
    mirror[t] = z[H - (jh+t)] = cat[h - t] = reverse(cat[1 : h+1])

Traffic: 3 reads + 1 write per plane pair (~2 pass-equivalents) vs ~5
for the jnp composition.  bin0 packing (x[0] = DC + i*Nyq,
pffft.h:144-155) is handled in-kernel with a lane-index mask on block 0.

Forward:  z (half-length complex spectrum) -> packed real spectrum x.
Backward: packed spectrum s -> 2*Z (the half-length engine's backward
input), matching ops/split.py:real_backward_split_planar exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as _pk

__all__ = ["real_split_pallas", "supported_shape", "pick_blocks"]


def pick_blocks(b: int, h: int) -> Tuple[int, int] | None:
    """(bt, hb) grid blocks for [B, H] planes, or None (jnp fallback).

    hb: widest power-of-two lane block <= 32768 dividing H (>= 512 so
    the concat/slice relayout amortizes); bt: widest power-of-two
    sublane block <= 256 dividing B.
    """

    if h < (1 << 14):
        return None  # small H: the jnp composition is fine (and fuses)
    bt = None
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if b % cand == 0:
            bt = cand
            break
    # joint budget: ~10 blocks of [bt, hb] live (8 in views + 2 out, plus
    # pipelining) — keep bt*hb <= 256K elements (1 MB/block)
    hb = None
    for cand in (8192, 4096, 2048, 1024, 512):
        if h % cand == 0 and h // cand >= 2 and bt * cand <= (1 << 18):
            hb = cand
            break
    if hb is None:
        return None
    return bt, hb


def supported_shape(b: int, h: int) -> bool:
    return pick_blocks(b, h) is not None


def _make_kernel(h: int, hb: int, backward: bool):
    def fwd_kernel(twr_ref, twi_ref, fr_ref, fi_ref,
                   b1r_ref, b1i_ref, b2r_ref, b2i_ref, xr_ref, xi_ref):
        zr = fr_ref[:]          # [bt, hb] front block (k = j*hb + t)
        zi = fi_ref[:]
        catr = jnp.concatenate([b1r_ref[:], b2r_ref[:]], axis=-1)
        cati = jnp.concatenate([b1i_ref[:], b2i_ref[:]], axis=-1)
        mr = _pk._rev_roll(catr[:, 1 : hb + 1], hb, 1)  # z[(H-k) mod H].re
        mi = _pk._rev_roll(cati[:, 1 : hb + 1], hb, 1)
        cr, ci = mr, -mi                    # conj(z[H-k])
        er, ei = 0.5 * (zr + cr), 0.5 * (zi + ci)
        orr, oi = 0.5 * (zi - ci), -0.5 * (zr - cr)
        wr = twr_ref[:]                     # [1, hb]
        wi = twi_ref[:]
        xr = er + wr * orr - wi * oi
        xi = ei + wr * oi + wi * orr
        # bin0 packing on the global first column: x[0] = DC + i*Nyq
        j = pl.program_id(1)
        col = lax.broadcasted_iota(jnp.int32, zr.shape, 1)
        is0 = (col == 0) & (j == 0)
        xr_ref[:] = jnp.where(is0, zr + zi, xr)
        xi_ref[:] = jnp.where(is0, zr - zi, xi)

    def bwd_kernel(twr_ref, twi_ref, fr_ref, fi_ref,
                   b1r_ref, b1i_ref, b2r_ref, b2i_ref, zr_ref, zi_ref):
        j = pl.program_id(1)
        col = lax.broadcasted_iota(jnp.int32, fr_ref.shape, 1)
        is0 = (col == 0) & (j == 0)
        sr = fr_ref[:]
        si = fi_ref[:]
        # xa = packed spectrum with Im xa[0] := 0 (DC is real)
        xar = sr
        xai = jnp.where(is0, 0.0, si)
        catr = jnp.concatenate([b1r_ref[:], b2r_ref[:]], axis=-1)
        cati = jnp.concatenate([b1i_ref[:], b2i_ref[:]], axis=-1)
        xbr = _pk._rev_roll(catr[:, 1 : hb + 1], hb, 1)  # xa[(H-k) mod H]
        xbi = _pk._rev_roll(cati[:, 1 : hb + 1], hb, 1)
        # mirror element at k=0 is xa[0] = (dc, nyq-in-im): the backward
        # prepare wants xb[0] = (nyq, 0) — rewrite from the front block's
        # own column 0 (global bin0 holds nyq in the imag lane)
        xbr = jnp.where(is0, si, xbr)
        xbi = jnp.where(is0, 0.0, xbi)
        # the mirror's imag must also honor Im xa[0] == 0, but index 0 is
        # only ever the mirror of k=0 (handled above), so no extra fix.
        er, ei = xar + xbr, xai - xbi
        dr, di = xar - xbr, xai + xbi
        wr = twr_ref[:]
        wi = twi_ref[:]
        orr = wr * dr + wi * di              # o = conj(w) * d
        oi = wr * di - wi * dr
        zr_ref[:] = er - oi
        zi_ref[:] = ei + orr

    return bwd_kernel if backward else fwd_kernel


@functools.lru_cache(maxsize=128)
def _build(h: int, bt: int, hb: int, backward: bool, interpret: bool):
    nb = h // hb
    front = pl.BlockSpec((bt, hb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    back1 = pl.BlockSpec(
        (bt, hb), lambda i, j: (i, nb - 1 - j), memory_space=pltpu.VMEM)
    back2 = pl.BlockSpec(
        (bt, hb), lambda i, j: (i, (nb - j) % nb), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, hb), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    kernel = _make_kernel(h, hb, backward)

    def call(twr, twi, ar, ai):
        b = ar.shape[0]
        grid = (b // bt, nb)
        out_shape = [
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ]
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(_pk.VMEM_LIMIT)
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[tw_spec, tw_spec, front, front,
                      back1, back1, back2, back2],
            out_specs=[front, front],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=16 * b * h, bytes_accessed=6 * 4 * b * h,
                transcendentals=0,
            ),
            **params,
        )(twr.reshape(1, h), twi.reshape(1, h), ar, ai, ar, ai, ar, ai)

    return call


def real_split_pallas(
    zr: jax.Array,
    zi: jax.Array,
    real_twiddle: np.ndarray,
    *,
    backward: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One-pass real split step on [B, H] planes (see module docstring).

    Forward == ops/split.real_forward_split_planar; backward ==
    real_backward_split_planar (returns 2*Z).  Caller gates via
    :func:`supported_shape`.
    """

    b, h = zr.shape
    blocks = pick_blocks(b, h)
    if blocks is None:
        raise ValueError(f"real split kernel does not cover shape {zr.shape}")
    bt, hb = blocks
    from . import split as _split

    twr, twi = _split._split_real_tw(real_twiddle)
    # Mosaic only compiles on TPU; elsewhere run interpreted (tests)
    interpret = interpret or jax.default_backend() != "tpu"
    call = _build(h, bt, hb, backward, interpret)
    return call(
        jnp.asarray(twr, jnp.float32), jnp.asarray(twi, jnp.float32), zr, zi
    )
