"""Fused two-stage MXU FFT kernel: both dense stages in one VMEM pass.

The production TPU plan policy factors N into two fat stages (e.g. 4096 =
64 x 64, plan.default_max_factor) and runs each as an MXU DFT-matrix
contraction.  Through XLA that is two-plus passes over HBM (stage-1 matmuls,
twiddle, stage-2 matmuls, plus Gauss combine traffic).  This kernel performs
the whole pipeline — stage-1 contraction, four-step twiddle, stage-2
contraction, output (re)ordering — on a (TB, N) tile resident in VMEM, so
the transform costs exactly one HBM read + one write.

This is the MXU-scale analog of the reference's fused finalize pass
(/root/reference/src/pffft_priv_impl.h:1195-1270: transpose + twiddle +
radix-4 combine in registers, one memory pass); the radix<=5 VPU kernel in
pallas_fft.py plays the same role for thin-stage plans.

Complex arithmetic per stage is ONE real matmul over lane-concatenated
planes: [ar | ai] (M, 2r) @ [[Wr, Wi], [-Wi, Wr]] (2r, 2r) -> [nr | ni].
For r = 64 this is a K=128 contraction that exactly fills the MXU.  (The
Gauss 3-matmul form the XLA path uses, ops/split.py:cmul_mode, reliably
crashes the Mosaic remote compiler at r=64 in several variants —
isolated by scripts/r2 probes — so the kernel uses the concat form; its
extra MXU work is the price of single-pass HBM traffic.)  The in-kernel
transposes between stages are VMEM-local, never HBM passes.

Layout contract (bit-matched to ops/split.py:cfft_stages_split, verified by
tests/test_fused_stage.py):
  ordered:   out[b, k2*n1 + k1]  (canonical bins, k = k1 + n1*k2)
  unordered: out[b, k1*n2 + k2]  (internal k1-major layout)
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import plan as _plan

__all__ = ["supported", "cfft_fused2", "DEFAULT_TB"]

DEFAULT_TB = 64  # batch rows per grid step (VMEM-sized for N up to 16384)

_PREC = jax.lax.Precision.HIGHEST


def supported(plan: _plan.Plan) -> bool:
    """Two dense stages, both factors MXU-sized (the TPU plan policy)."""

    active = [st for st in plan.stages if st.r > 1]
    return (
        plan.local_split is None
        and len(active) == 2
        and all(2 <= st.r <= 128 for st in active)
    )


def _mm(a, w):
    return jax.lax.dot_general(
        a, w, (((a.ndim - 1,), (0,)), ((), ())),
        precision=_PREC, preferred_element_type=jnp.float32,
    )


def _cstage_mm(ar, ai, b):
    """(ar + i*ai) @ W as one lane-concat real matmul against
    B = [[Wr, Wi], [-Wi, Wr]]; returns the planar halves."""

    r = ar.shape[-1]
    z = _mm(jnp.concatenate([ar, ai], axis=-1), b)
    return z[..., :r], z[..., r:]


def _cstage_gauss(ar, ai, tabs):
    """(ar + i*ai) @ W via Gauss's 3-multiplication form: 3 r x r matmuls
    (3/4 of the concat form's MXU work).  tabs = (Wr, Wi - Wr, Wi + Wr).
    The 3-dot combined-result pattern crashed the axon Mosaic compiler in
    round 2 (HTTP 500 at r=64); the minimal repro compiles after a
    service-side fix (benchmarks/results/MOSAIC_r3.md case D)."""

    wr, wdiff, wsum = tabs
    k1 = _mm(ar + ai, wr)
    k2 = _mm(ar, wdiff)
    k3 = _mm(ai, wsum)
    return k1 - k3, k1 + k2


def _make_kernel(n1: int, n2: int, ordered: bool, cmul: str = "concat"):
    """Kernel over 3D blocks (tb, n1, n2) — no lane-splitting reshapes
    inside the kernel (Mosaic rejects them); all data movement is
    swapaxes of the minor two dims plus last-axis matmuls.

    cmul: "concat" (one 2r x 2r matmul per stage) or "gauss" (three
    r x r matmuls, 25% less MXU work; compiles post-MOSAIC_r3)."""

    def kernel(*refs):
        if cmul == "gauss":
            (s1r, s1d, s1s, twr_ref, twi_ref, s2r, s2d, s2s,
             re_ref, im_ref, or_ref, oi_ref) = refs
            st1 = lambda ar, ai: _cstage_gauss(ar, ai, (s1r[:], s1d[:], s1s[:]))
            st2 = lambda ar, ai: _cstage_gauss(ar, ai, (s2r[:], s2d[:], s2s[:]))
        else:
            (b1_ref, twr_ref, twi_ref, b2_ref,
             re_ref, im_ref, or_ref, oi_ref) = refs
            st1 = lambda ar, ai: _cstage_mm(ar, ai, b1_ref[:])
            st2 = lambda ar, ai: _cstage_mm(ar, ai, b2_ref[:])
        xr = re_ref[:]  # (tb, j1, j2)
        xi = im_ref[:]
        # stage 1 contracts j1: transpose minor dims, matmul the last axis
        xr = jnp.swapaxes(xr, 1, 2)  # (tb, j2, j1)
        xi = jnp.swapaxes(xi, 1, 2)
        yr, yi = st1(xr, xi)
        # four-step twiddle at the current [j2, k1] layout (tables pre-transposed)
        twr = twr_ref[:]
        twi = twi_ref[:]
        yr, yi = yr * twr - yi * twi, yr * twi + yi * twr
        # stage 2 contracts j2: transpose back -> (tb, k1, j2)
        yr = jnp.swapaxes(yr, 1, 2)
        yi = jnp.swapaxes(yi, 1, 2)
        zr, zi = st2(yr, yi)
        if ordered:  # (b, k1, k2) -> (b, k2, k1): k = k1 + n1*k2 canonical
            zr = jnp.swapaxes(zr, 1, 2)
            zi = jnp.swapaxes(zi, 1, 2)
        or_ref[:] = zr
        oi_ref[:] = zi

    return kernel


@functools.lru_cache(maxsize=256)
def _tables(plan: _plan.Plan, backward: bool, cmul: str = "concat"):
    """Host-side stage matrices + transposed twiddle (per cmul form)."""

    st1, st2 = [st for st in plan.stages if st.r > 1]

    def concat_matrix(dft):
        wr = dft.real
        wi = dft.imag
        top = np.concatenate([wr, wi], axis=1)
        bot = np.concatenate([-wi, wr], axis=1)
        return np.ascontiguousarray(
            np.concatenate([top, bot], axis=0), dtype=np.float32
        )

    def gauss_tabs(dft):
        wr = np.ascontiguousarray(dft.real, dtype=np.float32)
        wdiff = np.ascontiguousarray(dft.imag - dft.real, dtype=np.float32)
        wsum = np.ascontiguousarray(dft.imag + dft.real, dtype=np.float32)
        return wr, wdiff, wsum

    d1 = np.conj(st1.dft) if backward else st1.dft
    d2 = np.conj(st2.dft) if backward else st2.dft
    tw = np.conj(st2.twiddle) if backward else st2.twiddle  # [l=n1, r=n2]
    twt = tw.T  # kernel layout [j2, k1]
    twr = np.ascontiguousarray(twt.real, dtype=np.float32)
    twi = np.ascontiguousarray(twt.imag, dtype=np.float32)
    if cmul == "gauss":
        return (*gauss_tabs(d1), twr, twi, *gauss_tabs(d2))
    return (concat_matrix(d1), twr, twi, concat_matrix(d2))


@functools.lru_cache(maxsize=256)
def _build(plan: _plan.Plan, backward: bool, ordered: bool, tb: int, interpret: bool,
           cmul: str = "concat"):
    st1, st2 = [st for st in plan.stages if st.r > 1]
    n1, n2 = st1.r, st2.r
    n = plan.engine_n
    assert n1 * n2 == n
    tabs = _tables(plan, backward, cmul)
    tab_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for t in tabs
    ]
    in_spec = pl.BlockSpec((tb, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    oshape = (n2, n1) if ordered else (n1, n2)
    out_spec = pl.BlockSpec((tb, *oshape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kernel = _make_kernel(n1, n2, ordered, cmul)

    def call(re, im):
        b = re.shape[0]
        out_shape = [
            jax.ShapeDtypeStruct((b, *oshape), jnp.float32),
            jax.ShapeDtypeStruct((b, *oshape), jnp.float32),
        ]
        # concat: 2 matmuls (2r x 2r); gauss: 6 matmuls (r x r, 3/4 the
        # work) — both at HIGHEST = 6 bf16 passes; bytes = 1 read + 1
        # write of both planes
        mxu_scale = 3 if cmul == "gauss" else 4
        flops = int(mxu_scale * 24 * b * n * max(n1, n2))
        zr, zi = pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[*tab_specs, in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * 4 * n * b, transcendentals=0
            ),
        )(
            *[jnp.asarray(t) for t in tabs],
            re.reshape(b, n1, n2),
            im.reshape(b, n1, n2),
        )
        return zr.reshape(b, n), zi.reshape(b, n)

    return call


def cfft_fused2(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    ordered: bool = True,
    tb: int = DEFAULT_TB,
    interpret: bool = False,
    cmul: str = "concat",
) -> Tuple[jax.Array, jax.Array]:
    """Batched complex FFT of batch-major planes [B, N] (B % tb == 0).

    Unscaled both directions; layout per the module contract.
    cmul: in-kernel complex-product form, "concat" or "gauss" (3/4 the
    MXU work; compiles since the MOSAIC_r3 service fix).
    """

    if cmul not in ("concat", "gauss"):
        raise ValueError(f"unknown cmul form {cmul!r}")
    if not supported(plan):
        raise ValueError(f"plan {plan} is not a two-fat-stage plan")
    b, n = re.shape
    if n != plan.engine_n:
        raise ValueError(f"data length {n} != plan engine length {plan.engine_n}")
    if b % tb:
        raise ValueError(f"batch {b} must be a multiple of tile {tb}")
    return _build(plan, backward, ordered, tb, interpret, cmul)(re, im)
