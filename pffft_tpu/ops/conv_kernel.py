"""Fused Pallas spectral-convolution kernel: FFT -> Hf multiply -> IFFT in
one HBM pass.

This is the TPU counterpart of the reference's fused frequency-domain
convolution identity (zconvolve in the internal layout,
/root/reference/src/pffft_priv_impl.h:1534-1684, driven by
pffastconv_apply's fwd-FFT / zconvolve / bwd-FFT block loop,
/root/reference/src/pffastconv.c:185-196): where the reference keeps the
pointwise complex multiply in SSE registers between two engine calls,
this kernel keeps the WHOLE block pipeline — every forward butterfly
stage, the spectrum multiply, and every inverse stage — on a [N, TB]
VMEM tile, so one overlap-save block costs one HBM read + one write
instead of the XLA path's three round trips (fft, multiply, ifft).

Layout and algebra are those of ops/pallas_fft.py (time-major planes,
batch on lanes, Stockham autosort — see that module's docstring): the
forward chain emits the spectrum in canonical bin order, the multiply is
order-agnostic (the filter spectrum is passed in the same order), and
the inverse chain (conjugated twiddles) returns natural time order.  The
1/N inverse scale is folded into the filter spectrum on the host, so the
kernel itself does no extra work for it.

Real-input convolution rides the same kernel by the classic two-for-one
packing: for a REAL filter h, Hf is Hermitian, so with two real frames
packed as re=a, im=b the pointwise product Hf*(A + iB) inverse-transforms
to (h*a) + i*(h*b) exactly — two real convolutions per complex kernel
pass, with no Hermitian split step in the kernel.
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
from . import pallas_fft as _pk

__all__ = ["zconv_pallas_tmajor", "filter_spectrum", "supported"]


def supported(plan: _plan.Plan) -> bool:
    """Whether the fused conv kernel covers this plan (complex factors)."""

    return _pk.supported(plan)


# Scratch-vs-unrolled preference for the DOUBLED (fwd+bwd) chain: the
# unrolled form compiled and won at nfft<=512 in round 3 (convroute_r3);
# nfft>=1024 needs the ping-pong form (the unrolled chain died at any
# tile there, convkernel_r4 probes the scratch coverage).
_SCRATCH_PREF = {1024: True, 2048: True, 4096: True}


def use_scratch(n: int, tb: int) -> bool:
    pref = _SCRATCH_PREF.get(n)
    if pref is not None:
        return pref
    return n * tb > 192 * 1024  # past the widest round-3 unrolled compile


def filter_spectrum(plan: _plan.Plan, h: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(hfr, hfi): spectrum of filter ``h`` zero-padded to N, canonical
    order, pre-scaled by 1/N so the kernel's inverse needs no rescale."""

    n = plan.n
    hp = np.zeros(n, np.complex128)
    hp[: len(h)] = np.asarray(h, np.complex128)
    hf = np.fft.fft(hp) / n
    return hf.real.astype(np.float32), hf.imag.astype(np.float32)


def _make_conv_kernel(n: int, stages, inner: int = 0):
    """Kernel (tw refs..., hfr, hfi, re, im, or_, oi_): fused fwd->mul->bwd."""

    active = [s for s in stages if s.r != 1]

    def chain(ar, ai, tw, backward):
        sign = 1.0 if backward else -1.0
        for idx, st in enumerate(active):
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            ar, ai = _pk._stage_values(ar, ai, st.l, st.r, st.m, twr, twi, sign)
        return ar, ai

    def kernel(*refs):
        ntw = len(active)
        tw = [r_[:] for r_ in refs[: 2 * ntw]]
        hfr_ref, hfi_ref, re_ref, im_ref, or_ref, oi_ref = refs[2 * ntw :]
        hr = hfr_ref[:]  # [n, 1]
        hi = hfi_ref[:]
        tb = re_ref.shape[-1]

        def block(xr, xi, cols):
            ar = xr.reshape(1, n, cols)
            ai = xi.reshape(1, n, cols)
            ar, ai = chain(ar, ai, tw, backward=False)
            sr = ar.reshape(n, cols)
            si = ai.reshape(n, cols)
            # pointwise spectrum multiply, broadcast over lanes ([n,1]*[n,cols])
            mr = sr * hr - si * hi
            mi = sr * hi + si * hr
            ar, ai = chain(mr.reshape(1, n, cols), mi.reshape(1, n, cols), tw, backward=True)
            return ar.reshape(n, cols), ai.reshape(n, cols)

        if not inner or inner >= tb:
            yr, yi = block(re_ref[:], im_ref[:], tb)
            or_ref[:] = yr
            oi_ref[:] = yi
            return
        for c in range(tb // inner):
            sl = slice(c * inner, (c + 1) * inner)
            yr, yi = block(re_ref[:, sl], im_ref[:, sl], inner)
            or_ref[:, sl] = yr
            oi_ref[:, sl] = yi

    return kernel


def _make_conv_kernel_scratch(n: int, stages):
    """Scratch ping-pong form of the fused conv kernel.

    The fwd+bwd chain doubles the stage count, which doubled the Mosaic
    live-SSA stack and killed nfft>=1024 compiles in round 3.  Same
    ping-pong trick as ops/pallas_fft._make_kernel_scratch: every stage
    stores its flat [n, tb] result to an alternating VMEM ref, so the
    live set is ~3 plane pairs at ANY chain length.  The Hf multiply is
    folded into the last forward stage's values before its store."""

    active = [s_ for s_ in stages if s_.r != 1]
    s = len(active)

    def kernel(*refs):
        ntw = 2 * s
        tw = [r_[:] for r_ in refs[:ntw]]
        (hfr_ref, hfi_ref, re_ref, im_ref,
         or_ref, oi_ref, sr_ref, si_ref) = refs[ntw:]
        tb = re_ref.shape[-1]
        hr = hfr_ref[:]  # [n, 1]
        hi = hfi_ref[:]
        total = 2 * s
        src = (re_ref, im_ref)
        for j in range(total):
            backward = j >= s
            idx = j - s if backward else j
            st = active[idx]
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            ar = src[0][:].reshape(st.l, st.r * st.m, tb)
            ai = src[1][:].reshape(st.l, st.r * st.m, tb)
            ar, ai = _pk._stage_values(
                ar, ai, st.l, st.r, st.m, twr, twi,
                1.0 if backward else -1.0,
            )
            ar = ar.reshape(n, tb)
            ai = ai.reshape(n, tb)
            if j == s - 1:  # spectrum multiply rides the last fwd stage
                ar, ai = ar * hr - ai * hi, ar * hi + ai * hr
            dst = (
                (or_ref, oi_ref)
                if (total - 1 - j) % 2 == 0
                else (sr_ref, si_ref)
            )
            dst[0][:] = ar
            dst[1][:] = ai
            src = dst

    return kernel


@functools.lru_cache(maxsize=128)
def _build(plan: _plan.Plan, tb: int, interpret: bool, inner: int = 0,
           scratch: bool = False):
    n = plan.engine_n
    active = [s for s in plan.stages if s.r != 1]
    tw_inputs = []
    tw_specs = []
    for st in active:
        tw = st.twiddle
        tw_inputs.append(np.ascontiguousarray(tw.real, dtype=np.float32))
        tw_inputs.append(np.ascontiguousarray(tw.imag, dtype=np.float32))
        spec = pl.BlockSpec((st.l, st.r), lambda j: (0, 0), memory_space=pltpu.VMEM)
        tw_specs.extend([spec, spec])

    hf_spec = pl.BlockSpec((n, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((n, tb), lambda j: (0, j), memory_space=pltpu.VMEM)
    scratch_shapes = []
    if scratch:
        kernel = _make_conv_kernel_scratch(n, plan.stages)
        scratch_shapes = [pltpu.VMEM((n, tb), jnp.float32)] * 2
    else:
        kernel = _make_conv_kernel(n, plan.stages, inner)

    def call(hfr, hfi, re, im):
        b = re.shape[-1]
        grid = (b // tb,)
        out_shape = [
            jax.ShapeDtypeStruct((n, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ]
        # fwd + bwd transform + the pointwise multiply
        flops = int(2 * 8 * n * math.log2(max(n, 2)) * b + 6 * n * b)
        ntw = len(tw_inputs)
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(_pk.VMEM_LIMIT)
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*tw_specs, hf_spec, hf_spec, data_spec, data_spec],
            out_specs=[data_spec, data_spec],
            out_shape=out_shape,
            input_output_aliases={ntw + 2: 0, ntw + 3: 1},
            interpret=interpret,
            scratch_shapes=scratch_shapes,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * 4 * n * b, transcendentals=0
            ),
            **params,
        )(*[jnp.asarray(t) for t in tw_inputs], hfr.reshape(n, 1), hfi.reshape(n, 1), re, im)

    return call


def zconv_pallas_tmajor(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    hfr: jax.Array,
    hfi: jax.Array,
    *,
    tb: int = _pk.DEFAULT_TB,
    interpret: bool = False,
    inner: int = 0,
    scratch: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused block convolution of TIME-MAJOR planes [N, B] (B % tb == 0):
    returns IFFT(FFT(x) * Hf) per column, with Hf = filter_spectrum(...)
    already carrying the 1/N scale.  Each column is one overlap-save
    block; the caller owns framing and the valid-sample slice."""

    if not supported(plan):
        raise ValueError(f"plan {plan} has unsupported factors for the fused conv kernel")
    n, b = re.shape[-2], re.shape[-1]
    if n != plan.engine_n:
        raise ValueError(f"data length {n} != plan engine length {plan.engine_n}")
    if b % tb:
        raise ValueError(f"batch {b} must be a multiple of tile {tb}")
    if inner and tb % inner:
        raise ValueError(f"tile {tb} must be a multiple of inner chunk {inner}")
    call = _build(plan, tb, interpret, inner, scratch)
    return call(hfr, hfi, re, im)
