"""Public functional FFT API (pffft.h parity surface, TPU-native semantics).

Mirrors the reference C ABI (/root/reference/include/pffft/pffft.h:124-250):

    transform(plan, x, direction)          <-> pffft_transform (internal order)
    transform_ordered(plan, x, direction)  <-> pffft_transform_ordered
    zreorder(plan, z, direction)           <-> pffft_zreorder
    zconvolve_accumulate(plan, a, b, ab, scaling) <-> pffft_zconvolve_accumulate
    zconvolve_no_accu(plan, a, b, scaling) <-> pffft_zconvolve_no_accu

Differences (deliberate, JAX-native):
  * arrays are jnp arrays with arbitrary leading batch dims; transforms are
    batched as a first-class axis (the TPU replacement for the reference's
    "call it from many threads" model, pffft.h:102-106);
  * complex spectra are complex dtype arrays, not interleaved float pairs;
    real spectra are [..., N/2] complex with pffft's packed bin0
    (F(0) + i F(N/2), pffft.h:144-155);
  * no work buffers: XLA owns scratch;
  * functions are pure; "in-place" (input==output aliasing, allowed by the
    C API) is expressed by donating arguments to jit.

Transforms are unscaled: backward(forward(x)) == N * x (pffft.h:134).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from . import plan as _plan
from .ops import dispatch as _dispatch
from .ops import split as _split
from .ops import stages as _stages

Plan = _plan.Plan
FORWARD = _plan.FORWARD
BACKWARD = _plan.BACKWARD
REAL = _plan.REAL
COMPLEX = _plan.COMPLEX

__all__ = [
    "transform",
    "transform_ordered",
    "zreorder",
    "zconvolve_accumulate",
    "zconvolve_no_accu",
    "rfft_packed",
    "irfft_packed",
    "cfft",
    "icfft",
    "spectrum_unpack",
    "spectrum_pack",
    "fftfreq",
    "rfftfreq",
    "fftshift",
    "ifftshift",
]


# ---------------------------------------------------------------------------
# Core (traced) implementations
# ---------------------------------------------------------------------------


def _complex_transform(p: Plan, x: jax.Array, backward: bool, ordered: bool) -> jax.Array:
    x = x.astype(p.cdtype.type)
    return _stages.cfft_plan(x, p, backward=backward, ordered=ordered)


def _use_flat_split(p: Plan) -> bool:
    """Use the flat-FMA split step on TPU: the classic e/o composition
    costs ~5 HBM passes there (real_anatomy_r4.txt — XLA does not fuse
    the Hermitian mirror into the combine, and the bin0 slice+concat is
    a full extra pass).  The one-pass Pallas split kernel
    (ops/real_kernel.py) is blocked on this backend: `rev` does not
    lower in Mosaic (probed round 4, /tmp probe archived in
    realkernel_r4.txt), so the flat jnp form — one flip pass + one fused
    FMA pass — is the shipped large-N route."""

    return jax.default_backend() == "tpu"


def _mxu_pack_shape(p: Plan, lead_shape) -> bool:
    """The identity-einsum conversions win only at TINY batch with huge H
    (pack_r4.txt: 1.9x at B=8/N=2^21, 1.9x WORSE at B=128/N=2^20) — the
    MXU staging of a tall-skinny [B, H, 2] operand beats the strided
    slices only when the sublane dim is under ~2 tiles."""

    b = 1
    for d in lead_shape:
        b *= int(d)
    return b <= 16


def _use_fold(p: Plan, batch: int) -> bool:
    """Fold the interleaved<->planar conversion into the first/last
    stage contraction (ops/split.real_chain_*_folded) — the conversions
    cost ~65% of the real transform at production geometries
    (real_anatomy2/3_r4).  Chain plans on the plain batch-major XLA
    engine only; other engines/strategies keep the composed path."""

    return (
        _use_flat_split(p)
        and p.local_split is None
        and len([s for s in p.stages if s.r > 1]) >= 1
        and _dispatch.select_engine(p, batch, False) == "xla"
    )


def _real_forward_planar(p: Plan, x: jax.Array) -> "tuple[jax.Array, jax.Array]":
    x = x.astype(p.dtype.type)
    b = int(np.prod(x.shape[:-1])) if x.shape[:-1] else 1
    if _use_fold(p, b):
        zr, zi = _split.real_chain_fwd_folded(x, p.stages)
        return _split.real_forward_split_planar_flat(zr, zi, p.real_twiddle)
    pack = (
        _split.pack_real_input_split_mxu
        if _use_flat_split(p) and _mxu_pack_shape(p, x.shape[:-1])
        else _split.pack_real_input_split
    )
    zr, zi = pack(x)
    zr, zi = _dispatch.cfft_dispatch(p, zr, zi, backward=False)
    if _use_flat_split(p):
        return _split.real_forward_split_planar_flat(zr, zi, p.real_twiddle)
    return _split.real_forward_split_planar(zr, zi, p.real_twiddle)


def _real_backward_planar(p: Plan, sr: jax.Array, si: jax.Array) -> jax.Array:
    sr = sr.astype(p.dtype.type)
    si = si.astype(p.dtype.type)
    if _use_flat_split(p):
        zr, zi = _split.real_backward_split_planar_flat(sr, si, p.real_twiddle)
    else:
        zr, zi = _split.real_backward_split_planar(sr, si, p.real_twiddle)
    b = int(np.prod(sr.shape[:-1])) if sr.shape[:-1] else 1
    if _use_fold(p, b):
        return _split.real_chain_bwd_folded(zr, zi, p.stages).astype(
            p.dtype.type
        )
    wr, wi = _dispatch.cfft_dispatch(p, zr, zi, backward=True)
    inter = (
        _split.interleave_to_real_split_mxu
        if _use_flat_split(p) and _mxu_pack_shape(p, wr.shape[:-1])
        else _split.interleave_to_real_split
    )
    return inter(wr, wi).astype(p.dtype.type)


def _real_forward(p: Plan, x: jax.Array) -> jax.Array:
    sr, si = _real_forward_planar(p, x)
    return _split.from_split((sr, si), p.cdtype.type)


def _real_backward(p: Plan, s: jax.Array) -> jax.Array:
    s = s.astype(p.cdtype.type)
    return _real_backward_planar(p, jnp.real(s), jnp.imag(s))


@functools.lru_cache(maxsize=1024)
def _jitted(plan: Plan, backward: bool, ordered: bool, ekey=None):
    """One compiled callable per (plan, direction, layout)."""

    if plan.is_real:
        if backward:
            fn = lambda s: _real_backward(plan, s)
        else:
            fn = lambda x: _real_forward(plan, x)
        # real internal layout == canonical for this engine (the split step
        # naturally emits canonical order); zreorder is the identity there,
        # matching the *contract* of pffft.h:159-182 (any self-consistent
        # internal order is allowed, convolution + reorder must compose).
        return jax.jit(fn)
    if backward and not ordered:
        # "unordered" always refers to the z-domain side: the backward
        # transform *accepts* internal-layout spectrum input.  The reorder
        # transpose fuses into the first backward stage under XLA.
        fn = lambda z: _complex_transform(
            plan,
            _stages.reorder_spectrum(z, plan.factors, to_canonical=True),
            True,
            True,
        )
    else:
        fn = lambda x: _complex_transform(plan, x, backward, ordered)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _check_len(plan: Plan, x, backward: bool) -> None:
    expect = plan.n
    if plan.is_real:
        expect = plan.spectrum_size if backward else plan.n
    if x.shape[-1] != expect:
        raise ValueError(
            f"input last-axis length {x.shape[-1]} does not match plan "
            f"(N={plan.n}, {plan.kind.value}): expected {expect}"
        )


def transform_ordered(plan: Plan, x: jax.Array, direction=FORWARD) -> jax.Array:
    """pffft_transform_ordered parity (pffft.h:168): canonical spectrum order.

    REAL forward:  [..., N] real     -> [..., N/2] complex (packed bin0)
    REAL backward: [..., N/2] complex -> [..., N] real (unscaled, = N*x)
    COMPLEX:       [..., N] complex  -> [..., N] complex
    """

    d = _plan._coerce_direction(direction)
    if not isinstance(plan, Plan):
        from . import bluestein as _bs

        if isinstance(plan, _bs.BluesteinPlan):  # arbitrary-N chirp-Z plan
            return _bs.transform_any(plan, x, d)
        raise TypeError(
            f"unsupported plan type {type(plan).__name__} for "
            f"transform_ordered (CztPlan goes through czt/czt_split; "
            f"FourStepPlan through its forward/backward methods)")
    _check_len(plan, x, d == BACKWARD)
    return _jitted(plan, d == BACKWARD, True, _dispatch.state_key())(x)


def transform(plan: Plan, x: jax.Array, direction=FORWARD) -> jax.Array:
    """pffft_transform parity (pffft.h:159): internal (unordered) z-layout.

    The internal layout is plan-defined: for complex multi-stage plans it is
    the transpose-free output of the last stage (see ops/stages.py), the
    order the TPU produces without the final shuffle pass; for real plans it
    coincides with canonical order.  Use zreorder to map to/from canonical.
    Pointwise spectral ops (zconvolve_*) work directly in this layout.
    """

    d = _plan._coerce_direction(direction)
    _check_len(plan, x, d == BACKWARD)
    if plan.is_real:
        return _jitted(plan, d == BACKWARD, True, _dispatch.state_key())(x)
    return _jitted(plan, d == BACKWARD, False, _dispatch.state_key())(x)


def zreorder(plan: Plan, z: jax.Array, direction=FORWARD) -> jax.Array:
    """pffft_zreorder parity (pffft.h:182).

    FORWARD: internal -> canonical; BACKWARD: canonical -> internal.
    """

    d = _plan._coerce_direction(direction)
    if plan.is_real:
        return z
    return _stages.reorder_spectrum(z, plan.factors, to_canonical=(d == FORWARD))


def _zmul(plan: Plan, a: jax.Array, b: jax.Array, scaling) -> jax.Array:
    """Pointwise spectral multiply in internal layout, with the real-packing
    DC/Nyquist fixup (analog of FUNC_ZCONVOLVE's scalar lanes,
    pffft_priv_impl.h:1534-1684: bin0 of a real spectrum holds two packed
    real values which must multiply component-wise, not complex-wise)."""

    ab = a * b
    if plan.is_real:
        dc = jnp.real(a[..., 0]) * jnp.real(b[..., 0])
        nyq = jnp.imag(a[..., 0]) * jnp.imag(b[..., 0])
        ab = ab.at[..., 0].set(dc + 1j * nyq)
    return ab * jnp.asarray(scaling, dtype=plan.dtype.type)


def zconvolve_no_accu(plan: Plan, dft_a: jax.Array, dft_b: jax.Array, scaling=1.0) -> jax.Array:
    """pffft_zconvolve_no_accu parity (pffft.h:210): (a*b)*scaling."""

    return _zmul(plan, dft_a, dft_b, scaling)


def zconvolve_accumulate(
    plan: Plan, dft_a: jax.Array, dft_b: jax.Array, dft_ab: jax.Array, scaling=1.0
) -> jax.Array:
    """pffft_zconvolve_accumulate parity (pffft.h:196): ab + (a*b)*scaling."""

    return dft_ab + _zmul(plan, dft_a, dft_b, scaling)


# ---------------------------------------------------------------------------
# Convenience (JAX-idiomatic names and unpacked real spectra)
# ---------------------------------------------------------------------------


def cfft(plan: Plan, x: jax.Array) -> jax.Array:
    """Forward complex FFT, canonical order (numpy convention, unscaled)."""

    return transform_ordered(plan, x, FORWARD)


def icfft(plan: Plan, x: jax.Array) -> jax.Array:
    """Unscaled inverse complex FFT: icfft(cfft(x)) == N * x."""

    return transform_ordered(plan, x, BACKWARD)


def rfft_packed(plan: Plan, x: jax.Array) -> jax.Array:
    """Forward real FFT with pffft bin0 packing: [..., N] -> [..., N/2]."""

    return transform_ordered(plan, x, FORWARD)


def irfft_packed(plan: Plan, s: jax.Array) -> jax.Array:
    """Unscaled inverse of rfft_packed: [..., N/2] -> [..., N] (= N * x)."""

    return transform_ordered(plan, s, BACKWARD)


def spectrum_unpack(s: jax.Array) -> jax.Array:
    """Packed real spectrum [..., H] -> standard rfft layout [..., H+1]
    (DC ... Nyquist as separate bins, numpy.fft.rfft convention)."""

    dc = jnp.real(s[..., :1]).astype(s.dtype)
    nyq = jnp.imag(s[..., :1]).astype(s.dtype)
    return jnp.concatenate([dc, s[..., 1:], nyq], axis=-1)


def spectrum_pack(r: jax.Array) -> jax.Array:
    """Standard rfft layout [..., H+1] -> pffft packed layout [..., H]."""

    dc = jnp.real(r[..., 0])
    nyq = jnp.real(r[..., -1])
    return r[..., :-1].at[..., 0].set(dc + 1j * nyq)


# ---------------------------------------------------------------------------
# Split-format (planar re/im) API — the TPU-native entry points.
#
# Complex dtypes do not exist on the TPU compute path (see ops/split.py);
# spectra are pairs of float arrays.  These functions mirror the complex API
# one-to-one and share its engine, so every accuracy test above covers them.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1024)
def _jitted_split_tmajor(plan: Plan, backward: bool, ekey=None):
    """Time-major transform: planes [N, B], batch on the lanes.

    The layout for callers whose streams are already [time, channel] —
    no transpose pass in or out (ops/dispatch routes to the native
    time-major engine / the pallas VPU kernel per the measured table;
    benchmarks/results/routed_tb_r3.txt).  REAL plans run the packed
    half-length complex engine with axis-0 pack/split steps."""

    if plan.is_real:
        flat = _use_flat_split(plan)
        if backward:
            def fn(sr, si):
                sr = sr.astype(plan.dtype.type)
                si = si.astype(plan.dtype.type)
                fused = _dispatch.fused_real_bwd_route(plan, sr.shape[-1])
                if fused is not None:
                    # one-pass kernel: split prep + backward stages fused
                    wr, wi = fused(sr, si)
                    return _split.interleave_to_real_split_tmajor(
                        wr, wi
                    ).astype(plan.dtype.type)
                skern = _dispatch.real_split_kernel_route(
                    plan, sr.shape[-1], True
                )
                if skern is not None:
                    zr, zi = skern(sr, si)
                else:
                    bwd = (
                        _split.real_backward_split_planar_tmajor_flat
                        if flat
                        else _split.real_backward_split_planar_tmajor
                    )
                    zr, zi = bwd(sr, si, plan.real_twiddle)
                wr, wi = _dispatch.cfft_dispatch(
                    plan, zr, zi, backward=True, time_major=True
                )
                return _split.interleave_to_real_split_tmajor(wr, wi).astype(
                    plan.dtype.type
                )
        else:
            def fn(x):
                x = x.astype(plan.dtype.type)
                fused = _dispatch.fused_real_fwd_route(plan, x.shape[-1])
                if fused is not None:
                    # ONE HBM pass: packed input -> stages -> in-VMEM
                    # split -> packed spectrum (fusedreal_r5.txt)
                    return fused(x.reshape(plan.engine_n, -1))
                packed = _dispatch.packed_fwd_route(plan, x.shape[-1])
                if packed is not None:
                    # zero-copy pack: the kernel reads re/im tiles from
                    # the free [H, 2B] reshape at lane offsets 0/B
                    zr, zi = packed(x.reshape(plan.engine_n, -1))
                else:
                    zr, zi = _split.pack_real_input_split_tmajor(x)
                    zr, zi = _dispatch.cfft_dispatch(
                        plan, zr, zi, backward=False, time_major=True
                    )
                skern = _dispatch.real_split_kernel_route(
                    plan, x.shape[-1], False
                )
                if skern is not None:
                    return skern(zr, zi)
                fwd = (
                    _split.real_forward_split_planar_tmajor_flat
                    if flat
                    else _split.real_forward_split_planar_tmajor
                )
                return fwd(zr, zi, plan.real_twiddle)
        return jax.jit(fn)

    def fn(re, im):
        return _dispatch.cfft_dispatch(
            plan, re, im, backward=backward, time_major=True
        )

    return jax.jit(fn)


def _call_tmajor_fallback(plan: Plan, backward: bool, args):
    """Invoke the jitted time-major transform with compile-retry.

    At the kernel's n*tb ~ 2M-element wall the remote compiler fails
    STOCHASTICALLY (vmem2_r4.txt: 4096/tb512 failed under load, then
    compiled clean at 0.55 SoL) — on a remote-compile error while the
    pallas engine is routed, record the tile (pallas_fft.record_tb_fail),
    which bumps dispatch.state_key(), and re-trace with the next tile
    candidate; the loop ends at the XLA engine (no tile left)."""

    from .ops import pallas_fft as _pk

    import warnings

    while True:
        fn = _jitted_split_tmajor(plan, backward, _dispatch.state_key())
        try:
            return fn(*args)
        except Exception as e:  # jaxlib runtime error types vary
            msg = str(e)
            if "remote_compile" not in msg and "RESOURCE_EXHAUSTED" not in msg:
                raise
            batch = args[0].shape[-1]
            engine = _dispatch.select_engine(plan, batch, True)
            if engine == "kern2":
                # kern2's pass A may ride a wall tile (m=4096/tb512) whose
                # remote compile is stochastic (vmem2_r4.txt); demote this
                # N to the XLA chain for the process rather than fail.
                warnings.warn(
                    f"kern2 engine (n={plan.engine_n}) failed to compile "
                    f"on the remote backend; demoting to 'xla' "
                    f"({type(e).__name__})",
                    RuntimeWarning,
                    stacklevel=3,
                )
                _dispatch.record_engine(
                    "tpu", plan.engine_n, "xla", time_major=True
                )
                continue
            if engine != "pallas":
                raise
            tb = _pk.best_tb(plan.engine_n, batch)
            if tb is None:
                raise
            warnings.warn(
                f"pallas kernel tile (n={plan.engine_n}, tb={tb}) failed to "
                f"compile on the remote backend; falling back to the next "
                f"tile ({type(e).__name__})",
                RuntimeWarning,
                stacklevel=3,
            )
            _pk.record_tb_fail(plan.engine_n, tb)


def transform_ordered_split_tmajor(plan: Plan, x, direction=FORWARD):
    """Split-format ordered transform in TIME-MAJOR layout.

    COMPLEX:       x = (re, im) planes [N, B] -> (re, im) [N, B]
    REAL forward:  x [N, B] real             -> (re, im) [N/2, B]
    REAL backward: x = (re, im) [N/2, B]     -> [N, B] real (unscaled)

    Same spectrum convention as transform_ordered_split (packed bin0 =
    DC + i*Nyquist for real plans), transposed."""

    d = _plan._coerce_direction(direction)
    if plan.is_real:
        if d == BACKWARD:
            sr, si = x
            if sr.ndim != 2 or sr.shape[0] != plan.spectrum_size:
                raise ValueError(
                    f"time-major real spectrum planes must be "
                    f"[{plan.spectrum_size}, B]; got {sr.shape}"
                )
            return _call_tmajor_fallback(plan, True, (sr, si))
        if isinstance(x, (tuple, list)):
            raise ValueError(
                "time-major REAL forward takes a single [N, B] real array "
                "(got a tuple; planar pairs are the spectrum side)"
            )
        if x.ndim != 2 or x.shape[0] != plan.n:
            raise ValueError(
                f"time-major real input must be [N={plan.n}, B]; got {x.shape}"
            )
        return _call_tmajor_fallback(plan, False, (x,))
    re, im = x
    if re.ndim != 2 or re.shape[0] != plan.n:
        raise ValueError(
            f"time-major planes must be [N={plan.n}, B]; got {re.shape}"
        )
    return _call_tmajor_fallback(plan, d == BACKWARD, (re, im))


@functools.lru_cache(maxsize=1024)
def _jitted_split(plan: Plan, backward: bool, ordered: bool, ekey=None):
    if plan.is_real:
        if backward:
            fn = lambda sr, si: _real_backward_planar(plan, sr, si)
        else:
            fn = lambda x: _real_forward_planar(plan, x)
        return jax.jit(fn)
    if backward and not ordered:
        def fn(re, im):
            re = _stages.reorder_spectrum(re, plan.factors, to_canonical=True)
            im = _stages.reorder_spectrum(im, plan.factors, to_canonical=True)
            return _dispatch.cfft_dispatch(plan, re, im, backward=True)
    elif ordered:
        # ordered transforms go through the measured engine dispatcher
        # (ops/dispatch.py: xla stage engine / fused2 / pallas per table)
        def fn(re, im):
            return _dispatch.cfft_dispatch(plan, re, im, backward=backward)
    else:
        def fn(re, im):
            return _split.cfft_plan_split(
                plan, re, im, backward=backward, ordered=ordered
            )
    return jax.jit(fn)


def transform_ordered_split(plan: Plan, x, direction=FORWARD):
    """Split-format transform_ordered.

    REAL forward:  x [..., N] real          -> (re, im) [..., N/2]
    REAL backward: x = (re, im) [..., N/2]  -> [..., N] real
    COMPLEX:       x = (re, im) [..., N]    -> (re, im) [..., N]
    """

    d = _plan._coerce_direction(direction)
    if not isinstance(plan, Plan):
        from . import bluestein as _bs

        if isinstance(plan, _bs.BluesteinPlan):  # arbitrary-N chirp-Z plan
            return _bs.transform_any_split(plan, x, d)
        raise TypeError(
            f"unsupported plan type {type(plan).__name__} for "
            f"transform_ordered_split (CztPlan goes through czt_split)")
    backward = d == BACKWARD
    if plan.is_real and not backward:
        return _jitted_split(plan, False, True, _dispatch.state_key())(x)
    return _jitted_split(plan, backward, True, _dispatch.state_key())(*x)


def transform_split(plan: Plan, x, direction=FORWARD):
    """Split-format transform (internal/unordered z-layout)."""

    d = _plan._coerce_direction(direction)
    backward = d == BACKWARD
    if plan.is_real:
        return transform_ordered_split(plan, x, direction)
    return _jitted_split(plan, backward, False, _dispatch.state_key())(*x)


@functools.lru_cache(maxsize=512)
def _jitted_split_donated(plan: Plan, backward: bool, ordered: bool, ekey=None):
    """Complex split transform with donated input planes.

    The in-place analog of the C API's input==output aliasing
    (pffft_transform accepts input == output,
    /root/reference/src/pffft_priv_impl.h:1501,1522-1531): donating the
    [..., N] planes lets XLA reuse the input HBM buffers for the output,
    eliminating one allocation per plane at large N.  Complex only — the
    real transform changes shape ([..., N] <-> [..., N/2] pair), so there
    is no aliasable buffer.
    """

    if backward and not ordered:
        def fn(re, im):
            re = _stages.reorder_spectrum(re, plan.factors, to_canonical=True)
            im = _stages.reorder_spectrum(im, plan.factors, to_canonical=True)
            return _dispatch.cfft_dispatch(plan, re, im, backward=True)
    elif ordered:
        def fn(re, im):
            return _dispatch.cfft_dispatch(plan, re, im, backward=backward)
    else:
        def fn(re, im):
            return _split.cfft_plan_split(
                plan, re, im, backward=backward, ordered=ordered
            )
    return jax.jit(fn, donate_argnums=(0, 1))


def transform_ordered_split_inplace(plan: Plan, x, direction=FORWARD):
    """In-place split transform: DONATES the input planes to XLA.

    Semantics parity with calling pffft_transform_ordered with input ==
    output (legal per pffft.h:159-182, asserted bit-equal to the
    out-of-place call in the reference's own bench,
    /root/reference/benchmarks/bench_pffft.c:340-360).  The caller must
    not reuse ``x`` afterwards (JAX invalidates donated buffers).
    Real-kind plans fall back to the pure call (shape changes, nothing
    to alias).
    """

    d = _plan._coerce_direction(direction)
    backward = d == BACKWARD
    if plan.is_real:
        return transform_ordered_split(plan, x, direction)
    return _jitted_split_donated(plan, backward, True, _dispatch.state_key())(*x)


def transform_split_inplace(plan: Plan, x, direction=FORWARD):
    """In-place variant of :func:`transform_split` (internal layout)."""

    d = _plan._coerce_direction(direction)
    backward = d == BACKWARD
    if plan.is_real:
        return transform_split(plan, x, direction)
    return _jitted_split_donated(plan, backward, False, _dispatch.state_key())(*x)


def zconvolve_split(plan: Plan, a, b, scaling=1.0, accumulate=None):
    """Split-format pointwise spectral multiply (internal layout), with the
    real-packing DC/Nyquist component-wise fixup (pffft_priv_impl.h:1534).

    a, b: (re, im) pairs; optional ``accumulate`` = (re, im) to add into.
    Returns (re, im).
    """

    ar, ai = a
    br, bi = b
    cr, ci = _split.split_mul((ar, ai), (br, bi))
    if plan.is_real:
        cr = _split._set_bin0(cr, ar[..., 0] * br[..., 0])
        ci = _split._set_bin0(ci, ai[..., 0] * bi[..., 0])
    s = jnp.asarray(scaling, dtype=plan.dtype.type)
    cr, ci = cr * s, ci * s
    if accumulate is not None:
        cr = cr + accumulate[0]
        ci = ci + accumulate[1]
    return cr, ci


# ---------------------------------------------------------------------------
# Frequency-grid helpers (numpy.fft conventions; host-side numpy — these are
# plan/axis bookkeeping, not device compute)
# ---------------------------------------------------------------------------

def fftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """Bin center frequencies of a length-n complex transform (np.fft.fftfreq)."""

    n = int(n)
    k = np.empty(n, dtype=np.float64)
    half = (n - 1) // 2 + 1
    k[:half] = np.arange(half)
    k[half:] = np.arange(-(n // 2), 0)
    return k / (n * d)


def rfftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """Bin center frequencies of rfft_any / spectrum_unpack output
    (np.fft.rfftfreq): n//2 + 1 non-negative bins."""

    n = int(n)
    return np.arange(n // 2 + 1, dtype=np.float64) / (n * d)


def fftshift(x, axes=None):
    """Move the zero-frequency bin to the center (np.fft.fftshift);
    device-safe (jnp.roll = slice + concat, no gathers)."""

    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    shift = [x.shape[a] // 2 for a in axes]
    return jnp.roll(x, shift, axes)


def ifftshift(x, axes=None):
    """Inverse of fftshift (exact for odd lengths too)."""

    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    shift = [-(x.shape[a] // 2) for a in axes]
    return jnp.roll(x, shift, axes)
