"""Engine dispatch: select the kernel variant per backend/plan/shape.

The reference selects kernels three ways (SURVEY.md §2.8): compile-time
SIMD headers, link-time multi-arch libraries with a runtime dispatcher
(benchmarks/pf_conv_dispatcher.cpp:18-60), and gcc target_clones ifunc
(src/fmv.h).  The TPU analog is a plan-time registry choosing between

  * ``xla``    — the split-format stage engine (ops/split.py) with the
    backend-tuned stage policy (plan.default_max_factor) and Gauss
    3-matmul contractions (ops/split.py:cmul_mode); the default.
  * ``fused2`` — the fused two-stage MXU kernel (ops/fused_stage.py):
    whole transform in one VMEM pass, lane-concat stage matmuls; covers
    the production two-fat-stage plans, batch-major, B % TB == 0.
  * ``pallas`` — the radix<=5 VPU butterfly kernel (ops/pallas_fft.py),
    time-major; covers thin-stage (CPU-policy) plans only.
  * ``ksplit`` — hybrid: the VPU kernel runs the length-m sub-FFTs of
    N = m*r in one HBM pass (stride-r subsequences as extra lane batch),
    one XLA stage combines — extends the kernel past its VMEM ceiling.

Measured guidance on TPU v5e (benchmarks/results/concat_r3.txt,
engines_r3.csv; median of interleaved trials at plateau payloads): the
XLA stage path is the default, but the pallas VPU radix kernel wins
8/8 interleaved rounds at N=1024 in its native time-major layout
(median 0.30 vs 0.17 SoL) and the measured table routes it there —
through a derived thin-chain plan when the caller's plan uses fat MXU
stages (the ordered spectrum is factorization-independent).  Kernels
can also be forced (``set_engine`` / PFFFT_TPU_ENGINE) and the table
updated per (backend, N, layout) via ``record_engine`` without
touching call sites.
"""

from __future__ import annotations

import functools as _functools
import os
from typing import Optional, Tuple

import jax
import numpy as np

from .. import plan as _plan
from . import df64 as _df64
from . import fused_stage as _fs
from . import pallas_fft as _pk
from . import split as _split

__all__ = ["available_engines", "select_engine", "set_engine", "cfft_dispatch"]

_FORCED: Optional[str] = None

_ENGINES = ("xla", "fused2", "pallas", "ksplit", "kern2")

# VMEM budget for the fused kernels' block (bytes); beyond it Mosaic OOMs.
_PALLAS_VMEM_BUDGET = 12 << 20


@_functools.lru_cache(maxsize=64)
def _thin_plan(n: int) -> Optional[_plan.Plan]:
    """Kernel chain plan for the VPU kernel (radix<=5, or the radix-16/8
    chain where measured better — pallas_fft.chain_pref).

    The canonical ORDERED spectrum is factorization-independent, so the
    dispatcher may run a pallas-routed ordered transform through its own
    thin-chain plan even when the caller's plan uses fat MXU stages (the
    TPU default).  Carrier dynamic range of the radix chain is 148.7 dB
    (>= the 140 dB float bound; CLAUDE.md / results archives)."""

    try:
        if _pk.chain_pref(n):
            p = _plan.new_setup(
                n, _plan.COMPLEX, factors=_pk.thin_factors(n, radix16=True),
                strict=False,
            )
        else:
            # strict=False: this is an internal derivation — a kern2
            # sub-length like m=600 needn't satisfy the public pffft
            # N-granularity contract (pffft_priv_impl.h:1062-1078), only
            # 2/3/5-smoothness
            p = _plan.new_setup(n, _plan.COMPLEX, max_factor=5, strict=False)
    except ValueError:
        return None
    return p if _pk.supported(p) else None


def _pallas_plan(plan: _plan.Plan) -> Optional[_plan.Plan]:
    """The plan the pallas engine would run: the caller's if it is already
    a thin chain, else a derived thin plan for the same engine length
    (f32 only).  REAL plans derive the thin plan at engine_n = N/2 — the
    dispatcher serves their half-length complex sub-transform."""

    if plan.dtype != np.float32:
        return None
    if not plan.is_real and _pk.supported(plan):
        return plan
    return _thin_plan(plan.engine_n)


# ksplit: the VPU kernel computes the length-m sub-FFTs of N = m*r in ONE
# HBM pass (time-major [N, B] reshaped [m, r*B] — a free major-axis split,
# exactly the Stockham pre-last-stage state [L=m, M=r, B]), then a single
# XLA einsum stage does the radix-r combine, emitting the canonical
# ordered spectrum with no transpose anywhere.  This extends the measured
# kernel win (N<=1024, engines_r3/routed_tb_r3) to lengths whose direct
# kernel exceeds the Mosaic scoped-VMEM stack: two passes total where the
# XLA chain makes one pass per fat stage plus relayouts.  Per-N split
# preference is measured (scripts/r3_ksplit.py); values here are the
# shipped defaults for the derivation below.
_KSPLIT_CONF: dict = {}


def _ksplit_conf(n: int) -> Optional[Tuple[int, int]]:
    """(m, r) split for engine length n, or None (measured table first,
    else the largest kernel-covered m in {1024, 512, 256} with 2<=r)."""

    conf = _KSPLIT_CONF.get(n)
    if conf is not None:
        return conf
    if n < 2048:
        # the direct kernel covers N<=1024 (_TB_PREF); the hybrid's extra
        # combine pass only pays past the Mosaic VMEM ceiling
        return None
    for m in (1024, 512, 256):
        r = n // m
        if n == m * r and 2 <= r <= 128 and _pk.thin_factors(m) is not None:
            return (m, r)
    return None


def set_ksplit_conf(n: int, m: int, r: int) -> None:
    """Record a measured (m, r) split for ``n`` (scripts/r3_ksplit.py)."""

    global _TABLE_VERSION
    if m * r != n:
        raise ValueError(f"ksplit conf {m}*{r} != {n}")
    _KSPLIT_CONF[int(n)] = (int(m), int(r))
    _TABLE_VERSION += 1


@_functools.lru_cache(maxsize=128)
def _build_ksplit(n: int, m: int, r: int):
    """(m_plan, last_stage) for the explicit split n = m*r, or None.

    last_stage is the l=m, radix-r, m'=1 StageTables of the full-length
    plan with factors (thin_factors(m)..., r): its twiddle W_{n}^{i*k'} and
    dense DFT matrix finish the transform after the kernel's sub-FFTs."""

    mplan = _thin_plan(m)
    if mplan is None:
        return None
    try:
        nplan = _plan.new_setup(
            n, _plan.COMPLEX, factors=mplan.factors + (r,), strict=False
        )
    except ValueError:
        return None
    return mplan, [s for s in nplan.stages if s.r > 1][-1]


def _ksplit_plans(n: int):
    """(m_plan, last_stage) for engine length n per the conf table, or None."""

    conf = _ksplit_conf(n)
    if conf is None:
        return None
    return _build_ksplit(n, *conf)


def cfft_ksplit_tmajor(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    interpret: bool = False,
    conf: Optional[Tuple[int, int]] = None,
):
    """Hybrid kernel+combine complex FFT, time-major planes [N, B].

    Unscaled, canonical bin order.  N = m*r with the length-m sub-FFTs in
    the fused Pallas kernel (stride-r subsequences ride the lane axis as
    extra batch) and one XLA stage (twiddle + dense radix-r contraction)
    combining them — output index t*m + k' is exactly row-major [r, m].
    ``conf`` overrides the (m, r) split table (probe harnesses)."""

    built = (
        _build_ksplit(plan.engine_n, *conf)
        if conf is not None
        else _ksplit_plans(plan.engine_n)
    )
    if built is None:
        raise ValueError(f"no ksplit configuration for N={plan.engine_n}")
    mplan, last = built
    n, b = re.shape
    m, r = mplan.engine_n, last.r
    tb = _pk.best_tb(m, r * b)
    if tb is None:
        raise ValueError(f"batch {b}: no kernel tile divides {r}*{b}")
    ar = re.reshape(m, r * b)
    ai = im.reshape(m, r * b)
    ar, ai = _pk.cfft_pallas_tmajor(
        mplan, ar, ai, backward=backward, tb=tb, interpret=interpret,
        scratch=_pk.use_scratch(m, tb),
    )
    consts = _split._stage_consts(last, backward)
    ar = ar.reshape(m, r, 1, b)
    ai = ai.reshape(m, r, 1, b)
    ar, ai = _split._apply_twiddle(ar, ai, consts[4], 0)
    nr, ni = _split._contract_stage(ar, ai, consts, "lrmb,rt->tlmb")
    return nr.reshape(n, b), ni.reshape(n, b)


# ---------------------------------------------------------------------------
# ksplit2: the ksplit decomposition INSIDE one Pallas kernel (round 4).
#
# The XLA-combine ksplit loses (ksplit_r4.txt: its combine is a second
# HBM pass).  Here the combine is one more in-VMEM Stockham stage, so the
# whole N = m*r transform stays a single HBM pass — and the m-chain runs
# on r*tb concatenated lanes, the wide-tile regime where the kernel
# measures 0.6-0.8 SoL, instead of the tb=128 cap that holds the direct
# N>=8192 kernel at 0.2 (scratch_r4.txt).  The caller reshapes [N, B] ->
# [m, r*B] (free, row-major); r views of that array (lane-block index
# maps c*(B/tb)+j) land the r stride-r subsequences of batch block j in
# VMEM, lane-concat makes the [m, r*tb] chain tile, and the last stage
# lane-slices the r sub-spectra back (tile-aligned offsets) for the
# twiddled radix-r combine: X[s*m + q] = sum_c W_N^{c*q} W_r^{c*s} Z_c[q].
# ---------------------------------------------------------------------------


def _make_ksplit2_kernel(n: int, m: int, r: int, mstages, last, backward: bool):
    import jax.numpy as jnp

    sign = 1.0 if backward else -1.0
    active = [s for s in mstages if s.r != 1]
    s = len(active)

    def kernel(*refs):
        ntw = 2 * s
        tw = [r_[:] for r_ in refs[:ntw]]
        ltwr = refs[ntw][:]
        ltwi = -refs[ntw + 1][:] if backward else refs[ntw + 1][:]
        views = refs[ntw + 2 : ntw + 2 + 2 * r]  # re views, then im views
        or_ref, oi_ref, s0r, s0i, s1r, s1i = refs[ntw + 2 + 2 * r :]
        tb = views[0].shape[-1]
        ar = jnp.concatenate([v[:] for v in views[:r]], axis=-1)  # [m, r*tb]
        ai = jnp.concatenate([v[:] for v in views[r:]], axis=-1)
        src = None
        for idx, st in enumerate(active):
            twr, twi = tw[2 * idx], tw[2 * idx + 1]
            if backward:
                twi = -twi
            if src is not None:
                ar = src[0][:].reshape(st.l, st.r * st.m, r * tb)
                ai = src[1][:].reshape(st.l, st.r * st.m, r * tb)
            else:
                ar = ar.reshape(st.l, st.r * st.m, r * tb)
                ai = ai.reshape(st.l, st.r * st.m, r * tb)
            ar, ai = _pk._stage_values(
                ar, ai, st.l, st.r, st.m, twr, twi, sign)
            dst = (s0r, s0i) if idx % 2 == 0 else (s1r, s1i)
            dst[0][:] = ar.reshape(m, r * tb)
            dst[1][:] = ai.reshape(m, r * tb)
            src = dst
        zr = src[0][:]
        zi = src[1][:]
        # lane-slice the r sub-spectra (tile-aligned) -> [m, r, tb]
        slr = jnp.stack([zr[:, c * tb : (c + 1) * tb] for c in range(r)], axis=1)
        sli = jnp.stack([zi[:, c * tb : (c + 1) * tb] for c in range(r)], axis=1)
        lr, li = _pk._stage_values(
            slr.reshape(m, r, tb), sli.reshape(m, r, tb),
            m, r, 1, ltwr, ltwi, sign)
        or_ref[:] = lr.reshape(n, tb)
        oi_ref[:] = li.reshape(n, tb)

    return kernel


@_functools.lru_cache(maxsize=64)
def _build_ksplit2(n: int, m: int, r: int, tb: int, backward: bool,
                   interpret: bool):
    import math as _math

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    built = _build_ksplit(n, m, r)
    if built is None:
        return None
    mplan, last = built
    active = [s for s in mplan.stages if s.r != 1]
    tw_inputs = []
    tw_specs = []
    for st in active:
        tw = st.twiddle
        tw_inputs.append(np.ascontiguousarray(tw.real, dtype=np.float32))
        tw_inputs.append(np.ascontiguousarray(tw.imag, dtype=np.float32))
        spec = pl.BlockSpec((st.l, st.r), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
        tw_specs.extend([spec, spec])
    ltw = last.twiddle  # [m, r]
    tw_inputs.append(np.ascontiguousarray(ltw.real, dtype=np.float32))
    tw_inputs.append(np.ascontiguousarray(ltw.imag, dtype=np.float32))
    lspec = pl.BlockSpec((m, r), lambda j: (0, 0), memory_space=pltpu.VMEM)
    tw_specs.extend([lspec, lspec])

    kernel = _make_ksplit2_kernel(n, m, r, mplan.stages, last, backward)
    out_spec = pl.BlockSpec((n, tb), lambda j: (0, j), memory_space=pltpu.VMEM)

    def call(re, im):
        b = re.shape[-1]
        nb = b // tb
        grid = (nb,)
        view_specs = []
        for c in range(r):
            view_specs.append(pl.BlockSpec(
                (m, tb), lambda j, c=c: (0, c * nb + j),
                memory_space=pltpu.VMEM))
        re2 = re.reshape(m, r * b)   # free: row q, lane c*b + b'
        im2 = im.reshape(m, r * b)
        out_shape = [
            jax.ShapeDtypeStruct((n, b), jnp.float32),
            jax.ShapeDtypeStruct((n, b), jnp.float32),
        ]
        flops = int(8 * n * _math.log2(max(n, 2)) * b)
        params = {}
        if not interpret:
            params["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=int(_pk.VMEM_LIMIT))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*tw_specs, *(view_specs * 2)],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=interpret,
            scratch_shapes=[pltpu.VMEM((m, r * tb), jnp.float32)] * 4,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * 4 * n * b, transcendentals=0),
            **params,
        )(*[jnp.asarray(t) for t in tw_inputs],
          *([re2] * r), *([im2] * r))

    return call


def cfft_ksplit2_tmajor(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    interpret: bool = False,
    conf: Optional[Tuple[int, int]] = None,
    tb: int = 128,
):
    """Single-pass in-kernel ksplit complex FFT, time-major [N, B] planes.

    Unscaled, canonical bin order (see the ksplit2 block comment)."""

    n = plan.engine_n
    m, r = conf if conf is not None else (2048, n // 2048)
    if m * r != n:
        raise ValueError(f"ksplit2 conf {m}*{r} != {n}")
    b = re.shape[-1]
    if b % tb:
        raise ValueError(f"batch {b} must be a multiple of tile {tb}")
    call = _build_ksplit2(n, m, r, tb, backward, interpret)
    if call is None:
        raise ValueError(f"no ksplit2 build for N={n} (m={m}, r={r})")
    return call(re, im)


# ---------------------------------------------------------------------------
# kern2: the TWO-KERNEL-PASS engine (round 5) — pass A is the wide-tile
# length-m kernel over the free [N, B] -> [m, r*B] decimation-in-time view,
# pass B is the Pallas combine kernel (pallas_fft.cfft_combine_tmajor)
# instead of ksplit's losing XLA einsum+relayout combine.  Two clean HBM
# round trips with kernel-grade fusion in each: the design that extends
# single-pass-quality coverage past the n*tb <= 1M compile wall
# (VERDICT r4 next-1b).  The reference's engine covers its whole size
# range at uniform SIMD quality (pffft_priv_impl.h:1465-1532); this is
# the TPU analog for N above the direct kernel's ceiling.
# ---------------------------------------------------------------------------

# Measured (m, r) split for the kern2 engine (kern2d_r5.txt interleaved
# race with the v2 combine: 6/6 wins vs xla at every size, medians
# 0.244-0.258 SoL vs xla's 0.135-0.162 — 1.5-1.7x; at 8192 it also beats
# the direct tb128 scratch kernel, 0.258 vs 0.206).
_KERN2_CONF: dict = {
    # kern2d_r5.txt + kern2e_r5.txt interleaved races (>=64 MB plateau):
    # smaller m with a fatter combine wins — the radix-32 butterfly
    # (4 x radix-8 + twiddled radix-4 recombine) lets 32768/65536 ride
    # the m<=2048 wide-tile pass A (0.264/0.250 vs 0.249/0.225 for the
    # m=2048/4096 r=16 confs).
    8192: (1024, 8),
    16384: (2048, 8),
    32768: (1024, 32),
    65536: (2048, 32),
    # upper_r5.txt: (4096, 32) with the tb512 wall-tile pass A measures
    # 0.264 med SoL vs the 3-stage xla chain's 0.086 (3.1x) — the
    # two-pass engine's reach extends one octave past the band
    131072: (4096, 32),
}


def set_kern2_conf(n: int, m: int, r: int) -> None:
    """Record a measured kern2 (m, r) split for ``n``."""

    global _TABLE_VERSION
    if m * r != n:
        raise ValueError(f"kern2 conf {m}*{r} != {n}")
    _KERN2_CONF[int(n)] = (int(m), int(r))
    _TABLE_VERSION += 1


def _kern2_conf(n: int) -> Optional[Tuple[int, int]]:
    """(m, r) for the two-pass engine: measured table first, else the
    largest kernel-covered m with a butterfly-supported r (the combine
    kernel handles r in {2,3,4,5,8,16,32})."""

    conf = _KERN2_CONF.get(n)
    if conf is not None:
        return conf
    if n < 8192:
        # the direct kernel covers N<=8192; two passes only pay past it
        return None
    for m in (4096, 2048, 1024):
        r = n // m
        if n == m * r and r in (2, 3, 4, 5, 8, 16, 32) \
                and _pk.thin_factors(m) is not None:
            return (m, r)
    return None


def cfft_kern2_tmajor(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    interpret: bool = False,
    conf: Optional[Tuple[int, int]] = None,
    tb_a: Optional[int] = None,
    mk: Optional[int] = None,
    tb_b: Optional[int] = None,
):
    """Two-kernel-pass complex FFT, time-major planes [N, B].

    Unscaled, canonical bin order.  N = m*r: pass A runs the length-m
    fused kernel on the [m, r*B] view (wide lane tiles — the kernel's
    0.5-0.8 SoL regime), pass B the Pallas combine kernel.  ``conf``
    overrides the (m, r) table; ``tb_a``/``mk``/``tb_b`` the tile policy
    (probe harnesses)."""

    c = conf if conf is not None else _kern2_conf(plan.engine_n)
    if c is None:
        raise ValueError(f"no kern2 configuration for N={plan.engine_n}")
    built = _build_ksplit(plan.engine_n, *c)
    if built is None:
        raise ValueError(f"no kern2 build for N={plan.engine_n} (m,r)={c}")
    mplan, last = built
    n, b = re.shape
    m, r = mplan.engine_n, last.r
    tb = tb_a if tb_a is not None else _pk.best_tb(m, r * b)
    if tb is None:
        raise ValueError(f"batch {b}: no kernel tile divides {r}*{b}")
    ar = re.reshape(m, r * b)
    ai = im.reshape(m, r * b)
    ar, ai = _pk.cfft_pallas_tmajor(
        mplan, ar, ai, backward=backward, tb=tb, interpret=interpret,
        scratch=_pk.use_scratch(m, tb),
    )
    return _pk.cfft_combine_tmajor(
        last, ar.reshape(n, b), ai.reshape(n, b),
        backward=backward, mk=mk, tb=tb_b, interpret=interpret,
    )


def cfft_kern2_tmajor_packed(
    plan: _plan.Plan,
    y: jax.Array,
    *,
    interpret: bool = False,
    conf: Optional[Tuple[int, int]] = None,
):
    """Two-kernel-pass FFT of a PACKED time-major buffer y [H, 2B]
    (the real forward's free ``x.reshape(H, 2B)`` — lanes :B re, B: im).

    Pass A reads each DIT slab's re/im tiles straight from the packed
    buffer's [m, r*2B] wide view (pallas_fft._build_packed slab index
    maps), so the planar pack never materializes — the HBM pass that a
    pallas_call input otherwise forces (the lane slices cannot fuse into
    the kernel the way they fuse into the XLA chain's first einsum)."""

    c = conf if conf is not None else _kern2_conf(plan.engine_n)
    if c is None:
        raise ValueError(f"no kern2 configuration for N={plan.engine_n}")
    built = _build_ksplit(plan.engine_n, *c)
    if built is None:
        raise ValueError(f"no kern2 build for N={plan.engine_n} (m,r)={c}")
    mplan, last = built
    n, b2 = y.shape
    b = b2 // 2
    m, r = mplan.engine_n, last.r
    # packed tiles must not cross slab boundaries: divisor of b, not r*b
    # (narrower than the unpacked pass A when b < its tile — the probe
    # races both compositions)
    tb = _pk.best_tb(m, b)
    if tb is None:
        raise ValueError(f"batch {b}: no kernel tile divides each slab")
    yw = y.reshape(m, r * 2 * b)
    ar, ai = _pk.cfft_pallas_tmajor_packed(
        mplan, yw, tb=tb, interpret=interpret, slabs=r,
        scratch=_pk.use_scratch(m, tb),
    )
    return _pk.cfft_combine_tmajor(
        last, ar.reshape(n, b), ai.reshape(n, b),
        backward=False, interpret=interpret,
    )


def available_engines(plan: _plan.Plan, batch: int, time_major: bool) -> Tuple[str, ...]:
    out = ["xla"]
    if (
        _fs.supported(plan)
        and not time_major
        and batch % _fs.DEFAULT_TB == 0
        # in + out + ~2 live intermediates per plane pair
        and 8 * plan.engine_n * _fs.DEFAULT_TB * 4 <= _PALLAS_VMEM_BUDGET
    ):
        out.append("fused2")
    if (
        _pallas_plan(plan) is not None
        and time_major
        # per-N measured tile policy (VMEM stack gate folded in):
        # None when no compiling tile divides the batch
        and _pk.best_tb(plan.engine_n, batch) is not None
    ):
        out.append("pallas")
    if plan.dtype == np.float32 and time_major:
        built = _ksplit_plans(plan.engine_n)
        if built is not None and _pk.best_tb(
            built[0].engine_n, built[1].r * batch
        ) is not None:
            out.append("ksplit")
        conf = _kern2_conf(plan.engine_n)
        if (
            conf is not None
            and batch % 128 == 0
            and _build_ksplit(plan.engine_n, *conf) is not None
            and _pk.best_tb(conf[0], conf[1] * batch) is not None
        ):
            out.append("kern2")
    return tuple(out)


def set_engine(name: Optional[str]) -> None:
    """Force an engine globally ('xla', 'fused2', 'pallas', 'ksplit', or None)."""

    global _FORCED
    if name is not None and name not in _ENGINES:
        raise ValueError(f"unknown engine {name!r}")
    _FORCED = name


_WARNED_ENV_FALLBACK = set()

# Measured engine table: (backend, n, time_major) -> engine, filled from
# the archived interleaved-round comparisons (benchmarks/bench_engines.py
# -> benchmarks/results/engines_r*.csv).  The analog of the reference's
# runtime dispatcher table (/root/reference/benchmarks/pf_conv_dispatcher.cpp:18-60).
# Round-3 plateau-payload measurement (engines_r3.csv, >=64 MB/plane,
# 8 interleaved rounds): the pallas VPU radix kernel wins 8/8 rounds at
# N=1024 time-major (median 764 GF/s = 0.30 SoL vs 433 for the XLA
# time-major engine) — its single HBM pass finally beats the stage
# engine in the kernel's native layout.  Batch-major stays xla (the
# transposes in/out of the kernel layout would eat the win); N=4096
# stays xla (the kernel exceeds the VMEM budget / Mosaic 500s there).
_MEASURED_TABLE: dict = {
    # pallas_tb2_r3.txt: with the per-N measured tile policy the kernel
    # medians at plateau payloads are 1.1 SoL at N=128 (tb=512), 0.86 at
    # N=256 (tb=1024), 0.90 at N=512 (tb=384) — 3-6x every XLA variant
    ("tpu", 128, True): "pallas",
    ("tpu", 256, True): "pallas",
    ("tpu", 512, True): "pallas",
    ("tpu", 1024, False): "xla",
    ("tpu", 1024, True): "pallas",
    # Round 4 (vmem_r4.txt / scratch_r4.txt): raising the Mosaic scoped-
    # VMEM limit to 100 MB unlocked the kernel across the north-star band
    # — N=1024 tb1024 0.66-0.77 SoL, N=2048 tb512 0.61-1.00, N=4096 tb256
    # 0.32-0.34 — vs XLA time-major medians of 0.17-0.23 there
    # (sweep_r3_tmajor.csv), >=2x margins.  Batch-major stays xla (the
    # transposes in/out of the kernel layout eat the win).
    ("tpu", 2048, False): "xla",
    ("tpu", 2048, True): "pallas",
    ("tpu", 4096, False): "xla",
    ("tpu", 4096, True): "pallas",
    # N=8192-65536 (round 5): the two-kernel-pass engine with the v2
    # per-slab combine — kern2d_r5.txt interleaved race, 6/6 wins vs xla
    # at every size (medians 0.219-0.258 SoL vs 0.135-0.162; at 8192 it
    # also beats the r4-routed direct tb128 scratch kernel 0.258 vs
    # 0.206).  The upper band's first single-engine coverage.
    ("tpu", 8192, True): "kern2",
    ("tpu", 16384, True): "kern2",
    ("tpu", 32768, True): "kern2",
    ("tpu", 65536, True): "kern2",
    # one octave past the band (upper_r5.txt): kern2 (4096,32) wall-tile
    # pass A 0.264 med vs xla 0.086 (3.1x)
    ("tpu", 131072, True): "kern2",
    # non-pow2 (non2{,b}_r5.txt, interleaved >=64 MB plateau): the VPU
    # kernel's radix-3/5 butterflies outrun the dense XLA chain 2-4x —
    # 96 0.78 vs 0.42, 160 0.99 vs 0.32, 192 0.52 vs 0.33, 384 0.65 vs
    # 0.24, 480 0.53 vs 0.18, 768 0.28 vs 0.17, 800 0.60 vs 0.14,
    # 2400 0.39 vs 0.13.  640 raced at a tile-divisible batch in
    # non2c_r5.txt: tb768 0.763 med vs xla (80,8) 0.172 (4.4x).  9216
    # has no kernel tile (n*tb > 1M) and its kern2 confs lose to the
    # xla chain (kern2e_r5.txt: (3072,3) 0.145 vs 0.222) — xla stays.
    ("tpu", 96, True): "pallas",
    ("tpu", 160, True): "pallas",
    ("tpu", 192, True): "pallas",
    ("tpu", 384, True): "pallas",
    ("tpu", 480, True): "pallas",
    ("tpu", 640, True): "pallas",
    ("tpu", 768, True): "pallas",
    ("tpu", 800, True): "pallas",
    ("tpu", 2400, True): "pallas",
}

# Real-plan override rows (consulted before _MEASURED_TABLE when
# plan.is_real): the REAL composition's pack/split-step neighbours fuse
# into the XLA chain's einsums but NOT across pallas_call boundaries, so
# the engine race can flip vs the bare complex transform at the same H
# (realroute_r5.txt: complex kern2 wins 0.27 vs 0.22 at H=8192 but the
# real pair LOSES 0.065 vs 0.086).  Filled from realpack_r5.txt.
_MEASURED_TABLE_REAL: dict = {}

# Fused one-pass real transform route (pallas_fft.rfft_*_tmajor_fused:
# FFT chain + REAL_FINALIZE/PREPROCESS split in ONE HBM pass via the
# roll-network mirror, revroll_r5.txt).  Entries are (backend, H) pairs
# measured to beat the composed path (fusedreal_r5.txt, 6 interleaved
# trials, >=64 MB payloads — real N=1024..8192: fwd 0.309-0.332 vs
# 0.226-0.267, bwd 0.219-0.265 vs 0.174-0.219, every round a win).
# H=8192 (real 16384) stays on packed kern2 (0.193 vs the fused direct
# kernel's 0.150 — tb128 is the direct kernel's slow regime there).
# Per-direction because the composed baselines differ (fwd has the
# packed-input entries, bwd pays the interleave either way).
_FUSED_REAL_FWD: set = {
    ("tpu", 512), ("tpu", 1024), ("tpu", 2048), ("tpu", 4096),
}
_FUSED_REAL_BWD: set = {
    ("tpu", 512), ("tpu", 1024), ("tpu", 2048), ("tpu", 4096),
}


def record_fused_real(backend: str, h: int, *, forward: bool = True,
                      backward: bool = True) -> None:
    """Record measured fused-real wins (bumps the dispatch state key)."""

    global _TABLE_VERSION
    if forward:
        _FUSED_REAL_FWD.add((backend, int(h)))
    if backward:
        _FUSED_REAL_BWD.add((backend, int(h)))
    _TABLE_VERSION += 1


def _fused_real_common(plan: _plan.Plan, batch: int, table: set):
    if jax.default_backend() != "tpu":
        return None
    if not plan.is_real or plan.dtype != np.float32:
        return None
    h = plan.engine_n
    if h & (h - 1) or (jax.default_backend(), h) not in table:
        return None
    pplan = _pallas_plan(plan)
    if pplan is None:
        return None
    tb = _pk.best_tb(h, batch)
    if tb is None:
        return None
    return pplan, tb


def fused_real_fwd_route(plan: _plan.Plan, batch: int):
    """Callable y[H, 2B] -> packed spectrum planes, or None."""

    hit = _fused_real_common(plan, batch, _FUSED_REAL_FWD)
    if hit is None:
        return None
    pplan, tb = hit
    return lambda y: _pk.rfft_pallas_tmajor_fused(
        pplan, y, plan.real_twiddle, tb=tb)


def fused_real_bwd_route(plan: _plan.Plan, batch: int):
    """Callable (sr, si) -> planar pre-interleave pair, or None."""

    hit = _fused_real_common(plan, batch, _FUSED_REAL_BWD)
    if hit is None:
        return None
    pplan, tb = hit
    return lambda sr, si: _pk.rfft_bwd_pallas_tmajor_fused(
        pplan, sr, si, plan.real_twiddle, tb=tb)


# Standalone one-pass split-step kernel (pallas_fft.real_split_tmajor_
# pallas) for sizes whose FFT rides kern2 and cannot absorb the split
# (H >= 8192).  realsplit2_r5.txt at H=8192: fwd 0.269 vs the flat
# form's 0.197, and the PAIR (the flat split sandwiched between pallas
# calls in one jit hits an XLA relayout pathology: 0.035 vs the
# parts-ideal 0.081) recovers to 0.075 with the kernel on both sides.
# H >= 16384 is a 2M-element wall tile and fails the remote compile
# (HTTP 500) — stays flat.
_SPLIT_KERNEL_REAL: set = {("tpu", 8192)}


def record_split_kernel_real(backend: str, h: int) -> None:
    global _TABLE_VERSION
    _SPLIT_KERNEL_REAL.add((backend, int(h)))
    _TABLE_VERSION += 1


def real_split_kernel_route(plan: _plan.Plan, batch: int, backward: bool):
    """Callable (zr, zi) -> split-step output planes, or None."""

    if jax.default_backend() != "tpu":
        return None
    if not plan.is_real or plan.dtype != np.float32:
        return None
    h = plan.engine_n
    if h & (h - 1) or (jax.default_backend(), h) not in _SPLIT_KERNEL_REAL:
        return None
    if batch % 128:
        return None
    return lambda zr, zi: _pk.real_split_tmajor_pallas(
        zr, zi, plan.real_twiddle, backward=backward)


_TABLE_VERSION = 0

# Fused spectral-convolution kernel route (ops/conv_kernel.py): one HBM
# pass per overlap-save block instead of three engine passes (the
# reference's fwd-FFT / zconvolve / bwd-FFT block loop,
# /root/reference/src/pffastconv.c:185-196).  Measured round-3 at
# plateau payloads, median of 5 interleaved rounds:
#   bare block engines (benchmarks/results/convkernel_r3.txt):
#     nfft=256 fused 45.3 Gsamp/s vs 17.6 (kernel-FFT composition) /
#     10.5 (forced-xla); nfft=512: 15.1 vs 13.7 / 4.0
#   END-TO-END FastConv pipelines incl. framing (convroute_r3.txt):
#     nfft=128: 9.7 vs 2.4 Gsamp/s (4.1x); nfft=256: 11.2 vs 2.5 (4.5x);
#     nfft=512: 6.3 vs 2.2 (2.8x); on-chip rel err 3e-7 vs the XLA path
#   nfft=1024: the fwd+bwd stage chain doubles the Mosaic scoped-VMEM
#   stack and the compile fails (HTTP 500) — stays on the XLA pipeline.
# Follow-up (convroute2_r3.txt, same protocol): nfft=64 fused 3.3 vs
# 2.7 (composed tmajor) vs 1.5 Gsamp/s (xla).  Where the fused kernel
# cannot compile, the COMPOSED time-major pipeline (same framing and
# two-frames-per-column packing, dispatch-routed transforms + XLA Hf
# multiply) still wins on layout alone: nfft=1024 6.5 vs 2.2 Gsamp/s
# (3.0x — the FFT kernel carries it), nfft=2048 4.2 vs 2.2 (1.9x with
# XLA engines on both sides).  Values: 'fused'/True, 'tmajor', falsy.
# Round 4 (convkernel_r4.txt): the scratch chain + VMEM-limit raise make
# the fused kernel COMPILE at nfft=1024-4096, but it only TIES the
# composed tmajor route there (3.61/3.44/3.07 vs 3.46/3.29/3.15
# Gsamp/s, margins ~1.05x << the 1.5x gate) — at these lengths both are
# engine-pass-bound, so the in-kernel Hf multiply saves little.  The
# table keeps 'tmajor' at >=1024 (no route change without a margin).
_CONV_TABLE: dict = {
    ("tpu", 64): True,
    ("tpu", 128): True,
    ("tpu", 256): True,
    ("tpu", 512): True,
    ("tpu", 1024): "tmajor",
    ("tpu", 2048): "tmajor",
    # convroute3 block of convroute2_r3.txt: 4.5 vs 2.1 / 3.7 vs 2.0
    ("tpu", 4096): "tmajor",
    ("tpu", 8192): "tmajor",
}


def record_conv_route(backend: str, nfft: int, use) -> None:
    """Record a measured conv route decision (True/'fused', 'tmajor',
    or False)."""

    global _TABLE_VERSION
    if use not in (True, False, "fused", "tmajor"):
        raise ValueError(f"unknown conv route {use!r}")
    _CONV_TABLE[(backend, int(nfft))] = use
    _TABLE_VERSION += 1


def conv_route_mode(nfft: int, force=None) -> Optional[str]:
    """'fused' | 'tmajor' | None — which overlap-save pipeline FastConv
    runs for this block length (measured table + engine force; ``force``
    overrides: True/'fused', 'tmajor', False)."""

    if force is False:
        return None
    if force in (True, "fused"):
        return "fused"
    if force == "tmajor":
        return "tmajor"
    eng = _FORCED or (os.environ.get("PFFFT_TPU_ENGINE") or None)
    if eng == "pallas":
        # sentinel-aware: a recorded False (e.g. the kernel crashes the
        # remote compiler at this length) stays False even under the
        # pallas force; only a table MISS defaults to the kernel.
        t = _CONV_TABLE.get((jax.default_backend(), nfft), "fused")
    elif eng is not None:
        return None
    else:
        t = _CONV_TABLE.get((jax.default_backend(), nfft))
    if t in (True, "fused"):
        return "fused"
    if t == "tmajor":
        return "tmajor"
    return None


def conv_kernel_choice(
    nfft: int, cols: int, force: Optional[bool] = None
) -> Optional[Tuple[_plan.Plan, int]]:
    """(thin plan, tile) for the fused spectral-conv kernel over ``cols``
    complex columns of length ``nfft``, or None to keep the XLA pipeline.

    Honors the engine force ('xla' disables, 'pallas' enables wherever the
    kernel covers the length) and the measured per-backend table
    otherwise.  ``force`` overrides both (tests / probes).  The tile is
    the widest measured candidate whose column padding wastes <= 1/3 of
    the batch (tiles are preference-ordered; wider lane tiles measure up
    to 3x faster — ops/pallas_fft._TB_PREF).
    """

    if force is False:
        return None
    if force is None and conv_route_mode(nfft) != "fused":
        return None
    plan = _thin_plan(nfft)
    if plan is None or cols < 1:
        return None
    # wall tiles (n*tb past the pipelined-grid envelope) are excluded:
    # the conv kernel's DOUBLED fwd+bwd chain is unmeasured there
    cands = [t for t in _pk.tb_candidates(nfft)
             if not _pk.is_wall_tile(nfft, t)]
    if not cands:
        return None
    for tb in cands:
        if (-cols) % tb <= cols // 3:
            return plan, tb
    if force:
        return plan, min(cands)
    return None


def record_engine(backend: str, n: int, engine: str, time_major: bool = False) -> None:
    """Record a measured winner (updates the in-process dispatch table)."""

    global _TABLE_VERSION
    if engine not in _ENGINES:
        raise ValueError(f"unknown engine {engine!r}")
    _MEASURED_TABLE[(backend, int(n), bool(time_major))] = engine
    _TABLE_VERSION += 1


def record_engine_real(backend: str, n: int, engine: str,
                       time_major: bool = False) -> None:
    """Record a REAL-composition winner (overrides the complex row when
    the dispatched plan is a real transform's half-length engine)."""

    global _TABLE_VERSION
    if engine not in _ENGINES:
        raise ValueError(f"unknown engine {engine!r}")
    _MEASURED_TABLE_REAL[(backend, int(n), bool(time_major))] = engine
    _TABLE_VERSION += 1


def set_chain_pref(n: int, radix16: bool) -> None:
    """Set the kernel chain preference for engine length ``n`` (measured
    via scripts/r3_radix16.py) and invalidate the dependent caches (the
    thin-plan cache and, through the table version, the public
    transforms' jit caches)."""

    global _TABLE_VERSION
    _pk._CHAIN_PREF[int(n)] = bool(radix16)
    _thin_plan.cache_clear()
    _TABLE_VERSION += 1


def state_key() -> tuple:
    """Hashable snapshot of every trace-time global that changes what the
    engine executes: the engine force (programmatic + env), the
    measured-table version, and the split engine's mode switches (cmul
    form, spec2 chain, stage barrier).  Every jit cache keyed on a Plan
    that traces through :func:`cfft_dispatch` or the split engine MUST
    include this key — the choices are baked in at trace time, so a stale
    cache entry silently keeps running the previously traced variant
    after ``set_engine``/``set_cmul_mode``/``record_engine`` (any
    forced-variant A/B then compares an executable against itself)."""

    return (
        _FORCED,
        os.environ.get("PFFFT_TPU_ENGINE") or None,
        os.environ.get("PFFFT_TPU_DF64") or None,
        _TABLE_VERSION,
        _pk.tb_fail_version(),
        _split.cmul_mode(),
        _split._SPEC2_ENABLED,
        _split._STAGE_BARRIER,
    )


def packed_fwd_route(plan: _plan.Plan, batch: int):
    """Zero-copy real-forward pack: a callable y[H, 2B] -> planar pair
    when the tmajor engine is the direct kernel (its re/im input tiles
    then DMA straight from the packed buffer at lane offsets 0/B —
    pallas_fft.cfft_pallas_tmajor_packed), else None.  The planar pack's
    lane slices cannot fuse into a pallas call (XLA materializes both
    half planes first), so the packed entry saves a full HBM pass."""

    if jax.default_backend() != "tpu":
        return None
    engine = select_engine(plan, batch, True)
    if engine == "kern2":
        # the two-pass engine's pass A reads the packed wide view
        # directly (slab index maps) — same one-pass saving
        conf = _kern2_conf(plan.engine_n)
        if conf is None:
            return None
        built = _build_ksplit(plan.engine_n, *conf)
        if built is None:
            return None
        tb = _pk.best_tb(conf[0], batch)  # per-slab tile (divides batch)
        if tb is None:
            return None
        return lambda y: cfft_kern2_tmajor_packed(plan, y)
    if engine != "pallas":
        return None
    pplan = _pallas_plan(plan)
    if pplan is None:
        return None
    tb = _pk.best_tb(plan.engine_n, batch)
    if tb is None or batch % tb:
        return None
    return lambda y: _pk.cfft_pallas_tmajor_packed(pplan, y, tb=tb)


def _df64_route(plan: _plan.Plan) -> bool:
    """Route f64 plans through the double-float MXU engine (ops/df64.py).

    TPU only (elsewhere XLA's native f64 stage path is correct and fast
    enough); requires a plain chain with stage radices <= 128 — the
    exact-slice contraction's f32 accumulation bound is 2r <= 256 rows
    (df64.py module docs).  PFFFT_TPU_DF64=0 forces the soft-float path
    (measured 2-4 GF/s, sweep_r4_f64.csv); default is on."""

    if plan.dtype != np.float64:
        return False
    if os.environ.get("PFFFT_TPU_DF64", "") in ("0", "off"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return plan.local_split is None and all(
        st.r <= 128 for st in plan.stages
    )


def _cfft_df64(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool,
    time_major: bool,
):
    """f64 planes -> (hi, lo) f32 pairs -> df64 chain -> f64 planes.

    The pair split/merge is 4 soft-float elementwise ops (memory-bound);
    the stage contractions run on the MXU (see ops/df64.py)."""

    import jax.numpy as jnp

    if time_major:
        rr, ii = _cfft_df64(
            plan, re.T, im.T, backward=backward, time_major=False
        )
        return rr.T, ii.T
    f64 = re.dtype
    rh = re.astype(jnp.float32)
    rl = (re - rh.astype(f64)).astype(jnp.float32)
    ih = im.astype(jnp.float32)
    il = (im - ih.astype(f64)).astype(jnp.float32)
    (yh, yl), (vh, vl) = _df64.df64_cfft_split(
        (rh, rl), (ih, il), plan.stages, backward=backward
    )
    return (
        yh.astype(f64) + yl.astype(f64),
        vh.astype(f64) + vl.astype(f64),
    )


def select_engine(plan: _plan.Plan, batch: int, time_major: bool) -> str:
    avail = available_engines(plan, batch, time_major)
    if _FORCED is not None:
        # programmatic force: hard error when unavailable (caller opted in)
        if _FORCED not in avail:
            raise ValueError(
                f"forced engine {_FORCED!r} unavailable for plan {plan} "
                f"(batch={batch}, time_major={time_major}); available: {avail}"
            )
        return _FORCED
    env = os.environ.get("PFFFT_TPU_ENGINE") or None
    if env is not None:
        # env-var force: fall back to 'xla' with a one-time warning — a
        # global env var must not turn every unsupported call site (odd
        # batch, time_major mismatch) into a ValueError (ADVICE r2)
        if env in avail:
            return env
        key = (env, plan.n, batch, time_major)
        if key not in _WARNED_ENV_FALLBACK:
            _WARNED_ENV_FALLBACK.add(key)
            import warnings

            warnings.warn(
                f"PFFFT_TPU_ENGINE={env!r} unavailable for plan {plan} "
                f"(batch={batch}, time_major={time_major}); falling back to 'xla'",
                RuntimeWarning,
                stacklevel=2,
            )
        return "xla"
    # measured table first (per backend + engine length + layout), then
    # the measured default: the XLA stage path wins everywhere else on
    # current hardware (engines_r3.csv; the fused kernel's concat matmuls
    # cost 4/3 the MXU work — see benchmarks/results/)
    backend = jax.default_backend()
    if plan.is_real:
        # the REAL composition can prefer a different engine than the
        # bare complex transform at the same engine length: its pack /
        # split-step neighbours fuse into XLA chains but not into
        # pallas_call boundaries (realroute_r5.txt) — a real-specific
        # row wins over the complex row when present
        measured = _MEASURED_TABLE_REAL.get(
            (backend, plan.engine_n, bool(time_major))
        )
        if measured is not None and measured in avail:
            return measured
    measured = _MEASURED_TABLE.get(
        (backend, plan.engine_n, bool(time_major))
    )
    if measured is not None and measured in avail:
        return measured
    return "xla"


def cfft_dispatch(
    plan: _plan.Plan,
    re: jax.Array,
    im: jax.Array,
    *,
    backward: bool = False,
    time_major: bool = False,
):
    """Complex FFT through the selected engine (split format).

    time_major: planes are [N, B] (the VPU kernel's native layout);
    otherwise [..., N].
    """

    if _df64_route(plan):
        return _cfft_df64(
            plan, re, im, backward=backward, time_major=time_major
        )
    batch = re.shape[-1] if time_major else int(re.size // re.shape[-1])
    engine = select_engine(plan, batch, time_major)
    # Mosaic only compiles on TPU; elsewhere the kernels run interpreted
    interp = jax.default_backend() != "tpu"
    if engine == "pallas":
        pplan = _pallas_plan(plan)
        tb = _pk.best_tb(plan.engine_n, batch) or _pk.DEFAULT_TB
        return _pk.cfft_pallas_tmajor(
            pplan, re, im, backward=backward, tb=tb, interpret=interp,
            scratch=_pk.use_scratch(plan.engine_n, tb),
        )
    if engine == "ksplit":
        return cfft_ksplit_tmajor(plan, re, im, backward=backward, interpret=interp)
    if engine == "kern2":
        return cfft_kern2_tmajor(plan, re, im, backward=backward, interpret=interp)
    if engine == "fused2":
        lead = re.shape[:-1]
        n = re.shape[-1]
        rr, ii = _fs.cfft_fused2(
            plan, re.reshape(-1, n), im.reshape(-1, n),
            backward=backward, ordered=True, interpret=interp,
        )
        return rr.reshape(*lead, n), ii.reshape(*lead, n)
    if time_major:
        if plan.local_split is None and re.ndim == 2:
            # native time-major engine: batch stays on the lanes end-to-end
            return _split.cfft_stages_split_tmajor(
                re, im, plan.stages, backward=backward, ordered=True
            )
        rr, ii = _split.cfft_plan_split(plan, re.T, im.T, backward=backward, ordered=True)
        return rr.T, ii.T
    return _split.cfft_plan_split(plan, re, im, backward=backward, ordered=True)
