"""Transform plans: factorization, twiddle tables, validity helpers.

TPU-native analog of the reference's ``PFFFT_Setup`` (see
/root/reference/src/pffft_priv_impl.h:1051-1120 for the contract being
mirrored: size validation, factor decomposition into {2,3,4,5}-smooth sizes,
precomputed twiddles, read-only shareability).

Design departure from the reference (deliberate, TPU-first): instead of
4-lane SIMD butterflies over radix-2/3/4/5 passes, a plan factors N into a
small number of *large* factors (each itself 2/3/5-smooth, up to
``max_factor``).  Each stage is then a dense DFT-matrix contraction on the
MXU plus an elementwise twiddle multiply on the VPU.  On TPU the MXU/HBM
flop:byte ratio (~100+) makes dense-DFT factors of size up to ~128-256
cheaper than extra memory passes, so "few fat stages" replaces "many thin
radix passes".  This is the same idea as the reference's 4x4
"SIMD-ification" finalize step (pffft_priv_impl.h:1195-1462), scaled from
4 to MXU tile size.

Twiddles are computed on host in float64 (numpy) and cast once, mirroring
the reference's care with per-stage twiddle conditioning
(pffft_priv_impl.h:932-1001) so the fp32 engine reaches the 140 dB dynamic
range bound of tests/test_pffft.c.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
import math
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "Direction",
    "TransformKind",
    "FORWARD",
    "BACKWARD",
    "REAL",
    "COMPLEX",
    "Plan",
    "new_setup",
    "min_fft_size",
    "is_valid_size",
    "nearest_transform_size",
    "next_power_of_two",
    "is_power_of_two",
    "simd_size",
    "simd_arch",
    "decompose_smooth",
    "plan_factors",
    "save_plan",
    "load_plan",
]


class Direction(enum.Enum):
    """Transform direction (pffft_direction_t parity, pffft.h:112)."""

    FORWARD = -1  # sign of the exponent: exp(-2i pi nk / N)
    BACKWARD = +1


class TransformKind(enum.Enum):
    """Transform kind (pffft_transform_t parity, pffft.h:115)."""

    REAL = "real"
    COMPLEX = "complex"


FORWARD = Direction.FORWARD
BACKWARD = Direction.BACKWARD
REAL = TransformKind.REAL
COMPLEX = TransformKind.COMPLEX

# The reference's SIMD width; kept as the unit of its size-validity contract
# (pffft_priv_impl.h:78-98): complex N must be a multiple of SIMD^2 = 16,
# real N a multiple of 2*SIMD^2 = 32, remaining factors only {2,3,5}.
_REFERENCE_SIMD_SZ = 4

# Maximum N accepted by the reference (int-overflow guard,
# pffft_priv_impl.h:1069).  We keep the same cap for contract parity.
_MAX_N = 1 << 26


def simd_size() -> int:
    """Parity helper for ``pffft_simd_size`` (pffft.h:213).

    Returns the reference's SIMD width (4), which is what callers use to
    compute valid-size granularity.  The TPU lane width is reported by
    :func:`simd_arch` metadata instead.
    """

    return _REFERENCE_SIMD_SZ


def simd_arch() -> str:
    """Parity helper for ``pffft_simd_arch`` (pffft.h:216)."""

    return "tpu-xla-mxu"


def next_power_of_two(n: int) -> int:
    """Bit-exact parity with pffft_next_power_of_two (pffft_common.c:25)."""

    if n <= 0:
        return 1
    return 1 << (int(n - 1).bit_length())


def is_power_of_two(n: int) -> bool:
    """Parity with pffft_is_power_of_two (pffft_common.c)."""

    return n > 0 and (n & (n - 1)) == 0


def min_fft_size(kind: TransformKind = COMPLEX) -> int:
    """Minimum supported N (pffft_min_fft_size parity, pffft.h:222).

    complex: SIMD^2 = 16; real: 2*SIMD^2 = 32 (pffft_priv_impl.h:78-98).
    """

    kind = _coerce_kind(kind)
    base = _REFERENCE_SIMD_SZ * _REFERENCE_SIMD_SZ
    return 2 * base if kind == REAL else base


def _smooth_235_quotient(n: int) -> int:
    """Divide out all factors of 2, 3, 5; return the remaining quotient."""

    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n


def is_valid_size(n: int, kind: TransformKind = COMPLEX) -> bool:
    """Contract parity with pffft_is_valid_size (pffft.h:236).

    N must be a positive multiple of min_fft_size whose remaining factors
    are only 2, 3 and 5, and N <= 2^26.
    """

    kind = _coerce_kind(kind)
    m = min_fft_size(kind)
    if n <= 0 or n % m != 0 or n > _MAX_N:
        return False
    return _smooth_235_quotient(n // m) == 1


def nearest_transform_size(n: int, kind: TransformKind = COMPLEX, higher: bool = True) -> int:
    """Parity with pffft_nearest_transform_size (pffft.h:242).

    Brute-force search for the nearest valid size, matching the reference's
    semantics (search up when ``higher`` else down, clamping at the minimum).
    """

    kind = _coerce_kind(kind)
    m = min_fft_size(kind)
    if n < m:
        return m
    n = (n // m) * m if not higher else ((n + m - 1) // m) * m
    step = m if higher else -m
    while not is_valid_size(n, kind):
        n += step
        if n < m:
            return m
    return n


def _coerce_kind(kind) -> TransformKind:
    if isinstance(kind, TransformKind):
        return kind
    if isinstance(kind, str):
        return TransformKind(kind.lower())
    # Accept the C enum's integer values: 0 = REAL, 1 = COMPLEX (pffft.h:115)
    if isinstance(kind, int):
        return REAL if kind == 0 else COMPLEX
    raise TypeError(f"invalid transform kind: {kind!r}")


def _coerce_direction(direction) -> Direction:
    if isinstance(direction, Direction):
        return direction
    if isinstance(direction, str):
        s = direction.lower()
        if s in ("forward", "fwd"):
            return FORWARD
        if s in ("backward", "bwd", "inverse", "inv"):
            return BACKWARD
        raise ValueError(f"invalid direction: {direction!r}")
    # C enum integer values: 0 = FORWARD, 1 = BACKWARD (pffft.h:112)
    if isinstance(direction, int):
        return FORWARD if direction == 0 else BACKWARD
    raise TypeError(f"invalid direction: {direction!r}")


# ---------------------------------------------------------------------------
# Factorization
# ---------------------------------------------------------------------------


def decompose_smooth(n: int) -> Tuple[int, ...]:
    """Decompose n into prime factors from {2, 3, 5} (ascending).

    Raises ValueError if n is not 2/3/5-smooth.  Analog of the reference's
    ``decompose`` (pffft_priv_impl.h:903-928) without the radix-4 grouping,
    which is a SIMD-era concern; stage grouping happens in plan_factors.
    """

    if n < 1:
        raise ValueError("n must be >= 1")
    out = []
    for p in (2, 3, 5):
        while n % p == 0:
            out.append(p)
            n //= p
    if n != 1:
        raise ValueError("n has prime factors other than 2, 3, 5")
    return tuple(out)


def default_max_factor() -> int:
    """Backend-dependent stage-size policy (measured on TPU v5e; all TPU
    rows meet the reference's 140 dB carrier-test bound with margin):

        backend  max_factor  N=4096 factors  dynrange   throughput
        TPU      128         (64, 64)        153.0 dB   1826 GF/s
        TPU      128         (128,128)@16k   153.0 dB    845 GF/s (vs 381 @ mf=64)
        TPU      5           (4,)*6          148.7 dB    107 GF/s
        CPU      64+         dense           126.7 dB   (fails the 140 dB bound)
        CPU      5           (4,)*6          148.7 dB   meets the bound

    On the MXU, jax.lax.Precision.HIGHEST multiplies via six bf16 passes
    whose products are exact in f32, so two dense stages round *less* than
    six chained radix-4 stages -- fat stages win BOTH accuracy and speed
    on TPU.  On CPU (true f32 FMA) a 64-term dot accumulates ~sqrt(64)*eps
    and loses the reference's 140 dB bound (tests/test_pffft.c:52-61), so
    small radices stay the default there, mirroring the reference's
    radix-4 preference (pffft_priv_impl.h:904).

    Beyond two stages (engine_n > max_factor^2) TPU plans switch to a
    local four-step split (see Plan.local_split): measured 910 GF/s vs 468
    at N=65536.
    """

    import os

    env = os.environ.get("PFFFT_TPU_MAX_FACTOR")
    if env:
        return int(env)
    try:
        import jax

        # Round-2 measurement (scripts/r2_perf4.py): a (512, 256) dense
        # chain runs 2.2x the four-step on the same factors at N=2^17
        # (628 GF/s = 0.145 SoL vs 285), and dense-256 stages hold 150.5 dB
        # on-chip — so the TPU cap is 512 and large N prefers fat chains
        # (see Plan._cached's chain-vs-split policy).
        return 512 if jax.default_backend() == "tpu" else 5
    except Exception:  # pragma: no cover
        return 5


# local four-step activates only for the fat-stage (TPU) policy and while
# the [N1, N2] twiddle table stays a sane size (planar f32 on device).
_LOCAL_SPLIT_MIN_MF = 32
_LOCAL_SPLIT_MAX_N = 1 << 24

# Measured stage-chain table for the TPU backend (engine length -> factor
# chain), from the round-3 on-chip factor matrix (scripts/r3_factors.py,
# benchmarks/results/factors_r3.csv).  The engine is MXU-bound under
# HIGHEST precision (6 bf16 passes x 3 Gauss matmuls = 36*r bf16 flops per
# element per stage of factor r), so the best chain balances sum(r_i)
# against per-stage pass overhead — fatter is NOT faster beyond r~64-128.
# Sizes not listed fall back to the max_factor policy.  The runtime
# MEASURE-mode analog (tune.tuned_setup) can override per-process.
#
# Median-of-interleaved-trials winners (factors_r3.csv + ab_r3 +
# concat_r3.txt, v5e, GAUSS mode — the default; see cmul_mode's
# payload-regime note):
#   256    (256,)        0.450 SoL med (gauss matrix; (16,16) wins only
#                        under concat mode)
#   512    (32,16)       0.310-0.466 (~tied with (64,8))
#   1024   (64,16)       0.265-0.470 (gauss; (32,32) wins under concat)
#   2048   (64,32)       0.456-0.567 (both-mode windows)
#   4096   (64,64)       0.317-0.378 (concat wins 6/8 both windows)
#   8192   (128,64)      0.260 (the serial-matrix 0.12 "cliff" was a
#                        contention block; interleaved re-probe is clean)
#   16384  (128,128)     0.351-0.357
#   32768  (256,128)     0.241
#   65536  (256,256)     0.166-0.189 (chain beats (64,64,16) 0.149 —
#                        3-stage chains are pass-bound, not MXU-bound)
#   131072 (128,128,8)   0.182 (8/8 wins vs (64,64,32))
#   262144 (128,128,16)  0.190 (8/8 wins vs (64,64,64))
#   1048576 (256,256,16) 0.103 (8/8 wins vs 64-chains)
_TPU_FACTOR_TABLE: dict = {
    256: (256,),
    512: (32, 16),
    1024: (64, 16),
    2048: (64, 32),
    4096: (64, 64),
    8192: (128, 64),
    16384: (128, 128),
    32768: (256, 128),
    65536: (256, 256),
    131072: (128, 128, 8),
    262144: (128, 128, 16),
    1048576: (256, 256, 16),
    # non-pow2 XLA-chain winners (non2{,b}_r5.txt, >=64 MB plateau,
    # interleaved): single dense stage wins through 480; split chains
    # past it.  (The kernel engine outruns the chain 2-4x at most of
    # these sizes and is routed via dispatch._MEASURED_TABLE; these
    # factors serve batch-major and kernel-ineligible batches.)
    640: (80, 8),
    768: (48, 16),
    800: (100, 8),
    2400: (60, 40),
    9216: (72, 128),
}


def _tpu_table_factors(engine_n: int) -> Optional[Tuple[int, ...]]:
    return _TPU_FACTOR_TABLE.get(engine_n)


def _balanced_split(n: int) -> Tuple[int, int]:
    """n = n1 * n2, both 2/3/5-smooth, as balanced as possible."""

    fs = decompose_smooth(n)
    divs = {1}
    for p in fs:
        divs |= {d * p for d in divs}
    best = None
    for d in sorted(divs):
        score = abs(math.log(d) - math.log(n // d))
        if best is None or score < best[0]:
            best = (score, d)
    n1 = best[1]
    return max(n1, n // n1), min(n1, n // n1)


def plan_factors(n: int, max_factor: int = 5) -> Tuple[int, ...]:
    """Group the 2/3/5-smooth factorization of n into stage factors.

    Policy: greedily build balanced factors no larger than ``max_factor``.
    Each returned factor becomes one DFT-matrix contraction stage.
    See :func:`default_max_factor` for how the default is chosen.
    """

    if n == 1:
        return (1,)
    primes = sorted(decompose_smooth(n), reverse=True)
    # Number of stages needed at minimum
    k = 1
    while True:
        target = n ** (1.0 / k)
        if target <= max_factor:
            break
        k += 1
    # Distribute primes over k buckets, largest-first into the smallest bucket,
    # subject to the max_factor cap.
    while True:
        buckets = [1] * k
        ok = True
        for p in primes:
            # place into smallest bucket that stays under cap
            order = sorted(range(k), key=lambda i: buckets[i])
            placed = False
            for i in order:
                if buckets[i] * p <= max_factor:
                    buckets[i] *= p
                    placed = True
                    break
            if not placed:
                ok = False
                break
        if ok:
            return tuple(sorted((b for b in buckets if b > 1), reverse=True) or (1,))
        k += 1


# ---------------------------------------------------------------------------
# Twiddle tables
# ---------------------------------------------------------------------------


def _native_planner():
    """The C++ planner from pffft_tpu.runtime, or None (lazy, cached)."""

    global _NATIVE
    if _NATIVE is _UNSET:
        try:
            from . import runtime as _runtime

            _NATIVE = _runtime.native_planner()
        except Exception:
            _NATIVE = None
    return _NATIVE


_UNSET = object()
_NATIVE = _UNSET


def _dft_matrix(r: int, sign: int, dtype) -> np.ndarray:
    """Dense r x r DFT matrix W[i, t] = exp(sign * 2i pi * i * t / r).

    Angles are reduced exactly in integer arithmetic before the trig
    evaluation (long-double in the native planner, float64 fallback),
    mirroring the conditioning of the reference's twiddle setup
    (pffft_priv_impl.h:942-962) so large-N fp32 plans keep the 140 dB
    test bound.
    """

    nat = _native_planner()
    if nat is not None:
        m = nat.dft_matrix(r)
        return (np.conj(m) if sign > 0 else m).astype(dtype)
    i = np.arange(r, dtype=np.int64)[:, None]
    t = np.arange(r, dtype=np.int64)[None, :]
    k = (i * t) % r  # exact integer reduction
    ang = (2.0 * np.pi / r) * k.astype(np.float64)
    m = np.cos(ang) + 1j * np.sin(ang) * sign
    return m.astype(dtype)


def _stage_twiddle(l: int, r: int, sign: int, dtype) -> np.ndarray:
    """Stage twiddle T[k, i] = exp(sign * 2i pi * i * k / (l * r)).

    Shape [l, r]; multiplies the input of the radix-r butterfly at Stockham
    stage with completed-DFT length l (see ops/stages.py for the derivation).
    """

    period = l * r
    nat = _native_planner()
    # native long-double conditioning for ordinary tables; giant tables
    # (l*r > 2^22, only reachable at N >= 2^23) use vectorized float64 —
    # the scalar long-double loop costs tens of seconds there and the
    # engine factors such tables into split form anyway (ops/split.py)
    if nat is not None and l * r <= (1 << 22):
        m = nat.stage_twiddle(l, r, period)
        return (np.conj(m) if sign > 0 else m).astype(dtype)
    k = np.arange(l, dtype=np.int64)[:, None]
    i = np.arange(r, dtype=np.int64)[None, :]
    e = (k * i) % period
    ang = (2.0 * np.pi / period) * e.astype(np.float64)
    m = np.cos(ang) + 1j * np.sin(ang) * sign
    return m.astype(dtype)


def _real_split_twiddle(n: int, sign: int, dtype) -> np.ndarray:
    """Twiddles for the real<->complex split step of an N-point real FFT.

    B[k] = exp(sign * 2i pi * k / N) for k = 0 .. N/2 - 1.
    """

    nat = _native_planner()
    if nat is not None:
        m = nat.real_split_twiddle(n)
        return (np.conj(m) if sign > 0 else m).astype(dtype)
    half = n // 2
    k = np.arange(half, dtype=np.int64)
    ang = (2.0 * np.pi / n) * k.astype(np.float64)
    m = np.cos(ang) + 1j * np.sin(ang) * sign
    return m.astype(dtype)


@dataclasses.dataclass(frozen=True, eq=False)
class StageTables:
    """Per-stage constants for one Stockham contraction stage.

    ``eq=False`` keeps identity hashing: stage tables are cached per plan
    and used as lru_cache keys for their host-side split (ops/split.py).
    """

    r: int  # factor (butterfly size)
    l: int  # completed DFT length entering this stage
    m: int  # remaining span after this stage (N / (l*r))
    dft: np.ndarray  # [r, r] DFT matrix, forward sign
    twiddle: np.ndarray  # [l, r] stage twiddle, forward sign


@dataclasses.dataclass(frozen=True)
class Plan:
    """Read-only transform plan (PFFFT_Setup analog, thread/jit shareable).

    For REAL kind, the complex engine runs at length N/2 and ``real_twiddle``
    holds the split-step twiddles.  All tables are stored with FORWARD sign;
    backward transforms conjugate on the fly (free on the VPU).
    """

    n: int
    kind: TransformKind
    dtype: np.dtype  # real scalar dtype (float32 / float64)
    cdtype: np.dtype  # complex dtype (complex64 / complex128)
    engine_n: int  # complex engine length (N for complex, N/2 for real)
    factors: Tuple[int, ...]
    stages: Tuple[StageTables, ...]
    real_twiddle: Optional[np.ndarray]  # [N/2] for REAL kind else None
    # local four-step split for large engine_n under the fat-stage policy:
    # (sub_plan_n1, sub_plan_n2, twiddle [n1, n2] complex np).  The two FFT
    # phases run through the sub-plans; the on-chip transposes replace a
    # long stage chain (measured ~2x at N=65536).  factors == (n1, n2) so
    # the internal/ordered layout contract is the ordinary 2-stage one.
    local_split: Optional[Tuple["Plan", "Plan", np.ndarray]] = None

    # --- constructors -----------------------------------------------------

    @staticmethod
    @functools.lru_cache(maxsize=256)
    def _cached(
        n: int,
        kind: TransformKind,
        dtype_str: str,
        max_factor: int,
        explicit_factors: Optional[Tuple[int, ...]] = None,
    ) -> "Plan":
        dtype = np.dtype(dtype_str)
        if dtype == np.float32:
            cdtype = np.dtype(np.complex64)
        elif dtype == np.float64:
            cdtype = np.dtype(np.complex128)
        else:
            raise ValueError(f"unsupported dtype {dtype}; use float32 or float64")
        engine_n = n // 2 if kind == REAL else n
        real_tw = _real_split_twiddle(n, -1, cdtype) if kind == REAL else None

        use_split = (
            explicit_factors is None
            and max_factor >= _LOCAL_SPLIT_MIN_MF
            and engine_n > max_factor * max_factor
            and engine_n <= _LOCAL_SPLIT_MAX_N
        )
        if use_split:
            # Prefer a plain chain when it stays short and fat: measured
            # 2.2x over the four-step at N=2^17 (scripts/r2_perf4.py) —
            # fewer, fatter HBM passes beat the spectator-einsum phases.
            try:
                chain = plan_factors(engine_n, max_factor=max_factor)
                if len(chain) <= 4 and min(chain) >= 64:
                    use_split = False
                elif dtype == np.float64 and max(chain) <= 128:
                    # f64: the df64 MXU engine requires a plain chain with
                    # r <= 128 (ops/dispatch._df64_route); the alternative
                    # is 3-5 GF/s soft-float (sweep_r4_f64.csv) vs 37+ on
                    # df64 — any eligible chain wins, the f32-measured
                    # chain-vs-split heuristic does not apply
                    use_split = False
            except ValueError:  # pragma: no cover
                pass
        if use_split:
            n1, n2 = _balanced_split(engine_n)
            p1 = Plan._cached(n1, COMPLEX, dtype_str, max_factor)
            p2 = Plan._cached(n2, COMPLEX, dtype_str, max_factor)
            tw = _stage_twiddle(n1, n2, -1, cdtype)  # W_N^{k1*n2}, [n1, n2]
            return Plan(
                n=n,
                kind=kind,
                dtype=dtype,
                cdtype=cdtype,
                engine_n=engine_n,
                factors=(n1, n2),
                stages=(),
                real_twiddle=real_tw,
                local_split=(p1, p2, tw),
            )

        if explicit_factors is not None:
            factors = explicit_factors
            prod = 1
            for f in factors:
                decompose_smooth(f)  # raises if not 2/3/5-smooth
                prod *= f
            if prod != engine_n:
                raise ValueError(
                    f"explicit factors {factors} multiply to {prod}, "
                    f"expected engine length {engine_n}"
                )
        else:
            factors = plan_factors(engine_n, max_factor=max_factor)
        stages = []
        l = 1
        m = engine_n
        for r in factors:
            m //= r
            stages.append(
                StageTables(
                    r=r,
                    l=l,
                    m=m,
                    dft=_dft_matrix(r, -1, cdtype),
                    twiddle=_stage_twiddle(l, r, -1, cdtype),
                )
            )
            l *= r
        return Plan(
            n=n,
            kind=kind,
            dtype=dtype,
            cdtype=cdtype,
            engine_n=engine_n,
            factors=tuple(factors),
            stages=tuple(stages),
            real_twiddle=real_tw,
        )

    @staticmethod
    def create(
        n: int,
        kind: TransformKind = COMPLEX,
        dtype="float32",
        *,
        max_factor=None,
        factors=None,
        strict: bool = True,
    ) -> "Plan":
        """Create a plan.

        With ``strict=True`` (default), enforces the reference's size
        contract exactly (pffft_new_setup validation,
        pffft_priv_impl.h:1062-1078) so that ``is_valid_size(N) <=>
        Plan.create(N) succeeds``.  With ``strict=False``, any 2/3/5-smooth
        N >= 2 is accepted (the TPU engine itself has no SIMD granularity
        constraint).

        ``factors`` pins the exact stage chain (a tuple multiplying to the
        engine length — N for complex, N/2 for real); the measured-dispatch
        layer (tune.py) uses this to select stage shapes from data instead
        of the max_factor policy heuristic.
        """

        kind = _coerce_kind(kind)
        if max_factor is None:
            max_factor = default_max_factor()
            if np.dtype(dtype) == np.float64:
                # the df64 MXU engine's exact-slice accumulation bound is
                # 2r <= 256 contraction rows (ops/df64.py); the f32
                # measured factor table below doesn't apply either — its
                # winners were timed on the 6-pass HIGHEST engine.
                max_factor = min(max_factor, 128)
            # measured per-size stage table (TPU only; env/arg overrides win)
            elif factors is None and "PFFFT_TPU_MAX_FACTOR" not in __import__("os").environ:
                try:
                    import jax

                    if jax.default_backend() == "tpu":
                        engine_n = n // 2 if kind == REAL else n
                        factors = _tpu_table_factors(int(engine_n))
                except Exception:  # pragma: no cover
                    pass
        if strict:
            if not is_valid_size(n, kind):
                raise ValueError(
                    f"invalid transform size N={n} for {kind.value} transform; "
                    f"N must be a multiple of {min_fft_size(kind)} with remaining "
                    f"factors 2, 3, 5 and N <= 2^26 "
                    f"(nearest valid: {nearest_transform_size(n, kind, True)})"
                )
        else:
            if n < 2 or (n % 2 != 0 and kind == REAL):
                raise ValueError(f"N={n} unsupported for {kind.value} transform")
            decompose_smooth(n)  # raises if not smooth
        ef = tuple(int(f) for f in factors) if factors is not None else None
        return Plan._cached(int(n), kind, np.dtype(dtype).name, int(max_factor), ef)

    # --- helpers ----------------------------------------------------------

    @property
    def is_real(self) -> bool:
        return self.kind == REAL

    @property
    def spectrum_size(self) -> int:
        """Number of complex bins in the (packed) spectrum.

        real: N/2 packed bins (bin0 = DC + i*Nyquist, pffft.h:144-155);
        complex: N bins.
        """

        return self.n // 2 if self.is_real else self.n

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"Plan(N={self.n}, {self.kind.value}, {self.dtype.name}, "
            f"factors={self.factors})"
        )

    def _signature(self) -> tuple:
        """Identity tuple distinguishing every *engine* variant.

        Includes the recursive local-split structure: a chain plan with
        factors (256, 256) and a four-step plan with the same factors are
        DIFFERENT compiled engines (round-2 finding: hashing only the
        factors silently reused one engine for both, defeating tuned_setup's
        chain-vs-split comparison).
        """

        ls = None
        if self.local_split is not None:
            p1, p2, _ = self.local_split
            ls = (p1._signature(), p2._signature())
        return (self.n, self.kind, self.dtype.name, self.factors, ls)

    def __hash__(self) -> int:
        return hash(self._signature())

    def __eq__(self, other) -> bool:
        return isinstance(other, Plan) and self._signature() == other._signature()


# ---------------------------------------------------------------------------
# Plan serialization (the checkpoint analog, SURVEY.md §5.4: the reference's
# only "checkpointable" state is the precomputed Setup; here a Plan is a
# frozen pytree of numpy tables and serializes losslessly — restore does NOT
# recompute twiddles, so a restored plan is bit-identical to the saved one)
# ---------------------------------------------------------------------------


def _plan_to_arrays(plan: Plan, prefix: str, out: dict) -> None:
    out[prefix + "meta"] = np.array(
        [plan.n, 0 if plan.kind == REAL else 1, plan.engine_n], dtype=np.int64
    )
    out[prefix + "dtype"] = np.array(plan.dtype.name)
    out[prefix + "factors"] = np.array(plan.factors, dtype=np.int64)
    for i, st in enumerate(plan.stages):
        sp = f"{prefix}s{i}_"
        out[sp + "rlm"] = np.array([st.r, st.l, st.m], dtype=np.int64)
        out[sp + "dft"] = st.dft
        out[sp + "tw"] = st.twiddle
    if plan.real_twiddle is not None:
        out[prefix + "real_tw"] = plan.real_twiddle
    if plan.local_split is not None:
        p1, p2, tw = plan.local_split
        out[prefix + "ls_tw"] = tw
        _plan_to_arrays(p1, prefix + "ls1_", out)
        _plan_to_arrays(p2, prefix + "ls2_", out)


def _plan_from_arrays(d, prefix: str) -> Plan:
    n, kind_i, engine_n = (int(v) for v in d[prefix + "meta"])
    kind = REAL if kind_i == 0 else COMPLEX
    dtype = np.dtype(str(d[prefix + "dtype"]))
    cdtype = np.dtype(np.complex64) if dtype == np.float32 else np.dtype(np.complex128)
    factors = tuple(int(v) for v in d[prefix + "factors"])
    stages = []
    i = 0
    while f"{prefix}s{i}_rlm" in d:
        r, l, m = (int(v) for v in d[f"{prefix}s{i}_rlm"])
        stages.append(
            StageTables(r=r, l=l, m=m, dft=d[f"{prefix}s{i}_dft"], twiddle=d[f"{prefix}s{i}_tw"])
        )
        i += 1
    real_tw = d[prefix + "real_tw"] if prefix + "real_tw" in d else None
    local_split = None
    if prefix + "ls_tw" in d:
        local_split = (
            _plan_from_arrays(d, prefix + "ls1_"),
            _plan_from_arrays(d, prefix + "ls2_"),
            d[prefix + "ls_tw"],
        )
    return Plan(
        n=n,
        kind=kind,
        dtype=dtype,
        cdtype=cdtype,
        engine_n=engine_n,
        factors=factors,
        stages=tuple(stages),
        real_twiddle=real_tw,
        local_split=local_split,
    )


def save_plan(plan: Plan, file) -> None:
    """Serialize a plan (all precomputed tables) to a .npz file/path."""

    arrays: dict = {}
    _plan_to_arrays(plan, "p_", arrays)
    np.savez(file, **arrays)


def load_plan(file) -> Plan:
    """Restore a plan saved by :func:`save_plan` (no table recompute)."""

    with np.load(file, allow_pickle=False) as d:
        return _plan_from_arrays(d, "p_")


def new_setup(n: int, kind=COMPLEX, dtype="float32", **kw) -> Plan:
    """pffft_new_setup parity constructor (pffft.h:124).

    Unlike the C API this raises ValueError (instead of returning NULL) on
    invalid sizes; use :func:`is_valid_size` to pre-check.
    """

    return Plan.create(n, kind, dtype, **kw)
