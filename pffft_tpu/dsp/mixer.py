"""NCO frequency-shift mixers (pf_mixer parity).

The reference ships ten CPU strategies (ALGO A-J,
/root/reference/include/pffft/pf_mixer.h:70-280): exact cmath, sine tables,
incremental phasors with renormalization, SSE 4-lane phasor rotation, and
recursive quadrature oscillators.  All compute the same mathematical map

    out[n] = in[n] * exp(i * (2*pi*rate*n + phase0))

and differ only in how they fight CPU trig cost and fp32 phase drift.

On TPU both problems disappear with one design: a **32-bit fixed-point
integer NCO**.  The phase is ``phase_fp + n * rate_fp (mod 2^32)`` computed
with wrapping int32 multiplies -- exact for any stream length, no drift, no
renormalization (the TPU analog of ALGO F/G/H's periodic sqrt-renorm,
pf_mixer.cpp:560-631) -- followed by vectorized VPU sin/cos.  Frequency
resolution is 2^-32 of the sample rate, finer than the reference's fp32
``rate`` argument can express, so every ALGO A-J behavior is reproduced to
within its own quantization.

The ALGO A-J entry points are kept as thin parity wrappers over this one
kernel; their init/state structs carry the streaming phase exactly like the
C API (each ``shift_*_cc`` returns the phase for the next call).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MixerState", "mixer_init", "mixer_apply", "Mixer",
    "shift_math_cc", "shift_table_init", "shift_table_cc",
    "shift_addfast_init", "shift_addfast_cc",
    "shift_unroll_init", "shift_unroll_cc",
    "shift_limited_unroll_init", "shift_limited_unroll_cc",
    "shift_recursive_osc_init", "shift_recursive_osc_cc", "gen_recursive_osc_c",
    "have_sse_shift_mixer_impl",
]

_TWO32 = float(1 << 32)
_PHASE_SCALE = np.float32(2.0 * np.pi / _TWO32)


def have_sse_shift_mixer_impl() -> bool:
    """Parity with pf_mixer.h:61; always true (the VPU kernel is the
    vectorized implementation)."""

    return True


class MixerState(NamedTuple):
    """Streaming NCO state (a jit-friendly pytree).

    phase_fp: uint32 fixed-point phase (2^32 == one turn).
    rate_fp:  uint32 fixed-point frequency (cycles/sample * 2^32, wrapped).
    """

    phase_fp: jax.Array
    rate_fp: jax.Array


def _to_fp(cycles: float) -> np.uint32:
    """Wrap a real number of turns to uint32 fixed point."""

    frac = float(cycles) % 1.0
    return np.uint32(np.uint64(round(frac * _TWO32)) & np.uint64(0xFFFFFFFF))


def mixer_init(rate: float, starting_phase: float = 0.0) -> MixerState:
    """rate: frequency shift relative to the sample rate (can be negative);
    starting_phase: radians (pf_mixer convention)."""

    return MixerState(
        phase_fp=jnp.asarray(_to_fp(starting_phase / (2.0 * np.pi)), dtype=jnp.uint32),
        rate_fp=jnp.asarray(_to_fp(rate), dtype=jnp.uint32),
    )


@functools.partial(jax.jit, static_argnums=1)
def _nco_carrier(state: MixerState, n: int) -> jax.Array:
    """Carrier exp(i*(phase0 + 2*pi*rate*k)) for k = 0..n-1, complex64."""

    k = jnp.arange(n, dtype=jnp.uint32)
    ph = state.phase_fp + k * state.rate_fp  # wrapping uint32: exact mod 1 turn
    ang = ph.astype(jnp.float32) * _PHASE_SCALE
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


@functools.partial(jax.jit, static_argnums=1)
def _advance(state: MixerState, n) -> MixerState:
    return MixerState(
        phase_fp=state.phase_fp + jnp.uint32(n) * state.rate_fp,
        rate_fp=state.rate_fp,
    )


def mixer_apply(state: MixerState, x: jax.Array) -> Tuple[jax.Array, MixerState]:
    """Shift a complex stream: returns (x * carrier, next_state).

    x: [..., n] complex; the same carrier is applied to every leading batch
    row (multi-channel streams share the NCO, vmap mixer_init for
    independent NCOs).
    """

    n = x.shape[-1]
    carrier = _nco_carrier(state, n)
    return x * carrier, _advance(state, n)


@jax.jit
def _nco_carrier_split(state: MixerState, k: jax.Array):
    ph = state.phase_fp + k * state.rate_fp
    ang = ph.astype(jnp.float32) * _PHASE_SCALE
    return jnp.cos(ang), jnp.sin(ang)


def mixer_apply_split(
    state: MixerState, x_re: jax.Array, x_im: jax.Array
) -> Tuple[Tuple[jax.Array, jax.Array], MixerState]:
    """Split-format (planar re/im) mixer_apply — the TPU-native entry
    (complex dtypes do not exist on the TPU backend; see ops/split.py)."""

    n = x_re.shape[-1]
    cr, ci = _nco_carrier_split(state, jnp.arange(n, dtype=jnp.uint32))
    out = (x_re * cr - x_im * ci, x_re * ci + x_im * cr)
    return out, _advance(state, n)


def mixer_carrier(state: MixerState, n: int) -> Tuple[jax.Array, MixerState]:
    """Generate n carrier samples (pure NCO output) and advance."""

    return _nco_carrier(state, n), _advance(state, n)


class Mixer:
    """Stateful convenience wrapper (carries MixerState across calls)."""

    def __init__(self, rate: float, starting_phase: float = 0.0):
        self.state = mixer_init(rate, starting_phase)

    def shift(self, x: jax.Array) -> jax.Array:
        out, self.state = mixer_apply(self.state, jnp.asarray(x))
        return out

    def carrier(self, n: int) -> jax.Array:
        out, self.state = mixer_carrier(self.state, n)
        return out

    @property
    def phase(self) -> float:
        """Current phase in radians [0, 2*pi) (the C return-value convention)."""

        return float(np.uint32(self.state.phase_fp)) * 2.0 * np.pi / _TWO32


# ---------------------------------------------------------------------------
# ALGO A-J parity surface (pf_mixer.h:70-280).
#
# Unlike round 1 (one kernel + thin wrappers), each algorithm below
# reproduces its reference counterpart's OWN numerics, including the
# family's documented quirks:
#
#   * ALGO A multiplies sample k by phase phi0 + k*D (D = 2*pi*rate);
#     ALGO C/D/E multiply sample k by phi0 + (k+1)*D — a genuine
#     one-sample carrier offset in the reference (compare
#     pf_mixer.cpp:149-158 with the SADF_L1 macro at :245-247 and the
#     init loops at :341-348 which advance phase BEFORE storing).
#   * ALGO B's upstream index computation has an operator-precedence bug
#     (`(int)(vphase/(PI/2))*table_size`, pf_mixer.cpp:200 — the cast
#     binds before the multiply, so the index is always 0 and the carrier
#     degenerates to quadrant steps).  We implement the *intended*
#     table-quantized semantics and do not replicate the bug.
#   * ALGO E renormalizes its phasor every 128 samples
#     (pf_mixer.cpp "starts := vals / |vals|"); C and D never do.
#   * ALGO I/J run the Vicanek "magic circle" recursion
#     u' = u - k1 v; v' = v + k2 u'; u'' = u' ... with 8 staggered lanes
#     advancing by 8 steps at a time (pf_mixer.cpp ALGO I).
#
# All heavy math stays vectorized; only the genuinely sequential carries
# (per-block phasor products, the QuadOsc recursion) use lax.scan.  These
# entry points are the parity surface; the production TPU mixer is
# mixer_apply's drift-free integer NCO above.
# ---------------------------------------------------------------------------


def _shift_once(x, rate: float, starting_phase: float):
    st = mixer_init(rate, starting_phase)
    out, st2 = mixer_apply(st, jnp.asarray(x))
    next_phase = float(np.uint32(st2.phase_fp)) * 2.0 * np.pi / _TWO32
    return out, next_phase


def shift_math_cc(x, rate: float, starting_phase: float = 0.0):
    """ALGO A parity (pf_mixer.cpp:141-163): exact trig NCO, sample k at
    phase phi0 + 2*pi*rate*k.  Returns (output, next_phase_radians)."""

    return _shift_once(x, rate, starting_phase)


@dataclasses.dataclass
class ShiftTableData:
    """ALGO B state: quarter-wave sine table (pf_mixer.cpp:171-187)."""

    table_size: int


def shift_table_init(table_size: int = 65536) -> ShiftTableData:
    return ShiftTableData(table_size=table_size)


def shift_table_cc(x, rate: float, table_data: ShiftTableData, starting_phase: float = 0.0):
    """ALGO B (intended semantics): carrier trig quantized to a quarter-wave
    table of ``table_size`` entries per quadrant — sin/cos are evaluated at
    phase floor(vphase / (pi/2) * T) / T * (pi/2) with the table's
    cos-index mirror (T-1-i), reproducing the table's value grid exactly.
    (The upstream index expression is bugged; see module notes.)"""

    t = int(table_data.table_size)
    n = jnp.asarray(x).shape[-1]
    delta = 2.0 * np.pi * float(rate)
    phase = (starting_phase + delta * np.arange(n, dtype=np.float64)) % (2.0 * np.pi)
    quadrant = np.floor(phase / (np.pi / 2.0)).astype(np.int64) % 4
    vphase = phase - quadrant * (np.pi / 2.0)
    idx = np.clip((vphase / (np.pi / 2.0) * t).astype(np.int64), 0, t - 1)
    s_tab = np.sin(idx / t * (np.pi / 2.0)).astype(np.float32)
    c_tab = np.sin((t - 1 - idx) / t * (np.pi / 2.0)).astype(np.float32)
    odd = (quadrant & 1).astype(bool)
    sinv = np.where(odd, c_tab, s_tab)
    cosv = np.where(odd, s_tab, c_tab)
    sinv = np.where(quadrant > 1, -sinv, sinv)
    cosv = np.where((quadrant > 0) & (quadrant < 3), -cosv, cosv)
    carrier = jnp.asarray(cosv + 1j * sinv, dtype=jnp.complex64)
    nxt = float((starting_phase + delta * n) % (2.0 * np.pi))
    return jnp.asarray(x) * carrier, nxt


@dataclasses.dataclass
class ShiftAddfastData:
    """ALGO C state (pf_mixer.h:95-104): f32 rotators for 1..4 steps."""

    rate: float
    dcos: np.ndarray  # [4] cos((j+1)*D), f32
    dsin: np.ndarray


def shift_addfast_init(rate: float) -> ShiftAddfastData:
    d = 2.0 * np.pi * float(rate)
    j = np.arange(1, 5, dtype=np.float64)
    return ShiftAddfastData(
        rate=float(rate),
        dcos=np.cos(j * d).astype(np.float32),
        dsin=np.sin(j * d).astype(np.float32),
    )


def _blocked_phasor_carrier(n, start_c, start_s, dcos, dsin, block, renorm):
    """Carrier of the C/E family: within a block of ``block`` samples the
    phasor start is fixed and sample j uses start*rot[j]; the start advances
    by rot[block-1] each block (f32 products, honest drift), optionally
    renormalized per block (ALGO E)."""

    nb = n // block
    rot_c = jnp.asarray(dcos)  # [block] rotators for 1..block steps
    rot_s = jnp.asarray(dsin)

    def body(carry, _):
        c, s = carry
        vc = c * rot_c - s * rot_s  # start * rot[j+1], j = 0..block-1
        vs = s * rot_c + c * rot_s
        nc, ns = vc[-1], vs[-1]
        if renorm:
            mag = jnp.sqrt(nc * nc + ns * ns)
            nc, ns = nc / mag, ns / mag
        return (nc, ns), (vc, vs)

    (fc, fs), (vc, vs) = jax.lax.scan(
        body, (jnp.float32(start_c), jnp.float32(start_s)), None, length=nb
    )
    return vc.reshape(-1), vs.reshape(-1), fc, fs


def shift_addfast_cc(x, d: ShiftAddfastData, starting_phase: float = 0.0):
    """ALGO C parity (pf_mixer.cpp:252-281): 4-step unrolled incremental
    phasor, no renormalization; sample k carries phase phi0 + (k+1)*D
    (the reference family's one-sample offset, see module notes)."""

    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % 4:
        raise ValueError("ALGO C requires input_size % 4 == 0 (pf_mixer.cpp:254)")
    vc, vs, _, _ = _blocked_phasor_carrier(
        n, np.cos(starting_phase), np.sin(starting_phase), d.dcos, d.dsin, 4, False
    )
    out = x * jax.lax.complex(vc, vs)
    delta = 2.0 * np.pi * d.rate
    nxt = float(starting_phase + n * delta)
    while nxt > np.pi:
        nxt -= 2 * np.pi
    while nxt < -np.pi:
        nxt += 2 * np.pi
    return out, nxt


@dataclasses.dataclass
class ShiftUnrollData:
    """ALGO D state (pf_mixer.h:113-124): full-length rotator table."""

    rate: float
    size: int
    dcos: np.ndarray  # [size] cos of wrapped (k+1)*D, f32
    dsin: np.ndarray


def shift_unroll_init(rate: float, size: int) -> ShiftUnrollData:
    d = 2.0 * np.pi * float(rate)
    ph = (np.arange(1, size + 1, dtype=np.float64) * d + np.pi) % (2 * np.pi) - np.pi
    return ShiftUnrollData(
        rate=float(rate),
        size=int(size),
        dcos=np.cos(ph).astype(np.float32),
        dsin=np.sin(ph).astype(np.float32),
    )


def shift_unroll_cc(x, d: ShiftUnrollData, starting_phase: float = 0.0):
    """ALGO D parity (pf_mixer.cpp:333-380): carrier = start phasor times
    the precomputed f32 rotator table (phase (k+1)*D, wrapped at init)."""

    x = jnp.asarray(x)
    n = x.shape[-1]
    if n > d.size:
        raise ValueError(f"ALGO D table holds {d.size} samples, got {n}")
    c0, s0 = np.float32(np.cos(starting_phase)), np.float32(np.sin(starting_phase))
    rc = jnp.asarray(d.dcos[:n])
    rs = jnp.asarray(d.dsin[:n])
    vc = c0 * rc - s0 * rs
    vs = s0 * rc + c0 * rs
    out = x * jax.lax.complex(vc, vs)
    delta = 2.0 * np.pi * d.rate
    nxt = float(starting_phase + n * delta)
    while nxt > np.pi:
        nxt -= 2 * np.pi
    while nxt < -np.pi:
        nxt += 2 * np.pi
    return out, nxt


_LIMITED_UNROLL_SIZE = 128  # PF_SHIFT_LIMITED_UNROLL_SIZE (pf_mixer.h:137)


class ShiftLimitedUnrollState:
    """ALGO E/F/G/H state (pf_mixer.h:140-152): 128-entry rotator table and
    an internal complex phasor renormalized once per 128-sample block."""

    def __init__(self, rate: float, starting_phase: float = 0.0):
        d = 2.0 * np.pi * float(rate)
        k = np.arange(1, _LIMITED_UNROLL_SIZE + 1, dtype=np.float64)
        ph = (k * d + np.pi) % (2 * np.pi) - np.pi
        self.dcos = np.cos(ph).astype(np.float32)
        self.dsin = np.sin(ph).astype(np.float32)
        self.phasor = (np.float32(np.cos(starting_phase)), np.float32(np.sin(starting_phase)))


def shift_limited_unroll_init(rate: float, starting_phase: float = 0.0) -> ShiftLimitedUnrollState:
    return ShiftLimitedUnrollState(rate, starting_phase)


def shift_limited_unroll_cc(x, d: ShiftLimitedUnrollState):
    """ALGO E parity: blocked phasor carrier with per-block sqrt
    renormalization; phase state carried inside ``d`` (the C struct's
    complex_phase), output only is returned."""

    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % _LIMITED_UNROLL_SIZE:
        raise ValueError(
            f"ALGO E processes multiples of {_LIMITED_UNROLL_SIZE} samples"
        )
    c0, s0 = d.phasor
    vc, vs, fc, fs = _blocked_phasor_carrier(
        n, c0, s0, d.dcos, d.dsin, _LIMITED_UNROLL_SIZE, True
    )
    # C carry semantics: sample i uses the phasor BEFORE its update —
    # carrier[i] = start*rot[i-1] with carrier[0] = start; the stored state
    # is the final block's renormalized carry.
    vc = jnp.concatenate([jnp.asarray([c0], jnp.float32), vc[:-1]])
    vs = jnp.concatenate([jnp.asarray([s0], jnp.float32), vs[:-1]])
    out = x * jax.lax.complex(vc, vs)
    d.phasor = (np.float32(fc), np.float32(fs))
    return out


# F/G/H are the SSE table organizations of ALGO E (separate / shared /
# interleaved trig tables, pf_mixer.cpp:560-631) — identical semantics on
# a vector machine, so they share the implementation.
shift_limited_unroll_A_sse_init = shift_limited_unroll_init
shift_limited_unroll_B_sse_init = shift_limited_unroll_init
shift_limited_unroll_C_sse_init = shift_limited_unroll_init
shift_limited_unroll_A_sse_inp_c = shift_limited_unroll_cc
shift_limited_unroll_B_sse_inp_c = shift_limited_unroll_cc
shift_limited_unroll_C_sse_inp_c = shift_limited_unroll_cc


_RECURSIVE_SIMD_SZ = 8  # PF_SHIFT_RECURSIVE_SIMD_SZ (pf_mixer.h:237)


class ShiftRecursiveOscState:
    """ALGO I/J state (pf_mixer.h:234-280): 8 staggered Vicanek QuadOsc
    lanes u/v plus the 8-step recursion constants k1 = tan(4*D),
    k2 = 2 k1/(1+k1^2) (pf_mixer.cpp shift_recursive_osc_update_rate)."""

    def __init__(self, rate: float = 0.0, starting_phase: float = 0.0):
        self.rate = float(rate)
        u = np.empty(_RECURSIVE_SIMD_SZ, np.float32)
        v = np.empty(_RECURSIVE_SIMD_SZ, np.float32)
        u[0] = np.cos(starting_phase)
        v[0] = np.sin(starting_phase)
        d = 2.0 * np.pi * float(rate)
        k1s = np.float32(np.tan(0.5 * d))
        k2s = np.float32(2 * k1s / (1 + k1s * k1s))
        for j in range(1, _RECURSIVE_SIMD_SZ):
            tmp = u[j - 1] - k1s * v[j - 1]
            v[j] = v[j - 1] + k2s * tmp
            u[j] = tmp - k1s * v[j]
        self.u = u
        self.v = v
        db = d * _RECURSIVE_SIMD_SZ
        db = (db + np.pi) % (2 * np.pi) - np.pi
        self.k1 = np.float32(np.tan(0.5 * db))
        self.k2 = np.float32(2 * self.k1 / (1 + self.k1 * self.k1))


def shift_recursive_osc_init(rate: float, starting_phase: float = 0.0) -> ShiftRecursiveOscState:
    return ShiftRecursiveOscState(rate, starting_phase)


def shift_recursive_osc_update_rate(rate: float, state: ShiftRecursiveOscState) -> None:
    """Re-derive the recursion constants at the current phase (the C
    update_rate semantics: lane 0 keeps its phasor)."""

    ph = float(np.arctan2(state.v[0], state.u[0]))
    fresh = ShiftRecursiveOscState(rate, ph)
    state.__dict__.update(fresh.__dict__)


def _recursive_osc_carrier(state: ShiftRecursiveOscState, nblocks: int):
    k1 = jnp.float32(state.k1)
    k2 = jnp.float32(state.k2)

    def body(carry, _):
        u, v = carry
        tmp = u - k1 * v
        v2 = v + k2 * tmp
        u2 = tmp - k1 * v2
        return (u2, v2), carry

    (u_f, v_f), (us, vs) = jax.lax.scan(
        body, (jnp.asarray(state.u), jnp.asarray(state.v)), None, length=nblocks
    )
    return us.reshape(-1), vs.reshape(-1), u_f, v_f


def shift_recursive_osc_cc(x, state: ShiftRecursiveOscState):
    """ALGO I parity: multiply by the 8-lane magic-circle oscillator; the
    recursion (not trig) generates the carrier, with f32 drift exactly as
    sequential as the reference's."""

    x = jnp.asarray(x)
    n = x.shape[-1]
    if n % _RECURSIVE_SIMD_SZ:
        raise ValueError(f"ALGO I processes multiples of {_RECURSIVE_SIMD_SZ} samples")
    us, vs, u_f, v_f = _recursive_osc_carrier(state, n // _RECURSIVE_SIMD_SZ)
    out = x * jax.lax.complex(us, vs)
    state.u = np.asarray(u_f)
    state.v = np.asarray(v_f)
    return out


def gen_recursive_osc_c(n: int, state: ShiftRecursiveOscState):
    """Generate n oscillator samples (pf_mixer.h:257) via the recursion."""

    if n % _RECURSIVE_SIMD_SZ:
        raise ValueError(f"ALGO I generates multiples of {_RECURSIVE_SIMD_SZ} samples")
    us, vs, u_f, v_f = _recursive_osc_carrier(state, n // _RECURSIVE_SIMD_SZ)
    state.u = np.asarray(u_f)
    state.v = np.asarray(v_f)
    return jax.lax.complex(us, vs)


# J is the SSE 4-lane variant of I (pf_mixer.h:262-280) — same recursion.
shift_recursive_quadrature_osc_init = shift_recursive_osc_init
shift_recursive_quadrature_osc_cc = shift_recursive_osc_cc
