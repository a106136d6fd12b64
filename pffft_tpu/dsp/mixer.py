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
# ALGO A-J parity surface (pf_mixer.h).  All are the same TPU kernel; the
# init functions return state objects mirroring the C structs' streaming
# semantics, and each shift_*_cc returns (output, next_starting_phase).
# ---------------------------------------------------------------------------


def _shift_once(x, rate: float, starting_phase: float):
    st = mixer_init(rate, starting_phase)
    out, st2 = mixer_apply(st, jnp.asarray(x))
    next_phase = float(np.uint32(st2.phase_fp)) * 2.0 * np.pi / _TWO32
    return out, next_phase


def shift_math_cc(x, rate: float, starting_phase: float = 0.0):
    """ALGO A parity (pf_mixer.cpp:141-163): exact trig NCO.

    Returns (output, next_phase_radians) like the C float return."""

    return _shift_once(x, rate, starting_phase)


@dataclasses.dataclass
class ShiftTableData:
    """ALGO B state (quarter-wave table in C; table-free here)."""

    table_size: int


def shift_table_init(table_size: int = 65536) -> ShiftTableData:
    return ShiftTableData(table_size=table_size)


def shift_table_cc(x, rate: float, table_data: ShiftTableData, starting_phase: float = 0.0):
    """ALGO B parity (pf_mixer.cpp:171-224)."""

    del table_data  # trig is native on the VPU; table strategy not needed
    return _shift_once(x, rate, starting_phase)


@dataclasses.dataclass
class ShiftAddfastData:
    """ALGO C state (pf_mixer.h:95-104)."""

    rate: float


def shift_addfast_init(rate: float) -> ShiftAddfastData:
    return ShiftAddfastData(rate=rate)


def shift_addfast_cc(x, d: ShiftAddfastData, starting_phase: float = 0.0):
    """ALGO C parity (4-step unrolled incremental phasor in C)."""

    return _shift_once(x, d.rate, starting_phase)


@dataclasses.dataclass
class ShiftUnrollData:
    """ALGO D state (pf_mixer.h:113-124)."""

    rate: float
    size: int


def shift_unroll_init(rate: float, size: int) -> ShiftUnrollData:
    return ShiftUnrollData(rate=rate, size=size)


def shift_unroll_cc(x, d: ShiftUnrollData, starting_phase: float = 0.0):
    """ALGO D parity (fully precomputed dcos/dsin table in C)."""

    return _shift_once(x, d.rate, starting_phase)


class ShiftLimitedUnrollState:
    """ALGO E/F/G/H state: carries phase internally (pf_mixer.h:140-152:
    'starting_phase for next call is kept internal in state')."""

    def __init__(self, rate: float, starting_phase: float = 0.0):
        self.mixer = Mixer(rate, starting_phase)


def shift_limited_unroll_init(rate: float, starting_phase: float = 0.0) -> ShiftLimitedUnrollState:
    return ShiftLimitedUnrollState(rate, starting_phase)


def shift_limited_unroll_cc(x, d: ShiftLimitedUnrollState):
    """ALGO E-H parity: phase state lives in ``d``; returns output only."""

    return d.mixer.shift(x)


# SSE variants map to the same kernel
shift_limited_unroll_A_sse_init = shift_limited_unroll_init
shift_limited_unroll_B_sse_init = shift_limited_unroll_init
shift_limited_unroll_C_sse_init = shift_limited_unroll_init
shift_limited_unroll_A_sse_inp_c = shift_limited_unroll_cc
shift_limited_unroll_B_sse_inp_c = shift_limited_unroll_cc
shift_limited_unroll_C_sse_inp_c = shift_limited_unroll_cc


class ShiftRecursiveOscState:
    """ALGO I/J parity (Vicanek QuadOsc, pf_mixer.h:234-280).

    The C recursion u' = u - k1*v; v' = v + k2*u' is an exact rotation by
    omega with k1 = tan(omega/2), k2 = sin(omega); the integer NCO computes
    the same rotation without error accumulation, so the state here is just
    the oscillator angle.
    """

    def __init__(self, rate: float = 0.0, starting_phase: float = 0.0):
        self.mixer = Mixer(rate, starting_phase)


def shift_recursive_osc_init(rate: float, starting_phase: float = 0.0) -> ShiftRecursiveOscState:
    return ShiftRecursiveOscState(rate, starting_phase)


def shift_recursive_osc_update_rate(rate: float, state: ShiftRecursiveOscState) -> None:
    ph = state.mixer.phase
    state.mixer = Mixer(rate, ph)


def shift_recursive_osc_cc(x, state: ShiftRecursiveOscState):
    """ALGO I parity: shift using the oscillator state."""

    return state.mixer.shift(x)


def gen_recursive_osc_c(n: int, state: ShiftRecursiveOscState):
    """Generate n oscillator samples (pf_mixer.h:257)."""

    return state.mixer.carrier(n)
