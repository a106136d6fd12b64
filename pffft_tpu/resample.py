"""Polyphase rational resampling (L/M) on the batched engine.

Beyond-parity SDR capability: upsample-by-L, lowpass, downsample-by-M as
an efficient polyphase bank — no upsampled grid is ever materialized, no
gathers (framing is the reshape/slice construction of spectral.py).

Math: with prototype h (designed at the upsampled rate), output
    y[n] = sum_k h[phi_n + k*L] * x[b_n - k],
    phi_n = (n*M) mod L,  b_n = floor(n*M / L).

TPU formulation (measured, scripts/r3_resample.py): the per-phase
frame-and-matvec construction runs ~100 small ops per call and measured
43 Msamp/s on-chip — this backend is per-pass-bound at that op count,
and stride-M framing materializes minor-axis-M arrays (lane-tile waste).
Instead, G*L consecutive outputs (a *super-block*) share one frame of
the input: frame x at stride S = G*M (G=128 makes S a lane-aligned
multiple of 128), width W = S + P*? (the taps' reach), and compute ALL
G*L outputs of a super-block with ONE MXU contraction
    y[j, o] = sum_w frame[j, w] * A[w, o],
    A[(o*M)//L + k, o] = taps_rev[k, (o*M) mod L]   (banded placement),
because for n = j*G*L + o the sample offset within frame j is
(n*M)//L - j*S = (o*M)//L.  One pad + one framing + one dot_general +
one reshape replaces ~100 strided ops; measured 43 -> thousands of
Msamp/s (benchmarks/results/resample_r3.txt).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .channelizer import design_lowpass
from .spectral import frame_signal

__all__ = ["Resampler", "resample"]


class Resampler:
    """Rational L/M resampler with a windowed-sinc prototype.

    taps_per_phase P controls quality; the prototype has P*L taps at the
    upsampled rate with cutoff min(1/L, 1/M)/2 (anti-image + anti-alias).
    """

    def __init__(self, up: int, down: int, taps_per_phase: int = 16,
                 prototype: Optional[np.ndarray] = None):
        g = math.gcd(up, down)
        self.up = up // g
        self.down = down // g
        l, m = self.up, self.down
        if prototype is None:
            cutoff = 0.5 / max(l, m)
            prototype = design_lowpass(taps_per_phase * l, cutoff) * l
        prototype = np.asarray(prototype, dtype=np.float64)
        if prototype.size % l:
            prototype = np.pad(prototype, (0, l - prototype.size % l))
        self.p = prototype.size // l
        # phase taps, reversed for the frame dot: frame f ends at b_n, so
        # y = sum_k h[phi + kL] * f[P-1-k]
        taps = prototype.reshape(self.p, l)  # taps[k, phi] = h[kL + phi]
        self.taps_rev = jnp.asarray(taps[::-1].astype(np.float32))  # [P, L]
        # static interleave order: output slot (n mod L) -> phase (nM mod L)
        self.phase_of_slot = [(n * m) % l for n in range(l)]
        self.base_shift = [(n * m) // l for n in range(l)]
        # --- super-block MXU contraction setup (see module docstring) ---
        # G outputs-per-phase per super-block; S = G*M is the frame stride
        # (G=128 -> S is a multiple of 128, lane-aligned on TPU).
        self.g_blk = 128
        self.s_stride = self.g_blk * m
        self.w_frame = self.s_stride + self.p + m
        taps_np = np.asarray(taps[::-1], dtype=np.float32)
        a = np.zeros((self.w_frame, self.g_blk * l), np.float32)
        for o in range(self.g_blk * l):
            d, phi = (o * m) // l, (o * m) % l
            a[d : d + self.p, o] = taps_np[:, phi]
        self._bank = jnp.asarray(a)  # [W, G*L]

    def __call__(self, x: jax.Array) -> jax.Array:
        """[..., T] -> [..., floor(T * L / M)] resampled signal."""

        l, m, p = self.up, self.down, self.p
        t_in = x.shape[-1]
        n_out = (t_in * l) // m
        jn = -(-n_out // (self.g_blk * l))  # super-blocks
        # frame j covers padded indices [j*S, j*S + W); left-pad P-1 for
        # the causal warm-up, right-pad to the last frame's end.
        left = p - 1
        need = (jn - 1) * self.s_stride + self.w_frame + left
        xp = jnp.pad(
            x.astype(jnp.float32),
            [(0, 0)] * (x.ndim - 1) + [(left, max(0, need - t_in - left))],
        )
        fr = frame_signal(xp, self.w_frame, self.s_stride)[..., :jn, :]
        y = jax.lax.dot_general(
            fr, self._bank, (((fr.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [..., Jn, G*L]
        y = y.reshape(*x.shape[:-1], jn * self.g_blk * l)
        return y[..., :n_out]


def resample(x: jax.Array, up: int, down: int, taps_per_phase: int = 16) -> jax.Array:
    """One-shot rational resampling: [..., T] -> [..., floor(T*up/down)]."""

    return Resampler(up, down, taps_per_phase)(jnp.asarray(x))
