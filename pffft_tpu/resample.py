"""Polyphase rational resampling (L/M) on the batched engine.

Beyond-parity SDR capability: upsample-by-L, lowpass, downsample-by-M as
an efficient polyphase bank — no upsampled grid is ever materialized, no
gathers (framing is the reshape/slice construction of spectral.py, phase
interleaving is a static permutation).

Math: with prototype h (designed at the upsampled rate), output
    y[n] = sum_k h[phi_n + k*L] * x[b_n - k],
    phi_n = (n*M) mod L,  b_n = floor(n*M / L).
For gcd(L, M) == 1 each block of L consecutive outputs hits every phase
once, so phase p's outputs are an arithmetic sequence: frame x at stride M,
dot with the phase taps, and statically interleave the L phase streams.
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

    def __call__(self, x: jax.Array) -> jax.Array:
        """[..., T] -> [..., floor(T * L / M)] resampled signal."""

        l, m, p = self.up, self.down, self.p
        t_in = x.shape[-1]
        n_out = (t_in * l) // m
        blocks = -(-n_out // l)  # output blocks of L samples
        # frame ending index for slot s of block j: b = j*M + base_shift[s];
        # frame = x[b-P+1 .. b].  Left-pad by P-1 (causal warm-up), right-pad
        # to cover the last block.
        left = p - 1
        need = (blocks - 1) * m + max(self.base_shift) + 1 + left
        xp = jnp.pad(
            x.astype(jnp.float32),
            [(0, 0)] * (x.ndim - 1) + [(left, max(0, need - t_in - left))],
        )
        outs = []
        for s in range(l):
            phi = self.phase_of_slot[s]
            start = self.base_shift[s]
            seg = xp[..., start:]
            fr = frame_signal(seg, p, m)[..., :blocks, :]  # [..., blocks, P]
            y = fr @ self.taps_rev[:, phi]  # [..., blocks]
            outs.append(y)
        y = jnp.stack(outs, axis=-1).reshape(*x.shape[:-1], blocks * l)
        return y[..., :n_out]


def resample(x: jax.Array, up: int, down: int, taps_per_phase: int = 16) -> jax.Array:
    """One-shot rational resampling: [..., T] -> [..., floor(T*up/down)]."""

    return Resampler(up, down, taps_per_phase)(jnp.asarray(x))
