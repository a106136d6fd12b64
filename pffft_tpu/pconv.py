"""Uniform partitioned convolution (frequency-domain delay line).

BEYOND PARITY: the reference's fast-convolution (pffastconv.c) covers
one regime — grow Nfft until the whole filter fits one block.  For very
long FIRs (reverbs, channel emulation: 10^4-10^6 taps) production
streaming systems instead PARTITION the filter: with block size B and
Nfft = 2B, the L-tap filter becomes P = ceil(L/B) spectra computed once;
each B-sample input block costs ONE forward FFT into a P-deep spectrum
delay line (FDL), and the output block is the inverse FFT of
sum_p FDL[p] * H[p].  Latency stays one block regardless of L.

TPU-native formulation: all K blocks of a call are transformed in one
batched half-length REAL transform, the delay line becomes a banded
window over the block axis (built from P shifted slices — gather-free),
and the P-term accumulation is four einsum contractions over the
partition axis (MXU work, not a serial loop).  Packed-format bin0
(DC + i*Nyquist, pffft.h:144-155) accumulates componentwise, mirroring
the zconvolve fixup (pffft_priv_impl.h:1534).

Streaming convention: output n is sum_t h[t] x[n-t] with zero history
(np.convolve(x, h)[:len(x)] over the concatenated stream).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import plan as _plan
from .ops import dispatch as _dispatch
from .ops import split as _split

__all__ = ["PartitionedConv"]


class PartitionedConv:
    """Streaming long-FIR convolution with bounded (one-block) latency.

    >>> pc = PartitionedConv(h, block_len=512)
    >>> state = pc.init_state()
    >>> y1, state = pc.process(state, x1)   # len(x1) % 512 == 0
    >>> y2, state = pc.process(state, x2)
    # np.concatenate([y1, y2]) == np.convolve(concat(x1,x2), h)[:total]

    Real input/filter only (the production streaming case); leading axes
    of x are batch (channels).  ``block_len`` must make 2*block_len a
    supported REAL transform size (block_len 2/3/5-smooth).
    """

    def __init__(self, filter_coeffs, block_len: int = 512, dtype="float32"):
        h = np.asarray(filter_coeffs, dtype=np.float64).reshape(-1)
        if h.size < 1:
            raise ValueError("empty filter")
        self.dtype = np.dtype(dtype)
        self.block = int(block_len)
        if self.block < 2:
            raise ValueError("block_len must be >= 2")
        self.nfft = 2 * self.block
        self.plan = _plan.Plan.create(self.nfft, _plan.REAL, dtype,
                                      strict=False)
        self.taps = h.size
        self.parts = -(-h.size // self.block)
        # partition p = h[p*B : (p+1)*B], zero-padded to the 2B frame
        hb = np.zeros((self.parts, self.block), dtype=np.float64)
        hb.reshape(-1)[: h.size] = h
        hp = np.concatenate(
            [hb, np.zeros_like(hb)], axis=1)  # [P, 2B]
        # forbid partition tails in the aliased zone: partition length B,
        # frame 2B -> the last B output samples of each block are exact
        hr, hi = _fft.transform_ordered_split(
            self.plan, jnp.asarray(hp.astype(self.dtype)), _plan.FORWARD)
        self._h = (jnp.asarray(hr), jnp.asarray(hi))  # [P, H]
        self._jit_cache: dict = {}

    @property
    def latency(self) -> int:
        """Samples of algorithmic delay: one block, independent of taps."""

        return self.block

    def init_state(self, lead: Tuple[int, ...] = ()):
        """FDL state for a stream with leading (channel) shape ``lead``:
        (past-spectra planes [*lead, P-1, H], input tail [*lead, B])."""

        h_bins = self.nfft // 2
        z = jnp.zeros((*lead, max(self.parts - 1, 0), h_bins), self.dtype.type)
        tail = jnp.zeros((*lead, self.block), self.dtype.type)
        return (z, jnp.zeros_like(z), tail)

    def _jitted(self, k: int, lead_ndim: int, ekey=None):
        # per-instance cache (lru_cache on a bound method pins self);
        # keyed on dispatch.state_key() per the trace-time-globals rule
        cached = self._jit_cache.get((k, lead_ndim, ekey))
        if cached is not None:
            return cached
        b, p = self.block, self.parts
        nfft = self.nfft
        plan = self.plan
        hp = jax.lax.Precision.HIGHEST  # DEFAULT/HIGH are unusable (CLAUDE.md)

        def fn(sr, si, tail, x, hr, hi):
            lead = x.shape[:-1]
            blocks = x.reshape(*lead, k, b)
            prev = jnp.concatenate(
                [tail[..., None, :], blocks[..., :-1, :]], axis=-2)
            frames = jnp.concatenate([prev, blocks], axis=-1)  # [.., K, 2B]
            xr, xi = _fft.transform_ordered_split(plan, frames, _plan.FORWARD)
            # block-axis history: [.., P-1+K, H]
            ar = jnp.concatenate([sr, xr], axis=-2)
            ai = jnp.concatenate([si, xi], axis=-2)
            # banded correlation over the block axis: output block j needs
            # spectra j-p for p = 0..P-1 (index P-1+j-p in the history);
            # window q holds the spectrum of block j-(P-1-q)
            hrr = hr[::-1]
            hii = hi[::-1]
            if p <= 16:
                # small P: one MXU contraction over the partition axis
                wr = jnp.stack([ar[..., q : q + k, :] for q in range(p)],
                               axis=-2)
                wi = jnp.stack([ai[..., q : q + k, :] for q in range(p)],
                               axis=-2)
                acc_r = (jnp.einsum("...kph,ph->...kh", wr, hrr, precision=hp)
                         - jnp.einsum("...kph,ph->...kh", wi, hii, precision=hp))
                acc_i = (jnp.einsum("...kph,ph->...kh", wr, hii, precision=hp)
                         + jnp.einsum("...kph,ph->...kh", wi, hrr, precision=hp))
                # packed bin0 (DC + i*Nyq) accumulates componentwise
                dc = jnp.einsum("...kp,p->...k", wr[..., 0], hrr[..., 0],
                                precision=hp)
                nyq = jnp.einsum("...kp,p->...k", wi[..., 0], hii[..., 0],
                                 precision=hp)
            else:
                # large P: fold without materializing the [.., K, P, H]
                # window stack (P-fold memory blowup; the op is
                # traffic-bound either way so elementwise MAC is fine)
                acc_r = jnp.zeros_like(ar[..., :k, :])
                acc_i = jnp.zeros_like(acc_r)
                dc = jnp.zeros_like(acc_r[..., 0])
                nyq = jnp.zeros_like(dc)
                for q in range(p):
                    cr, ci = ar[..., q : q + k, :], ai[..., q : q + k, :]
                    acc_r = acc_r + cr * hrr[q] - ci * hii[q]
                    acc_i = acc_i + cr * hii[q] + ci * hrr[q]
                    dc = dc + cr[..., 0] * hrr[q, 0]
                    nyq = nyq + ci[..., 0] * hii[q, 0]
            acc_r = _split._set_bin0(acc_r, dc)
            acc_i = _split._set_bin0(acc_i, nyq)
            y = _fft.transform_ordered_split(
                plan, (acc_r, acc_i), _plan.BACKWARD) * (1.0 / nfft)
            out = y[..., b:].reshape(*lead, k * b)  # last B of each block
            new_tail = blocks[..., -1, :]
            nsr = ar[..., k:, :] if p > 1 else sr
            nsi = ai[..., k:, :] if p > 1 else si
            return out.astype(x.dtype), (nsr, nsi, new_tail)

        jfn = jax.jit(fn)
        self._jit_cache[(k, lead_ndim, ekey)] = jfn
        return jfn

    def process(self, state, x):
        """Filter ``x`` [..., K*B]; returns (y [..., K*B], new_state)."""

        x = jnp.asarray(x, dtype=self.dtype.type)
        if x.shape[-1] == 0 or x.shape[-1] % self.block:
            raise ValueError(
                f"chunk length {x.shape[-1]} must be a non-zero multiple of "
                f"block_len {self.block} (pad the final chunk with zeros)")
        sr, si, tail = state
        k = x.shape[-1] // self.block
        hr, hi = self._h
        return self._jitted(k, x.ndim - 1, _dispatch.state_key())(
            sr, si, tail, x, hr, hi)
