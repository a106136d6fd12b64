"""Channelizer pipelines — the framework's flagship composite workload.

BASELINE.json names two composite configs: "PFDSP chain: NCO mixer + CIC
decimate on a multichannel IQ stream" and "Pod-scale channelizer:
4096-channel sharded FFT+FIR stream with ICI halo exchange".  The reference
ships the ingredients (pffft FFT, pffastconv FIR, pf_mixer NCO, pf_cic DDC)
but leaves composition to the user; here the composition is a first-class,
jit-compiled, mesh-shardable pipeline built from the same modules:

  * :class:`Channelizer` — critically-sampled polyphase filter-bank (PFB)
    channelizer: frame at stride M, weight with the polyphase decomposition
    of a prototype lowpass (MXU contraction), FFT across the M channel
    phases (the batched complex engine).  Mathematically this computes, for
    frame k and channel c,

        Y[k, c] = sum_p  exp(+2i pi c p / M) * sum_t h[t*M + p] * x[k*M - t*M - p + (P-1)*M]

    i.e. every channel is the input mixed to baseband by exp(-2i pi c n/M),
    filtered by h, and decimated by M — M DDC chains for the price of one
    FIR + one FFT (the classic PFB identity).

  * :class:`DDCChain` — single-channel chain with explicit stages (NCO mix
    -> FIR lowpass via overlap-save fast conv -> decimate), the
    mixer+CIC-style composite, streaming state carried as a pytree.

Both carry streaming state exactly like the reference's stateful C structs
(pffastconv tail, pf_mixer phase): state in, state out, pure functions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import conv as _conv
from . import fft as _fft
from . import plan as _plan
from .dsp import mixer as _mixer

__all__ = ["Channelizer", "OversampledChannelizer", "ChannelizerState", "DDCChain", "DDCState", "design_lowpass"]


def design_lowpass(num_taps: int, cutoff: float, window: str = "hamming") -> np.ndarray:
    """Windowed-sinc FIR lowpass prototype (cutoff in cycles/sample).

    Host-side float64 design (the analog of the reference's filter-design
    helpers living outside the hot path, tests/test_pffastconv.c keeps its
    filters host-side too).
    """

    n = np.arange(num_taps, dtype=np.float64) - (num_taps - 1) / 2.0
    h = 2.0 * cutoff * np.sinc(2.0 * cutoff * n)
    if window == "hamming":
        w = np.hamming(num_taps)
    elif window == "blackman":
        w = np.blackman(num_taps)
    elif window == "rect":
        w = np.ones(num_taps)
    else:
        raise ValueError(f"unknown window {window!r}")
    h *= w
    return (h / h.sum()).astype(np.float64)


class ChannelizerState(NamedTuple):
    """Streaming history: the last P*M input samples, planar re/im.

    Planar split format so the state (and the whole pipeline) runs on the
    TPU backend, which has no complex dtypes (see ops/split.py).
    """

    hist_re: jax.Array  # [..., P*M] float
    hist_im: jax.Array


class Channelizer:
    """Critically-sampled polyphase filter-bank channelizer.

    num_channels M: FFT length across phases (any 2/3/5-smooth size).
    taps_per_channel P: polyphase depth; prototype length = P*M.
    """

    def __init__(
        self,
        num_channels: int,
        taps_per_channel: int = 8,
        prototype: Optional[np.ndarray] = None,
        dtype="float32",
    ):
        m, p = int(num_channels), int(taps_per_channel)
        if prototype is None:
            prototype = design_lowpass(p * m, 0.5 / m)
        prototype = np.asarray(prototype, dtype=np.float64)
        if prototype.size != p * m:
            raise ValueError(f"prototype length {prototype.size} != P*M = {p * m}")
        self.m = m
        self.p = p
        self.dtype = np.dtype(dtype)
        # polyphase branches: hb[s, phi] = h[s*M + phi]
        self.weights = jnp.asarray(
            prototype.reshape(p, m).astype(self.dtype), dtype=self.dtype
        )
        self.plan = _plan.Plan.create(m, _plan.COMPLEX, dtype, strict=False)

    def init_state(self, channels_shape: Tuple[int, ...] = ()) -> ChannelizerState:
        z = jnp.zeros((*channels_shape, self.p * self.m), dtype=self.dtype)
        return ChannelizerState(hist_re=z, hist_im=z)

    # ------------------------------------------------------------------
    def _frame_idx(self, k_frames: int) -> np.ndarray:
        m, p = self.m, self.p
        k_idx = np.arange(k_frames)[:, None, None]
        s_idx = np.arange(p)[None, :, None]
        phi_idx = np.arange(m)[None, None, :]
        return (p + k_idx - s_idx) * m - phi_idx  # [K, P, M], all >= 1

    def _polyphase(self, ext: jax.Array, k: int) -> jax.Array:
        """[..., P*M + L] -> [..., K, M] weighted frames
        v[k, phi] = sum_s hb[s, phi] * ext[(P + k - s)*M - phi].

        Built from a blocked flip + reshape + P shifted row slices — NO
        integer-array gather (XLA gathers serialize on TPU) and NO flat
        reverse of the long stream axis (a flat lax.rev on a large minor
        axis also serializes — the round-2 real-path cliff; see
        ops/split.py:_flip_last).  Derivation: with f = flip(ext) and
        g = f[M-1:], rows of g.reshape(P+K-1, M) are u[q, phi] :=
        ext[q*M - phi] in DESCENDING q, so v (ascending k) is the k-flip
        of sum_s hb[s] * rows[s : s+K].  The P-term multiply-accumulate
        replaces the round-2 stack-of-P-slabs + einsum, which materialized
        (and re-read) a P-times-amplified [K, P, M] intermediate — the
        flagship pipeline's 0.044-SoL bottleneck.
        """

        m, p, w = self.m, self.p, self.weights
        from .ops.split import _flip_last

        f = _flip_last(ext)
        g = f[..., m - 1 : m - 1 + (p + k - 1) * m]
        rows = g.reshape(*g.shape[:-1], p + k - 1, m)
        wt = w.astype(ext.dtype)
        if self._use_pfb_kernel(k):
            from .ops import pfb_kernel

            acc = pfb_kernel.pfb_fir(rows, wt, k)
        else:
            acc = rows[..., 0:k, :] * wt[0]
            for s in range(1, p):
                acc = acc + rows[..., s : s + k, :] * wt[s]
        return jnp.flip(acc, axis=-2)  # k-axis flip: axis -2 is never minor

    def _polyphase_tmajor(self, ext: jax.Array, k: int) -> jax.Array:
        """[..., (P+K)*M] stream -> [M, ..., K] weighted frames, TIME-MAJOR.

        Same identity as :meth:`_polyphase` but built in the transposed
        layout the FFT kernel wants, so the frame tensor never does the
        [..., K, M] -> [M, K] relayout hop: ONE stream transpose
        ([..., Q, M] chunks -> [M, ..., Q]), a sublane flip + row-0
        realignment (v[k, phi] reads ext[(P+k-s)M - phi], which for
        phi >= 1 is chunk row M-phi at frame q-1 and for phi = 0 row 0 at
        frame q), then the P-term MAC as aligned lane slices.  Saves 2-3
        HBM passes vs _polyphase + transpose (pipeline_r4: the 4096ch
        channelizer ran 0.061 SoL while its FFT ran 0.2+ — the framing
        hops were the loss)."""

        m, p, w = self.m, self.p, self.weights
        q = ext.shape[-1] // m
        lead = ext.shape[:-1]
        chunks = ext.reshape(*lead, q, m)
        t = jnp.moveaxis(chunks, -1, 0)  # [M, ..., Q]; t[j,...,q] = ext[qM+j]
        # tf[0] = t[0] shifted one frame left (phi=0 reads frame q, not
        # q-1); tf[phi>=1] = t[M-phi].  Zero-pad keeps lane counts equal —
        # the slices below never touch the padded tail.
        row0 = jnp.concatenate(
            [t[0:1, ..., 1:], jnp.zeros_like(t[0:1, ..., :1])], axis=-1
        )
        tf = jnp.concatenate([row0, jnp.flip(t[1:], axis=0)], axis=0)
        wt = w.astype(ext.dtype)  # [P, M]
        wsh = (m,) + (1,) * (tf.ndim - 1)
        acc = tf[..., p - 1 : p - 1 + k] * wt[0].reshape(wsh)
        for s in range(1, p):
            acc = acc + tf[..., p - 1 - s : p - 1 - s + k] * wt[s].reshape(
                wsh
            )
        return acc  # [M, ..., K]

    def _pfb_split_tmajor(
        self, extr: jax.Array, exti: jax.Array, k_frames: int
    ):
        """Time-major composition end-to-end: returns ([M, B*K]) x2 planes
        (channel-major).  The public process_split transposes back; the
        streaming-pipeline entry :meth:`process_split_tmajor` doesn't."""

        vr = self._polyphase_tmajor(extr, k_frames)
        vi = self._polyphase_tmajor(exti, k_frames)
        lead = vr.shape[1:]
        yr, yi = _fft.transform_ordered_split_tmajor(
            self.plan,
            (vr.reshape(self.m, -1), vi.reshape(self.m, -1)),
            _plan.BACKWARD,
        )
        return yr, yi, lead

    def _use_pfb_kernel(self, k: int) -> bool:
        """Route the polyphase FIR through the Pallas sliding-window
        kernel (ops/pfb_kernel.py: 1 read + 1 write vs the XLA chain's P
        shifted reads).  PFFFT_TPU_PFB=pallas|xla; default xla until the
        kernel is measured stable on the axon Mosaic service."""

        import os

        mode = os.environ.get("PFFFT_TPU_PFB", "xla").lower()
        if mode != "pallas" or jax.default_backend() != "tpu":
            return False
        from .ops import pfb_kernel

        return pfb_kernel.supported(k, self.p, self.m, self.dtype)

    def _pfb_split(self, extr: jax.Array, exti: jax.Array, k_frames: int):
        """ext planes [..., P*M + L] (history-prefixed) -> ([..., K, M]) x2.

        Exact identity produced (verified in tests/test_channelizer.py):

            Y[k, c] = sum_j h[j] * x[k*M - j] * exp(+2i pi c j / M)
                    = (x * e^{-2i pi c n / M}) conv h, sampled at n = k*M

        via v[k, phi] = sum_s hb[s, phi] * ext[(P + k - s)*M - phi] and an
        unscaled backward DFT over phi (channel extraction).
        """

        if self._use_tmajor_route(extr, k_frames):
            # time-major end-to-end (r5): the polyphase builds [M, ..., K]
            # directly, the kernel transforms in place, one transpose back
            # to the public layout — vs the r4 composition's transpose in
            # AND out of the frame tensor
            yr, yi, lead = self._pfb_split_tmajor(extr, exti, k_frames)
            m = self.m
            yr = jnp.moveaxis(yr.reshape((m,) + lead), 0, -1)
            yi = jnp.moveaxis(yi.reshape((m,) + lead), 0, -1)
            return yr, yi
        vr = self._polyphase(extr, k_frames)
        vi = self._polyphase(exti, k_frames)
        return _fft.transform_ordered_split(self.plan, (vr, vi), _plan.BACKWARD)

    def _use_tmajor_route(self, ext: jax.Array, k_frames: int) -> bool:
        """Auto: when the measured dispatch table routes time-major M to
        the pallas kernel (and the batch is tile-aligned); override with
        PFFFT_TPU_CHAN_TMAJOR=1/0."""

        import os

        env = os.environ.get("PFFFT_TPU_CHAN_TMAJOR")
        if env is not None:
            return env not in ("0", "false", "off")
        if jax.default_backend() != "tpu" or self.plan.is_real:
            return False
        from .ops import dispatch as _dispatch

        batch = int(np.prod(ext.shape[:-1])) * k_frames
        return _dispatch.select_engine(self.plan, batch, True) in (
            "pallas",
            "kern2",
        )

    def process_split_tmajor(
        self, state: ChannelizerState, x_re: jax.Array, x_im: jax.Array
    ) -> Tuple[Tuple[jax.Array, jax.Array], ChannelizerState]:
        """Channel-major stream step for time-major pipelines: planes
        [..., L] x2 -> (([M, B*K]) x2, state') — the [M, ...] output of
        the kernel with NO transpose back (columns run frame-fastest,
        batch-major over any leading dims)."""

        if x_re.shape[-1] % self.m:
            raise ValueError(
                f"stream chunk length {x_re.shape[-1]} must be a "
                f"multiple of M={self.m}"
            )
        extr = jnp.concatenate(
            [state.hist_re, x_re.astype(self.dtype)], axis=-1
        )
        exti = jnp.concatenate(
            [state.hist_im, x_im.astype(self.dtype)], axis=-1
        )
        k = x_re.shape[-1] // self.m
        yr, yi, _ = self._pfb_split_tmajor(extr, exti, k)
        hist = self.p * self.m
        new_state = ChannelizerState(
            hist_re=extr[..., -hist:], hist_im=exti[..., -hist:]
        )
        return (yr, yi), new_state

    def process_split(
        self, state: ChannelizerState, x_re: jax.Array, x_im: jax.Array
    ) -> Tuple[Tuple[jax.Array, jax.Array], ChannelizerState]:
        """Split-format stream step (the TPU-native entry):
        planes [..., L] x2 -> (([..., L//M, M]) x2, state')."""

        if x_re.shape[-1] % self.m:
            raise ValueError(
                f"stream chunk length {x_re.shape[-1]} must be a multiple of M={self.m}"
            )
        extr = jnp.concatenate([state.hist_re, x_re.astype(self.dtype)], axis=-1)
        exti = jnp.concatenate([state.hist_im, x_im.astype(self.dtype)], axis=-1)
        yr, yi = self._pfb_split(extr, exti, x_re.shape[-1] // self.m)
        hist = self.p * self.m
        new_state = ChannelizerState(
            hist_re=extr[..., -hist:], hist_im=exti[..., -hist:]
        )
        return (yr, yi), new_state

    def process(
        self, state: ChannelizerState, x: jax.Array
    ) -> Tuple[jax.Array, ChannelizerState]:
        """Stream step: x [..., L] (L % M == 0) -> (Y [..., L//M, M], state').

        Y[..., k, c] is channel c of output frame k at rate fs/M; frame k of
        this chunk samples the filtered stream at chunk-local time k*M.
        Complex-dtype convenience over :meth:`process_split`.
        """

        x = x.astype(self.plan.cdtype)
        (yr, yi), st = self.process_split(state, jnp.real(x), jnp.imag(x))
        return jax.lax.complex(yr, yi).astype(self.plan.cdtype), st

    @functools.cached_property
    def jitted_process(self):
        return jax.jit(self.process)

    def one_shot(self, x: jax.Array) -> jax.Array:
        """Convenience: zero history, process, drop state."""

        lead = x.shape[:-1]
        y, _ = self.jitted_process(self.init_state(lead), jnp.asarray(x))
        return y

    def __repr__(self) -> str:  # pragma: no cover
        return f"Channelizer(M={self.m}, P={self.p}, {self.dtype.name})"


# ---------------------------------------------------------------------------


class OversampledChannelizer:
    """Oversampled PFB channelizer: per-channel output rate V*fs/M.

    Critically-sampled banks (hop M) alias channel edges; hop H = M/V
    (V | M) keeps V-times oversampled channels.  Identity produced
    (verified in tests): for frame k and channel c,

        Y[k, c] = sum_j h[j] * x[k*H - j] * exp(+2i pi c (j - k*H) / M)
                = the c-th DDC (mix by e^{-2i pi c n / M}, filter by h)
                  sampled at n = k*H.

    Implementation: V interleaved critically-sampled passes (residue
    r = k mod V uses frames offset by r*H), each the gather-free PFB of
    :class:`Channelizer`, plus the static phase table
    e^{-2i pi c r H / M} applied per residue.
    """

    def __init__(self, num_channels: int, oversample: int = 2,
                 taps_per_channel: int = 8, prototype: Optional[np.ndarray] = None,
                 dtype="float32"):
        if num_channels % oversample:
            raise ValueError("oversample must divide num_channels")
        self.base = Channelizer(num_channels, taps_per_channel, prototype, dtype)
        self.v = int(oversample)
        self.hop = num_channels // self.v
        m = num_channels
        # phase[r, c] = exp(-2i pi c r H / M)
        r = np.arange(self.v)[:, None]
        c = np.arange(m)[None, :]
        ang = -2.0 * np.pi * (r * self.hop % m) * c / m
        self.ph_re = jnp.asarray(np.cos(ang).astype(self.base.dtype))
        self.ph_im = jnp.asarray(np.sin(ang).astype(self.base.dtype))

    @property
    def m(self) -> int:
        return self.base.m

    def init_state(self, channels_shape: Tuple[int, ...] = ()) -> ChannelizerState:
        return self.base.init_state(channels_shape)

    def process_split(self, state: ChannelizerState, x_re, x_im):
        """Planes [..., L] (L % M == 0) -> ([..., V*L//M, M]) x2, state'.

        Output frame k corresponds to stream time k*H (H = M/V).
        """

        b = self.base
        if x_re.shape[-1] % b.m:
            raise ValueError(f"chunk length must be a multiple of M={b.m}")
        extr = jnp.concatenate([state.hist_re, x_re.astype(b.dtype)], axis=-1)
        exti = jnp.concatenate([state.hist_im, x_im.astype(b.dtype)], axis=-1)
        k_big = x_re.shape[-1] // b.m  # frames per residue
        full = extr.shape[-1]  # == (P + K) * M
        subs = []
        for r in range(self.v):
            off = r * self.hop
            # residue r frames sample times k*M + r*H: shift the window
            # right by `off` and zero-pad back to (P+K)*M (frame K-1's last
            # needed index is (P+K-1)*M - off' < full - off, so the pad is
            # never read — it only restores the framing length invariant)
            if off:
                pad = [(0, 0)] * (extr.ndim - 1) + [(0, off)]
                er = jnp.pad(extr[..., off:], pad)
                ei = jnp.pad(exti[..., off:], pad)
            else:
                er, ei = extr, exti
            vr_, vi_ = b._pfb_split(er, ei, k_big)
            # residue phase e^{-2i pi c r H / M} (DDC alignment)
            pr = self.ph_re[r]
            pi = self.ph_im[r]
            subs.append((vr_ * pr - vi_ * pi, vr_ * pi + vi_ * pr))
        # interleave residues: output frame k*V + r = subs[r] frame k
        yr = jnp.stack([s[0] for s in subs], axis=-2)  # [..., K, V, M]
        yi = jnp.stack([s[1] for s in subs], axis=-2)
        lead = yr.shape[:-3]
        yr = yr.reshape(*lead, k_big * self.v, b.m)
        yi = yi.reshape(*lead, k_big * self.v, b.m)
        hist = b.p * b.m
        new_state = ChannelizerState(hist_re=extr[..., -hist:], hist_im=exti[..., -hist:])
        return (yr, yi), new_state

    def process(self, state: ChannelizerState, x: jax.Array):
        x = x.astype(self.base.plan.cdtype)
        (yr, yi), st = self.process_split(state, jnp.real(x), jnp.imag(x))
        return jax.lax.complex(yr, yi).astype(self.base.plan.cdtype), st


class DDCState(NamedTuple):
    mixer: _mixer.MixerState
    tail: jax.Array  # [filterLen-1] carried input samples (pffastconv contract)


class DDCChain:
    """Mixer -> FIR lowpass (overlap-save) -> decimate, streaming.

    The explicit-stage composite of BASELINE.json config #4: each call mixes
    the chunk with the NCO carrier, convolves with the lowpass (fast conv in
    the frequency domain), and keeps every ``decim``-th sample.  The carried
    state is exactly what the reference APIs carry: the NCO phase
    (pf_mixer.h:140-152) and the unconsumed input tail (pffastconv.h:149-174).
    """

    def __init__(self, shift_rate: float, filter_taps, decim: int, dtype="float32"):
        self.decim = int(decim)
        h = np.asarray(filter_taps, dtype=np.float64)
        self.filter_len = h.size
        self.conv = _conv.FastConv(h, flags=_conv.ConvFlags.CPLX_INP_OUT, dtype=dtype)
        self.shift_rate = float(shift_rate)

    def init_state(self) -> DDCState:
        return DDCState(
            mixer=_mixer.mixer_init(self.shift_rate),
            tail=jnp.zeros(self.filter_len - 1, dtype=jnp.complex64),
        )

    def process(self, state: DDCState, x: jax.Array) -> Tuple[jax.Array, DDCState]:
        """x [L] complex chunk -> (y [L/decim] complex, state').

        L must be a multiple of ``decim`` so the decimation phase is chunk
        invariant (streaming == one-shot); otherwise the phase would have to
        be carried as state and the output length would become dynamic.
        """

        if x.shape[0] % self.decim != 0:
            raise ValueError(
                f"chunk length {x.shape[0]} must be a multiple of decim="
                f"{self.decim} (keeps the decimation phase chunk-invariant)"
            )
        mixed, mst = _mixer.mixer_apply(state.mixer, x.astype(jnp.complex64))
        ext = jnp.concatenate([state.tail, mixed])
        n_out = x.shape[0]
        yi = self.conv._conv_stream(jnp.real(ext).astype(self.conv.dtype), n_out)
        yq = self.conv._conv_stream(jnp.imag(ext).astype(self.conv.dtype), n_out)
        y = (yi + 1j * yq)[:: self.decim]
        return y, DDCState(mixer=mst, tail=ext[-(self.filter_len - 1) :])

    @functools.cached_property
    def jitted_process(self):
        return jax.jit(self.process)
