"""PFFASTCONV parity: FFT-based overlap-save FIR fast convolution.

TPU-native re-design of /root/reference/src/pffastconv.c and
include/pffft/pffastconv.h: the reference's sequential per-block loop
(pffastconv_apply:133-263) becomes ONE batched rfft -> pointwise multiply ->
irfft over a [num_blocks, Nfft] framing of the input, which is how a TPU
wants this workload (thousands of independent FFT blocks on the MXU, a
single fused XLA program, no streaming scalar loop).

Semantics preserved exactly (validated against the reference's slow_conv
oracle semantics, tests/test_pffastconv.c:175-213):

  * ``y[i] = sum_j x[i+j] * h[filterLen-1-j]`` -- i.e. valid-mode
    convolution ``np.convolve(x, h, 'valid')`` (or correlation with the
    CORRELATION flag);
  * block length negotiation: Nfft = max(2*next_pow2(filterLen-1),
    min_fft, next_pow2(blockLen)) (pffastconv_new_setup:58-97);
  * the streaming contract: apply() returns (output, consumed); the caller
    keeps the uncomsumed tail (pffastconv.h:149-174);
  * flags: CPLX_INP_OUT (2 FFTs over I/Q), CPLX_SINGLE_FFT (one real FFT of
    the interleaved stream with stride-2 filter embedding), CORRELATION,
    SYMMETRIC (informational), DIRECT_INP/DIRECT_OUT (memory-layout hints,
    no-ops under XLA's memory model).  CPLX_FILTER is *implemented* here
    (complex FFT path) -- the reference declares but rejects it
    (pffastconv.c:71-72).
"""

from __future__ import annotations

import enum
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from .ops import dispatch as _dispatch
from . import plan as _plan

__all__ = ["ConvFlags", "FastConv", "StreamingConv", "new_setup", "apply", "fastconv_valid"]


class ConvFlags(enum.IntFlag):
    """pffastconv_flags_t parity (pffastconv.h:83-134)."""

    NONE = 0
    CPLX_INP_OUT = 1
    CPLX_FILTER = 2
    DIRECT_INP = 4
    DIRECT_OUT = 8
    CPLX_SINGLE_FFT = 16
    SYMMETRIC = 32
    CORRELATION = 64


def _negotiate_nfft(filter_len: int, block_len: int) -> int:
    """Block-length negotiation, exact mirror of pffastconv_new_setup:62-80."""

    min_fft_len = 2 * _plan.simd_size() * _plan.simd_size()  # 32
    nfft = 2 * _plan.next_power_of_two(filter_len - 1)
    if nfft < min_fft_len:
        nfft = min_fft_len
    if block_len > nfft:
        nfft = _plan.next_power_of_two(block_len)
    return nfft


class FastConv:
    """PFFASTCONV_Setup analog.

    Unlike the reference's setup (explicitly NOT thread-shareable because it
    owns scratch buffers, pffastconv.h:77-80), this object is immutable and
    freely shareable: XLA owns all scratch.
    """

    def __init__(
        self,
        filter_coeffs,
        block_len: int = 0,
        flags: ConvFlags = ConvFlags.NONE,
        dtype="float32",
    ):
        flags = ConvFlags(flags)
        h = np.asarray(filter_coeffs)
        if flags & ConvFlags.CPLX_FILTER:
            h = h.astype(np.complex128)
        else:
            h = np.real(h).astype(np.float64)
        if h.ndim != 1 or h.size < 1:
            raise ValueError("filter_coeffs must be a 1-D array")
        filter_len = int(h.size)

        self.flags = flags
        self.filter_len = filter_len
        self.correlation = bool(flags & ConvFlags.CORRELATION)
        self.cplx_stream = bool(flags & ConvFlags.CPLX_INP_OUT)
        self.cplx_filter = bool(flags & ConvFlags.CPLX_FILTER)
        self.single_fft = bool(
            self.cplx_stream and (flags & ConvFlags.CPLX_SINGLE_FFT) and not self.cplx_filter
        )
        self.dtype = np.dtype(dtype)

        nfft = _negotiate_nfft(filter_len, int(block_len))
        self.block_len = nfft  # negotiated block length in (complex) samples
        cplx_factor = 2 if self.single_fft else 1
        nfft *= cplx_factor
        self.nfft = nfft
        self.cplx_factor = cplx_factor
        # effective filter span in scalar positions within a block
        self.filter_span = 2 * filter_len - 1 if cplx_factor == 2 else filter_len
        self.scale = 1.0 / nfft

        if self.cplx_filter:
            # extension path: complex filter on complex stream via complex FFT
            self.plan = _plan.Plan.create(nfft, _plan.COMPLEX, dtype, strict=False)
            # y[m] = sum_j x[m+j] * c[j], with c = reversed h (convolution)
            # or h itself (correlation); realized as circular convolution
            # with g[(nfft - j) % nfft] = c[j].
            c = h if self.correlation else h[::-1]
            g = np.zeros(nfft, dtype=np.complex128)
            for i in range(filter_len):
                g[(nfft - i) % nfft] = c[i]
            hf = _fft.transform(self.plan, jnp.asarray(g.astype(self.plan.cdtype)), _plan.FORWARD)
        else:
            self.plan = _plan.Plan.create(nfft, _plan.REAL, dtype, strict=False)
            g = np.zeros(nfft, dtype=np.float64)
            # exact mirror of pffastconv_new_setup:100-106
            for i in range(filter_len):
                if self.correlation:
                    g[(nfft - cplx_factor * i) % nfft] = h[i].real
                else:
                    g[(nfft - cplx_factor * i) % nfft] = h[filter_len - 1 - i].real
            # planar filter spectrum: the compute path is split-format so it
            # runs on the TPU backend (no complex dtypes there)
            self.hf_re, self.hf_im = _fft.transform_split(
                self.plan, jnp.asarray(g.astype(self.dtype)), _plan.FORWARD
            )
            hf = None
            # time-arranged filter, kept for the fused-kernel route's
            # full complex spectrum (ops/conv_kernel.filter_spectrum)
            self._g64 = g
        self._hf_cplx = hf  # complex-filter path only (CPU engine)
        # time-major route override: None = measured dispatch table
        # (ops/dispatch.conv_route_mode); True/'fused', 'tmajor', or
        # False force a mode (tests, probes).  Set before first apply.
        self._force_conv_kernel = None

    # ------------------------------------------------------------------
    @property
    def num_out_per_block(self) -> int:
        u = self.nfft - self.filter_span + 1
        if self.cplx_factor == 2:
            u &= ~1
        return u

    def _frame(self, x: jax.Array, total_out: int):
        """Frame a scalar stream [L] into [nb, Nfft] blocks at stride u,
        zero-padding past the end (equivalent to the reference's tail
        memset, pffastconv.c:181-183).

        TPU-critical detail: built from reshape + slice + concatenate, NOT
        an integer-array gather — XLA gathers serialize badly on TPU.  The
        Nfft negotiation guarantees Nfft <= 2u (filter span <= Nfft/2 + 1),
        so every frame lies within two consecutive u-chunks.
        """

        u = self.num_out_per_block
        nfft = self.nfft
        nb = -(-total_out // u)  # ceil
        if nfft <= 2 * u:
            pad_len = (nb + 1) * u
            xp = jnp.pad(x, (0, max(0, pad_len - x.shape[0])))[:pad_len]
            x2 = xp.reshape(nb + 1, u)
            frames = jnp.concatenate([x2[:-1], x2[1:]], axis=-1)[:, :nfft]
            return frames, nb, u
        # fallback (not reachable through the public negotiation)
        pad_len = (nb - 1) * u + nfft
        xp = jnp.pad(x, (0, max(0, pad_len - x.shape[0])))
        idx = np.arange(nb)[:, None] * u + np.arange(nfft)[None, :]
        return xp[idx], nb, u

    @property
    def hf(self) -> jax.Array:
        """Filter spectrum (internal layout) as a complex array.

        Convenience for complex-dtype callers; the compute path uses the
        planar ``hf_re``/``hf_im`` pair.
        """

        if self._hf_cplx is not None:
            return self._hf_cplx
        return jax.lax.complex(self.hf_re, self.hf_im).astype(self.plan.cdtype)

    def _jit_memo(self, key, build):
        """Per-instance jit-executable cache.

        Deliberately NOT functools.lru_cache on the bound method: that
        keys on ``self`` in a global table and pins up to 256 FastConv
        instances (plus their executables) for process lifetime
        (round-3 ADVICE).  A plain instance dict dies with the instance.
        """

        cache = self.__dict__.setdefault("_jit_cache", {})
        if key not in cache:
            cache[key] = build()
        return cache[key]

    def _jitted_pipeline(self, nb: int, ekey=None):
        return self._jit_memo(("pipe", nb, ekey), lambda: self._build_pipeline(nb))

    def _build_pipeline(self, nb: int):
        plan, scale = self.plan, self.scale
        if self.cplx_filter:
            hf = self._hf_cplx

            def pipe(frames):  # [nb, Nfft] complex
                xf = _fft.transform(plan, frames, _plan.FORWARD)
                mf = _fft.zconvolve_no_accu(plan, xf, hf, scale)
                return _fft.transform(plan, mf, _plan.BACKWARD)

            return jax.jit(pipe)

        hr, hi = self.hf_re, self.hf_im

        def pipe(frames):  # [nb, Nfft] real, planar spectral path throughout
            sr, si = _fft.transform_split(plan, frames, _plan.FORWARD)
            mr, mi = _fft.zconvolve_split(plan, (sr, si), (hr, hi), scale)
            return _fft.transform_split(plan, (mr, mi), _plan.BACKWARD)

        return jax.jit(pipe)

    def _jitted_fused_stream(self, nb: int, force=None, ekey=None):
        return self._jit_memo(
            ("fused", nb, force, ekey),
            lambda: self._build_fused_stream(nb, force),
        )

    def _build_fused_stream(self, nb: int, force=None):
        """Routed time-major block pipeline, or None for the batch-major
        XLA path.

        Both routed modes (ops/dispatch.conv_route_mode) share the
        layout: a REAL filter's Hermitian spectrum convolves TWO real
        frames per complex column (re = even frames, im = odd), framing
        goes time-major — [Nfft, nb] built with ONE stream-sized
        transpose — and columns pair up with a plain minor-axis reshape.

        * 'fused': the one-HBM-pass spectral-conv Pallas kernel
          (ops/conv_kernel.py) replaces the three engine passes of the
          XLA pipeline; measured 2.2-4.5x end-to-end at nfft 64-512
          (benchmarks/results/convroute_r3.txt, convroute2_r3.txt).
        * 'tmajor': the composed pipeline through the dispatch-routed
          time-major transforms + an XLA Hf multiply — wins on layout
          where the fused kernel exceeds the Mosaic VMEM stack
          (nfft=1024: 3.0x, nfft=2048: 1.9x, convroute2_r3.txt).
        """

        if (
            self.cplx_filter
            or self.dtype != np.float32
            or self.nfft > 2 * self.num_out_per_block
        ):
            return None
        mode = _dispatch.conv_route_mode(self.nfft, force)
        if mode is None:
            return None
        cols = (nb + 1) // 2
        nfft, u = self.nfft, self.num_out_per_block
        from .ops import conv_kernel as _ck

        if mode == "fused":
            choice = _dispatch.conv_kernel_choice(
                self.nfft, cols, True if force else None
            )
            if choice is None:
                # tile padding waste too high for the kernel (short
                # streams / small nb): the composed time-major pipeline
                # below still beats the batch-major XLA path at these
                # lengths (convroute2_r3.txt), so fall through to it
                # rather than all the way back to XLA.
                mode = "tmajor"
        if mode == "fused":
            cplan, tb = choice
            colsp = -(-cols // tb) * tb
        else:  # 'tmajor': any dispatch-covered length; lane-tile columns
            cplan = _plan.new_setup(nfft, _plan.COMPLEX)
            tb = None
            colsp = -(-cols // 128) * 128
        # keep the spectrum as NUMPY in the closure: this builder may be
        # invoked inside an outer trace (a caller jitting around
        # _conv_stream), where jnp.asarray would return a tracer and the
        # lru-cached closure would leak it into later traces
        hfr_np, hfi_np = _ck.filter_spectrum(cplan, self._g64)
        interp = jax.default_backend() != "tpu"

        def block_conv(re, im):
            hfr, hfi = jnp.asarray(hfr_np), jnp.asarray(hfi_np)
            if tb is not None:
                return _ck.zconv_pallas_tmajor(
                    cplan, re, im, hfr, hfi, tb=tb, interpret=interp,
                    scratch=_ck.use_scratch(nfft, tb),
                )
            sr, si = _fft.transform_ordered_split_tmajor(
                cplan, (re, im), _plan.FORWARD
            )
            mr = sr * hfr[:, None] - si * hfi[:, None]
            mi = sr * hfi[:, None] + si * hfr[:, None]
            return _fft.transform_ordered_split_tmajor(
                cplan, (mr, mi), _plan.BACKWARD
            )

        def pipe(x):  # padded stream [(nb+1)*u] -> valid samples [nb*u]
            x2 = x.reshape(nb + 1, u).T  # [u, nb+1]
            frames = jnp.concatenate([x2[:, :-1], x2[:, 1:]], axis=0)[:nfft]
            fp = jnp.pad(frames, ((0, 0), (0, 2 * colsp - nb)))
            f3 = fp.reshape(nfft, colsp, 2)
            yr, yi = block_conv(f3[..., 0], f3[..., 1])
            y = jnp.stack([yr, yi], axis=-1).reshape(nfft, 2 * colsp)
            return y[:u, :nb].T.reshape(-1)

        return jax.jit(pipe)

    def _conv_stream(self, x: jax.Array, total_out: int) -> jax.Array:
        """Valid-mode overlap-save conv of a scalar stream; returns [total_out]."""

        u = self.num_out_per_block
        nb = -(-total_out // u)  # ceil
        fused = self._jitted_fused_stream(
            nb, self._force_conv_kernel, _dispatch.state_key()
        )
        if fused is not None:
            pad_len = (nb + 1) * u
            xp = jnp.pad(x, (0, max(0, pad_len - x.shape[0])))[:pad_len]
            return fused(xp)[:total_out]
        frames, nb, u = self._frame(x, total_out)
        y = self._jitted_pipeline(nb, _dispatch.state_key())(frames)
        y = y[:, :u].reshape(-1)
        return y[:total_out]

    # ------------------------------------------------------------------
    def apply(self, x, flush: bool = False) -> Tuple[jax.Array, int]:
        """pffastconv_apply parity (pffastconv.h:149-174).

        x: [L] float stream (real mode) or [L] complex stream (CPLX modes;
        also accepts interleaved float [2L] for C-layout parity).
        Returns (output, consumed): ``consumed`` samples were processed;
        the caller carries the remaining ``L - consumed`` samples over to
        the next call, exactly like the C API.
        """

        x = jnp.asarray(x)
        if self.cplx_stream or self.cplx_filter:
            if not jnp.iscomplexobj(x):
                # interleaved float view -> complex
                x = x.reshape(-1, 2)
                x = x[:, 0] + 1j * x[:, 1]
            return self._apply_complex(x, flush)
        if jnp.iscomplexobj(x):
            raise ValueError("real-mode FastConv got complex input; set CPLX_INP_OUT")
        return self._apply_real(x, flush)

    def _num_consumed(self, input_len_scalar: int, flush: bool) -> int:
        """Total samples produced/consumed, in scalar stream positions
        (mirrors the loop-bound algebra at pffastconv.c:144-165)."""

        nfft, span = self.nfft, self.filter_span
        u = self.num_out_per_block
        if flush:
            max_off = input_len_scalar - span + 1
            if self.cplx_factor == 2:
                # the C loop steps by even numOut and stops when numOut==0
                total, off = 0, 0
                while off < max_off:
                    proc = min(nfft, input_len_scalar - off)
                    nout = (proc - span + 1) & ~1
                    if nout <= 0:
                        break
                    off += nout
                total = off
                return max(0, total)
            return max(0, max_off)
        max_off = input_len_scalar - nfft + 1
        if max_off <= 0:
            return 0
        nb = -(-max_off // u)  # number of full blocks started below max_off
        return nb * u

    def _apply_real(self, x: jax.Array, flush: bool) -> Tuple[jax.Array, int]:
        n = int(x.shape[0])
        total = self._num_consumed(n, flush)
        if total <= 0:
            return jnp.zeros((0,), dtype=self.dtype), 0
        y = self._conv_stream(x.astype(self.dtype), total)
        return y, total

    def _apply_complex(self, x: jax.Array, flush: bool) -> Tuple[jax.Array, int]:
        n_cplx = int(x.shape[0])
        if self.cplx_filter:
            total = self._num_consumed(n_cplx, flush)
            if total <= 0:
                return jnp.zeros((0,), dtype=self.plan.cdtype), 0
            frames, nb, u = self._frame(x.astype(self.plan.cdtype), total)
            y = self._jitted_pipeline(nb, _dispatch.state_key())(frames)
            return y[:, :u].reshape(-1)[:total], total
        if self.single_fft:
            # interleaved stream as a real vector of length 2*n_cplx
            xs = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1).reshape(-1)
            total_scalar = self._num_consumed(2 * n_cplx, flush)
            if total_scalar <= 0:
                return jnp.zeros((0,), dtype=np.result_type(self.dtype, np.complex64)), 0
            y = self._conv_stream(xs.astype(self.dtype), total_scalar)
            yc = y.reshape(-1, 2)
            return yc[:, 0] + 1j * yc[:, 1], total_scalar // 2
        # two real pipelines over I and Q (pffastconv.c:212-258)
        total = self._num_consumed(n_cplx, flush)
        if total <= 0:
            return jnp.zeros((0,), dtype=np.result_type(self.dtype, np.complex64)), 0
        yi = self._conv_stream(jnp.real(x).astype(self.dtype), total)
        yq = self._conv_stream(jnp.imag(x).astype(self.dtype), total)
        return yi + 1j * yq, total

    # ------------------------------------------------------------------
    def apply_batched(self, x: jax.Array, flush: bool = True) -> jax.Array:
        """Batched one-shot convenience: x [..., L] -> [..., L-F+1]
        (valid-mode).  vmapped overlap-save; the TPU-idiomatic entry."""

        fn = lambda row: self.apply(row, flush)[0]
        for _ in range(x.ndim - 1):
            fn = jax.vmap(fn)
        return fn(x)

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"FastConv(filterLen={self.filter_len}, Nfft={self.nfft}, "
            f"blockLen={self.block_len}, flags={self.flags!r})"
        )


def new_setup(filter_coeffs, filter_len: Optional[int] = None, block_len: int = 0, flags=0) -> FastConv:
    """pffastconv_new_setup parity (pffastconv.h:145).

    Note: the C API mutates *blockLen to return the negotiated block
    length; here it is available as ``setup.block_len``.
    """

    h = np.asarray(filter_coeffs)
    if filter_len is not None:
        h = h[:filter_len]
    return FastConv(h, block_len=block_len, flags=ConvFlags(flags))


def apply(setup: FastConv, x, flush: bool = False) -> Tuple[jax.Array, int]:
    """pffastconv_apply parity; returns (output, consumed)."""

    return setup.apply(x, flush)


def fastconv_valid(x: jax.Array, h, flags: ConvFlags = ConvFlags.NONE) -> jax.Array:
    """One-shot valid-mode fast convolution of [..., L] with filter [F].

    Equivalent to np.convolve(x, h, 'valid') per row (or correlation with
    the CORRELATION flag), choosing the block size automatically.
    """

    setup = FastConv(h, flags=flags)
    return setup.apply_batched(jnp.asarray(x), flush=True)


class StreamingConv:
    """Host-native streaming FIR: ring-buffer framer + device FFT pipeline.

    The full streaming composition of the reference's pffastconv usage
    pattern: push arbitrary-size chunks (a soundcard/SDR callback), pop
    filtered output; the C++ framer (pffft_tpu.runtime.StreamFramer)
    carries the overlap-save tail and cuts fixed-shape [k, Nfft] batches so
    the device never recompiles.  Real streams only (the common case).

    >>> sc = StreamingConv(h)
    >>> for chunk in chunks: out.append(sc.push(chunk))
    >>> out.append(sc.flush())
    """

    def __init__(self, filter_coeffs, block_len: int = 0, correlation: bool = False,
                 dtype="float32"):
        flags = ConvFlags.CORRELATION if correlation else ConvFlags.NONE
        self.setup = FastConv(filter_coeffs, block_len=block_len, flags=flags, dtype=dtype)
        from . import runtime as _runtime

        self._framer = _runtime.StreamFramer(
            frame_len=self.setup.nfft, hop=self.setup.num_out_per_block
        )

    @property
    def native(self) -> bool:
        """Whether the C++ ring buffer is active (Python fallback else)."""

        return self._framer.native

    def _run(self, frames: np.ndarray) -> np.ndarray:
        s = self.setup
        y = s._jitted_pipeline(frames.shape[0], _dispatch.state_key())(jnp.asarray(frames))
        return np.asarray(y[:, : s.num_out_per_block]).reshape(-1)

    def push(self, chunk) -> np.ndarray:
        """Feed samples; returns whatever filtered output became ready
        (possibly empty).  Output is the valid-mode convolution stream."""

        self._framer.push(np.asarray(chunk, dtype=np.float32))
        frames = self._framer.frames()
        if frames.shape[0] == 0:
            return np.empty(0, dtype=self.setup.dtype)
        return self._run(frames)

    def flush(self) -> np.ndarray:
        """Drain the tail (zero-padded), like pffastconv's applyFlush."""

        pending = self._framer.pending()
        frames = self._framer.flush()
        if frames.shape[0] == 0:
            return np.empty(0, dtype=self.setup.dtype)
        y = self._run(frames)
        valid = max(0, pending - self.setup.filter_len + 1)
        return y[:valid]
