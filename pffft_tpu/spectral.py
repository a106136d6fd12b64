"""Spectral analysis built on the batched engine: STFT, spectrogram, PSD.

Beyond-parity capability (the reference provides the FFT primitive and
leaves short-time analysis to users): windowed framing reuses the
gather-free overlap framing of conv.py, transforms run batched through the
split-format engine, and everything works on the TPU backend.

Conventions: unnormalized forward STFT (matching the engine's unscaled
transforms); `istft` reconstructs with the standard overlap-add
least-squares normalization, exact for COLA-compliant window/hop pairs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import plan as _plan
from . import fft as _fft

__all__ = ["frame_signal", "stft_split", "stft_split_tmajor", "stft",
           "istft", "spectrogram", "welch_psd", "hann", "hamming",
           "blackman", "blackmanharris", "flattop", "kaiser", "get_window"]


def _cosine_window(n: int, coefs, dtype) -> np.ndarray:
    """Periodic generalized-cosine window sum_k a_k cos(2 pi k t / n)
    (the scipy.signal.windows family with sym=False)."""

    t = 2.0 * np.pi * np.arange(n) / n
    w = np.zeros(n, dtype=np.float64)
    for k, a in enumerate(coefs):
        w += a * np.cos(k * t) * (-1.0 if k % 2 else 1.0)
    return w.astype(dtype)


def hann(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (COLA at hop n/2, n/4, ...)."""

    return _cosine_window(n, (0.5, 0.5), dtype)


def hamming(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hamming window (classic 0.54/0.46, scipy convention)."""

    return _cosine_window(n, (0.54, 0.46), dtype)


def blackman(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Blackman window (a = 0.16 classic)."""

    return _cosine_window(n, (0.42, 0.5, 0.08), dtype)


def blackmanharris(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic 4-term Blackman-Harris (-92 dB sidelobes)."""

    return _cosine_window(n, (0.35875, 0.48829, 0.14128, 0.01168), dtype)


def flattop(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic flat-top window (amplitude-accurate tone measurement;
    scipy coefficient set)."""

    return _cosine_window(
        n, (0.21557895, 0.41663158, 0.277263158, 0.083578947, 0.006947368),
        dtype)


def kaiser(n: int, beta: float = 8.6, dtype=np.float32) -> np.ndarray:
    """Periodic Kaiser window (I0 form, numpy's i0)."""

    t = np.arange(n, dtype=np.float64) / n  # periodic: denominator n
    w = np.i0(beta * np.sqrt(np.clip(1.0 - (2.0 * t - 1.0) ** 2, 0.0, None)))
    return (w / np.i0(beta)).astype(dtype)


_WINDOWS = {
    "hann": hann, "hamming": hamming, "blackman": blackman,
    "blackmanharris": blackmanharris, "flattop": flattop,
    "kaiser": kaiser, "boxcar": lambda n, dtype=np.float32: np.ones(n, dtype),
    "rect": lambda n, dtype=np.float32: np.ones(n, dtype),
}


def get_window(name: str, n: int, dtype=np.float32) -> np.ndarray:
    """Window by name (all periodic / DFT-even, scipy sym=False).

    Accepts ``(name, param)`` tuples for parameterized windows
    (currently ``("kaiser", beta)``)."""

    if isinstance(name, tuple):
        base, param = name
        if base != "kaiser":
            raise ValueError(f"unknown parameterized window {base!r}")
        return kaiser(n, float(param), dtype)
    try:
        return _WINDOWS[name](n, dtype=dtype)
    except KeyError:
        raise ValueError(
            f"unknown window {name!r}; available: {sorted(_WINDOWS)}") from None



def _coerce_window(window, n_fft: int) -> np.ndarray:
    """None -> periodic Hann; str / (name, param) -> get_window; else the
    array itself (cast to float32)."""

    if window is None:
        return hann(n_fft)
    if isinstance(window, (str, tuple)):
        return get_window(window, n_fft)
    return np.asarray(window, dtype=np.float32)


def frame_signal(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """[..., L] -> [..., K, frame_len] frames at stride ``hop``.

    Gather-free: requires hop <= frame_len <= C*hop for some small C; built
    from reshape + shifted slices (the conv.py framing generalized).
    K = floor((L - frame_len) / hop) + 1.
    """

    length = x.shape[-1]
    if frame_len > length:
        raise ValueError(f"frame_len {frame_len} > signal length {length}")
    k = (length - frame_len) // hop + 1
    spans = -(-frame_len // hop)  # chunks of size hop spanned by one frame
    total = (k - 1) * hop + spans * hop
    pad = total - length
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        x = x[..., :total]
    chunks = x.reshape(*x.shape[:-1], -1, hop)  # [..., Q, hop], Q = k-1+spans
    parts = [chunks[..., s : s + k, :] for s in range(spans)]
    frames = jnp.concatenate(parts, axis=-1)  # [..., K, spans*hop]
    return frames[..., :frame_len]


# Time-major STFT route: None = auto (on for the TPU backend — measured
# 4-25x the batch-major composition at every probed n_fft 256..2048,
# benchmarks/results/stft_tmajor_r3.txt; the batch-major REAL engine
# collapses to ~175 Msamp/s at n_fft>=1024 while the time-major path
# holds 3.4-4.5 Gsamp/s incl. the transpose back to the public [K, H]
# layout), True/False = forced (tests, probes).
_TMAJOR_STFT: Optional[bool] = None


def _stft_tmajor_enabled() -> bool:
    if _TMAJOR_STFT is not None:
        return _TMAJOR_STFT
    return jax.default_backend() == "tpu"


def _stft_split_tmajor(
    x: jax.Array, plan, hop: int, w: np.ndarray, tmajor_out: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Time-major STFT composition: frames [n_fft, ..., K] built with ONE
    chunk transpose (the conv route's framing, ops/dispatch._CONV_TABLE
    rationale), windowed on rows, time-major REAL transform, half-size
    spectrum planes transposed back to the public [..., K, H] layout."""

    n_fft = plan.n
    lead = x.shape[:-1]
    length = x.shape[-1]
    if n_fft > length:
        raise ValueError(f"frame_len {n_fft} > signal length {length}")
    k = (length - n_fft) // hop + 1
    spans = -(-n_fft // hop)
    total = (k - 1 + spans) * hop
    pad = total - length
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        x = x[..., :total]
    chunks = x.reshape(*lead, -1, hop)  # [..., Q, hop]
    cm = jnp.moveaxis(chunks, -1, 0)  # [hop, ..., Q]
    parts = [cm[..., s : s + k] for s in range(spans)]
    fr = jnp.concatenate(parts, axis=0)[:n_fft]  # [n_fft, ..., K]
    fr = fr * jnp.asarray(w).reshape((n_fft,) + (1,) * (fr.ndim - 1))
    sr, si = _fft.transform_ordered_split_tmajor(
        plan, fr.reshape(n_fft, -1), _plan.FORWARD
    )
    if tmajor_out:
        return sr.reshape((plan.spectrum_size,) + lead + (k,)), si.reshape(
            (plan.spectrum_size,) + lead + (k,)
        )
    h = plan.spectrum_size
    sr = jnp.moveaxis(sr.reshape((h,) + lead + (k,)), 0, -1)
    si = jnp.moveaxis(si.reshape((h,) + lead + (k,)), 0, -1)
    return sr, si


def stft_split_tmajor(
    x: jax.Array,
    n_fft: int,
    hop: int,
    window: Optional[np.ndarray] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Channel-major STFT for time-major pipelines: [..., L] real ->
    ([H, ..., K]) x2 planes (H = n_fft/2 packed bins) with NO transpose
    back to the public [..., K, H] layout — the transform's native
    orientation (the two output moveaxis hops are ~2 of the composed
    pipeline's ~6 HBM passes; pipeline_r4 measured the [..., K, H]
    composition at 0.059 SoL)."""

    plan = _plan.Plan.create(n_fft, _plan.REAL, strict=False)
    w = _coerce_window(window, n_fft)
    return _stft_split_tmajor(
        x.astype(jnp.float32), plan, hop, w, tmajor_out=True
    )


def stft_split(
    x: jax.Array,
    n_fft: int,
    hop: int,
    window: Optional[np.ndarray] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Split-format STFT of a real signal: [..., L] -> ([..., K, H]) x2
    planes (H = n_fft/2 packed bins, pffft bin0 convention)."""

    plan = _plan.Plan.create(n_fft, _plan.REAL, strict=False)
    w = _coerce_window(window, n_fft)
    if _stft_tmajor_enabled():
        return _stft_split_tmajor(x.astype(jnp.float32), plan, hop, w)
    fr = frame_signal(x.astype(jnp.float32), n_fft, hop) * jnp.asarray(w)
    return _fft.transform_ordered_split(plan, fr)


def stft(x: jax.Array, n_fft: int, hop: int, window: Optional[np.ndarray] = None) -> jax.Array:
    """Complex-dtype STFT (CPU convenience): [..., K, H] packed spectrum."""

    sr, si = stft_split(x, n_fft, hop, window)
    return jax.lax.complex(sr, si)


def istft(
    s: jax.Array,
    hop: int,
    window: Optional[np.ndarray] = None,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT with overlap-add and COLA normalization.

    s: [..., K, H] packed spectrum (complex).  Returns [..., L] real with
    L = (K-1)*hop + n_fft (trimmed to ``length`` if given).
    """

    h = s.shape[-1]
    n_fft = 2 * h
    k = s.shape[-2]
    plan = _plan.Plan.create(n_fft, _plan.REAL, strict=False)
    frames = _fft.transform_ordered(plan, s, _plan.BACKWARD) / n_fft  # [..., K, n_fft]
    w = _coerce_window(window, n_fft)
    frames = frames * jnp.asarray(w)
    # overlap-add via the transpose of frame_signal: scatter-free padding sum
    out_len = (k - 1) * hop + n_fft
    spans = -(-n_fft // hop)
    total = (k - 1 + spans) * hop
    acc = jnp.zeros((*s.shape[:-2], total), dtype=frames.dtype)
    fpad = jnp.concatenate(
        [frames, jnp.zeros((*frames.shape[:-1], spans * hop - n_fft), frames.dtype)],
        axis=-1,
    )
    fchunks = fpad.reshape(*frames.shape[:-1], spans, hop)  # [..., K, spans, hop]
    for sft in range(spans):
        seg = fchunks[..., sft, :]  # [..., K, hop]
        seg_flat = seg.reshape(*seg.shape[:-2], k * hop)
        pad_l = sft * hop
        pad_r = total - pad_l - k * hop
        acc = acc + jnp.pad(seg_flat, [(0, 0)] * (seg_flat.ndim - 1) + [(pad_l, pad_r)])
    # COLA normalization: sum of squared windows at each position
    wsq = np.zeros(total, dtype=np.float64)
    for i in range(k):
        wsq[i * hop : i * hop + n_fft] += (w.astype(np.float64)) ** 2
    wsq = np.maximum(wsq, 1e-12)
    out = acc / jnp.asarray(wsq.astype(np.float32))
    out = out[..., :out_len]
    return out[..., :length] if length is not None else out


def spectrogram(x: jax.Array, n_fft: int, hop: int, window: Optional[np.ndarray] = None) -> jax.Array:
    """Power spectrogram [..., K, H] (planar — runs on TPU)."""

    sr, si = stft_split(x, n_fft, hop, window)
    return sr * sr + si * si


def welch_psd(
    x: jax.Array,
    n_fft: int,
    hop: Optional[int] = None,
    window: Optional[np.ndarray] = None,
) -> jax.Array:
    """Welch power-spectral-density estimate: [..., H+1] (unpacked bins,
    numpy rfft layout), window-power normalized."""

    hop = hop or n_fft // 2
    w = _coerce_window(window, n_fft)
    sr, si = stft_split(x, n_fft, hop, w)
    p = sr * sr + si * si  # [..., K, H] packed
    pm = jnp.mean(p, axis=-2)
    # unpack bin0 (DC) and Nyquist from the packed layout
    dc = jnp.mean(sr[..., :, 0] ** 2, axis=-1)
    nyq = jnp.mean(si[..., :, 0] ** 2, axis=-1)
    out = jnp.concatenate([dc[..., None], pm[..., 1:], nyq[..., None]], axis=-1)
    return out / float(np.sum(w.astype(np.float64) ** 2))
