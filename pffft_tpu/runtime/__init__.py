"""Native host runtime: C++ planner + streaming framer via ctypes.

The reference's runtime is native C (plan setup, aligned buffers, the
streaming apply loop); this package is its TPU-native counterpart: a small
C++ library (built on demand with g++) providing

  * plan factorization / validity / nearest-size / twiddle tables with
    long-double trig conditioning (:func:`native_planner`), and
  * an aligned overlap-save ring-buffer framer for host-side stream IO
    (:class:`StreamFramer`).

Everything has a pure-Python fallback; ``HAVE_NATIVE`` reports which path
is active.  The library builds once into this directory and is reused.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "HAVE_NATIVE", "load", "native_planner", "StreamFramer",
    "convert_s16_f32", "convert_cs16_planar_f32", "convert_cu8_planar_f32",
    "convert_planar_f32_cs16",
]

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libpffft_tpu_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""

    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("PFFFT_TPU_NO_NATIVE"):
            return None  # CI axis: force the pure-Python fallbacks
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        u64, i32, f64p, f32p = (
            ctypes.c_uint64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float),
        )
        lib.pftpu_decompose.restype = ctypes.c_int
        lib.pftpu_decompose.argtypes = [u64, ctypes.POINTER(i32)]
        lib.pftpu_is_valid_size.restype = ctypes.c_int
        lib.pftpu_is_valid_size.argtypes = [u64, ctypes.c_int]
        lib.pftpu_nearest_transform_size.restype = u64
        lib.pftpu_nearest_transform_size.argtypes = [u64, ctypes.c_int, ctypes.c_int]
        lib.pftpu_fill_stage_twiddle.argtypes = [f64p, f64p, u64, u64, u64]
        lib.pftpu_fill_dft_matrix.argtypes = [f64p, f64p, u64]
        lib.pftpu_fill_real_split_twiddle.argtypes = [f64p, f64p, u64]
        lib.pftpu_ring_new.restype = ctypes.c_void_p
        lib.pftpu_ring_new.argtypes = [u64]
        lib.pftpu_ring_free.argtypes = [ctypes.c_void_p]
        lib.pftpu_ring_size.restype = u64
        lib.pftpu_ring_size.argtypes = [ctypes.c_void_p]
        lib.pftpu_ring_capacity.restype = u64
        lib.pftpu_ring_capacity.argtypes = [ctypes.c_void_p]
        lib.pftpu_ring_write.restype = u64
        lib.pftpu_ring_write.argtypes = [ctypes.c_void_p, f32p, u64]
        lib.pftpu_ring_read_frames.restype = u64
        lib.pftpu_ring_read_frames.argtypes = [ctypes.c_void_p, f32p, u64, u64, u64]
        lib.pftpu_ring_flush_frame.restype = u64
        lib.pftpu_ring_flush_frame.argtypes = [ctypes.c_void_p, f32p, u64]
        i16p = ctypes.POINTER(ctypes.c_int16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.pftpu_convert_s16_f32.argtypes = [i16p, f32p, u64]
        lib.pftpu_convert_cs16_planar_f32.argtypes = [i16p, f32p, f32p, u64]
        lib.pftpu_convert_cu8_planar_f32.argtypes = [u8p, f32p, f32p, u64]
        lib.pftpu_convert_planar_f32_cs16.argtypes = [f32p, f32p, i16p, u64]
        _lib = lib
        return _lib


HAVE_NATIVE = load() is not None


# ---------------------------------------------------------------------------
# Planner facade
# ---------------------------------------------------------------------------


class _NativePlanner:
    """Thin typed facade over the C planner ABI (None-safe)."""

    def __init__(self, lib):
        self.lib = lib

    def decompose(self, n: int) -> Optional[Tuple[int, ...]]:
        out = (ctypes.c_int32 * 64)()
        cnt = self.lib.pftpu_decompose(n, out)
        if cnt < 0:
            return None
        return tuple(out[i] for i in range(cnt))

    def is_valid_size(self, n: int, kind_is_complex: bool) -> bool:
        return bool(self.lib.pftpu_is_valid_size(n, 1 if kind_is_complex else 0))

    def nearest_transform_size(self, n: int, kind_is_complex: bool, higher: bool) -> int:
        return int(
            self.lib.pftpu_nearest_transform_size(
                n, 1 if kind_is_complex else 0, 1 if higher else 0
            )
        )

    def stage_twiddle(self, l: int, r: int, period: int) -> np.ndarray:
        re = np.empty((l, r), dtype=np.float64)
        im = np.empty((l, r), dtype=np.float64)
        self.lib.pftpu_fill_stage_twiddle(
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            l, r, period,
        )
        return re + 1j * im

    def dft_matrix(self, r: int) -> np.ndarray:
        return self.stage_twiddle(r, r, r)

    def real_split_twiddle(self, n: int) -> np.ndarray:
        h = n // 2
        re = np.empty(h, dtype=np.float64)
        im = np.empty(h, dtype=np.float64)
        self.lib.pftpu_fill_real_split_twiddle(
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n,
        )
        return re + 1j * im


def native_planner() -> Optional[_NativePlanner]:
    lib = load()
    return _NativePlanner(lib) if lib is not None else None


# ---------------------------------------------------------------------------
# Streaming framer
# ---------------------------------------------------------------------------


class StreamFramer:
    """Overlap-save stream framer (native ring buffer, Python fallback).

    push() arbitrary float chunks; frames() returns [k, frame_len] batches
    advancing by ``hop`` with ``frame_len - hop`` samples of carried
    overlap — exactly the block-cutting loop of pffastconv_apply
    (/root/reference/src/pffastconv.c:162-199), hoisted out of the compute
    path so the device sees fixed shapes.
    """

    def __init__(self, frame_len: int, hop: int, capacity: int = 1 << 22):
        if hop < 1 or hop > frame_len:
            raise ValueError("need 1 <= hop <= frame_len")
        self.frame_len = int(frame_len)
        self.hop = int(hop)
        self._lib = load()
        if self._lib is not None:
            self._ring = self._lib.pftpu_ring_new(capacity)
            if not self._ring:  # pragma: no cover
                self._lib = None
        if self._lib is None:
            self._buf = np.zeros(0, dtype=np.float32)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def push(self, x) -> int:
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float32).ravel())
        if self._lib is not None:
            # all-or-nothing: check free space BEFORE writing, so a raised
            # BufferError leaves the ring untouched and the caller can
            # safely drain and re-push the same chunk (a partial write
            # would duplicate the committed prefix on retry).
            free = int(self._lib.pftpu_ring_capacity(self._ring)) - int(
                self._lib.pftpu_ring_size(self._ring)
            )
            if x.size > free:
                raise BufferError(
                    f"stream ring full: {x.size} samples do not fit in "
                    f"{free} free slots (nothing written); drain frames() "
                    f"before pushing, or push smaller chunks"
                )
            written = int(
                self._lib.pftpu_ring_write(
                    self._ring,
                    x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    x.size,
                )
            )
            return written
        self._buf = np.concatenate([self._buf, x])
        return x.size

    def pending(self) -> int:
        if self._lib is not None:
            return int(self._lib.pftpu_ring_size(self._ring))
        return int(self._buf.size)

    def frames(self, max_frames: int = 1 << 16) -> np.ndarray:
        """Pop all complete frames: [k, frame_len] float32 (k may be 0)."""

        if self._lib is not None:
            out = np.empty((max_frames, self.frame_len), dtype=np.float32)
            k = int(
                self._lib.pftpu_ring_read_frames(
                    self._ring,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self.frame_len, self.hop, max_frames,
                )
            )
            return out[:k].copy()
        k = 0
        frames = []
        while self._buf.size >= self.frame_len and k < max_frames:
            frames.append(self._buf[: self.frame_len].copy())
            self._buf = self._buf[self.hop :]
            k += 1
        return np.stack(frames) if frames else np.empty((0, self.frame_len), np.float32)

    def flush(self) -> np.ndarray:
        """Drain remaining samples as one zero-padded frame ([1, frame_len]
        with k real samples) or an empty array."""

        if self._lib is not None:
            out = np.zeros((1, self.frame_len), dtype=np.float32)
            k = int(
                self._lib.pftpu_ring_flush_frame(
                    self._ring,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self.frame_len,
                )
            )
            return out if k else np.empty((0, self.frame_len), np.float32)
        if self._buf.size == 0:
            return np.empty((0, self.frame_len), np.float32)
        out = np.zeros((1, self.frame_len), dtype=np.float32)
        n = min(self._buf.size, self.frame_len)
        out[0, :n] = self._buf[:n]
        self._buf = self._buf[n:]
        return out

    def __del__(self):  # pragma: no cover
        lib = getattr(self, "_lib", None)
        ring = getattr(self, "_ring", None)
        if lib is not None and ring:
            lib.pftpu_ring_free(ring)
            self._ring = None

# ---------------------------------------------------------------------------
# Sample-format converters (native single-pass loops with numpy fallbacks)
#
# The host-side IO layer of the DSP chain: SDR byte formats -> the planar
# f32 the TPU engine consumes (reference formats: cicddc_s16/cs16/cu8,
# /root/reference/src/pf_cic.cpp:87-252; DIRECT_* copy-avoidance,
# pffastconv.h:104-118).
# ---------------------------------------------------------------------------


def convert_s16_f32(x) -> np.ndarray:
    """int16 samples -> float32 scaled by 1/32768."""

    x = np.ascontiguousarray(x, dtype=np.int16)
    out = np.empty(x.size, dtype=np.float32)
    lib = load()
    if lib is not None:
        lib.pftpu_convert_s16_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.size,
        )
        return out.reshape(x.shape)
    return (x.astype(np.float32) / np.float32(32768.0)).reshape(x.shape)


def convert_cs16_planar_f32(x) -> Tuple[np.ndarray, np.ndarray]:
    """Interleaved int16 IQ [2n] -> planar (re, im) float32, 1/32768."""

    x = np.ascontiguousarray(x, dtype=np.int16).ravel()
    n = x.size // 2
    re = np.empty(n, dtype=np.float32)
    im = np.empty(n, dtype=np.float32)
    lib = load()
    if lib is not None:
        lib.pftpu_convert_cs16_planar_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        return re, im
    f = x.astype(np.float32) / np.float32(32768.0)
    return np.ascontiguousarray(f[0::2]), np.ascontiguousarray(f[1::2])


def convert_cu8_planar_f32(x) -> Tuple[np.ndarray, np.ndarray]:
    """Interleaved offset-binary uint8 IQ -> planar float32 (x-127.4)/128
    (the reference's cu8 midpoint, pf_cic.cpp)."""

    x = np.ascontiguousarray(x, dtype=np.uint8).ravel()
    n = x.size // 2
    re = np.empty(n, dtype=np.float32)
    im = np.empty(n, dtype=np.float32)
    lib = load()
    if lib is not None:
        lib.pftpu_convert_cu8_planar_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
        )
        return re, im
    f = (x.astype(np.float32) - np.float32(127.4)) / np.float32(128.0)
    return np.ascontiguousarray(f[0::2]), np.ascontiguousarray(f[1::2])


def convert_planar_f32_cs16(re, im) -> np.ndarray:
    """Planar float32 -> interleaved int16 IQ with saturation, scale 32767."""

    re = np.ascontiguousarray(re, dtype=np.float32).ravel()
    im = np.ascontiguousarray(im, dtype=np.float32).ravel()
    n = re.size
    out = np.empty(2 * n, dtype=np.int16)
    lib = load()
    if lib is not None:
        lib.pftpu_convert_planar_f32_cs16(
            re.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            n,
        )
        return out
    z = np.empty(2 * n, dtype=np.float32)
    z[0::2] = re * 32767.0
    z[1::2] = im * 32767.0
    return np.clip(z, -32768.0, 32767.0).astype(np.int16)
