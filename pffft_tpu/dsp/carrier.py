"""Carrier generators (pf_carrier parity).

The reference exploits exp(i*pi*k/2) in {1, i, -1, -i} so DC / +-fs/4 /
+-fs/2 carriers need no trig (/root/reference/src/pf_carrier.cpp:40-298).
On TPU these are trivially tiled period-4 patterns.  The exact VALUES of
the reference are reproduced (including its combined-carrier amplitude
choices m = SHRT_MAX/2 and the float amplitude 127/128).

Float variants return complex64 arrays of length ``size``; s16 variants
return int16 arrays of shape [size, 2] (re, im interleaved pairs), or the
flat interleaved [2*size] layout with ``interleaved=True`` for exact
C-buffer parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_AF = np.float32(127.0 / 128.0)
_SM = np.int16(32767)  # SHRT_MAX
_M = np.int16(32767 // 2)  # SHRT_MAX / 2 = 16383

__all__ = [
    "generate_dc_f", "generate_dc_s16",
    "generate_pos_fs4_f", "generate_pos_fs4_s16",
    "generate_neg_fs4_f", "generate_neg_fs4_s16",
    "generate_dc_pos_fs4_s16", "generate_dc_neg_fs4_s16",
    "generate_pos_neg_fs4_s16", "generate_dc_pos_neg_fs4_s16",
    "generate_pos_neg_fs2_s16", "generate_dc_pos_neg_fs2_s16",
]


def _tile_f(pattern, size: int):
    if size % 4:
        raise ValueError("size must be a multiple of 4 (pf_carrier contract)")
    pat = np.asarray(pattern, dtype=np.complex64)
    return jnp.asarray(np.tile(pat, size // 4))


def _tile_s16(pairs, size: int, interleaved: bool):
    if size % 4:
        raise ValueError("size must be a multiple of 4 (pf_carrier contract)")
    pat = np.asarray(pairs, dtype=np.int16)  # [4, 2]
    out = np.tile(pat, (size // 4, 1))
    if interleaved:
        return jnp.asarray(out.reshape(-1))
    return jnp.asarray(out)


# --- single carriers --------------------------------------------------------

def generate_dc_f(size: int):
    """pf_carrier.cpp:41-50."""

    return _tile_f([_AF, _AF, _AF, _AF], size)


def generate_dc_s16(size: int, interleaved: bool = False):
    return _tile_s16([[_SM, 0]] * 4, size, interleaved)


def generate_pos_fs4_f(size: int):
    """exp(+i*pi*k/2) * 127/128 (pf_carrier.cpp:62-81)."""

    return _tile_f([_AF, 1j * _AF, -_AF, -1j * _AF], size)


def generate_pos_fs4_s16(size: int, interleaved: bool = False):
    return _tile_s16([[_SM, 0], [0, _SM], [-_SM, 0], [0, -_SM]], size, interleaved)


def generate_neg_fs4_f(size: int):
    return _tile_f([_AF, -1j * _AF, -_AF, 1j * _AF], size)


def generate_neg_fs4_s16(size: int, interleaved: bool = False):
    return _tile_s16([[_SM, 0], [0, -_SM], [-_SM, 0], [0, _SM]], size, interleaved)


# --- combined carriers (values as in pf_carrier.cpp:150-298) ---------------

def generate_dc_pos_fs4_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[2 * m, 0], [m, m], [0, 0], [m, -m]], size, interleaved)


def generate_dc_neg_fs4_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[2 * m, 0], [m, -m], [0, 0], [m, m]], size, interleaved)


def generate_pos_neg_fs4_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[m, -m], [-m, m], [-m, m], [m, -m]], size, interleaved)


def generate_dc_pos_neg_fs4_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[2 * m, -m], [0, m], [0, m], [2 * m, -m]], size, interleaved)


def generate_pos_neg_fs2_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[m, 0], [-m, 0], [m, 0], [-m, 0]], size, interleaved)


def generate_dc_pos_neg_fs2_s16(size: int, interleaved: bool = False):
    m = int(_M)
    return _tile_s16([[m, m], [-m, m], [m, m], [-m, m]], size, interleaved)
