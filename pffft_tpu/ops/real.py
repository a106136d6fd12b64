"""Real <-> complex split steps for real transforms.

TPU-native replacement for the reference's real-FFT radix passes and
finalize/preprocess (radf/radb, FUNC_REAL_FINALIZE/PREPROCESS,
/root/reference/src/pffft_priv_impl.h:323-807,1273-1462).  Instead of real
fftpack stages we use the classic half-length complex trick, which keeps all
heavy work in the batched complex MXU engine:

forward:  z[m] = x[2m] + i x[2m+1];  Z = CFFT_{N/2}(z);
          E[k] = (Z[k] + conj(Z[H-k]))/2,  O[k] = -i/2 (Z[k] - conj(Z[H-k]))
          X[k] = E[k] + W^k O[k],  W = e^{-2i pi/N},  k = 0..N/2

Packing parity with pffft (pffft.h:144-155): the returned spectrum has
N/2 complex bins with bin0 = F(0) + i*F(N/2) (DC and Nyquist are both real).

backward is the exact algebraic inverse, unscaled so that
backward(forward(x)) = N * x (pffft.h:134).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np



def pack_real_input(x: jax.Array, cdtype) -> jax.Array:
    """[..., N] real -> [..., N/2] complex z[m] = x[2m] + i x[2m+1]."""

    lead = x.shape[:-1]
    n = x.shape[-1]
    xz = x.reshape(*lead, n // 2, 2)
    return (xz[..., 0] + 1j * xz[..., 1]).astype(cdtype)


def _set_bin0(x: jax.Array, v: jax.Array) -> jax.Array:
    """x.at[..., 0].set(v) as slice+concat (scatters serialize on TPU;
    same construction as ops/split.py:_set_bin0)."""

    return jnp.concatenate([v[..., None].astype(x.dtype), x[..., 1:]], axis=-1)


def _flip_last(z: jax.Array) -> jax.Array:
    """flip on the last axis via a [H/n2, n2] both-axes reverse for large H
    (the flat minor-axis rev serializes on the TPU backend; see
    ops/split.py:_flip_last)."""

    h = z.shape[-1]
    if h >= (1 << 15):
        for n2 in (512, 256, 1024, 128, 64):
            if h % n2 == 0:
                lead = z.shape[:-1]
                y = z.reshape(*lead, h // n2, n2)
                return y[..., ::-1, ::-1].reshape(*lead, h)
    return z[..., ::-1]


def _reverse_conj(z: jax.Array) -> jax.Array:
    """y[k] = conj(z[(H - k) mod H]) along the last axis.

    roll(flip(z), 1) built from slices+concat: [z0, z_{H-1}, .., z1]
    (the reversed_copy analog, pffft_priv_impl.h:1125 — also shuffle-free).
    """

    return jnp.conj(jnp.concatenate([z[..., 0:1], _flip_last(z)[..., :-1]], axis=-1))


def real_forward_split(Z: jax.Array, real_twiddle: np.ndarray) -> jax.Array:
    """Half-length complex spectrum Z [..., H] -> packed real spectrum [..., H].

    real_twiddle: numpy [H] = exp(-2i pi k / N), k = 0..H-1 (H = N/2).
    """

    Zc = _reverse_conj(Z)
    e = 0.5 * (Z + Zc)
    o = -0.5j * (Z - Zc)
    w = jnp.asarray(real_twiddle)
    x = e + w * o
    # bin0 packing: X[0] = Re(Z0) + Im(Z0), X[N/2] = Re(Z0) - Im(Z0)
    z0 = Z[..., 0]
    dc = jnp.real(z0) + jnp.imag(z0)
    nyq = jnp.real(z0) - jnp.imag(z0)
    return _set_bin0(x, dc + 1j * nyq)


def real_backward_split(S: jax.Array, real_twiddle: np.ndarray) -> jax.Array:
    """Packed real spectrum S [..., H] -> half-length complex spectrum Z.

    Inverse of real_forward_split scaled by 2, chosen so that running the
    unscaled complex backward engine on the result and interleaving
    (re, im) yields exactly N * x (see fft.py).
    """

    dc = jnp.real(S[..., 0])
    nyq = jnp.imag(S[..., 0])
    xa = _set_bin0(S, dc)  # X[k], k = 0..H-1 (X[0] real)
    # xb[k] = X[H - k]: xb[0] = X[H] (real Nyquist), xb[k>0] = S[H-k];
    # built directly from slices (no roll/scatter)
    xb = jnp.concatenate(
        [nyq[..., None].astype(S.dtype), _flip_last(xa)[..., :-1]], axis=-1
    )
    xbc = jnp.conj(xb)
    w = jnp.asarray(real_twiddle)
    e = xa + xbc            # 2*E[k]
    o = jnp.conj(w) * (xa - xbc)  # 2*W^k O[k] * conj(W^k) = 2*O[k]
    return e + 1j * o       # 2*Z[k]


def interleave_to_real(w: jax.Array, dtype) -> jax.Array:
    """[..., H] complex -> [..., N] real via x[2m] = Re(w), x[2m+1] = Im(w)."""

    lead = w.shape[:-1]
    h = w.shape[-1]
    out = jnp.stack([jnp.real(w), jnp.imag(w)], axis=-1)
    return out.reshape(*lead, 2 * h).astype(dtype)
