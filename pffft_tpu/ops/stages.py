"""Mixed-radix Stockham FFT engine as MXU tensor contractions.

This is the TPU-native replacement for the reference's SIMD radix passes
(passf2/3/4/5 and radf/radb stages, /root/reference/src/pffft_priv_impl.h:122-807).
Instead of 4-lane butterflies, each stage contracts a *factor axis* of size r
against a dense r x r DFT matrix on the MXU, preceded by an elementwise
twiddle multiply on the VPU.

Derivation (Stockham autosort, decimation in time).  Maintain the invariant
after s stages, with L = r_1...r_s completed and M = N / L remaining:

    A_s[b, k, m] = sum_{j in [L]} x[b, j*M + m] * W_L^{j*k},   W_L = e^{-2i pi/L}

so A_0 = x (L=1) and A_final[b, k, 0] = X[b, k] in canonical order (no bit
reversal).  One stage with factor r maps (L, M=r*M') -> (L*r, M'):

    A'[b, k + L*t, m'] = sum_{i in [r]} W_{Lr}^{i*k} * W_r^{i*t} * A[b, k, i*M' + m']

i.e. view A as [B, L, r, M'], multiply the stage twiddle T[k, i] = W_{Lr}^{i k},
contract the r axis with DFT_r[i, t] = W_r^{i t}, and merge t *above* k
(k' = k + L*t), which is the transpose-merge einsum 'blrm,rt->btlm'.

Ordered vs unordered output: skipping the final stage's transpose-merge
(einsum to 'bltm' instead) yields the spectrum in "internal" order --
flat index l*r_last + t holds bin t*L_last + l.  This is the TPU-native
analog of pffft's unordered z-domain layout (pffft.h:126-132): it is the
order the hardware produces for free, pointwise convolution works in it,
and zreorder (a reshape/transpose) maps to canonical order.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST  # full-f32 MXU passes; bf16 default
# would break the 140 dB dynamic-range bound of tests/test_pffft.c:52-61.


def cfft_stages(x: jax.Array, stages: Sequence, *, backward: bool, ordered: bool) -> jax.Array:
    """Run the staged complex FFT over the last axis of ``x``.

    x: [..., N] complex.  Unscaled in both directions (pffft.h:134 contract:
    backward(forward(x)) == N * x).

    Thin complex-dtype wrapper over the planar split engine (ops/split.py),
    so the complex API exercises exactly the arithmetic the TPU runs.
    """

    from . import split as _split

    re, im = _split.to_split(x)
    rr, ri = _split.cfft_stages_split(re, im, stages, backward=backward, ordered=ordered)
    return _split.from_split((rr, ri), x.dtype)


def cfft_plan(x: jax.Array, plan, *, backward: bool, ordered: bool) -> jax.Array:
    """Plan-level complex wrapper (handles the local four-step split)."""

    from . import split as _split

    re, im = _split.to_split(x)
    rr, ri = _split.cfft_plan_split(plan, re, im, backward=backward, ordered=ordered)
    return _split.from_split((rr, ri), x.dtype)


def internal_order_shape(factors: Tuple[int, ...]) -> Tuple[int, int]:
    """(L, r) view of the internal layout: internal.reshape(L, r).T.flatten()
    is canonical order.  L = product of all factors but the last, r = last."""

    if len(factors) < 2:
        return (1, int(np.prod(factors)))
    r = factors[-1]
    l = int(np.prod(factors[:-1]))
    return (l, r)


def reorder_spectrum(z: jax.Array, factors: Tuple[int, ...], to_canonical: bool) -> jax.Array:
    """Map between internal and canonical complex spectrum order.

    Analog of pffft_zreorder for the complex case (pffft_priv_impl.h:1158).
    internal[l*r + t] == canonical[t*L + l]; both directions are a cheap
    reshape/transpose that XLA fuses into neighboring ops.
    """

    l, r = internal_order_shape(factors)
    if l == 1 or r == 1:
        return z
    lead = z.shape[:-1]
    n = z.shape[-1]
    if to_canonical:
        zz = z.reshape(*lead, l, r)
        zz = jnp.swapaxes(zz, -1, -2)
    else:
        zz = z.reshape(*lead, r, l)
        zz = jnp.swapaxes(zz, -1, -2)
    return zz.reshape(*lead, n)
