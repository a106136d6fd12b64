"""Double-float (two-f32) MXU engine: primitives + chain vs numpy f64.

The reference's double engine contract (pffft_double.c:113-145): same
API, double accuracy.  The df64 engine must land ~1e-14 relative —
f64-class, two orders past the 215 dB bound — on every factor mix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pffft_tpu as pf
from pffft_tpu.ops import df64


RNG = np.random.default_rng(7)


def test_df_from_to_f64_roundtrip():
    a = RNG.standard_normal(4096) * np.exp(RNG.uniform(-30, 30, 4096))
    h, l = df64.df_from_f64(a)
    back = df64.df_to_f64(h, l)
    assert np.abs(back - a).max() <= 2.0 ** -48 * np.abs(a).max()


def test_two_sum_exact():
    a = jnp.float32(1.0), jnp.float32(1e-8)
    s, e = df64._two_sum(a[0], a[1])
    assert float(s) + float(e) == 1.0 + float(jnp.float32(1e-8))


def test_two_prod_exact():
    a = np.float32(1.2345678)
    b = np.float32(9.8765432)
    p, e = df64._two_prod(jnp.float32(a), jnp.float32(b))
    exact = np.float64(a) * np.float64(b)
    assert abs((float(p) + float(e)) - exact) < 1e-15


def test_peel_aligned_reconstructs():
    a = RNG.standard_normal((8, 1, 64, 4))
    h, l = df64.df_from_f64(a)
    sl, sc = df64._peel_aligned(
        jnp.asarray(h), jnp.asarray(l), 2, df64.DF_CHUNKS
    )
    tot = sum(np.asarray(c, dtype=np.float64) for c in sl) * np.asarray(
        sc, dtype=np.float64
    )
    assert np.abs(tot - a).max() < 2.0 ** -45


@pytest.mark.parametrize("n", [32, 64, 160, 480, 1024])
@pytest.mark.parametrize("backward", [False, True])
def test_df64_chain_vs_numpy(n, backward):
    p = pf.new_setup(n, pf.COMPLEX, dtype=np.float64)
    z = RNG.standard_normal((3, n)) + 1j * RNG.standard_normal((3, n))
    rr = df64.df_from_f64(z.real)
    ii = df64.df_from_f64(z.imag)
    (yh, yl), (vh, vl) = df64.df64_cfft_split(
        (jnp.asarray(rr[0]), jnp.asarray(rr[1])),
        (jnp.asarray(ii[0]), jnp.asarray(ii[1])),
        p.stages,
        backward=backward,
    )
    got = df64.df_to_f64(np.asarray(yh), np.asarray(yl)) + 1j * df64.df_to_f64(
        np.asarray(vh), np.asarray(vl)
    )
    ref = np.fft.ifft(z, axis=-1) * n if backward else np.fft.fft(z, axis=-1)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-13, err


def test_df64_jit_and_grad_safe():
    """The chain must trace under jit (all consts host-side, HTTP-413
    discipline: tables ride as jit constants only at KB sizes)."""

    n = 64
    p = pf.new_setup(n, pf.COMPLEX, dtype=np.float64)
    z = RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n))
    rr = df64.df_from_f64(z.real)
    ii = df64.df_from_f64(z.imag)

    @jax.jit
    def run(a, b, c, d):
        return df64.df64_cfft_split((a, b), (c, d), p.stages, backward=False)

    (yh, yl), (vh, vl) = run(*map(jnp.asarray, (*rr, *ii)))
    got = df64.df_to_f64(np.asarray(yh), np.asarray(yl)) + 1j * df64.df_to_f64(
        np.asarray(vh), np.asarray(vl)
    )
    ref = np.fft.fft(z, axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-13
