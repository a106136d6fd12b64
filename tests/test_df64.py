"""Double-float (two-f32) MXU engine: primitives + chain vs numpy f64.

The reference's double engine contract (pffft_double.c:113-145): same
API, double accuracy — the carrier-test bound is 215 dB (~1.8e-11
relative).  The default slice budget (TAU=6, measured 239-242 dB on
chip at N=4096..262144, df64{b,c}_r5.txt) clears it with ~24 dB margin;
TAU=7 is the ~281 dB high-accuracy mode (PFFFT_TPU_DF64_TAU=7).
Default-budget tests assert a 234 dB bound (2e-12); the tau=7 tests
assert the f64-class 1e-13.
"""

import contextlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pffft_tpu as pf
from pffft_tpu.ops import df64


RNG = np.random.default_rng(7)


@contextlib.contextmanager
def _budget(tau, chunks):
    old = df64.TAU, df64.DF_CHUNKS
    df64.TAU, df64.DF_CHUNKS = tau, chunks
    try:
        yield
    finally:
        df64.TAU, df64.DF_CHUNKS = old


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


@pytest.mark.parametrize("chunks,bound", [(6, 2.0 ** -38), (7, 2.0 ** -45)])
def test_peel_aligned_reconstructs(chunks, bound):
    a = RNG.standard_normal((8, 1, 64, 4))
    h, l = df64.df_from_f64(a)
    sl, sc = df64._peel_aligned(jnp.asarray(h), jnp.asarray(l), 2, chunks)
    tot = sum(np.asarray(c, dtype=np.float64) for c in sl) * np.asarray(
        sc, dtype=np.float64
    )
    assert np.abs(tot - a).max() < bound


@pytest.mark.parametrize("n", [32, 64, 160, 480, 1024])
@pytest.mark.parametrize("backward", [False, True])
@pytest.mark.parametrize("tau,bound", [(6, 2e-12), (7, 1e-13)])
def test_df64_chain_vs_numpy(n, backward, tau, bound):
    with _budget(tau, tau):
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
    assert err < bound, err


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
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-12
