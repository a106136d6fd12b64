"""JAX functional transforms compose through the engine.

The TPU-first design promise (ARCHITECTURE.md §1): transforms are pure
jittable functions of their inputs, so jit / vmap / grad / checkpoint all
apply — the capability a C library cannot offer and a framework must.
"""

import numpy as np
import jax
import jax.numpy as jnp

import pffft_tpu as pf


def test_vmap_over_plans_batch():
    plan = pf.new_setup(256, pf.COMPLEX)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((5, 256)) + 1j * rng.standard_normal((5, 256))).astype(np.complex64)
    direct = pf.transform_ordered(plan, jnp.asarray(x))
    vmapped = jax.vmap(lambda v: pf.transform_ordered(plan, v))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(vmapped), np.asarray(direct), atol=1e-3)


def test_grad_through_fft_is_adjoint():
    """d/dx Re<c, FFT(x)> == Re(adjoint(FFT) c) == Re(IFFT_unscaled(c))
    for the unscaled DFT (a linear map; its JVP/VJP are exact)."""

    n = 128
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = np.random.default_rng(1)
    c = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    cj = jnp.asarray(c)

    def loss(re, im):
        z = jax.lax.complex(re, im)
        s = pf.transform_ordered(plan, z)
        return jnp.sum(jnp.real(s * jnp.conj(cj)))

    x = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(n).astype(np.float32)
    gr, gi = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    # adjoint of the unscaled forward DFT = unscaled backward (conjugate
    # transpose); gradient wrt re is Re(backward(c)), wrt im is Im(...)
    adj = np.asarray(pf.transform_ordered(plan, cj, pf.BACKWARD))
    np.testing.assert_allclose(np.asarray(gr), adj.real, rtol=0, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gi), adj.imag, rtol=0, atol=2e-2)


def test_jit_checkpoint_compose():
    plan = pf.new_setup(512, pf.REAL)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 512)).astype(np.float32))

    @jax.jit
    def f(v):
        s = pf.transform_ordered(plan, v)
        return jnp.sum(jnp.abs(s) ** 2)

    g = jax.jit(jax.checkpoint(lambda v: f(v) * 2.0))
    assert np.isfinite(float(g(x)))
    # Parseval (unscaled forward): sum |X|^2 over the packed real spectrum
    # equals N * sum x^2 with DC/Nyquist unpacked; just check jit==nojit
    s1 = float(f(x))
    s2 = float(jnp.sum(jnp.abs(pf.transform_ordered(plan, x)) ** 2))
    assert abs(s1 - s2) < 1e-2 * abs(s2)


def test_grad_through_fastconv_filter():
    """Differentiate a loss wrt the INPUT through the conv pipeline (the
    'trainable front-end' use): gradients flow through framing + spectral
    multiply + inverse."""

    from pffft_tpu import conv as pfc

    rng = np.random.default_rng(3)
    h = rng.standard_normal(33).astype(np.float32)
    s = pfc.FastConv(h)
    x = rng.standard_normal(1024).astype(np.float32)
    tgt = rng.standard_normal(1024 - 33 + 1).astype(np.float32)

    def loss(v):
        y = s._conv_stream(v, tgt.shape[0])
        return jnp.mean((y - jnp.asarray(tgt)) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    assert g.shape == (1024,)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference spot check
    i = 100
    eps = 1e-2
    xp = x.copy(); xp[i] += eps
    xm = x.copy(); xm[i] -= eps
    fd = (loss(jnp.asarray(xp)) - loss(jnp.asarray(xm))) / (2 * eps)
    assert abs(float(fd) - float(g[i])) < 5e-3 * max(1.0, abs(float(fd)))


def test_transform_ordered_split_tmajor():
    """Public time-major split transform: [N, B] planes, no transposes,
    matches the batch-major path and numpy; REAL plans take a single
    real array forward (a planar tuple there is a ValueError)."""

    import jax.numpy as jnp
    import numpy as np
    import pffft_tpu as pf
    import pytest

    n, b = 768, 8
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = np.random.default_rng(21)
    x = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    rt = jnp.asarray(np.float32(x.real).T.copy())
    it = jnp.asarray(np.float32(x.imag).T.copy())
    sr, si = pf.transform_ordered_split_tmajor(plan, (rt, it), pf.FORWARD)
    got = np.asarray(sr).T + 1j * np.asarray(si).T
    ref = np.fft.fft(x)
    assert np.abs(got - ref).max() < 1e-3 * np.abs(ref).max()
    br, bi = pf.transform_ordered_split_tmajor(plan, (sr, si), pf.BACKWARD)
    assert np.abs(np.asarray(br).T / n - x.real).max() < 1e-4
    with pytest.raises(ValueError):
        pf.transform_ordered_split_tmajor(pf.new_setup(n, pf.REAL), (rt, it))
    with pytest.raises(ValueError):
        pf.transform_ordered_split_tmajor(plan, (rt.T, it.T))
