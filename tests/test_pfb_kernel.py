"""Pallas sliding-window PFB FIR kernel vs the XLA multiply-accumulate chain.

The SIMD-self-validation pattern (SURVEY.md §4): the hand kernel must
match the engine it replaces to f32 ulp scale, in interpret mode, on
every supported shape class.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pffft_tpu.ops import pfb_kernel


def _xla_chain(rows, wt, k):
    p = wt.shape[0]
    acc = rows[..., 0:k, :] * wt[0]
    for s in range(1, p):
        acc = acc + rows[..., s : s + k, :] * wt[s]
    return acc


@pytest.mark.parametrize(
    "k,p,m,lead",
    [
        (16, 8, 128, ()),
        (64, 8, 256, (3,)),
        (24, 4, 384, (2, 2)),
        (128, 12, 128, (1,)),
        (8, 1, 128, ()),
    ],
)
def test_interpret_matches_chain(k, p, m, lead):
    rng = np.random.default_rng(k * 1000 + p * 10 + m)
    q = k + p - 1 + rng.integers(0, 3)  # extra tail rows must be ignored
    rows = jnp.asarray(rng.standard_normal((*lead, q, m)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((p, m)).astype(np.float32))
    got = pfb_kernel.pfb_fir(rows, wt, k, interpret=True)
    want = _xla_chain(rows, wt, k)
    assert got.shape == want.shape
    # interpret mode may fuse/associate the FMAs differently than the
    # XLA chain; require agreement to f32 ulp scale, not bitwise
    scale = float(np.abs(np.asarray(want)).max())
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=4e-6 * max(scale, 1.0), rtol=0
    )


def test_supported_gates():
    assert pfb_kernel.supported(1024, 8, 4096, np.float32)
    assert not pfb_kernel.supported(1024, 8, 4096, np.float64)  # dtype
    assert not pfb_kernel.supported(1024, 8, 100, np.float32)  # lanes
    # VMEM budget: a huge K strip must be rejected, not compiled
    assert not pfb_kernel.supported(1 << 20, 8, 4096, np.float32)


def test_rows_too_short_raises():
    rows = jnp.zeros((10, 128), jnp.float32)
    wt = jnp.zeros((8, 128), jnp.float32)
    with pytest.raises(ValueError, match="K \\+ P - 1"):
        pfb_kernel.pfb_fir(rows, wt, 16, interpret=True)


def test_channelizer_env_routing(monkeypatch):
    """PFFFT_TPU_PFB=pallas routes _polyphase through the kernel on TPU
    only; on CPU the flag is ignored (default path, results identical)."""

    from pffft_tpu.channelizer import Channelizer

    ch = Channelizer(128, 4)
    monkeypatch.setenv("PFFFT_TPU_PFB", "pallas")
    assert not ch._use_pfb_kernel(16)  # CPU backend -> XLA chain
    monkeypatch.setenv("PFFFT_TPU_PFB", "xla")
    assert not ch._use_pfb_kernel(16)
