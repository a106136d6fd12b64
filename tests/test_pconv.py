"""Uniform partitioned convolution (frequency-domain delay line) tests.

Oracle: np.convolve over the concatenated stream (float64).  Beyond
parity — the reference grows Nfft to fit the whole filter
(pffastconv_new_setup, pffastconv.c); partitioning bounds latency at one
block for arbitrarily long filters.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pffft_tpu as pf
from pffft_tpu.pconv import PartitionedConv


RNG = np.random.default_rng(99)


def _stream_ref(x, h):
    return np.convolve(np.asarray(x, np.float64),
                       np.asarray(h, np.float64))[: np.shape(x)[-1]]


@pytest.mark.parametrize("taps,block", [
    (37, 16),      # P=3, tiny
    (129, 128),    # P=2, one tap spills
    (1000, 128),   # P=8
    (4096, 256),   # P=16, exact multiple
    (100_000, 1024),  # P=98, reverb-scale
])
def test_matches_convolve_across_chunks(taps, block):
    h = RNG.standard_normal(taps).astype(np.float32)
    pc = PartitionedConv(h, block_len=block)
    x = RNG.standard_normal(8 * block).astype(np.float32)
    st = pc.init_state()
    y1, st = pc.process(st, x[: 3 * block])
    y2, st = pc.process(st, x[3 * block:])
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    ref = _stream_ref(x, h)
    assert np.abs(y - ref).max() / max(1.0, np.abs(ref).max()) < 1e-5


def test_state_continuity_vs_oneshot():
    """Chunked output must equal one-shot output bit-for-bit-ish."""

    h = RNG.standard_normal(777).astype(np.float32)
    pc = PartitionedConv(h, block_len=128)
    x = RNG.standard_normal(1280).astype(np.float32)
    yo, _ = pc.process(pc.init_state(), x)
    st = pc.init_state()
    parts = []
    for i in range(0, 1280, 256):
        yi, st = pc.process(st, x[i : i + 256])
        parts.append(np.asarray(yi))
    # chunking changes the einsum reduction order -> f32-noise-level only
    yo = np.asarray(yo)
    assert (np.abs(np.concatenate(parts) - yo).max()
            < 2e-6 * max(1.0, np.abs(yo).max()))


def test_batched_channels():
    h = RNG.standard_normal(700).astype(np.float32)
    pc = PartitionedConv(h, block_len=256)
    x = RNG.standard_normal((3, 1024)).astype(np.float32)
    y, _ = pc.process(pc.init_state((3,)), x)
    ref = np.stack([_stream_ref(r, h) for r in x])
    assert np.abs(np.asarray(y) - ref).max() / np.abs(ref).max() < 1e-5


def test_latency_and_shapes():
    pc = PartitionedConv(np.ones(5000, np.float32), block_len=512)
    assert pc.latency == 512
    assert pc.parts == -(-5000 // 512)
    sr, si, tail = pc.init_state((2,))
    assert sr.shape == (2, pc.parts - 1, pc.nfft // 2)
    assert tail.shape == (2, 512)


def test_matches_fastconv_stream():
    """Same math as the reference-style FastConv path (shifted by its
    valid-mode start): partitioned[n] == fastconv_valid[n - (L-1)]."""

    h = RNG.standard_normal(257).astype(np.float32)
    x = RNG.standard_normal(4096).astype(np.float32)
    pc = PartitionedConv(h, block_len=256)
    y, _ = pc.process(pc.init_state(), x)
    sc = pf.conv.StreamingConv(h)
    yv = np.concatenate([sc.push(x), sc.flush()])
    n_valid = len(x) - len(h) + 1
    assert np.abs(np.asarray(y)[len(h) - 1 :] - yv[:n_valid + 0][: 4096 - 256]
                  ).max() < 2e-4 * max(1.0, np.abs(yv).max())


def test_error_paths():
    with pytest.raises(ValueError, match="empty"):
        PartitionedConv([])
    with pytest.raises(ValueError, match="block_len"):
        PartitionedConv([1.0], block_len=1)
    pc = PartitionedConv(np.ones(10, np.float32), block_len=16)
    with pytest.raises(ValueError, match="multiple"):
        pc.process(pc.init_state(), np.ones(17, np.float32))
    with pytest.raises(ValueError, match="multiple"):
        pc.process(pc.init_state(), np.ones(0, np.float32))


def test_dtype_float64():
    h = RNG.standard_normal(300)
    pc = PartitionedConv(h, block_len=64, dtype="float64")
    x = RNG.standard_normal(640)
    y, _ = pc.process(pc.init_state(), x)
    ref = _stream_ref(x, h)
    assert np.abs(np.asarray(y) - ref).max() / np.abs(ref).max() < 1e-13
