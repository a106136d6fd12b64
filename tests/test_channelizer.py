"""Channelizer / DDC-chain tests (BASELINE.json composite configs #4, #5).

Oracle: direct per-channel DDC (mix -> np.convolve -> decimate) in float64,
the same slow-reference pattern as the conv tests (tests/test_pffastconv.c
slow_conv analogs, SURVEY.md §4.4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pffft_tpu.channelizer import Channelizer, DDCChain, design_lowpass


def _rng(seed=0):
    return np.random.default_rng(seed)


def _direct_channel(x, h, m, c):
    n = np.arange(x.size)
    mixed = x.astype(np.complex128) * np.exp(-2j * np.pi * c * n / m)
    return np.convolve(mixed, np.asarray(h, dtype=np.float64))


@pytest.mark.parametrize("m,p", [(8, 4), (16, 8), (12, 6)])
def test_pfb_equals_direct_ddc_bank(m, p):
    r = _rng(m * p)
    length = 16 * m
    x = (r.standard_normal(length) + 1j * r.standard_normal(length)).astype(np.complex64)
    h = design_lowpass(p * m, 0.5 / m)
    ch = Channelizer(m, p, prototype=h)
    y, _ = ch.process(ch.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (length // m, m)
    for c in range(m):
        ref = _direct_channel(x, h, m, c)[0:length:m]
        assert np.abs(y[:, c] - ref).max() < 1e-5 * max(1.0, np.abs(ref).max())


def test_pfb_streaming_continuity():
    m, p = 8, 4
    r = _rng(1)
    h = design_lowpass(p * m, 0.5 / m)
    ch = Channelizer(m, p, prototype=h)
    chunks = [
        (r.standard_normal(8 * m) + 1j * r.standard_normal(8 * m)).astype(np.complex64)
        for _ in range(3)
    ]
    st = ch.init_state()
    outs = []
    for c in chunks:
        y, st = ch.process(st, jnp.asarray(c))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=0)
    xall = np.concatenate(chunks)
    for c in range(m):
        ref = _direct_channel(xall, h, m, c)[0 : xall.size : m]
        assert np.abs(got[:, c] - ref).max() < 1e-5


def test_pfb_batched_channels():
    m, p = 8, 4
    r = _rng(2)
    x = (r.standard_normal((3, 8 * m)) + 1j * r.standard_normal((3, 8 * m))).astype(np.complex64)
    ch = Channelizer(m, p)
    y, _ = ch.process(ch.init_state((3,)), jnp.asarray(x))
    y0, _ = ch.process(ch.init_state(), jnp.asarray(x[0]))
    np.testing.assert_allclose(np.asarray(y)[0], np.asarray(y0), atol=1e-6)


def test_pfb_tone_lands_in_its_channel():
    """A tone at channel-c center must concentrate in channel c."""

    m, p = 16, 8
    ch = Channelizer(m, p)
    c = 5
    n = np.arange(64 * m)
    x = np.exp(2j * np.pi * c * n / m).astype(np.complex64)
    y, _ = ch.process(ch.init_state(), jnp.asarray(x))
    power = np.abs(np.asarray(y))[16:]  # skip warm-up frames
    mean_power = power.mean(axis=0)
    assert mean_power[c] > 0.9
    others = np.delete(mean_power, c)
    assert others.max() < 0.02 * mean_power[c]


def test_ddc_chain_matches_direct():
    r = _rng(3)
    length = 4096
    x = (r.standard_normal(length) + 1j * r.standard_normal(length)).astype(np.complex64)
    h = design_lowpass(63, 0.1)
    rate = 0.11
    dd = DDCChain(rate, h, decim=4)
    y, _ = dd.process(dd.init_state(), jnp.asarray(x))
    n = np.arange(length)
    mixed = x.astype(np.complex128) * np.exp(2j * np.pi * rate * n)
    ref = np.convolve(mixed, h.astype(np.float64))[:length:4]
    assert np.abs(np.asarray(y) - ref).max() < 2e-5


def test_ddc_chain_streaming_continuity():
    r = _rng(4)
    h = design_lowpass(33, 0.1)
    dd = DDCChain(0.07, h, decim=2)
    chunks = [
        (r.standard_normal(512) + 1j * r.standard_normal(512)).astype(np.complex64)
        for _ in range(3)
    ]
    st = dd.init_state()
    outs = []
    for c in chunks:
        y, st = dd.process(st, jnp.asarray(c))
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    xall = np.concatenate(chunks)
    n = np.arange(xall.size)
    mixed = xall.astype(np.complex128) * np.exp(2j * np.pi * 0.07 * n)
    ref = np.convolve(mixed, h.astype(np.float64))[: xall.size : 2]
    assert np.abs(got - ref).max() < 2e-5


def test_process_split_matches_complex():
    """Planar channelizer step (the TPU path) == complex-dtype step."""

    m, p = 16, 4
    ch = Channelizer(m, p)
    r = _rng(21)
    x = (r.standard_normal((2, 8 * m)) + 1j * r.standard_normal((2, 8 * m))).astype(np.complex64)
    yc, stc = ch.process(ch.init_state((2,)), jnp.asarray(x))
    (yr, yi), sts = ch.process_split(
        ch.init_state((2,)), jnp.real(jnp.asarray(x)), jnp.imag(jnp.asarray(x))
    )
    np.testing.assert_allclose(np.asarray(yr), np.real(np.asarray(yc)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yi), np.imag(np.asarray(yc)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sts.hist_re), np.real(np.asarray(stc.hist_re)), atol=0)


def test_oversampled_channelizer_matches_direct():
    """V-times oversampled PFB == direct DDC decimated by M/V."""

    from pffft_tpu.channelizer import OversampledChannelizer

    m, p, v = 16, 4, 4
    h = design_lowpass(p * m, 0.5 / m)
    ch = OversampledChannelizer(m, v, p, prototype=h)
    r = _rng(31)
    length = 8 * m
    x = (r.standard_normal(length) + 1j * r.standard_normal(length)).astype(np.complex64)
    y, st = ch.process(ch.init_state(), jnp.asarray(x))
    y = np.asarray(y)
    hop = m // v
    assert y.shape == (length // hop, m)
    for c in range(m):
        ref = _direct_channel(x, h, m, c)[0:length:hop]
        assert np.abs(y[: len(ref), c] - ref).max() < 1e-5

    # streaming continuity
    x2 = (r.standard_normal(length) + 1j * r.standard_normal(length)).astype(np.complex64)
    y2, _ = ch.process(st, jnp.asarray(x2))
    y2 = np.asarray(y2)
    xall = np.concatenate([x, x2])
    for c in range(m):
        ref = _direct_channel(xall, h, m, c)[length : 2 * length : hop]
        assert np.abs(y2[: len(ref), c] - ref).max() < 1e-5


def test_oversampled_requires_divisor():
    from pffft_tpu.channelizer import OversampledChannelizer

    with pytest.raises(ValueError):
        OversampledChannelizer(16, 3)


def test_tmajor_fft_route_matches_batch_major(monkeypatch):
    """The round-4 time-major FFT route inside the channelizer (riding
    the dispatched kernel at M in the routed band) must produce the same
    channels as the batch-major path."""

    monkeypatch.setenv("PFFFT_TPU_CHAN_TMAJOR", "1")
    rng = np.random.default_rng(17)
    ch = Channelizer(16, 4)
    x = (rng.standard_normal(16 * 32) + 1j * rng.standard_normal(16 * 32)).astype(
        np.complex64
    )
    y_t = np.asarray(ch.one_shot(x))
    monkeypatch.setenv("PFFFT_TPU_CHAN_TMAJOR", "0")
    ch2 = Channelizer(16, 4)
    y_b = np.asarray(ch2.one_shot(x))
    np.testing.assert_allclose(y_t, y_b, atol=1e-4 * max(1.0, np.abs(y_b).max()))


class TestTmajorRoute:
    """Round-5 time-major polyphase: [M, ..., K] frames built directly
    (one stream transpose), vs the batch-major reference composition."""

    @pytest.mark.parametrize("m,p,lead", [(16, 4, ()), (32, 8, (3,)),
                                          (20, 3, (2,))])
    def test_matches_batch_major(self, m, p, lead, monkeypatch):
        rng = np.random.default_rng(11)
        ch = Channelizer(m, p)
        x = (rng.standard_normal((*lead, 6 * m))
             + 1j * rng.standard_normal((*lead, 6 * m))).astype(np.complex64)
        monkeypatch.setenv("PFFFT_TPU_CHAN_TMAJOR", "1")
        y_t, st_t = ch.process(ch.init_state(lead), jnp.asarray(x))
        monkeypatch.setenv("PFFFT_TPU_CHAN_TMAJOR", "0")
        y_b, st_b = ch.process(ch.init_state(lead), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_b),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(st_t.hist_re),
                                   np.asarray(st_b.hist_re))

    def test_tmajor_entry_layout(self, monkeypatch):
        monkeypatch.setenv("PFFFT_TPU_CHAN_TMAJOR", "1")
        rng = np.random.default_rng(12)
        m, k = 16, 8
        ch = Channelizer(m, 4)
        xr = jnp.asarray(rng.standard_normal(k * m).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(k * m).astype(np.float32))
        (yr, yi), _ = ch.process_split_tmajor(ch.init_state(()), xr, xi)
        assert yr.shape == (m, k)
        (br, bi), _ = ch.process_split(ch.init_state(()), xr, xi)
        np.testing.assert_allclose(np.asarray(yr.T), np.asarray(br),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(yi.T), np.asarray(bi),
                                   atol=1e-5)
