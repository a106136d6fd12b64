"""STFT / spectrogram / Welch tests vs direct numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from pffft_tpu import spectral as sp


def _rng(seed=0):
    return np.random.default_rng(seed)


def _np_frames(x, n, hop):
    k = (len(x) - n) // hop + 1
    return np.stack([x[i * hop : i * hop + n] for i in range(k)])


@pytest.mark.parametrize("n,hop", [(64, 16), (64, 48), (128, 128), (96, 32)])
def test_frame_signal_matches_direct(n, hop):
    x = _rng(n + hop).standard_normal(1000).astype(np.float32)
    got = np.asarray(sp.frame_signal(jnp.asarray(x), n, hop))
    ref = _np_frames(x, n, hop)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_stft_matches_numpy():
    n_fft, hop = 128, 32
    x = _rng(1).standard_normal(2000).astype(np.float32)
    w = sp.hann(n_fft)
    got = np.asarray(sp.stft(jnp.asarray(x), n_fft, hop, w))
    fr = _np_frames(x, n_fft, hop) * w
    ref_full = np.fft.rfft(fr.astype(np.float64), axis=-1)
    packed = ref_full[:, :-1].copy()
    packed[:, 0] = ref_full[:, 0].real + 1j * ref_full[:, -1].real
    assert np.abs(got - packed).max() < 1e-3


def test_istft_reconstructs_cola():
    n_fft, hop = 128, 32  # hann @ hop n/4 is COLA
    x = _rng(2).standard_normal(4096).astype(np.float32)
    s = sp.stft(jnp.asarray(x), n_fft, hop)
    y = np.asarray(sp.istft(s, hop, length=4096))
    # interior reconstruction exact (edges lack full overlap)
    assert np.abs(y[n_fft:-n_fft] - x[n_fft : 4096 - n_fft]).max() < 1e-4


def test_spectrogram_tone():
    n_fft, hop = 256, 64
    t = np.arange(8192)
    x = np.sin(2 * np.pi * 40 * t / n_fft).astype(np.float32)  # bin 40
    p = np.asarray(sp.spectrogram(jnp.asarray(x), n_fft, hop))
    assert (p.argmax(axis=-1) == 40).all()


def test_welch_psd_white_noise_flat_and_parseval():
    n_fft = 256
    x = _rng(3).standard_normal(1 << 16).astype(np.float32)
    psd = np.asarray(sp.welch_psd(jnp.asarray(x), n_fft))
    assert psd.shape == (n_fft // 2 + 1,)
    # white noise with unit variance: flat PSD; interior bins ~2.0 with the
    # chosen normalization (one-sided doubling absorbed in packed halves)
    interior = psd[1:-1]
    assert 0.7 < interior.mean() / interior.max() < 1.3 or interior.std() / interior.mean() < 0.35


def test_welch_detects_tone_over_noise():
    n_fft = 512
    t = np.arange(1 << 15)
    x = (0.1 * _rng(4).standard_normal(t.size) + np.sin(2 * np.pi * 100 * t / n_fft)).astype(np.float32)
    psd = np.asarray(sp.welch_psd(jnp.asarray(x), n_fft))
    assert psd.argmax() == 100


# --------------------------------------------------------------------------
# Window family (scipy.signal.windows parity, periodic / sym=False)
# --------------------------------------------------------------------------

def test_windows_match_scipy():
    sw = pytest.importorskip("scipy.signal.windows")
    n = 256
    cases = {
        "hann": sw.hann, "hamming": sw.hamming, "blackman": sw.blackman,
        "blackmanharris": sw.blackmanharris, "flattop": sw.flattop,
    }
    for name, fn in cases.items():
        got = sp.get_window(name, n, np.float64)
        ref = fn(n, sym=False)
        assert np.abs(got - ref).max() < 1e-12, name
    got = sp.get_window(("kaiser", 8.6), n, np.float64)
    assert np.abs(got - sw.kaiser(n, 8.6, sym=False)).max() < 1e-12


def test_get_window_errors_and_boxcar():
    assert (sp.get_window("boxcar", 8) == 1.0).all()
    with pytest.raises(ValueError, match="unknown window"):
        sp.get_window("nope", 16)
    with pytest.raises(ValueError, match="parameterized"):
        sp.get_window(("tukey", 0.5), 16)


def test_stft_accepts_named_windows():
    x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    w = sp.get_window("blackmanharris", 512)
    s = np.asarray(sp.stft(jnp.asarray(x), 512, 128, window=w))
    # compare one frame against a direct windowed rfft (packed layout)
    frame = x[:512] * w
    full = np.fft.rfft(frame.astype(np.float64))
    packed = full[:-1].copy()
    packed[0] = full[0].real + 1j * full[-1].real
    assert np.abs(s[0] - packed).max() / np.abs(full).max() < 1e-5


@pytest.mark.parametrize("name", ["hamming", "blackman", "blackmanharris"])
def test_istft_reconstructs_with_named_windows(name):
    """Least-squares COLA normalization composes with every window."""

    x = np.random.default_rng(3).standard_normal(8192).astype(np.float32)
    w = sp.get_window(name, 512)
    s = sp.stft(jnp.asarray(x), 512, 128, window=w)
    y = np.asarray(sp.istft(s, 128, window=w))
    core = slice(512, min(len(y), 8192) - 512)
    assert np.abs(y[core] - x[core]).max() < 5e-6


def test_window_names_accepted_by_entry_points():
    x = np.random.default_rng(5).standard_normal(2048).astype(np.float32)
    a = np.asarray(sp.stft(jnp.asarray(x), 256, 64, window="blackman"))
    b = np.asarray(sp.stft(jnp.asarray(x), 256, 64, window=sp.blackman(256)))
    assert np.abs(a - b).max() == 0
    p = np.asarray(sp.welch_psd(jnp.asarray(x), 256, window=("kaiser", 10.0)))
    assert np.isfinite(p).all()


def test_stft_tmajor_route_matches_batch(monkeypatch):
    """The time-major STFT composition (TPU route) == the batch-major
    path, 1-D and batched, even/odd frame counts, hop < and == n_fft."""

    import pffft_tpu.spectral as sp

    rng = np.random.default_rng(31)
    for shape, n_fft, hop in [
        ((4000,), 256, 128),
        ((3, 2100), 128, 64),
        ((2, 2, 1500), 64, 64),
        ((1337,), 96, 48),
    ]:
        x = rng.standard_normal(shape).astype(np.float32)
        monkeypatch.setattr(sp, "_TMAJOR_STFT", False)
        br, bi = sp.stft_split(x, n_fft, hop)
        monkeypatch.setattr(sp, "_TMAJOR_STFT", True)
        tr, ti = sp.stft_split(x, n_fft, hop)
        assert tr.shape == br.shape and ti.shape == bi.shape
        np.testing.assert_allclose(np.asarray(tr), np.asarray(br), atol=2e-4)
        np.testing.assert_allclose(np.asarray(ti), np.asarray(bi), atol=2e-4)


def test_welch_rides_tmajor_route(monkeypatch):
    import pffft_tpu.spectral as sp

    rng = np.random.default_rng(33)
    x = rng.standard_normal(8192).astype(np.float32)
    monkeypatch.setattr(sp, "_TMAJOR_STFT", False)
    a = np.asarray(sp.welch_psd(x, 256))
    monkeypatch.setattr(sp, "_TMAJOR_STFT", True)
    b = np.asarray(sp.welch_psd(x, 256))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_stft_split_tmajor_layout():
    """Channel-major entry == the public stft transposed (round-5)."""

    import pffft_tpu.spectral as sp

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
    n_fft, hop = 64, 32
    sr, si = sp.stft_split(x, n_fft, hop)
    tr, ti = sp.stft_split_tmajor(x, n_fft, hop)
    assert tr.shape == (n_fft // 2, 2, sr.shape[-2])
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(tr, 0, -1)), np.asarray(sr), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(ti, 0, -1)), np.asarray(si), atol=1e-5
    )
