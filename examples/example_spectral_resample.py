"""Spectral analysis + resampling: STFT waterfall and rate conversion.

Run: python examples/example_spectral_resample.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pffft_tpu import spectral, resample  # noqa: E402


def main() -> None:
    fs = 8000.0
    t = np.arange(int(fs * 2)) / fs
    # chirp from 500 Hz to 2 kHz + a steady 3 kHz tone
    chirp = np.sin(2 * np.pi * (500 * t + (1500 / 4.0) * t**2))
    x = (chirp + 0.5 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)

    p = np.asarray(spectral.spectrogram(jnp.asarray(x), n_fft=256, hop=64))
    print(f"spectrogram: {p.shape} (frames x bins)")
    # the steady tone sits at bin 3000/8000*256 = 96 in every frame
    assert (p[:, 90:102].max(axis=1) > 0.1 * p.max()).all()

    psd = np.asarray(spectral.welch_psd(jnp.asarray(x), n_fft=512))
    peak_hz = psd.argmax() * fs / 512
    print(f"welch PSD peak near {peak_hz:.0f} Hz")

    y = np.asarray(resample.resample(jnp.asarray(x), up=3, down=2))
    print(f"resampled 8 kHz -> 12 kHz: {x.shape[-1]} -> {y.shape[-1]} samples")
    spec = np.abs(np.fft.rfft(y[1000:1000 + 8192] * np.hanning(8192)))
    f = np.fft.rfftfreq(8192, 2.0 / (3.0 * fs))
    print(f"3 kHz tone recovered at {f[np.argmax(spec * (f > 2500))]:.0f} Hz")


if __name__ == "__main__":
    main()
