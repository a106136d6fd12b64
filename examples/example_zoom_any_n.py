"""Arbitrary-N transforms and spectral zoom (chirp-Z over the engine).

Two things the reference C library cannot do (pffft_new_setup rejects
any N that is not 2/3/5-smooth, pffft_priv_impl.h:1062-1078):

  1. transform a PRIME-length record directly — `pf.new_setup_any`
     returns a BluesteinPlan that rides the smooth MXU engine through a
     cyclic convolution;
  2. evaluate the spectrum on a FINE grid inside a narrow band
     (`pf.zoom_fft`) — m bins across 1% of the Nyquist range instead of
     wasting an enormous FFT for one narrow look.

Run: python examples/example_zoom_any_n.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # demo runs anywhere

import numpy as np

import pffft_tpu as pf


def prime_length_transform() -> None:
    n = 9973  # prime: no FFT library with a smoothness contract takes this
    plan = pf.new_setup_any(n)
    print(f"N={n}: {plan!r}")

    t = np.arange(n)
    k0 = 4211
    x = np.exp(2j * np.pi * k0 * t / n).astype(np.complex64)
    spec = np.abs(np.asarray(pf.transform_ordered(plan, x, pf.FORWARD)))
    print(f"  carrier injected at bin {k0}, detected at bin {spec.argmax()}")

    # real input of awkward length, scipy rfft convention
    xr = np.random.default_rng(0).standard_normal(1998).astype(np.float32)
    bins = pf.rfft_any(xr)
    err = np.abs(np.asarray(bins) - np.fft.rfft(xr)).max()
    print(f"  rfft_any(1998) vs np.fft.rfft max err: {err:.2e}")


def spectral_zoom() -> None:
    fs = 1.0e6  # 1 Msps capture
    n = 16384
    t = np.arange(n)
    # two tones 180 Hz apart near 200 kHz; the coarse FFT grid is 61 Hz
    f1, f2 = 200_130.0, 200_310.0
    x = (np.cos(2 * np.pi * f1 * t / fs)
         + 0.5 * np.cos(2 * np.pi * f2 * t / fs)).astype(np.float32)
    x *= np.hanning(n).astype(np.float32)  # tame rectangular sidelobes

    lo, hi, m = 199_800.0, 200_600.0, 512  # 1.6 Hz zoom grid
    spec = np.abs(np.asarray(pf.zoom_fft(x, (lo, hi), m, fs=fs)))
    grid = lo + np.arange(m) * (hi - lo) / m
    peaks = [i for i in range(1, m - 1)
             if spec[i] > spec[i - 1] and spec[i] > spec[i + 1]
             and spec[i] > spec.max() * 0.25]
    for i in peaks:
        print(f"  zoom peak at {grid[i]:,.1f} Hz (|X| = {spec[i]:.1f})")
    print(f"  (true tones: {f1:,.1f} and {f2:,.1f} Hz; "
          f"coarse FFT bin width {fs/n:,.1f} Hz, zoom grid "
          f"{(hi-lo)/m:.1f} Hz)")


if __name__ == "__main__":
    print("== prime-length transform (Bluestein) ==")
    prime_length_transform()
    print("== spectral zoom (chirp-Z) ==")
    spectral_zoom()
