"""Time-major transforms: FFT [time, channel] streams without transposes.

SDR capture pipelines naturally produce time-major buffers (each new
sample appends a ROW across all channels).  The batch-major API would
need a transpose in and out; `transform_ordered_split_tmajor` runs the
engine with the channel axis on the TPU's vector lanes end-to-end —
measured faster than batch-major at several sizes (`ordered_r3.txt`).

Run: python examples/example_time_major_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # demo runs anywhere

import jax.numpy as jnp  # noqa: E402

import pffft_tpu as pf  # noqa: E402


def main():
    n, channels = 4096, 64
    plan = pf.new_setup(n, pf.COMPLEX)

    # a [time, channel] capture: each channel carries a different tone
    rng = np.random.default_rng(0)
    t = np.arange(n)[:, None]
    bins = rng.integers(10, n // 2, channels)
    phase = 2 * np.pi * bins[None, :] * t / n
    re = jnp.asarray(np.cos(phase).astype(np.float32))  # [N, C]
    im = jnp.asarray(np.sin(phase).astype(np.float32))

    sr, si = pf.transform_ordered_split_tmajor(plan, (re, im), pf.FORWARD)
    mag = np.abs(np.asarray(sr) + 1j * np.asarray(si))  # [N, C]
    detected = mag.argmax(axis=0)
    assert (detected == bins).all(), (detected, bins)
    print(f"{channels} channels, all tones detected at their bins "
          f"(layout [N={n}, C={channels}], zero transposes)")

    # roundtrip, still time-major
    br, bi = pf.transform_ordered_split_tmajor(plan, (sr, si), pf.BACKWARD)
    err = float(jnp.abs(br / n - re).max())
    print(f"roundtrip max err: {err:.2e}")
    assert err < 1e-4

    # REAL capture, same layout: [N, C] real -> [N/2, C] packed planes.
    # On the TPU the half-length complex engine routes to the pallas VPU
    # kernel for real N <= 2048 (measured table; results/routed_tb_r3.txt).
    rplan = pf.new_setup(n, pf.REAL)
    x = jnp.asarray(np.cos(phase).astype(np.float32))
    rr, ri = pf.transform_ordered_split_tmajor(rplan, x, pf.FORWARD)
    rmag = np.abs(np.asarray(rr) + 1j * np.asarray(ri))
    rmag[0] = 0  # packed bin0 = DC + i*Nyquist
    assert (rmag.argmax(axis=0) == bins).all()
    back = pf.transform_ordered_split_tmajor(rplan, (rr, ri), pf.BACKWARD)
    rerr = float(jnp.abs(back / n - x).max())
    print(f"real [N, C] path: tones detected, roundtrip max err {rerr:.2e}")
    assert rerr < 1e-4


if __name__ == "__main__":
    main()
