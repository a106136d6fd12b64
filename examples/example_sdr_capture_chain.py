"""End-to-end SDR capture chain: bytes -> planar f32 -> DDC -> spectrum.

Demonstrates the round-2 host-runtime pieces together:
  * native sample-format converters (u8 offset-binary IQ -> planar f32),
  * the streaming DDC chain (mixer + lowpass fast-conv + decimate),
  * plan serialization (save once, restore bit-identical, no recompute).

Runs on CPU or TPU (planar path only).
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    # host-side demo: the DDC convenience API is complex-dtype (the TPU
    # backend has no complex dtypes; use the planar split APIs on-chip)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu import runtime as rt
    from pffft_tpu.channelizer import DDCChain, design_lowpass
    from pffft_tpu.plan import load_plan, save_plan

    rng = np.random.default_rng(0)

    # --- 1. a fake RTL-SDR-style capture: u8 offset-binary interleaved IQ
    n = 1 << 16
    tone = 0.21  # cycles/sample
    t = np.arange(n)
    iq = 0.4 * np.exp(2j * np.pi * tone * t) + 0.02 * (
        rng.standard_normal(n) + 1j * rng.standard_normal(n)
    )
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.round(iq.real * 127 + 127.4), 0, 255).astype(np.uint8)
    raw[1::2] = np.clip(np.round(iq.imag * 127 + 127.4), 0, 255).astype(np.uint8)

    re, im = rt.convert_cu8_planar_f32(raw)  # native single-pass converter
    print(f"converted {raw.size} bytes -> planar f32 ({'native' if rt.HAVE_NATIVE else 'numpy'})")

    # --- 2. DDC: shift the tone to DC, lowpass, decimate by 8
    decim = 8
    h = design_lowpass(129, 0.5 / decim)
    ddc = DDCChain(-tone, h, decim=decim)
    y, _ = ddc.process(ddc.init_state(), jnp.asarray(re) + 1j * jnp.asarray(im))
    y = np.asarray(y)
    print(f"DDC out: {y.shape[0]} samples at fs/{decim}")

    # --- 3. spectrum of the decimated baseband via a serialized plan
    m = 4096
    plan = pf.new_setup(m, pf.COMPLEX)
    buf = io.BytesIO()
    save_plan(plan, buf)
    buf.seek(0)
    plan2 = load_plan(buf)  # restore without recompute; bit-identical tables
    seg = y[: m]
    spec = np.asarray(pf.transform_ordered(plan2, jnp.asarray(seg.astype(np.complex64))))
    peak = np.abs(spec).argmax()
    freq = (peak if peak < m // 2 else peak - m) / m
    print(f"peak bin {peak} -> {freq:+.4f} cycles/sample (expect ~0: tone moved to DC)")
    assert abs(freq) < 0.01
    print("ok")


if __name__ == "__main__":
    main()
