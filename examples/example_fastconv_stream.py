"""Streaming FIR fast convolution (PFFASTCONV analog) with the native
host framer: chunked input, overlap-save, fixed-shape device batches.

Run: python examples/example_fastconv_stream.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# demo runs anywhere: force CPU (the axon TPU runtime has no complex
# dtype support for host fetches; the TPU path uses the split-format API)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pffft_tpu as pf
from pffft_tpu import runtime
from pffft_tpu.channelizer import design_lowpass


def main() -> None:
    fs = 48_000.0
    h = design_lowpass(101, cutoff=2_000.0 / fs).astype(np.float32)
    setup = pf.conv.new_setup(h)
    print(f"filterLen={setup.filter_len}  negotiated Nfft={setup.nfft} "
          f"outputs/block={setup.num_out_per_block}")

    # native ring-buffer framer: arbitrary chunks -> fixed [k, Nfft] batches
    framer = runtime.StreamFramer(frame_len=setup.nfft, hop=setup.num_out_per_block)
    print(f"framer native C++: {framer.native}")

    rng = np.random.default_rng(0)
    t = 0
    outputs = []
    for _ in range(20):  # 20 chunks of jittery size, like a soundcard callback
        chunk_len = int(rng.integers(300, 1200))
        n = np.arange(t, t + chunk_len)
        chunk = (np.sin(2 * np.pi * 1000.0 * n / fs)          # passband tone
                 + np.sin(2 * np.pi * 9000.0 * n / fs)).astype(np.float32)  # stopband
        t += chunk_len
        framer.push(chunk)
        frames = framer.frames()
        if frames.shape[0]:
            xf = pf.transform(setup.plan, jnp.asarray(frames), pf.FORWARD)
            mf = pf.zconvolve_no_accu(setup.plan, xf, setup.hf, setup.scale)
            y = np.asarray(pf.transform(setup.plan, mf, pf.BACKWARD))
            outputs.append(y[:, : setup.num_out_per_block].reshape(-1))

    y = np.concatenate(outputs)
    # the 9 kHz stopband tone should be gone
    spec = np.abs(np.fft.rfft(y[2000:2000 + 8192] * np.hanning(8192)))
    f = np.fft.rfftfreq(8192, 1 / fs)
    p1k = spec[np.argmin(np.abs(f - 1000))]
    p9k = spec[np.argmin(np.abs(f - 9000))]
    print(f"processed {y.size} samples; 1 kHz / 9 kHz power ratio: "
          f"{20*np.log10(p1k / max(p9k, 1e-12)):.1f} dB (expect > 40 dB)")

    # --- partitioned convolution: same stream, a 48000-tap 'reverb' -------
    # FastConv would need Nfft >= 2^17 (latency + memory to match the
    # filter); the frequency-domain delay line keeps latency at ONE block.
    reverb = (rng.standard_normal(48000) *
              np.exp(-np.arange(48000) / 8000.0)).astype(np.float32) * 0.05
    pc = pf.PartitionedConv(reverb, block_len=512)
    st = pc.init_state()
    x = rng.standard_normal(512 * 64).astype(np.float32)
    outs = []
    for i in range(0, x.size, 4096):  # soundcard-callback-sized pushes
        yo, st = pc.process(st, x[i : i + 4096])
        outs.append(np.asarray(yo))
    yr = np.concatenate(outs)
    ref = np.convolve(x.astype(np.float64), reverb.astype(np.float64))[: x.size]
    err = np.abs(yr - ref).max() / np.abs(ref).max()
    print(f"partitioned reverb ({pc.parts} partitions, latency "
          f"{pc.latency} samples): stream error vs np.convolve {err:.2e}")


if __name__ == "__main__":
    main()
