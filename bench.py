"""Driver benchmark: one JSON line on stdout.

Headline metric (BASELINE.md north star): batched complex-FFT throughput in
GFLOP/s on one TPU chip, fftw.org speed convention (5 * N * log2(N) flops
per complex transform, /root/reference/benchmarks/bench_pffft.c:606).

``vs_baseline`` is the fraction of speed-of-light: the FFT is HBM-bound, so
the bound is (bytes in + bytes out) / measured peak HBM bandwidth, where
peak bandwidth is measured with a saturating elementwise kernel on the same
arrays (the TPU analog of the reference's calibration run,
bench_pffft.c:495-530).  1.0 = the FFT costs exactly one read + one write
of its operands.

The compute path is the planar split-format engine (complex dtypes do not
exist on the TPU runtime; see pffft_tpu/ops/split.py).
"""

import json
import math
import time

import numpy as np


def _time_fn(fn, args, min_dur=0.2, max_iters=8192):
    out = fn(*args)
    for o in (out if isinstance(out, tuple) else (out,)):
        o.block_until_ready()  # warm-up / compile
    t0 = time.perf_counter()
    out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    once = time.perf_counter() - t0
    iters = max(1, min(max_iters, int(min_dur / max(once, 1e-7)) + 1))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf

    n = 4096
    batch = 2048  # planes: 2 x [2048, 4096] f32 = 64 MiB in, 64 MiB out
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    fft = jax.jit(lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD))
    # peak-bandwidth probe: one fused read+write over the same operands
    probe = jax.jit(lambda r, i: (r * 1.0000001 + i, i * 0.9999999 - r))

    t_fft = _time_fn(fft, (re, im))
    t_probe = _time_fn(probe, (re, im))

    bytes_min = 4 * batch * n * 4  # 2 planes in + 2 planes out, f32
    peak_bw = (4 * batch * n * 4) / t_probe  # probe moves the same bytes
    sol_time = bytes_min / peak_bw

    flops = 5.0 * batch * n * math.log2(n)
    gflops = flops / t_fft / 1e9

    # accuracy sanity vs numpy oracle on a slice (host fp64)
    sr, si = fft(re, im)
    got = np.asarray(sr[0]) + 1j * np.asarray(si[0])
    ref = np.fft.fft(np.asarray(re[0]).astype(np.float64) + 1j * np.asarray(im[0]).astype(np.float64))
    err = float(np.abs(got - ref).max() / np.abs(ref).max())

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": f"batched cfft N={n} B={batch} GFLOP/s ({dev.platform})",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(sol_time / t_fft, 4),
                "speed_of_light_note": "vs_baseline = fraction of HBM roofline (1.0 = one read+write at measured peak BW)",
                "measured_peak_bw_GBps": round(peak_bw / 1e9, 1),
                "ns_per_transform": round(t_fft / batch * 1e9, 1),
                "max_rel_err_vs_numpy": err,
            }
        )
    )


if __name__ == "__main__":
    main()
