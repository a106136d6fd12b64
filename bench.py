"""Driver benchmark: one JSON line on stdout.

Headline metric (BASELINE.md north star): batched complex-FFT throughput in
GFLOP/s on one TPU chip, fftw.org speed convention (5 * N * log2(N) flops
per complex transform, /root/reference/benchmarks/bench_pffft.c:606).

``vs_baseline`` is the MEDIAN-of-trials fraction of speed-of-light: the
bound is (bytes in + bytes out) at the v5e spec HBM bandwidth — 1.0 = the
FFT costs exactly one read + one write of its operands at spec bandwidth.
The engine's 2-stage chain makes (at least) 2 memory passes, so the
pass-count roofline is 0.5; the MXU roofline with the lane-concat
contraction (6 bf16 passes, K=128 full-array) is ~1.07 at this shape, so
HBM passes are the binding bound.  Median (not best-of-N) per the round-2
review: this backend's per-trial throughput varies 2-4x under service
contention with physically impossible highs, making best-of a
lucky-window statistic.

Timing uses benchmarks/timing.py (device-side loop chaining + forced fetch
+ two-point slope): the TPU runtime defers execution, so naive dispatch
timing is invalid.

The compute path is the planar split-format engine (complex dtypes do not
exist on the TPU runtime; see pffft_tpu/ops/split.py) with the
backend-tuned stage policy (plan.default_max_factor: dense 64-point MXU
stages on TPU — measured 153 dB carrier-test dynamic range, above the
reference's 140 dB bound).
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))


def main():
    quick = "--quick" in sys.argv

    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op, measure_peak_bw

    n = 4096
    batch = 1024 if quick else 2048
    plan = pf.new_setup(n, pf.COMPLEX)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    # HBM roofline baseline: the TPU v5e spec bandwidth.  A fixed constant
    # (not a measured probe) so vs_baseline is comparable across rounds —
    # this backend's memory-probe timings vary several-fold run to run
    # (see CLAUDE.md).  The measured probe is still reported as info.
    SPEC_BW_V5E = 819e9
    peak_bw = measure_peak_bw(128 << 20 if quick else 512 << 20)

    fft = lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
    # Fixed trial count, MEDIAN reported as the headline (value /
    # vs_baseline): this backend's throughput varies ~2-4x between trials
    # (service contention) and also produces physically impossible highs,
    # so best-of-N is a lucky-window statistic (round-2 VERDICT.md).  The
    # median of a fixed N is robust in both directions; every trial is
    # recorded so regressions are distinguishable from contention.
    trials = []
    max_trials = 3 if quick else 12
    while len(trials) < max_trials:
        trials.append(
            bench_op(fft, (re, im), k1=2 if quick else 4, k2=10 if quick else 40)
        )
    t_fft = sorted(trials)[len(trials) // 2]
    t_best = min(trials)

    bytes_min = 4 * batch * n * 4  # 2 planes in + 2 planes out, f32
    sol_time = bytes_min / SPEC_BW_V5E
    flops = 5.0 * batch * n * math.log2(n)
    gflops = flops / t_fft / 1e9

    # accuracy sanity vs numpy oracle on one row (host fp64)
    sr, si = jax.jit(fft)(re, im)
    got = np.asarray(sr[0]).astype(np.float64) + 1j * np.asarray(si[0]).astype(np.float64)
    ref = np.fft.fft(
        np.asarray(re[0]).astype(np.float64) + 1j * np.asarray(im[0]).astype(np.float64)
    )
    err = float(np.abs(got - ref).max() / np.abs(ref).max())

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": f"batched cfft N={n} B={batch} GFLOP/s median-of-{len(trials)} ({dev.platform})",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(sol_time / t_fft, 4),
                "speed_of_light_note": "vs_baseline = MEDIAN-of-trials fraction of the TPU v5e spec HBM roofline (819 GB/s): 1.0 = one read+write of the operands at spec bandwidth.  The 2-stage engine makes 2 memory passes, so the pass-count bound is 0.5; best-of-trials is also reported (lucky-window upper bound).",
                "best_gflops": round(flops / t_best / 1e9, 2),
                "best_vs_baseline": round(sol_time / t_best, 4),
                "measured_probe_bw_GBps": round(peak_bw / 1e9, 1),
                "ns_per_transform": round(t_fft / batch * 1e9, 1),
                "trial_gflops": [round(flops / t / 1e9, 1) for t in trials],
                "plan_factors": list(plan.factors),
                "max_rel_err_vs_numpy": err,
            }
        )
    )


if __name__ == "__main__":
    main()
