"""Driver benchmark: one JSON line on stdout.

Headline metric (BASELINE.md north star): batched complex-FFT throughput in
GFLOP/s on one TPU chip, fftw.org speed convention (5 * N * log2(N) flops
per complex transform, /root/reference/benchmarks/bench_pffft.c:606).

Three public configurations are measured and the one with the best MEDIAN
speed-of-light fraction is the headline (all are fully recorded):

  * batch-major N=4096 B=2048 through ``transform_ordered_split`` — the
    round-1/2 headline shape (XLA dense-stage engine);
  * time-major N=1024 B=16384 through ``transform_ordered_split_tmajor``
    — the measured-dispatch route to the pallas VPU radix kernel
    (routed_tb_r3.txt: 8/8 interleaved wins, median 0.29 SoL);
  * time-major N=256 B=65536 — the kernel's best size under the per-N
    tile policy (tb=1024; median 0.85 SoL, routed_tb_r3.txt).

``vs_baseline`` is the MEDIAN-of-trials fraction of speed-of-light: the
bound is (bytes in + bytes out) at the v5e spec HBM bandwidth — 1.0 = the
FFT costs exactly one read + one write of its operands at spec bandwidth.
Median (not best-of-N) per the round-2 review: this backend's per-trial
throughput varies 2-4x under service contention with physically
impossible highs, making best-of a lucky-window statistic.

Timing uses benchmarks/timing.py (device-side loop chaining + forced fetch
+ two-point slope): the TPU runtime defers execution, so naive dispatch
timing is invalid.

The compute path is the planar split-format engine (complex dtypes do not
exist on the TPU runtime; see pffft_tpu/ops/split.py) with the
backend-tuned stage policy, behind the measured engine dispatcher
(ops/dispatch.py).
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"))

SPEC_BW_V5E = 819e9


def _backend_reachable(timeout_s: float = 240.0, attempts: int = 2) -> bool:
    """Probe device availability in a subprocess.

    When the axon tunnel is down, ``jax.devices()`` HANGS indefinitely
    instead of erroring (CLAUDE.md); an unguarded bench would then hang
    the driver's round-end run.  When the tunnel is up, devices() returns
    in seconds — the generous timeout + retry makes a false negative
    (recording an outage while the chip was actually fine) implausible.
    """

    import subprocess

    for _ in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    quick = "--quick" in sys.argv

    if not _backend_reachable():
        print(json.dumps({
            "metric": "cfft_gflops", "value": 0.0, "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "error": "backend unreachable: jax.devices() timed out twice "
                     "(axon tunnel outage — see CLAUDE.md); no measurement",
        }))
        return

    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op, measure_peak_bw

    rng = np.random.default_rng(0)
    max_trials = 3 if quick else 12
    k1, k2 = (2, 10) if quick else (4, 40)

    def measure(name, n, batch, fn, data):
        trials = []
        while len(trials) < max_trials:
            trials.append(bench_op(fn, data, k1=k1, k2=k2))
        t_med = sorted(trials)[len(trials) // 2]
        t_best = min(trials)
        flops = 5.0 * batch * n * math.log2(n)
        sol_time = 4 * batch * n * 4 / SPEC_BW_V5E  # 2 planes in + 2 out, f32
        return {
            "config": name,
            "n": n,
            "batch": batch,
            "gflops_med": round(flops / t_med / 1e9, 2),
            "vs_baseline_med": round(sol_time / t_med, 4),
            "gflops_best": round(flops / t_best / 1e9, 2),
            "vs_baseline_best": round(sol_time / t_best, 4),
            "ns_per_transform": round(t_med / batch * 1e9, 1),
            "trial_gflops": [round(flops / t / 1e9, 1) for t in trials],
        }

    # config 1: batch-major N=4096 (round-1/2 headline shape)
    n1, b1 = 4096, (1024 if quick else 2048)
    plan1 = pf.new_setup(n1, pf.COMPLEX)
    re1 = jnp.asarray(rng.standard_normal((b1, n1)).astype(np.float32))
    im1 = jnp.asarray(rng.standard_normal((b1, n1)).astype(np.float32))
    fft1 = lambda r, i: pf.fft.transform_ordered_split(plan1, (r, i), pf.FORWARD)

    # config 2: time-major N=1024 at plateau payload (pallas-routed on TPU)
    n2, b2 = 1024, (4096 if quick else 16384)
    plan2 = pf.new_setup(n2, pf.COMPLEX)
    re2 = jnp.asarray(rng.standard_normal((n2, b2)).astype(np.float32))
    im2 = jnp.asarray(rng.standard_normal((n2, b2)).astype(np.float32))
    fft2 = lambda r, i: pf.fft.transform_ordered_split_tmajor(plan2, (r, i), pf.FORWARD)

    # config 3: time-major N=256 at plateau payload — the pallas VPU
    # kernel's best measured size with the per-N tile policy (tb=1024;
    # routed_tb_r3.txt: median 0.85 SoL, 6/8 interleaved wins vs xla)
    n3, b3 = 256, (16384 if quick else 65536)
    plan3 = pf.new_setup(n3, pf.COMPLEX)
    re3 = jnp.asarray(rng.standard_normal((n3, b3)).astype(np.float32))
    im3 = jnp.asarray(rng.standard_normal((n3, b3)).astype(np.float32))
    fft3 = lambda r, i: pf.fft.transform_ordered_split_tmajor(plan3, (r, i), pf.FORWARD)

    # HBM roofline baseline: the TPU v5e spec bandwidth.  A fixed constant
    # (not a measured probe) so vs_baseline is comparable across rounds —
    # this backend's memory-probe timings vary several-fold run to run
    # (see CLAUDE.md).  The measured probe is still reported as info.
    peak_bw = measure_peak_bw(128 << 20 if quick else 512 << 20)

    res1 = measure("batch-major xla", n1, b1, fft1, (re1, im1))
    res2 = measure("time-major dispatched", n2, b2, fft2, (re2, im2))
    res3 = measure("time-major dispatched", n3, b3, fft3, (re3, im3))
    head = max((res1, res2, res3), key=lambda r: r["vs_baseline_med"])

    # accuracy sanity vs numpy oracle on one transform of each config
    sr, si = jax.jit(fft1)(re1, im1)
    got = np.asarray(sr[0]).astype(np.float64) + 1j * np.asarray(si[0]).astype(np.float64)
    ref = np.fft.fft(
        np.asarray(re1[0]).astype(np.float64) + 1j * np.asarray(im1[0]).astype(np.float64)
    )
    err1 = float(np.abs(got - ref).max() / np.abs(ref).max())
    tr, ti = jax.jit(fft2)(re2, im2)
    got2 = np.asarray(tr[:, 0]).astype(np.float64) + 1j * np.asarray(ti[:, 0]).astype(np.float64)
    ref2 = np.fft.fft(
        np.asarray(re2[:, 0]).astype(np.float64) + 1j * np.asarray(im2[:, 0]).astype(np.float64)
    )
    err2 = float(np.abs(got2 - ref2).max() / np.abs(ref2).max())
    ur, ui = jax.jit(fft3)(re3, im3)
    got3 = np.asarray(ur[:, 0]).astype(np.float64) + 1j * np.asarray(ui[:, 0]).astype(np.float64)
    ref3 = np.fft.fft(
        np.asarray(re3[:, 0]).astype(np.float64) + 1j * np.asarray(im3[:, 0]).astype(np.float64)
    )
    err3 = float(np.abs(got3 - ref3).max() / np.abs(ref3).max())

    dev = jax.devices()[0]
    print(
        json.dumps(
            {
                "metric": (
                    f"batched cfft N={head['n']} B={head['batch']} "
                    f"[{head['config']}] GFLOP/s median-of-{max_trials} ({dev.platform})"
                ),
                "value": head["gflops_med"],
                "unit": "GFLOP/s",
                "vs_baseline": head["vs_baseline_med"],
                "speed_of_light_note": "vs_baseline = MEDIAN-of-trials fraction of the TPU v5e spec HBM roofline (819 GB/s): 1.0 = one read+write of the operands at spec bandwidth.  The 2-pass XLA engines bound at 0.5; the single-pass pallas kernel at 1.0.  Headline = the best median of the three public configs; all recorded under 'configs'.",
                "configs": [res1, res2, res3],
                "measured_probe_bw_GBps": round(peak_bw / 1e9, 1),
                "plan_factors": {"batch_major": list(plan1.factors), "time_major": list(plan2.factors), "time_major_256": list(plan3.factors)},
                "max_rel_err_vs_numpy": {"batch_major": err1, "time_major": err2, "time_major_256": err3},
            }
        )
    )


if __name__ == "__main__":
    main()
