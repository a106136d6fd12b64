"""Driver benchmark: one JSON line on stdout.

Headline metric (BASELINE.md north star): batched complex-FFT throughput in
GFLOP/s on one TPU chip, fftw.org speed convention (5 * N * log2(N) flops
per complex transform, /root/reference/benchmarks/bench_pffft.c:606).

The HEADLINE comes from the north-star band N=1024-65536 ONLY (round-3
judge: an out-of-band config must not stand in for the band target):
the best MEDIAN speed-of-light fraction among the IN-BAND configs is
reported as ``value``/``vs_baseline``; every config — including the
out-of-band small-N showcase — is fully recorded under ``configs``.

  * time-major N=1024/2048/4096 through the measured dispatch — the
    single-HBM-pass Pallas radix kernel at the per-N tile policy
    (round 4 unlocked the band: the Mosaic scoped-VMEM limit raise +
    the scratch ping-pong chain, benchmarks/results/vmem_r4.txt,
    scratch_r4.txt);
  * batch-major N=4096 B=2048 — the XLA dense-stage engine (info);
  * time-major N=256 B=65536 — the kernel's best out-of-band size
    (tb=1024; median 0.85 SoL, routed_tb_r3.txt) (info).

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
    # headline shapes get LONGER windows (>= ~100-150 ms at the measured
    # rate) and interleaved re-trials: the round-4 headline showed a 2.7x
    # trial spread inside one window (BENCH_r04 1777-4717 GF/s) — the gap
    # between builder windows (0.895) and driver capture (0.777) was
    # variance, not engine (VERDICT r4 weak #3/next #3)
    k1_band, k2_band = (2, 10) if quick else (16, 160)

    def warm(fn, data):
        # EAGER warmup first: the wall-tile compile-retry fallback
        # (fft.py:_call_tmajor_fallback) only catches remote-compile
        # errors when the transform executes eagerly — under bench_op's
        # outer jit the inner call inlines and an unlucky wall-tile
        # failure would crash the whole driver bench.  One eager call
        # resolves the tile (recording any failure) before timing.
        out = fn(*data)
        jax.block_until_ready(out)

    def result(name, n, batch, trials):
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

    def measure(name, n, batch, fn, data):
        warm(fn, data)
        trials = []
        while len(trials) < max_trials:
            trials.append(bench_op(fn, data, k1=k1, k2=k2))
        return result(name, n, batch, trials)

    def measure_band(configs):
        """Round-robin the in-band configs' trials across the whole
        window so every config sees the same service conditions (the
        headline is their max — a lucky/throttled streak for one config
        must not decide it)."""

        for _, _, _, fn, data in configs:
            warm(fn, data)
        trials = [[] for _ in configs]
        for _ in range(max_trials):
            for i, (_, _, _, fn, data) in enumerate(configs):
                trials[i].append(bench_op(fn, data, k1=k1_band, k2=k2_band))
        return [
            result(f"time-major dispatched N={n} (in-band)", n, b, ts)
            for (n, b, _, _, _), ts in zip(configs, trials)
        ]

    def tmajor_cfg(n, b):
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        fn = lambda r, i, p=plan: pf.fft.transform_ordered_split_tmajor(
            p, (r, i), pf.FORWARD)
        return plan, fn, (re, im)

    # in-band configs (the 1024-65536 north-star band): time-major through
    # the measured dispatch = the single-pass Pallas kernel per-N tiles at
    # the front, the measured upper-band engine (kern2/xla) behind it
    band = []
    band_shapes = ((1024, 16384), (2048, 8192), (4096, 4096))
    if not quick:
        band_shapes += ((8192, 2048), (16384, 1024), (32768, 512),
                        (65536, 256))
    for n, b in band_shapes:
        if quick:
            b //= 4
        band.append((n, b) + tmajor_cfg(n, b))

    # info config: batch-major N=4096 (XLA dense-stage engine)
    n1, b1 = 4096, (1024 if quick else 2048)
    plan1 = pf.new_setup(n1, pf.COMPLEX)
    re1 = jnp.asarray(rng.standard_normal((b1, n1)).astype(np.float32))
    im1 = jnp.asarray(rng.standard_normal((b1, n1)).astype(np.float32))
    fft1 = lambda r, i: pf.fft.transform_ordered_split(plan1, (r, i), pf.FORWARD)

    # info config: time-major N=256 — the kernel's best OUT-OF-BAND size
    n3, b3 = 256, (16384 if quick else 65536)
    plan3, fft3, data3 = tmajor_cfg(n3, b3)

    # HBM roofline baseline: the TPU v5e spec bandwidth.  A fixed constant
    # (not a measured probe) so vs_baseline is comparable across rounds —
    # this backend's memory-probe timings vary several-fold run to run
    # (see CLAUDE.md).  The measured probe is still reported as info.
    peak_bw = measure_peak_bw(128 << 20 if quick else 512 << 20)

    band_res = measure_band(band)
    res1 = measure("batch-major xla (info)", n1, b1, fft1, (re1, im1))
    res3 = measure("time-major dispatched N=256 (out-of-band info)",
                   n3, b3, fft3, data3)
    # headline: best median among IN-BAND configs only
    head = max(band_res, key=lambda r: r["vs_baseline_med"])

    # accuracy sanity vs numpy oracle on one transform of each config
    def rel_err_tmajor(fn, re, im):
        tr, ti = jax.jit(fn)(re, im)
        got = (np.asarray(tr[:, 0]).astype(np.float64)
               + 1j * np.asarray(ti[:, 0]).astype(np.float64))
        ref = np.fft.fft(
            np.asarray(re[:, 0]).astype(np.float64)
            + 1j * np.asarray(im[:, 0]).astype(np.float64)
        )
        return float(np.abs(got - ref).max() / np.abs(ref).max())

    errs = {}
    for n, b, _, fn, data in band:
        errs[f"tmajor_{n}"] = rel_err_tmajor(fn, *data)
    sr, si = jax.jit(fft1)(re1, im1)
    got = np.asarray(sr[0]).astype(np.float64) + 1j * np.asarray(si[0]).astype(np.float64)
    ref = np.fft.fft(
        np.asarray(re1[0]).astype(np.float64) + 1j * np.asarray(im1[0]).astype(np.float64)
    )
    errs["batch_major_4096"] = float(np.abs(got - ref).max() / np.abs(ref).max())
    errs["tmajor_256"] = rel_err_tmajor(fft3, *data3)

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
                "speed_of_light_note": "vs_baseline = MEDIAN-of-trials fraction of the TPU v5e spec HBM roofline (819 GB/s): 1.0 = one read+write of the operands at spec bandwidth.  The 2-pass XLA engines bound at 0.5; the single-pass pallas kernel at 1.0.  Headline = best median among the IN-BAND (N=1024-65536) configs; out-of-band and batch-major configs are info rows under 'configs'.",
                "configs": band_res + [res1, res3],
                "measured_probe_bw_GBps": round(peak_bw / 1e9, 1),
                "plan_factors": {
                    **{f"tmajor_{n}": list(p.factors) for n, _, p, _, _ in band},
                    "batch_major_4096": list(plan1.factors),
                    "tmajor_256": list(plan3.factors),
                },
                "max_rel_err_vs_numpy": errs,
            }
        )
    )


if __name__ == "__main__":
    main()
