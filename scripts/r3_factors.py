"""Round-3 on-chip experiment 1: the stage-factor matrix.

Hypothesis (from the round-2 numbers): the engine is MXU-bound by the
HIGHEST-precision 6-pass penalty.  Per-stage MXU time scales with the
stage factor r (f32-equiv flops per element per stage = 6 Gauss-matmul
flops * r), so a single fat stage (N=512 dense) sits at its MXU roofline
(~0.2 of the HBM-defined SoL) and 2-stage (256,256) chains at N=65536 cap
at ~0.21.  Thinner chains trade MXU work for extra passes — on this
backend (optimistic memory timing, real MXU timing) they should win.

This script measures a matrix of explicit factor chains per size and
prints CSV rows; the winners become the round-3 plan policy + tune
candidates.

Run:  python scripts/r3_factors.py [--quick] | tee benchmarks/results/factors_r3.csv
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9

# total f32 elements per plane held ~constant so every row moves the same
# payload (64 MB / plane pair at 8M elements)
TOTAL = 1 << 23

CONFIGS = {
    256: [(256,), (16, 16), (32, 8), (64, 4)],
    512: [(512,), (32, 16), (64, 8), (128, 4), (8, 8, 8)],
    1024: [(32, 32), (64, 16), (128, 8), (256, 4), (16, 8, 8)],
    2048: [(64, 32), (128, 16), (256, 8), (16, 16, 8)],
    4096: [(64, 64), (128, 32), (256, 16), (16, 16, 16), (32, 16, 8)],
    8192: [(128, 64), (256, 32), (512, 16), (32, 16, 16), (64, 32, 4)],
    16384: [(128, 128), (256, 64), (32, 32, 16), (64, 16, 16), (64, 64, 4)],
    32768: [(256, 128), (512, 64), (32, 32, 32), (64, 32, 16), (128, 16, 16)],
    65536: [(256, 256), (512, 128), (64, 64, 16), (64, 32, 32), (128, 128, 4), (16, 16, 16, 16)],
    131072: [(512, 256), (64, 64, 32), (128, 64, 16), (128, 128, 8), (32, 32, 16, 8)],
    262144: [(512, 512), (64, 64, 64), (128, 128, 16), (256, 64, 16), (32, 32, 32, 8)],
    1048576: [(128, 128, 64), (256, 256, 16), (256, 128, 32), (64, 64, 64, 4), (128, 64, 32, 4)],
}


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"# backend={dev.platform} device={dev}", flush=True)
    print("n,batch,factors,gflops_best,gflops_med,sol_best,sol_med,us_best,"
          "mxu_bound_gf,trials_gf", flush=True)
    rng = np.random.default_rng(0)

    sizes = sorted(CONFIGS)
    if quick:
        sizes = [512, 4096, 65536]

    # measured chip MXU peak (CLAUDE.md): 168 TF/s bf16; HIGHEST = 6 passes,
    # Gauss = 3 real matmuls per complex contraction
    MXU_BF16 = 168e12

    for n in sizes:
        batch = max(4, TOTAL // n)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW
        configs = list(CONFIGS[n])
        policy = pf.new_setup(n, pf.COMPLEX, strict=False)  # current default
        if policy.local_split is not None:
            configs.append("policy-split")
        for factors in configs:
            if factors == "policy-split":
                plan, fstr = policy, f"split{policy.factors[0]}x{policy.factors[1]}"
                sum_r = sum(policy.factors)  # approx: sub-chains add more
            else:
                try:
                    plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
                except ValueError as e:
                    print(f"# skip {n} {factors}: {e}", flush=True)
                    continue
                fstr = "x".join(map(str, factors))
                sum_r = sum(factors)
            # nominal MXU roofline for this chain: 36 * sum_r bf16 flops/elem
            mxu_t = 36.0 * batch * n * sum_r / MXU_BF16
            fft = lambda r, i, p=plan: pf.fft.transform_ordered_split(p, (r, i), pf.FORWARD)
            ts = []
            stale = 0
            while len(ts) < (3 if quick else 8):
                t = bench_op(fft, (re, im), k1=4, k2=20, repeats=2)
                improved = not ts or t < min(ts) * 0.98
                ts.append(t)
                stale = 0 if improved else stale + 1
                if stale >= 2 and len(ts) >= (2 if quick else 4):
                    break
            best, med = min(ts), sorted(ts)[len(ts) // 2]
            print(
                f"{n},{batch},{fstr},{flops/best/1e9:.1f},{flops/med/1e9:.1f},"
                f"{sol_t/best:.3f},{sol_t/med:.3f},{best*1e6:.1f},"
                f"{flops/mxu_t/1e9:.0f},"
                f"\"{[round(flops/t/1e9) for t in ts]}\"",
                flush=True,
            )


if __name__ == "__main__":
    main()
