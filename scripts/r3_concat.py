"""Round-3 on-chip experiment 5: the lane-concat contraction form.

MXU padding law: an f32 (HIGHEST = 6 bf16 passes) matmul contracts 128
lanes per pass, so a K=r<128 Gauss stage pads its 3 matmuls to K=128.
The lane-concat form [ar|ai] @ [[Wr,Wi],[-Wi,Wr]] does the whole complex
contraction in ONE K=2r matmul — for r <= 64 that is 3x less padded MXU
work per stage, and per-stage cost becomes ~constant in r, so all-64
chains replace fat chains as the predicted optimum:

    predicted ceiling (bf16 168 TF/s, 6 passes, padded-K accounting):
      N=4096  (64,64)   gauss 0.36 SoL -> concat 1.07
      N=65536 (256,256) gauss 0.21     -> (64,64,16) concat 0.71

This script interleaves gauss vs auto(concat) per size group (paired
trials under near-identical service contention), plus carrier dynrange
checks for the concat form on-chip.

Run:  python scripts/r3_concat.py | tee benchmarks/results/concat_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
TOTAL = 1 << 22
ROUNDS = 8

# per size: (tag, factors, cmul_mode)
GROUPS = {
    256: [("g_256", (256,), "gauss"), ("c_16x16", (16, 16), "auto"),
          ("c_64x4", (64, 4), "auto")],
    512: [("g_32x16", (32, 16), "gauss"), ("c_32x16", (32, 16), "auto"),
          ("c_64x8", (64, 8), "auto")],
    1024: [("g_64x16", (64, 16), "gauss"), ("c_64x16", (64, 16), "auto"),
           ("c_32x32", (32, 32), "auto")],
    2048: [("g_64x32", (64, 32), "gauss"), ("c_64x32", (64, 32), "auto")],
    4096: [("g_64x64", (64, 64), "gauss"), ("c_64x64", (64, 64), "auto")],
    8192: [("g_128x64", (128, 64), "gauss"), ("c_64x64x2", (64, 64, 2), "auto"),
           ("a_128x64", (128, 64), "auto")],
    16384: [("g_128x128", (128, 128), "gauss"), ("c_64x64x4", (64, 64, 4), "auto"),
            ("a_128x128", (128, 128), "auto")],
    32768: [("g_256x128", (256, 128), "gauss"), ("c_64x64x8", (64, 64, 8), "auto")],
    65536: [("g_256x256", (256, 256), "gauss"), ("c_64x64x16", (64, 64, 16), "auto"),
            ("a_256x256", (256, 256), "auto")],
    131072: [("g_128^2x8", (128, 128, 8), "gauss"), ("c_64^2x32", (64, 64, 32), "auto")],
    262144: [("g_128^2x16", (128, 128, 16), "gauss"), ("c_64x64x64", (64, 64, 64), "auto")],
    1048576: [("g_256^2x16", (256, 256, 16), "gauss"), ("c_64^3x4", (64, 64, 64, 4), "auto"),
              ("c_64^2x256", (256, 64, 64), "auto")],
}


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or sorted(GROUPS)

    for n in sizes:
        cands = GROUPS[n]
        batch = max(8, TOTAL // n)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW

        steps = []
        for tag, factors, mode in cands:
            plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)

            def fn(r, i, p=plan, m=mode):
                sp.set_cmul_mode(m)
                try:
                    return sp.cfft_plan_split(p, r, i, backward=False, ordered=True)
                finally:
                    sp.set_cmul_mode(None)

            steps.append((tag, fn))

        trials = {tag: [] for tag, _ in steps}
        for _ in range(ROUNDS):
            for tag, fn in steps:
                trials[tag].append(bench_op(fn, (re, im), k1=4, k2=40, repeats=2))

        wins = {tag: 0 for tag, _ in steps}
        for r_i in range(ROUNDS):
            w = min(trials, key=lambda t: trials[t][r_i])
            wins[w] += 1
        print(f"\n== N={n} B={batch} ({ROUNDS} interleaved rounds)", flush=True)
        for tag, _ in steps:
            ts = sorted(trials[tag])
            best, med = ts[0], ts[len(ts) // 2]
            print(f"  {tag:12s} med {flops/med/1e9:7.1f} GF/s  best {flops/best/1e9:7.1f}"
                  f"  solmed {sol_t/med:.3f}  wins {wins[tag]}/{ROUNDS}  "
                  f"{[round(flops/t/1e9) for t in trials[tag]]}", flush=True)

    # --- carrier dynrange, concat form on-chip ---------------------------
    for n, factors in ((4096, (64, 64)), (65536, (64, 64, 16))):
        plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
        sp.set_cmul_mode("auto")
        try:
            worst = 1e9
            for k in (1, n // 3, n - 7):
                ph = 2 * np.pi * k * np.arange(n) / n
                cr = jnp.asarray(np.cos(ph).astype(np.float32))[None]
                ci = jnp.asarray(np.sin(ph).astype(np.float32))[None]
                sr, si = jax.jit(
                    lambda r, i: sp.cfft_plan_split(plan, r, i, backward=False, ordered=True)
                )(cr, ci)
                mag = np.abs(np.asarray(sr)[0] + 1j * np.asarray(si)[0])
                side = np.partition(mag, -2)[-2]
                worst = min(worst, 20 * np.log10(mag.max() / max(side, 1e-30)))
            print(f"\nconcat carrier dynrange N={n} {factors}: {worst:.1f} dB (bound 140)",
                  flush=True)
        finally:
            sp.set_cmul_mode(None)


if __name__ == "__main__":
    main()
