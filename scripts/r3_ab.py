"""Round-3 on-chip experiment 4: interleaved A/B finals.

The factor matrix (factors_r3.csv) and layout probe (tmajor_r3.csv) ran
each config as a sequential block, so hour-scale service drift pollutes
cross-config comparisons.  This script round-robins ALL candidates, one
trial each per round, for R rounds — paired trials under near-identical
contention — and reports per-round wins plus medians.  Candidates: the
matrix winners for the headline and the contested sizes.

Run:  python scripts/r3_ab.py | tee benchmarks/results/ab_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
TOTAL = 1 << 22  # smaller payload: more rounds per minute, same slope method


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    GROUPS = {
        512: [("bm_512", (512,), "bm"), ("bm_32x16", (32, 16), "bm"),
              ("bm_64x8", (64, 8), "bm"), ("tm_32x16", (32, 16), "tm")],
        1024: [("bm_32x32", (32, 32), "bm"), ("bm_64x16", (64, 16), "bm"),
               ("tm_32x32", (32, 32), "tm")],
        4096: [("bm_64x64", (64, 64), "bm"), ("bm_128x32", (128, 32), "bm"),
               ("tm_64x64", (64, 64), "tm")],
        65536: [("bm_256x256", (256, 256), "bm"), ("tm_256x256", (256, 256), "tm"),
                ("bm_128x128x4", (128, 128, 4), "bm")],
    }
    ROUNDS = 10

    for n, cands in GROUPS.items():
        batch = max(8, TOTAL // n)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        ret = jnp.asarray(np.asarray(re).T.copy())
        imt = jnp.asarray(np.asarray(im).T.copy())
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW

        steps = []
        for tag, factors, layout in cands:
            plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
            if layout == "bm":
                fn = lambda r, i, p=plan: sp.cfft_plan_split(
                    p, r, i, backward=False, ordered=True)
                steps.append((tag, fn, (re, im)))
            else:
                fn = lambda r, i, p=plan: sp.cfft_stages_split_tmajor(
                    r, i, p.stages, backward=False, ordered=True)
                steps.append((tag, fn, (ret, imt)))

        trials = {tag: [] for tag, _, _ in steps}
        for _ in range(ROUNDS):
            for tag, fn, data in steps:
                trials[tag].append(bench_op(fn, data, k1=4, k2=40, repeats=2))

        wins = {tag: 0 for tag, _, _ in steps}
        for r_i in range(ROUNDS):
            w = min(trials, key=lambda t: trials[t][r_i])
            wins[w] += 1
        print(f"\n== N={n} B={batch} ({ROUNDS} interleaved rounds)", flush=True)
        for tag, _, _ in steps:
            ts = sorted(trials[tag])
            best, med = ts[0], ts[len(ts) // 2]
            print(f"  {tag:16s} med {flops/med/1e9:7.1f} GF/s  best {flops/best/1e9:7.1f}"
                  f"  solmed {sol_t/med:.3f}  wins {wins[tag]}/{ROUNDS}  "
                  f"{[round(flops/t/1e9) for t in trials[tag]]}", flush=True)


if __name__ == "__main__":
    main()
