"""Round-3 on-chip experiment 7: the stacked-channel (cstack) chain engine.

batch_r3.txt established the payload law: working sets >= 64 MB/plane
sit on a stable +-1% memory-bound plateau (the backend's optimistic
memory timing only inflates small payloads).  That plateau is pass-
bound, and the cstack engine (ops/split.py:_cfft_stages_split_cstack)
reduces a k-stage chain to exactly k HBM passes — no concat/slice
relayout, no stack/unstack (first/last stages consume/emit the separate
planes directly).  Predicted plateau gain ~1.5-2x over auto/gauss.

Measures interleaved medians in BOTH regimes (plateau payload + the
32 MB archive payload) for modes {auto, cstack, gauss, 4mul}.

Run:  python scripts/r3_cstack.py | tee benchmarks/results/cstack_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 6

# (n, batch, tag)
SHAPES = [
    (4096, 4096, "plateau"),
    (4096, 2048, "archive"),
    (16384, 1024, "plateau"),
    (65536, 256, "plateau"),
    (65536, 64, "archive"),
    (262144, 64, "plateau"),
]
MODES = ["auto", "cstack", "gauss", "4mul"]


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n, batch, tag in SHAPES:
        plan = pf.new_setup(n, pf.COMPLEX, strict=False)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW
        k2 = max(6, min(40, (1 << 23) // batch // (n // 4096)))

        steps = []
        for mode in MODES:
            def fn(r, i, p=plan, m=mode):
                sp.set_cmul_mode(m)
                try:
                    return sp.cfft_plan_split(p, r, i, backward=False, ordered=True)
                finally:
                    sp.set_cmul_mode(None)

            steps.append((mode, fn))

        trials = {m: [] for m, _ in steps}
        for _ in range(ROUNDS):
            for m, fn in steps:
                trials[m].append(bench_op(fn, (re, im), k1=3, k2=3 + k2, repeats=2))

        wins = {m: 0 for m, _ in steps}
        for r_i in range(ROUNDS):
            w = min(trials, key=lambda t: trials[t][r_i])
            wins[w] += 1
        print(f"\n== N={n} B={batch} [{tag}] {plan.factors} "
              f"({batch*n*4/1e6:.0f} MB/plane, {ROUNDS} rounds)", flush=True)
        for m, _ in steps:
            ts = sorted(trials[m])
            best, med = ts[0], ts[len(ts) // 2]
            print(f"  {m:7s} med {flops/med/1e9:7.1f} GF/s  solmed {sol_t/med:.3f}"
                  f"  best_sol {sol_t/best:.3f}  wins {wins[m]}/{ROUNDS}  "
                  f"{[round(flops/t/1e9) for t in trials[m]]}", flush=True)

    # accuracy: cstack carrier dynrange on-chip at the headline shape
    n = 4096
    plan = pf.new_setup(n, pf.COMPLEX, strict=False)
    sp.set_cmul_mode("cstack")
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
        print(f"\ncstack carrier dynrange N={n} {plan.factors}: {worst:.1f} dB (bound 140)",
              flush=True)
    finally:
        sp.set_cmul_mode(None)


if __name__ == "__main__":
    main()
