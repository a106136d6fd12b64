"""Round-3 on-chip experiment 10: the transpose-free spec2 chain.

anatomy_r3.txt showed the classic Stockham loop's last stage (m=1,
"->btlm") costs 4-6 memory-pass equivalents vs 1.8 for a spectator-form
einsum.  _cfft_spec2_chain reformulates every ordered 2-stage chain as
two spectator-form einsums with zero transposed writes.  A/B with the
classic loop per size, both payload regimes, interleaved rounds.

Run:  python scripts/r3_spec2.py | tee benchmarks/results/spec2_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 6

SHAPES = [
    (1024, 8192, "archive"),
    (4096, 4096, "plateau"),
    (4096, 2048, "archive"),
    (16384, 1024, "plateau"),
    (65536, 256, "plateau"),
    (65536, 64, "archive"),
]


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
        if len([s for s in plan.stages if s.r > 1]) != 2:
            continue
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW
        k2 = max(6, min(30, (1 << 23) // batch // max(1, n // 4096)))

        def mk(spec2):
            def fn(r, i):
                sp.set_spec2(spec2)
                try:
                    return sp.cfft_plan_split(plan, r, i, backward=False, ordered=True)
                finally:
                    sp.set_spec2(True)
            return fn

        steps = [("classic", mk(False)), ("spec2", mk(True))]
        trials = {t: [] for t, _ in steps}
        for _ in range(ROUNDS):
            for t, fn in steps:
                trials[t].append(bench_op(fn, (re, im), k1=3, k2=3 + k2, repeats=2))
        wins = {t: 0 for t, _ in steps}
        for r_i in range(ROUNDS):
            w = min(trials, key=lambda t: trials[t][r_i])
            wins[w] += 1
        print(f"\n== N={n} B={batch} [{tag}] {plan.factors} "
              f"({batch*n*4/1e6:.0f} MB/plane)", flush=True)
        for t, _ in steps:
            ts = sorted(trials[t])
            med = ts[len(ts) // 2]
            print(f"  {t:8s} med {flops/med/1e9:7.1f} GF/s  solmed {sol_t/med:.3f}"
                  f"  wins {wins[t]}/{ROUNDS}  {[round(flops/x/1e9) for x in trials[t]]}",
                  flush=True)

    # carrier dynrange through spec2 at the headline shape
    n = 4096
    plan = pf.new_setup(n, pf.COMPLEX, strict=False)
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
    print(f"\nspec2 carrier dynrange N={n} {plan.factors}: {worst:.1f} dB (bound 140)",
          flush=True)


if __name__ == "__main__":
    main()
