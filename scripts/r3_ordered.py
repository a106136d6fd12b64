"""Round-3 on-chip experiment 8: what the ordered-output pass costs.

At the reproducible plateau payload, compare per size: ordered vs
unordered (internal z-layout) vs time-major ordered, plus fp64 rows for
the archive.  If unordered is materially faster at the plateau, the
zconvolve pipelines (which stay in internal layout) run that much above
the sweep's ordered numbers, and the ordered finalize is the next
fusion target.

Run:  python scripts/r3_ordered.py | tee benchmarks/results/ordered_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 6

SHAPES = [(4096, 4096), (65536, 256)]


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n, batch in SHAPES:
        plan = pf.new_setup(n, pf.COMPLEX, strict=False)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        ret = jnp.asarray(np.asarray(re).T.copy())
        imt = jnp.asarray(np.asarray(im).T.copy())
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW

        steps = [
            ("ordered", lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD), (re, im)),
            ("unordered", lambda r, i: pf.fft.transform_split(plan, (r, i), pf.FORWARD), (re, im)),
            ("tmajor", lambda r, i: pf.fft.transform_ordered_split_tmajor(plan, (r, i), pf.FORWARD), (ret, imt)),
        ]
        trials = {t: [] for t, _, _ in steps}
        k2 = max(6, min(24, (1 << 23) // batch // max(1, n // 4096)))
        for _ in range(ROUNDS):
            for t, fn, data in steps:
                trials[t].append(bench_op(fn, data, k1=3, k2=3 + k2, repeats=2))
        wins = {t: 0 for t, _, _ in steps}
        for r_i in range(ROUNDS):
            w = min(trials, key=lambda t: trials[t][r_i])
            wins[w] += 1
        print(f"\n== N={n} B={batch} {plan.factors} ({batch*n*4/1e6:.0f} MB/plane)", flush=True)
        for t, _, _ in steps:
            ts = sorted(trials[t])
            med = ts[len(ts) // 2]
            print(f"  {t:10s} med {flops/med/1e9:7.1f} GF/s  solmed {sol_t/med:.3f}"
                  f"  wins {wins[t]}/{ROUNDS}  {[round(flops/x/1e9) for x in trials[t]]}",
                  flush=True)

    # fp64 archive row (reference instantiates double; soft-float on this
    # backend — archived so the capability has a measured number)
    jax.config.update("jax_enable_x64", True)
    try:
        n, batch = 4096, 64
        plan = pf.new_setup(n, pf.COMPLEX, dtype="float64")
        re = jnp.asarray(rng.standard_normal((batch, n)))
        im = jnp.asarray(rng.standard_normal((batch, n)))
        fn = lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
        ts = sorted(bench_op(fn, (re, im), k1=2, k2=6) for _ in range(3))
        flops = 5.0 * batch * n * math.log2(n)
        print(f"\nfp64 cfft N={n} B={batch}: {flops/ts[1]/1e9:.1f} GF/s med", flush=True)
    finally:
        jax.config.update("jax_enable_x64", False)


if __name__ == "__main__":
    main()
