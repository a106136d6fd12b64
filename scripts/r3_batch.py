"""Round-3 on-chip experiment 6: throughput vs batch payload.

Every archived sweep holds ~32 MiB/plane; this varies the batch at fixed
N to find where per-dispatch overhead amortizes and whether the medians
keep rising with payload (guides the documented "feed at least X MiB"
advice and bench.py's shape).  Interleaved rounds across batches per N.

Run:  python scripts/r3_batch.py | tee benchmarks/results/batch_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 6

CONFIGS = {
    4096: [256, 1024, 4096, 16384],
    65536: [16, 64, 256, 1024],
}


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n, batches in CONFIGS.items():
        plan = pf.new_setup(n, pf.COMPLEX, strict=False)
        steps = []
        for b in batches:
            re = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
            im = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
            fn = lambda r, i, p=plan: pf.fft.transform_ordered_split(p, (r, i), pf.FORWARD)
            steps.append((b, fn, (re, im)))

        trials = {b: [] for b, _, _ in steps}
        for _ in range(ROUNDS):
            for b, fn, data in steps:
                # keep the device-side work window roughly constant across
                # batch sizes so slope quality is comparable
                k2 = max(8, min(80, (1 << 22) // (b * n // 4096)))
                trials[b].append(bench_op(fn, data, k1=4, k2=4 + k2, repeats=2))

        print(f"\n== N={n} factors={plan.factors} ({ROUNDS} rounds)", flush=True)
        for b, _, _ in steps:
            flops = 5.0 * b * n * math.log2(n)
            sol_t = 4 * b * n * 4 / SPEC_BW
            ts = sorted(trials[b])
            best, med = ts[0], ts[len(ts) // 2]
            print(f"  B={b:6d} ({b*n*4/1e6:7.1f} MB/plane)  med {flops/med/1e9:7.1f} GF/s"
                  f"  solmed {sol_t/med:.3f}  best_sol {sol_t/best:.3f}  "
                  f"{[round(flops/t/1e9) for t in trials[b]]}", flush=True)


if __name__ == "__main__":
    main()
