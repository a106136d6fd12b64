"""Round-3 experiment 14: inter-stage materialization barrier in the engine.

The channelizer decomposition (chan_decomp_r3.txt) found composing an
elementwise producer with the engine's contractions costs ~2.7x the sum
of the parts.  The engine's own stage loop has the same pattern
internally: the stage twiddle (elementwise) feeds the next stage's
einsum.  A/B: PFFFT_TPU_STAGE_BARRIER forces one materialization after
each twiddle.  Interleaved rounds at honest >=64 MB/plane payloads.

Run:  python scripts/r3_stage_barrier.py | tee benchmarks/results/stage_barrier_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import math

import numpy as np

ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n, batch in ((4096, 4096), (65536, 256), (1048576, 16)):
        plan = pf.new_setup(n, pf.COMPLEX)
        print(f"\n== N={n} B={batch} factors={plan.factors} "
              f"({batch * n * 4 / 1e6:.0f} MB/plane)", flush=True)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

        if plan.local_split is not None:
            print("  (local-split plan: skipping — chain-only probe)", flush=True)
            continue

        def mk(barrier):
            def step(r, i):
                split.set_stage_barrier(barrier)
                try:
                    return split.cfft_stages_split(
                        r, i, plan.stages, backward=False, ordered=True
                    )
                finally:
                    split.set_stage_barrier(False)

            return step

        s_off, s_on = mk(False), mk(True)
        # correctness: barrier must be numerics-neutral on-chip
        a = jax.jit(s_off)(re, im)
        b = jax.jit(s_on)(re, im)
        d = max(float(jnp.abs(a[0] - b[0]).max()), float(jnp.abs(a[1] - b[1]).max()))
        print(f"  on-vs-off max abs diff {d:.2e}", flush=True)

        trials = {"off": [], "on": []}
        for _ in range(ROUNDS):
            trials["off"].append(bench_op(s_off, (re, im), k1=2, k2=8, repeats=2))
            trials["on"].append(bench_op(s_on, (re, im), k1=2, k2=8, repeats=2))
        fl = 5.0 * batch * n * math.log2(n)
        for tag in ("off", "on"):
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"  barrier_{tag:3s} med {fl/med/1e9:7.1f} GF/s  "
                  f"{[round(fl/v/1e9) for v in trials[tag]]}", flush=True)


if __name__ == "__main__":
    main()
