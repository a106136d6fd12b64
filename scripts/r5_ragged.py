"""Round-5: ragged-batch kernel tiles on the REAL chip.

Tile-divisibility gating kept the kernel off arbitrary batches (the
non-pow2 sweep batches divide NO candidate, so every routed size fell
back to xla there — sweep_r5_non2 2400 ran 0.134 vs the kernel's 0.39).
Interpret mode confirms Mosaic-style masked edge blocks (grid =
ceil(b/tb)) give exact results; this probe checks the REAL service
compiles them and what the edge costs:

Run: python scripts/r5_ragged.py | tee benchmarks/results/ragged_r5.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 5

CASES = (
    (2400, 6990, 384),    # the non2 sweep geometry (kernel should win 3x)
    (1024, 16000, 1024),  # pow2 with a ragged batch (edge 640/1024)
    (512, 32700, 512),
)


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n, b, tb in CASES:
        plan = pf.new_setup(n, pf.COMPLEX, strict=False)
        pplan = dp._pallas_plan(plan)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        flops = 5.0 * b * n * math.log2(n)

        def forced_xla(r, i):
            dp.set_engine("xla")
            try:
                return pf.fft.transform_ordered_split_tmajor(
                    plan, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants = {
            "xla": forced_xla,
            f"pal_rag_tb{tb}": (
                lambda r, i, tb=tb: pk.cfft_pallas_tmajor(
                    pplan, r, i, tb=tb, scratch=pk.use_scratch(n, tb))),
        }

        ref = np.fft.fft(
            np.asarray(re[:, -2:]).astype(np.float64)
            + 1j * np.asarray(im[:, -2:]).astype(np.float64), axis=0)
        live = {}
        for name, fn in variants.items():
            print(f"n={n} b={b} {name}: validating...", flush=True)
            try:
                sr, si = jax.jit(fn)(re, im)
                got = (np.asarray(sr[:, -2:]).astype(np.float64)
                       + 1j * np.asarray(si[:, -2:]).astype(np.float64))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                if err > 2e-5:
                    print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                    continue
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)
        print(f"n={n} b={b} live={list(live)}", flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                try:
                    trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
                except Exception as e:
                    print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:16s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_t/med:.3f}) trials "
                  f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
