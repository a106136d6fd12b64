"""Round-4: verify the band routing (VMEM-limit raise + scratch chain) end-to-end on the chip.

Races the PUBLIC dispatched time-major transform (which routes to the
pallas kernel at N=128-4096 (+8192 scratch) with the measured tile) against the
forced-xla path, interleaved rounds at plateau payloads, plus on-chip
correctness vs numpy.

Run: python scripts/r4_routed.py | tee benchmarks/results/routed_tb_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 8


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from timing import bench_op

    rng = np.random.default_rng(0)
    from pffft_tpu.ops import pallas_fft as pk

    for n in (1024, 2048, 4096, 8192):
        b = (64 << 20) // (4 * n)
        b -= b % pk.tb_candidates(n)[0]  # align to the preferred tile
        tb = pk.best_tb(n, b)
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

        routed = lambda r, i, p=plan: pf.fft.transform_ordered_split_tmajor(
            p, (r, i), pf.FORWARD)

        def forced_xla(r, i, p=plan):
            dp.set_engine("xla")
            try:
                return pf.fft.transform_ordered_split_tmajor(p, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        # on-chip correctness of the routed path (first 4 columns)
        sr, si = jax.jit(routed)(re, im)
        got = (np.asarray(sr[:, :4]).astype(np.float64)
               + 1j * np.asarray(si[:, :4]).astype(np.float64))
        ref = np.fft.fft(
            np.asarray(re[:, :4]).astype(np.float64)
            + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        err = float(np.abs(got - ref).max() / np.abs(ref).max())
        eng = dp.select_engine(plan, b, True)
        print(f"n={n} b={b} tb={tb} routed-engine={eng}: rel err {err:.2e}",
              flush=True)
        if err > 1e-5:
            print(f"n={n}: MISMATCH — skipping timing", flush=True)
            continue

        trials = {"routed": [], "xla": []}
        for _ in range(ROUNDS):
            trials["routed"].append(bench_op(routed, (re, im), k1=4, k2=20))
            trials["xla"].append(bench_op(forced_xla, (re, im), k1=4, k2=20))
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        wins = sum(1 for tr, tx in zip(trials["routed"], trials["xla"]) if tr < tx)
        for name in ("routed", "xla"):
            ts = sorted(trials[name])
            med = ts[len(ts) // 2]
            print(f"  {name:7s} med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in trials[name]]}", flush=True)
        print(f"  routed wins {wins}/{ROUNDS}", flush=True)


if __name__ == "__main__":
    main()
