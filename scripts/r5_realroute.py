"""Round-5: why did real tmajor N>=16384 halve when kern2 was routed?

sweep_r5_real_tmajor: 16384/32768/65536 = 0.065/0.062/0.063 vs r4's
0.135/0.115/0.104 (xla engine at H).  Pure complex kern2 wins 1.5-1.7x,
so something about the REAL composition hurts: the pack's lane-slice
input forcing a materialization before the pallas pass, the BACKWARD
kern2, or the fwd+bwd pair interaction.  This probe isolates: per
engine (xla/kern2) x {cplx fwd, cplx bwd, real fwd, real bwd, real pair}
at H=8192 / N=16384, interleaved.

Run: python scripts/r5_realroute.py | tee benchmarks/results/realroute_r5.txt
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


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from timing import bench_op

    rng = np.random.default_rng(0)
    n = 16384
    h = n // 2
    b = 1024

    rplan = pf.new_setup(n, pf.REAL)
    cplan = pf.new_setup(h, pf.COMPLEX)
    x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    sol_c = 4 * b * h * 4 / SPEC_BW  # complex H planes, 1 rd + 1 wr
    sol_r = 2 * b * n * 4 / SPEC_BW  # real N in, H-planes out (approx)

    def with_engine(eng, fn):
        def run(*a):
            dp.set_engine(eng)
            try:
                return fn(*a)
            finally:
                dp.set_engine(None)
        return run

    variants = {}
    for eng in ("xla", "kern2"):
        variants[f"cfwd_{eng}"] = (sol_c, with_engine(
            eng, lambda r, i: pf.fft.transform_ordered_split_tmajor(
                cplan, (r, i), pf.FORWARD)), (zr, zi))
        variants[f"cbwd_{eng}"] = (sol_c, with_engine(
            eng, lambda r, i: pf.fft.transform_ordered_split_tmajor(
                cplan, (r, i), pf.BACKWARD)), (zr, zi))
        variants[f"rfwd_{eng}"] = (sol_r, with_engine(
            eng, lambda v: pf.fft.transform_ordered_split_tmajor(
                rplan, v, pf.FORWARD)), (x,))
        variants[f"rbwd_{eng}"] = (sol_r, with_engine(
            eng, lambda r, i: pf.fft.transform_ordered_split_tmajor(
                rplan, (r, i), pf.BACKWARD)), (zr, zi))

        def pair(v, eng=eng):
            dp.set_engine(eng)
            try:
                sr, si = pf.fft.transform_ordered_split_tmajor(
                    rplan, v, pf.FORWARD)
                return pf.fft.transform_ordered_split_tmajor(
                    rplan, (sr, si), pf.BACKWARD)
            finally:
                dp.set_engine(None)

        variants[f"rpair_{eng}"] = (2 * sol_r, pair, (x,))

    live = {}
    for name, (sol, fn, data) in variants.items():
        try:
            out = fn(*data)
            jax.block_until_ready(out)
            live[name] = (sol, fn, data)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:160], flush=True)

    trials = {k: [] for k in live}
    for _ in range(ROUNDS):
        for k in live:
            sol, fn, data = live[k]
            try:
                trials[k].append(bench_op(fn, data, k1=4, k2=20))
            except Exception as e:
                print(f"{k}: trial FAIL {type(e).__name__}"[:120], flush=True)
    print(f"n={n} h={h} b={b}", flush=True)
    for k in live:
        sol, fn, data = live[k]
        ts = sorted(trials[k])
        if not ts:
            continue
        med = ts[len(ts) // 2]
        print(f"  {k:12s} med {med*1e3:7.3f} ms (SoL {sol/med:.3f}) trials "
              f"{[round(t*1e3, 2) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
