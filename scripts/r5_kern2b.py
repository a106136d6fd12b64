"""Round-5: decompose kern2 = pass A + pass B at the losing sizes.

kern2_r5 full-path results: only big-m/small-r confs tie xla (16384
4096x4 = 1.03x, 8192 2048x4 = 1.07x); everything else loses.  This probe
times pass A alone, pass B alone (per (mk, tb_b) tile), and the
composition, to find where the two-pass budget goes.

Run: python scripts/r5_kern2b.py | tee benchmarks/results/kern2b_r5.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 4

CONFS = {
    8192: ((2048, 4), (1024, 8)),
    16384: ((4096, 4), (2048, 8)),
    32768: ((4096, 8),),
}


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n, confs in CONFS.items():
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW  # one read+write of the planes

        for m, r_ in confs:
            built = dp._build_ksplit(n, m, r_)
            if built is None:
                print(f"n={n} ({m},{r_}): no build", flush=True)
                continue
            mplan, last = built
            tb = pk.best_tb(m, r_ * b)
            print(f"n={n} b={b} conf=({m},{r_}) passA tb={tb}", flush=True)

            def pass_a(rr, ii):
                ar = rr.reshape(m, r_ * b)
                ai = ii.reshape(m, r_ * b)
                ar, ai = pk.cfft_pallas_tmajor(
                    mplan, ar, ai, backward=False, tb=tb,
                    scratch=pk.use_scratch(m, tb))
                return ar.reshape(n, b), ai.reshape(n, b)

            variants = {"passA": pass_a}

            for mk, tbb in ((None, None), (64, 512), (128, 256),
                            (256, 128), (32, 1024)):
                if tbb is not None and (b % tbb or m % mk):
                    continue
                key = f"passB_mk{mk}_tb{tbb}"

                def pass_b(rr, ii, mk=mk, tbb=tbb):
                    return pk.cfft_combine_tmajor(
                        last, rr, ii, backward=False, mk=mk, tb=tbb)

                variants[key] = pass_b

            def full(rr, ii):
                return dp.cfft_kern2_tmajor(
                    pf.new_setup(n, pf.COMPLEX), rr, ii, conf=(m, r_))

            variants["full"] = full

            for name, fn in variants.items():
                try:
                    ts = []
                    for _ in range(ROUNDS):
                        ts.append(bench_op(fn, (re, im), k1=4, k2=20))
                    med = sorted(ts)[len(ts) // 2]
                    print(f"  {name:20s} med {med*1e3:7.3f} ms "
                          f"(pass-SoL {sol_t/med:.3f}) trials "
                          f"{[round(t*1e3, 2) for t in ts]}", flush=True)
                except Exception as e:
                    print(f"  {name}: FAIL {type(e).__name__}: {e}"[:160],
                          flush=True)


if __name__ == "__main__":
    main()
