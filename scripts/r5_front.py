"""Round-5: front-band attack — kern2 below 8192.

kern2d_r5's composition law (full two-pass ~ pass A alone in the chained
loop) suggests N=2048/4096 could ride m=1024's 0.7+ regime instead of
their direct tiles (0.67/0.48).

First attempt (07:00) burned its whole 90-min window with ZERO output:
the 1024/tb2048 wall-tile validation compile never returned (the known
stochastic wall-compile stall, CLAUDE.md).  Walls are dropped — r4
already measured them (2048/tb1024 0.705 vs 0.671, 1024/tb2048 0.696 vs
0.765: marginal/worse) — and validation now prints per variant.

Run: python scripts/r5_front.py | tee benchmarks/results/front_r5.txt
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
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    CASES = {
        # 512's _TB_PREF (384,256,128) is r3-era — predates the VMEM
        # raise; neighbours ride tb=1024 at 0.77-0.86.  Race wide tiles.
        512: {"walls": (), "confs": (), "tiles": (2048, 1024, 512)},
        2048: {"walls": (), "confs": ((1024, 2), (512, 4))},
        4096: {"walls": (), "confs": ((1024, 4), (2048, 2), (512, 8))},
    }

    for n, case in CASES.items():
        b = (64 << 20) // (4 * n)
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        flops = 5.0 * b * n * math.log2(n)

        pplan = dp._pallas_plan(plan)
        variants = {}
        tb0 = pk.best_tb(n, b)
        variants[f"direct_tb{tb0}"] = (
            lambda r, i, tb=tb0: pk.cfft_pallas_tmajor(
                pplan, r, i, backward=False, tb=tb,
                scratch=pk.use_scratch(n, tb)))
        for tb in case.get("tiles", ()):
            if b % tb or tb == tb0 or pk.is_wall_tile(n, tb):
                continue
            variants[f"direct_tb{tb}"] = (
                lambda r, i, tb=tb: pk.cfft_pallas_tmajor(
                    pplan, r, i, backward=False, tb=tb,
                    scratch=pk.use_scratch(n, tb)))
        for tb in case["walls"]:
            if b % tb:
                continue
            variants[f"direct_tb{tb}_wall"] = (
                lambda r, i, tb=tb: pk.cfft_pallas_tmajor(
                    pplan, r, i, backward=False, tb=tb,
                    scratch=pk.use_scratch(n, tb)))
        for m, r_ in case["confs"]:
            if dp._build_ksplit(n, m, r_) is None:
                continue
            if pk.best_tb(m, r_ * b) is None:
                continue
            variants[f"k2_{m}x{r_}"] = (
                lambda rr, ii, c=(m, r_): dp.cfft_kern2_tmajor(
                    plan, rr, ii, conf=c))

        ref = np.fft.fft(
            np.asarray(re[:, :4]).astype(np.float64)
            + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        live = {}
        for name, fn in variants.items():
            print(f"n={n} {name}: validating...", flush=True)
            try:
                sr, si = jax.jit(fn)(re, im)
                got = (np.asarray(sr[:, :4]).astype(np.float64)
                       + 1j * np.asarray(si[:, :4]).astype(np.float64))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                if err > 1e-5:
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
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"  {k:18s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_t/med:.3f}) trials "
                  f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
