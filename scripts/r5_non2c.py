"""Round-5: n=640 kernel-tile retry with a tile-divisible batch.

non2b_r5 raced 640 with b=25600 (b -= b%1024), which none of the kernel's
tile candidates (1536, 768, 384) divide — so only XLA chains went live and
640 stayed the one sub-0.3 front-band size (best 0.169, xla (80,8)).
Retry at b=24576 (60 MB/plane, divisible by every candidate + 128).

Run: python scripts/r5_non2c.py | tee benchmarks/results/non2c_r5.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)
    n = 640
    b = 24576
    plan = pf.new_setup(n, pf.COMPLEX, strict=False)
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

    variants = {f"xla_{plan.factors}": forced_xla}

    def _pal(r, i, tb):
        pplan = dp._pallas_plan(plan)
        return pk.cfft_pallas_tmajor(
            pplan, r, i, backward=False, tb=tb,
            scratch=pk.use_scratch(plan.engine_n, tb))

    for tb in pk.tb_candidates(n):
        if b % tb:
            continue
        variants[f"pal_tb{tb}"] = lambda r, i, tb=tb: _pal(r, i, tb)

    ref = np.fft.fft(
        np.asarray(re[:, :4]).astype(np.float64)
        + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
    live = {}
    for name, fn in variants.items():
        try:
            sr, si = jax.jit(fn)(re, im)
            got = (np.asarray(sr[:, :4]).astype(np.float64)
                   + 1j * np.asarray(si[:, :4]).astype(np.float64))
            err = float(np.abs(got - ref).max() / np.abs(ref).max())
            if err > 2e-5:
                print(f"{name}: MISMATCH {err:.2e}", flush=True)
                continue
            live[name] = fn
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:140], flush=True)

    print(f"n={n} b={b} live={list(live)}", flush=True)
    trials = {k: [] for k in live}
    for _ in range(ROUNDS):
        for k in live:
            try:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
            except Exception as e:
                print(f"  {k}: trial FAIL {type(e).__name__}"[:120], flush=True)
    for k in live:
        ts = sorted(trials[k])
        if not ts:
            continue
        med = ts[len(ts) // 2]
        print(f"  {k:18s} med {flops/med/1e9:7.1f} GF/s (SoL "
              f"{sol_t/med:.3f}) trials "
              f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
