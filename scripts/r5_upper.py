"""Round-5: does kern2 extend to N=131072 (m=4096, r=32)?

The measured table stops at 65536; 131072 runs the 3-stage XLA chain at
0.085 med SoL (sweep_r5_tmajor.csv).  The auto conf (4096, 32) is inside
both envelopes (m=4096 kernel-covered, r=32 combine butterfly), just
never raced.  Pass A may ride the 4096/tb512 wall tile — compile-retry
semantics apply (can cost ~10 min on a failed coin flip).

Run: python scripts/r5_upper.py | tee benchmarks/results/upper_r5.txt
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
    n = 131072
    b = (64 << 20) // (4 * n)  # 128
    plan = pf.new_setup(n, pf.COMPLEX)
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

    variants = {"xla": forced_xla}
    for m, r_ in ((4096, 32),):
        if dp._build_ksplit(n, m, r_) is None:
            print(f"({m},{r_}): no build", flush=True)
            continue
        for tb in (256, 512):
            if (r_ * b) % tb:
                continue
            variants[f"k2_{m}x{r_}_tb{tb}"] = (
                lambda rr, ii, c=(m, r_), tb=tb: dp.cfft_kern2_tmajor(
                    plan, rr, ii, conf=c, tb_a=tb))

    ref = np.fft.fft(
        np.asarray(re[:, :2]).astype(np.float64)
        + 1j * np.asarray(im[:, :2]).astype(np.float64), axis=0)
    live = {}
    for name, fn in variants.items():
        print(f"{name}: validating...", flush=True)
        try:
            sr, si = jax.jit(fn)(re, im)
            got = (np.asarray(sr[:, :2]).astype(np.float64)
                   + 1j * np.asarray(si[:, :2]).astype(np.float64))
            err = float(np.abs(got - ref).max() / np.abs(ref).max())
            if err > 2e-5:
                print(f"{name}: MISMATCH {err:.2e}", flush=True)
                continue
            live[name] = fn
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:160], flush=True)

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
        print(f"  {k:18s} med {flops/med/1e9:7.1f} GF/s (SoL "
              f"{sol_t/med:.3f}) trials "
              f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
