"""Round-5: kern2 with the v2 combine vs xla vs the direct kernel —
the routing decision for the band's upper half.

geom_r5: combine v2 (wide-view per-slab blocks) runs at the ~0.40-0.42
copy ceiling at every (m, r) — 2-3x v1 at r=8/16.  This probe interleaves
the full engines round-robin in one window (throttling makes separate
windows incomparable) and also re-times pass A alone for the diagnosis.

Run: python scripts/r5_kern2d.py | tee benchmarks/results/kern2d_r5.txt
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

CONFS = {
    8192: ((2048, 4), (1024, 8)),
    16384: ((4096, 4), (2048, 8)),
    32768: ((4096, 8), (2048, 16)),
    65536: ((4096, 16),),
}


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (8192, 16384, 32768, 65536):
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        flops = 5.0 * b * n * math.log2(n)

        def forced(r, i, eng, p=plan):
            dp.set_engine(eng)
            try:
                return pf.fft.transform_ordered_split_tmajor(
                    p, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants = {"xla": lambda r, i: forced(r, i, "xla")}
        if "pallas" in dp.available_engines(plan, b, True):
            variants["pallas"] = lambda r, i: forced(r, i, "pallas")
        for m, r_ in CONFS[n]:
            if dp._build_ksplit(n, m, r_) is None:
                continue
            if pk.best_tb(m, r_ * b) is None:
                continue
            variants[f"k2_{m}x{r_}"] = (
                lambda rr, ii, c=(m, r_): dp.cfft_kern2_tmajor(
                    plan, rr, ii, conf=c))
            mplan, last = dp._build_ksplit(n, m, r_)
            tb = pk.best_tb(m, r_ * b)

            def pass_a(rr, ii, m=m, r_=r_, mplan=mplan, tb=tb):
                ar = rr.reshape(m, r_ * b)
                ai = ii.reshape(m, r_ * b)
                ar, ai = pk.cfft_pallas_tmajor(
                    mplan, ar, ai, backward=False, tb=tb,
                    scratch=pk.use_scratch(m, tb))
                return ar.reshape(n, b), ai.reshape(n, b)

            variants[f"A_{m}x{r_}"] = pass_a

        ref = np.fft.fft(
            np.asarray(re[:, :4]).astype(np.float64)
            + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        live = {}
        for name, fn in variants.items():
            try:
                sr, si = jax.jit(fn)(re, im)
                if not name.startswith("A_"):
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
        base = sorted(trials["xla"])[ROUNDS // 2]
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            wins = sum(1 for a, x in zip(trials[k], trials["xla"]) if a < x)
            print(f"  {k:12s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_t/med:.3f}, {base/med:.2f}x xla, wins {wins}/"
                  f"{ROUNDS}) trials {[round(sol_t/t, 3) for t in trials[k]]}",
                  flush=True)


if __name__ == "__main__":
    main()
