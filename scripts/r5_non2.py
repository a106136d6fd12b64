"""Round-5: non-pow2 sizes on the measured/kernel route.

VERDICT r4 next-6: the reference treats {96..9216} as first-class
(bench_pffft.c:1144-1150) but our kernel tables cover only pow2 — the
set ran the XLA chain at 0.08-0.44 med SoL (sweep_r4_non2.csv).  The
Pallas kernel HAS radix-3/5 butterflies; this probe races, per size,
time-major: xla (default factors) vs xla (alt factor chains) vs the
pallas kernel at its candidate tiles.  Winners feed
dispatch.record_engine + pallas_fft._TB_PREF + plan._TPU_FACTOR_TABLE.

Run: python scripts/r5_non2.py | tee benchmarks/results/non2_r5.txt
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

SIZES = tuple(
    int(s) for s in os.environ.get(
        "NON2_SIZES", "96,160,192,384,480,640,768,800,2400,9216"
    ).split(",")
)

# alternative dense factor chains to race against plan_factors' default
ALT_FACTORS = {
    96: ((96,), (24, 4), (12, 8)),
    160: ((160,), (40, 4), (20, 8)),
    192: ((192,), (48, 4), (24, 8)),
    384: ((384,), (96, 4), (48, 8)),
    480: ((480,), (120, 4), (60, 8)),
    640: ((128, 5), (80, 8), (40, 16)),
    768: ((96, 8), (192, 4), (48, 16)),
    800: ((100, 8), (160, 5), (40, 20)),
    2400: ((60, 40), (48, 50), (120, 20)),
    9216: ((96, 96), (144, 64), (72, 128)),
}


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in SIZES:
        b = (64 << 20) // (4 * n)
        b -= b % 1024
        b = max(1024, b)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        flops = 5.0 * b * n * math.log2(n)

        variants = {}
        plan0 = pf.new_setup(n, pf.COMPLEX, strict=False)

        def forced(r, i, eng, p):
            dp.set_engine(eng)
            try:
                return pf.fft.transform_ordered_split_tmajor(
                    p, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants[f"xla_{plan0.factors}"] = (
            lambda r, i, p=plan0: forced(r, i, "xla", p))
        for fac in ALT_FACTORS.get(n, ()):
            if np.prod(fac) != n or fac == plan0.factors:
                continue
            try:
                p = pf.new_setup(n, pf.COMPLEX, strict=False, factors=fac)
            except Exception:
                continue
            variants[f"xla_{fac}"] = (
                lambda r, i, p=p: forced(r, i, "xla", p))
        # pallas kernel at its candidate tiles
        for tb in pk.tb_candidates(n)[:3]:
            if b % tb:
                continue
            variants[f"pal_tb{tb}"] = (
                lambda r, i, p=plan0, tb=tb: _pal(dp, pk, p, r, i, tb))

        def _pal(dp, pk, p, r, i, tb):
            pplan = dp._pallas_plan(p)
            return pk.cfft_pallas_tmajor(
                pplan, r, i, backward=False, tb=tb,
                scratch=pk.use_scratch(p.engine_n, tb))

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
                    print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                    continue
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:140],
                      flush=True)

        print(f"n={n} b={b} live={list(live)}", flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                try:  # transient service read errors must not kill the run
                    trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
                except Exception as e:
                    print(f"  n={n} {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:24s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_t/med:.3f}) trials "
                  f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
