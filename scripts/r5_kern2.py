"""Round-5 probe: the two-kernel-pass engine (kern2) vs the routed paths.

VERDICT r4 next-1b: above N=8192 the direct single-pass kernel hits the
n*tb <= 1M compile wall and the band runs the 2-pass XLA chain at
0.16-0.34 med SoL.  kern2 = pass A (wide-tile length-m kernel over the
free [m, r*B] DIT view) + pass B (Pallas combine kernel,
ops/pallas_fft.cfft_combine_tmajor) — two clean HBM round trips.

For each N: correctness-gate every variant on chip, then interleaved
timing rounds at the >=64 MB/plane plateau.  Winners feed
dispatch.set_kern2_conf / record_engine.

Run: python scripts/r5_kern2.py | tee benchmarks/results/kern2_r5.txt
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
    8192: ((1024, 8), (2048, 4)),
    16384: ((2048, 8), (1024, 16), (4096, 4)),
    32768: ((2048, 16), (4096, 8)),
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

        variants = {}

        def forced(r, i, eng, p=plan):
            dp.set_engine(eng)
            try:
                return pf.fft.transform_ordered_split_tmajor(
                    p, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants["xla"] = lambda r, i: forced(r, i, "xla")
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

        ref = np.fft.fft(
            np.asarray(re[:, :4]).astype(np.float64)
            + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        ok = {}
        for name, fn in variants.items():
            try:
                sr, si = jax.jit(fn)(re, im)
                got = (np.asarray(sr[:, :4]).astype(np.float64)
                       + 1j * np.asarray(si[:, :4]).astype(np.float64))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                ok[name] = err < 1e-5
                print(f"n={n} b={b} {name}: rel err {err:.2e}"
                      + ("" if ok[name] else " MISMATCH"), flush=True)
            except Exception as e:  # Mosaic 500s etc.
                ok[name] = False
                print(f"n={n} {name}: FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
        live = [k for k in variants if ok.get(k)]
        if len(live) < 2:
            print(f"n={n}: <2 live variants, skipping timing", flush=True)
            continue

        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(variants[k], (re, im), k1=4, k2=20))
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        base = sorted(trials["xla"])[ROUNDS // 2]
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            wins = sum(1 for a, x in zip(trials[k], trials["xla"]) if a < x)
            print(f"  n={n} {k:10s} med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}, {base/med:.2f}x xla, "
                  f"wins {wins}/{ROUNDS}) trials "
                  f"{[round(flops/t/1e9) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
