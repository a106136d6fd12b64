"""Round-5: re-run the two ksplit rows that died in round 4.

ksplit_r4.txt's n=32768/65536 rows failed for EVERY variant including the
xla baseline: the payload alignment `b -= b % 1024` zeroed b once
64MB/(4*n) dropped below 1024 (n=32768 -> b=512 -> 0).  Harness bug, not
an engine verdict (VERDICT r4 weak #5).  Fixed: align to 256 with a floor,
keeping r_*b a multiple of every candidate tile.

Run: python scripts/r5_ksplit.py | tee benchmarks/results/ksplit_r5.txt
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

    for n in (32768, 65536):
        # >=64 MB/plane honest plateau; b aligned so r*b hits every tile
        # (r >= 32 at these sizes, so b % 256 == 0 keeps r*b tile-aligned)
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

        variants = {}

        def forced_xla(r, i, p=plan):
            dp.set_engine("xla")
            try:
                return pf.fft.transform_ordered_split_tmajor(p, (r, i), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants["xla"] = forced_xla
        for m in (1024, 512, 256):
            r_ = n // m
            if n != m * r_ or r_ < 2 or r_ > 128:
                continue
            if dp._build_ksplit(n, m, r_) is None:
                continue
            if pk.best_tb(m, r_ * b) is None:
                continue
            variants[f"ks{m}x{r_}"] = (
                lambda rr, ii, p=plan, c=(m, r_): dp.cfft_ksplit_tmajor(
                    p, rr, ii, conf=c))

        # correctness gate (first 4 columns, fp64 reference)
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
                try:  # transient service read errors must not kill the run
                    trials[k].append(
                        bench_op(variants[k], (re, im), k1=4, k2=20))
                except Exception as e:
                    print(f"  n={n} {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        if not trials.get("xla"):
            print(f"n={n}: xla baseline has no trials, skipping", flush=True)
            continue
        base = sorted(trials["xla"])[len(trials["xla"]) // 2]
        for k in live:
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            wins = sum(1 for a, x in zip(trials[k], trials["xla"]) if a < x)
            print(f"  n={n} {k:9s} med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}, {base/med:.2f}x xla, "
                  f"wins {wins}/{len(trials[k])}) trials "
                  f"{[round(flops/t/1e9) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
