"""Round-5: r=32 kern2 confs — can 32768/65536 ride the m<=2048 pass A?

kern2d_r5: m=2048 confs beat m=4096 at every size where both raced
((2048,8) 0.244 vs (4096,4) 0.223 at 16384; (2048,16) 0.246 vs (4096,8)
0.219 at 32768).  The new radix-32 combine butterfly opens (2048,32) at
65536 and (1024,32) at 32768.  Interleaved vs the routed confs.

Run: python scripts/r5_kern2e.py | tee benchmarks/results/kern2e_r5.txt
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
    32768: ((2048, 16), (1024, 32)),
    65536: ((4096, 16), (2048, 32)),
    # non-pow2 beyond the direct kernel's comfort: the combine has
    # radix-3/4 butterflies, pass A rides the thin 2/3/5 chains
    9216: ((2304, 4), (3072, 3)),
    2400: ((600, 4), (800, 3)),
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
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        flops = 5.0 * b * n * math.log2(n)
        variants = {}
        for m, r_ in confs:
            if dp._build_ksplit(n, m, r_) is None:
                print(f"n={n} ({m},{r_}): no build", flush=True)
                continue
            variants[f"k2_{m}x{r_}"] = (
                lambda rr, ii, c=(m, r_): dp.cfft_kern2_tmajor(
                    plan, rr, ii, conf=c))
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
                if err > 1e-5:
                    print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                    continue
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        print(f"n={n} b={b}", flush=True)
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"  {k:12s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_t/med:.3f}) trials "
                  f"{[round(sol_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
