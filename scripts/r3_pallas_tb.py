"""Round-3 probe: pallas radix kernel tile-batch (TB) sweep.

The kernel ships TB=128 (one f32 lane tile).  Wider tiles halve the grid
steps and may improve VPU utilization; the VMEM gate allows TB=256 up to
N=512 (and TB=384 at N=256).  Plateau payloads, interleaved rounds.

Run:  python scripts/r3_pallas_tb.py | tee benchmarks/results/pallas_tb_r3.txt
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
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)
    for n, tbs in (
        (128, (512, 1024, 2048)),
        (256, (512, 768, 1024)),
        (512, (256, 384)),
        (1024, (128, 256)),
    ):
        b = (64 << 20) // (4 * n)
        b -= b % max(tbs)
        p5 = pf.new_setup(n, pf.COMPLEX, max_factor=5)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

        variants = []
        for tb in tbs:
            fn = lambda r, i, p=p5, t=tb: pk.cfft_pallas_tmajor(p, r, i, tb=t)
            try:
                out = jax.jit(fn)(re[:, :max(tbs)], im[:, :max(tbs)])
                float(jnp.sum(out[0]))
                variants.append((tb, fn))
            except Exception as e:
                print(f"n={n} tb={tb}: COMPILE FAIL {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)

        trials = {tb: [] for tb, _ in variants}
        for _ in range(ROUNDS):
            for tb, fn in list(variants):
                try:
                    trials[tb].append(
                        bench_op(fn, (re, im), k1=4, k2=20, repeats=2))
                except Exception as e:  # VMEM gate can fail at full batch
                    print(f"n={n} tb={tb}: BENCH FAIL {type(e).__name__}: "
                          f"{str(e)[:100]}", flush=True)
                    variants = [(t, f) for t, f in variants if t != tb]
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        for tb, _ in variants:
            if not trials[tb]:
                continue
            ts = sorted(trials[tb])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} tb={tb}: med {flops/med/1e9:.0f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials {[round(flops/t/1e9) for t in ts]}",
                  flush=True)


if __name__ == "__main__":
    main()
