"""Round-3 probe: unlock wide tiles at N=1024 via the inner-split kernel.

N=1024 tb=256 OOMs Mosaic's scoped-VMEM stack (19.2 MB vs 16 MB): the
unrolled 5-stage chain's live values scale with tb.  The inner-split
variant runs the chain on sequential 128-column chunks inside one grid
step — live set of one chunk, grid overhead of the wide tile.

Run: python scripts/r3_inner_tb.py | tee benchmarks/results/inner_tb_r3.txt
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
    for n, combos in (
        (1024, ((128, 0), (256, 128), (512, 128), (1024, 128))),
        (2048, ((128, 0), (256, 128), (128, 64))),
    ):
        b = (64 << 20) // (4 * n)
        p5 = pf.new_setup(n, pf.COMPLEX, max_factor=5)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

        variants = []
        for tb, inner in combos:
            fn = lambda r, i, p=p5, t=tb, q=inner: pk.cfft_pallas_tmajor(
                p, r, i, tb=t, inner=q)
            try:
                out = jax.jit(fn)(re, im)
                float(jnp.sum(out[0]))
                variants.append(((tb, inner), fn))
            except Exception as e:
                print(f"n={n} tb={tb} inner={inner}: FAIL {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)

        trials = {k: [] for k, _ in variants}
        for _ in range(ROUNDS):
            for k, fn in variants:
                trials[k].append(bench_op(fn, (re, im), k1=4, k2=20, repeats=2))
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        for k, _ in variants:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} tb={k[0]} inner={k[1]}: med {flops/med/1e9:7.1f}"
                  f" GF/s (SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
