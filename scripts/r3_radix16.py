"""Round-3 probe: radix-16/8 kernel chains vs the radix<=5 chain.

Each kernel stage is a full VMEM traversal of the [N, TB] tile, so a
(16,16,4) chain at N=1024 does 3 traversals where (4,4,4,4,4) does 5.
Fewer stages also means fewer live temporaries in the unrolled chain —
possibly a smaller Mosaic scoped-VMEM stack, so wider tiles (and N>=2048
at all) may newly compile.

Run: python scripts/r3_radix16.py | tee benchmarks/results/radix16_r3.txt
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
    cases = [
        (128, (512, 1024)),
        (256, (1024, 2048)),
        (512, (384, 768)),
        (1024, (128, 256, 512)),
        (2048, (128, 256)),
        (4096, (128,)),
    ]
    for n, tbs in cases:
        b = (64 << 20) // (4 * n)
        b -= b % max(tbs)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ref = np.fft.fft(np.asarray(re[:, :2]).astype(np.float64)
                         + 1j * np.asarray(im[:, :2]).astype(np.float64), axis=0)

        variants = []
        for radix16 in (False, True):
            f = pk.thin_factors(n, radix16=radix16)
            plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
            for tb in tbs:
                if not radix16 and tb != min(tbs):
                    continue  # r5 only at the current shipping tile
                tag = f"{'r16' if radix16 else 'r5'}/tb{tb}"
                fn = lambda r, i, p=plan, t=tb: pk.cfft_pallas_tmajor(p, r, i, tb=t)
                try:
                    kr, ki = jax.jit(fn)(re, im)
                    err = float(np.abs(
                        (np.asarray(kr[:, :2]) + 1j * np.asarray(ki[:, :2])) - ref
                    ).max() / np.abs(ref).max())
                    if err > 1e-5:
                        print(f"n={n} {tag}: MISMATCH {err:.2e}", flush=True)
                        continue
                    variants.append((tag, fn))
                except Exception as e:
                    print(f"n={n} {tag}: FAIL {type(e).__name__}: "
                          f"{str(e)[:90]}", flush=True)

        trials = {tag: [] for tag, _ in variants}
        for _ in range(ROUNDS):
            for tag, fn in list(variants):
                try:
                    trials[tag].append(bench_op(fn, (re, im), k1=4, k2=20, repeats=2))
                except Exception as e:
                    print(f"n={n} {tag}: BENCH FAIL {type(e).__name__}", flush=True)
                    variants = [(t, f_) for t, f_ in variants if t != tag]
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        for tag, _ in variants:
            if not trials[tag]:
                continue
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} {tag:10s}: med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
