"""Round-4 probe: raise the Mosaic scoped-VMEM limit, re-sweep the kernel.

Round 3 concluded the fused kernel is capped by "the 16 MB scoped VMEM
limit" — but 16 MB is only Mosaic's DEFAULT scoped limit; v5e has 128 MB
of physical VMEM and `pltpu.CompilerParams(vmem_limit_bytes=...)` raises
the gate.  This probe re-runs the compile matrix that round 3 recorded as
FAIL (N=1024 tb>=256, N>=2048 everywhere) with the limit at 100 MB, both
radix<=5 and radix-16/8 chains, checks correctness vs numpy, and races the
survivors at honest >=64 MB/plane payloads.

Run: python scripts/r4_vmem.py | tee benchmarks/results/vmem_r4.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 8


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)
    cases = [
        (1024, (256, 512, 1024)),
        (2048, (128, 256, 512)),
        (4096, (128, 256)),
        (8192, (128, 256)),
        (16384, (128,)),
    ]
    for n, tbs in cases:
        b = (64 << 20) // (4 * n)
        b -= b % max(tbs)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ref = np.fft.fft(np.asarray(re[:, :2]).astype(np.float64)
                         + 1j * np.asarray(im[:, :2]).astype(np.float64), axis=0)

        variants = []
        for radix16 in (True, False):
            f = pk.thin_factors(n, radix16=radix16)
            plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
            for tb in tbs:
                if not radix16 and tb != min(tbs):
                    continue  # r5 chain only at the smallest tile
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
                    print(f"n={n} {tag}: compiles, err {err:.1e}", flush=True)
                    variants.append((tag, fn))
                except Exception as e:
                    print(f"n={n} {tag}: FAIL {type(e).__name__}: "
                          f"{str(e)[:110]}", flush=True)

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
