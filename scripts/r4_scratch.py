"""Round-4 probe: scratch-ref ping-pong kernel + wider tiles, N=2048-32768.

Follow-up to r4_vmem.py (raised scoped-VMEM limit): the unrolled chain
still dies at N=8192 (live SSA values scale with stage count); the
scratch variant routes stage outputs through two VMEM refs so the live
set is ~3 plane pairs at any chain length.  Race scratch vs unrolled
where both compile, and push tiles wider at 2048/4096.

Run: python scripts/r4_scratch.py | tee benchmarks/results/scratch_r4.txt
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
    # (n, [(tb, scratch), ...])
    cases = [
        (1024, ((1024, False), (1024, True), (2048, False))),
        (2048, ((512, False), (512, True), (1024, False), (1024, True))),
        (4096, ((256, False), (256, True), (512, False), (512, True))),
        (8192, ((128, True), (256, True))),
        (16384, ((128, True),)),
        (32768, ((128, True),)),
    ]
    for n, variants_cfg in cases:
        b = (64 << 20) // (4 * n)
        tbmax = max(tb for tb, _ in variants_cfg)
        b = max(b - b % tbmax, tbmax)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ref = np.fft.fft(np.asarray(re[:, :2]).astype(np.float64)
                         + 1j * np.asarray(im[:, :2]).astype(np.float64), axis=0)

        f = pk.thin_factors(n, radix16=True)
        plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
        variants = []
        for tb, scr in variants_cfg:
            tag = f"tb{tb}{'/scr' if scr else ''}"
            fn = lambda r, i, p=plan, t=tb, s=scr: pk.cfft_pallas_tmajor(
                p, r, i, tb=t, scratch=s)
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
            print(f"n={n} b={b} {tag:12s}: med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
