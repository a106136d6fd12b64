"""Round-4 probe: the IN-KERNEL ksplit (single-HBM-pass combine).

The XLA-combine ksplit loses on its extra pass (ksplit_r4.txt); ksplit2
keeps the radix-r combine inside the kernel, and the m-chain runs on
r*tb concatenated lanes — the wide-tile regime.  Race vs the current
routed path and forced-xla at N=4096-32768, multiple (m, r, tb) confs.

Run: python scripts/r4_ksplit2.py | tee benchmarks/results/ksplit2_r4.txt
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
    from timing import bench_op

    rng = np.random.default_rng(0)
    cases = [
        (4096, [((2048, 2), 128), ((2048, 2), 256), ((1024, 4), 256)]),
        (8192, [((2048, 4), 128), ((1024, 8), 128), ((2048, 4), 256)]),
        (16384, [((2048, 8), 128), ((1024, 16), 128)]),
        (32768, [((2048, 16), 128), ((1024, 32), 128)]),
    ]
    for n, confs in cases:
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ref = np.fft.fft(np.asarray(re[:, :2]).astype(np.float64)
                         + 1j * np.asarray(im[:, :2]).astype(np.float64), axis=0)

        variants = []

        def routed(r_, i_, p=plan):
            return pf.fft.transform_ordered_split_tmajor(p, (r_, i_), pf.FORWARD)

        def forced_xla(r_, i_, p=plan):
            dp.set_engine("xla")
            try:
                return pf.fft.transform_ordered_split_tmajor(
                    p, (r_, i_), pf.FORWARD)
            finally:
                dp.set_engine(None)

        variants.append(("routed", routed))
        variants.append(("xla", forced_xla))
        for conf, tb in confs:
            m, r_ = conf
            tag = f"ks2_{m}x{r_}t{tb}"
            variants.append((tag, lambda a, c, p=plan, cf=conf, t=tb:
                             dp.cfft_ksplit2_tmajor(p, a, c, conf=cf, tb=t)))

        live = []
        for tag, fn in variants:
            try:
                sr, si = jax.jit(fn)(re, im)
                got = (np.asarray(sr[:, :2]).astype(np.float64)
                       + 1j * np.asarray(si[:, :2]))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                if err > 1e-5:
                    print(f"n={n} {tag}: MISMATCH {err:.2e}", flush=True)
                    continue
                print(f"n={n} {tag}: ok err {err:.1e}", flush=True)
                live.append((tag, fn))
            except Exception as e:
                print(f"n={n} {tag}: FAIL {type(e).__name__}: {str(e)[:100]}",
                      flush=True)

        trials = {tag: [] for tag, _ in live}
        for _ in range(ROUNDS):
            for tag, fn in list(live):
                try:
                    trials[tag].append(bench_op(fn, (re, im), k1=4, k2=20,
                                                repeats=2))
                except Exception:
                    live = [v for v in live if v[0] != tag]
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        for tag, _ in live:
            if not trials[tag]:
                continue
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} {tag:14s}: med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
