"""Round-4 probe: 8192/tb256 + 16384/tb128 under the arb127 wall config.

wall_r4.txt proved dimension_semantics=('arbitrary',) + 127 MB compiles
the 2M-element wall tiles 2/2 where plain scratch is 0/2; the 8192/tb256
and 16384/tb128 failures predate that discovery (vmem2 probed them under
service load).  Two attempts each + plateau timing vs the routed path.

Run: python scripts/r4_wall2.py | tee benchmarks/results/wall2_r4.txt
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
    for n, tb in ((8192, 256), (16384, 128)):
        f = pk.thin_factors(n, radix16=True)
        plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
        ok = 0
        for attempt in range(2):
            b_try = tb * (2 + attempt)
            rr = jnp.asarray(rng.standard_normal((n, b_try)).astype(np.float32))
            ii = jnp.asarray(rng.standard_normal((n, b_try)).astype(np.float32))
            try:
                r, i = pk.cfft_pallas_tmajor(plan, rr, ii, tb=tb)  # wall auto
                ref = np.fft.fft(np.asarray(rr[:, :2]).astype(np.float64)
                                 + 1j * np.asarray(ii[:, :2]).astype(np.float64),
                                 axis=0)
                err = float(np.abs(
                    (np.asarray(r[:, :2]) + 1j * np.asarray(i[:, :2])) - ref
                ).max() / np.abs(ref).max())
                ok += err < 1e-5
                print(f"n={n} tb={tb} attempt {attempt}: err {err:.1e}",
                      flush=True)
            except Exception as e:
                print(f"n={n} tb={tb} attempt {attempt}: FAIL "
                      f"{type(e).__name__}: {str(e)[:90]}", flush=True)
        print(f"n={n} tb={tb}: {ok}/2 attempts ok", flush=True)
        if not ok:
            continue
        b = (64 << 20) // (4 * n)
        b = max(tb, b - b % tb)
        rr = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ii = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        fn = lambda a, c, p=plan, t=tb: pk.cfft_pallas_tmajor(p, a, c, tb=t)
        ts = sorted(bench_op(fn, (rr, ii), k1=4, k2=20, repeats=2)
                    for _ in range(ROUNDS))
        med = ts[len(ts) // 2]
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        print(f"n={n} b={b} tb={tb}/wall: med {flops/med/1e9:7.1f} GF/s "
              f"(SoL {sol_t/med:.3f}) trials "
              f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
