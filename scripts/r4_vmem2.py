"""Round-4 probe: what exactly kills compiles at n*tb = 2M elements?

r4_scratch.py: every (n, tb) with n*tb <= 1M compiles (scratch or not),
every 2M fails — even scratch, whose live set should be ~3 plane pairs
(24 MB at 8 MB/plane).  Capture the FULL compiler error once, then try
(a) the limit at 127 MB, (b) dimension_semantics=('arbitrary',) to
disable grid double-buffering of the I/O blocks.

Run: python scripts/r4_vmem2.py | tee benchmarks/results/vmem2_r4.txt
"""

import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pffft_tpu as pf
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    # 1. full error text for the canonical failure
    n, tb = 4096, 512
    f = pk.thin_factors(n, radix16=True)
    plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
    re = jnp.asarray(rng.standard_normal((n, tb)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n, tb)).astype(np.float32))
    try:
        r, i = pk.cfft_pallas_tmajor(plan, re, im, tb=tb, scratch=True)
        float(jnp.sum(r))
        print("4096/tb512/scr: unexpectedly compiled!", flush=True)
    except Exception as e:
        print("=== full error for 4096/tb512/scr @100MB ===", flush=True)
        print(str(e)[:4000], flush=True)

    # 2/3. variations: limit 127MB / 64MB, arbitrary grid dim (no
    # pipelining double-buffer), at both 4096/tb512 and 16384/tb128
    def try_case(n_, tb_, tag, kw):
        f_ = pk.thin_factors(n_, radix16=True)
        p_ = pf.new_setup(n_, pf.COMPLEX, factors=f_, strict=False)
        b_ = max(tb_, 4 * tb_)
        rr = jnp.asarray(rng.standard_normal((n_, b_)).astype(np.float32))
        ii = jnp.asarray(rng.standard_normal((n_, b_)).astype(np.float32))
        try:
            r, i = pk.cfft_pallas_tmajor(p_, rr, ii, tb=tb_, **kw)
            ref = np.fft.fft(np.asarray(rr[:, :2]).astype(np.float64)
                             + 1j * np.asarray(ii[:, :2]).astype(np.float64),
                             axis=0)
            err = float(np.abs(
                (np.asarray(r[:, :2]) + 1j * np.asarray(i[:, :2])) - ref
            ).max() / np.abs(ref).max())
            print(f"{n_}/tb{tb_}/{tag}: compiles, err {err:.1e}", flush=True)
            if err < 1e-5:
                from timing import bench_op
                ts = sorted(
                    bench_op(lambda a, c: pk.cfft_pallas_tmajor(
                        p_, a, c, tb=tb_, **kw), (rr, ii), k1=4, k2=20)
                    for _ in range(5))
                med = ts[len(ts) // 2]
                fl = 5.0 * b_ * n_ * math.log2(n_)
                sol = 4 * b_ * n_ * 4 / SPEC_BW / med
                print(f"{n_}/tb{tb_}/{tag}: med {fl/med/1e9:.0f} GF/s "
                      f"SoL {sol:.3f} (small payload {4*n_*b_*4>>20} MB)",
                      flush=True)
        except Exception as e:
            print(f"{n_}/tb{tb_}/{tag}: FAIL {str(e)[:200]}", flush=True)

    for n_, tb_ in ((4096, 512), (16384, 128), (8192, 256)):
        try_case(n_, tb_, "limit127",
                 dict(vmem_limit=127 * 1024 * 1024, scratch=True))
        try_case(n_, tb_, "arb100",
                 dict(scratch=True, arbitrary_grid=True))
        try_case(n_, tb_, "arb127",
                 dict(vmem_limit=127 * 1024 * 1024, scratch=True,
                      arbitrary_grid=True))


if __name__ == "__main__":
    main()
