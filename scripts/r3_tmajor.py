"""Round-3 on-chip experiment 2: engine layout + donation.

(a) time-major [N, B] vs batch-major [B, N] stage engine: batch-major's
    minor axis is the remaining span m, which shrinks below the 128-lane
    width at late stages; time-major keeps the batch on the lanes through
    every stage.  Both sides get their native input layout (no transpose
    in the measured region).
(b) donated vs fresh output buffers at large N (the in-place analog):
    does XLA reusing the input HBM allocation change throughput?

Run:  python scripts/r3_tmajor.py | tee benchmarks/results/tmajor_r3.csv
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
TOTAL = 1 << 23

SHAPES = [
    (512, (32, 16)),
    (1024, (32, 32)),
    (4096, (64, 64)),
    (4096, (16, 16, 16)),
    (65536, (64, 64, 16)),
    (65536, (256, 256)),
]


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"# backend={dev.platform}", flush=True)
    print("n,factors,variant,gflops_best,gflops_med,sol_best,us_best,trials_gf", flush=True)
    rng = np.random.default_rng(0)

    def run(tag, n, factors, step, args, batch):
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW
        ts = []
        stale = 0
        while len(ts) < 8:
            t = bench_op(step, args, k1=4, k2=20, repeats=2)
            improved = not ts or t < min(ts) * 0.98
            ts.append(t)
            stale = 0 if improved else stale + 1
            if stale >= 2 and len(ts) >= 4:
                break
        best, med = min(ts), sorted(ts)[len(ts) // 2]
        fstr = "x".join(map(str, factors))
        print(f"{n},{fstr},{tag},{flops/best/1e9:.1f},{flops/med/1e9:.1f},"
              f"{sol_t/best:.3f},{best*1e6:.1f},"
              f"\"{[round(flops/t/1e9) for t in ts]}\"", flush=True)

    for n, factors in SHAPES:
        batch = max(4, TOTAL // n)
        plan = pf.new_setup(n, pf.COMPLEX, factors=factors, strict=False)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        ret = jnp.asarray(np.asarray(re).T.copy())
        imt = jnp.asarray(np.asarray(im).T.copy())

        bm = lambda r, i, p=plan: sp.cfft_plan_split(p, r, i, backward=False, ordered=True)
        run("batch_major", n, factors, bm, (re, im), batch)
        tm = lambda r, i, p=plan: sp.cfft_stages_split_tmajor(
            r, i, p.stages, backward=False, ordered=True)
        run("time_major", n, factors, tm, (ret, imt), batch)

    # donation probe: one large shape, repeated fresh allocations vs donated.
    # bench_op's loop carries buffers device-side either way, so measure the
    # jitted call directly with a forced fetch, best-of-N.
    import time as _t

    n, batch = 1 << 20, 8
    plan = pf.new_setup(n, pf.COMPLEX)
    re = rng.standard_normal((batch, n)).astype(np.float32)
    im = rng.standard_normal((batch, n)).astype(np.float32)
    f_fresh = pf.fft._jitted_split(plan, False, True)
    f_don = pf.fft._jitted_split_donated(plan, False, True)
    for tag, fn in [("fresh", f_fresh), ("donated", f_don)]:
        # warm
        r0, i0 = jnp.asarray(re), jnp.asarray(im)
        o = fn(r0, i0)
        float(jnp.sum(o[0]) + jnp.sum(o[1]))
        ts = []
        for _ in range(6):
            r0, i0 = jnp.asarray(re), jnp.asarray(im)
            t0 = _t.perf_counter()
            K = 4
            for _ in range(K):
                o = fn(r0, i0)
                r0, i0 = o  # chain: donated path reuses the freed buffers
            float(jnp.sum(o[0]) + jnp.sum(o[1]))
            ts.append((_t.perf_counter() - t0) / K)
        flops = 5.0 * batch * n * math.log2(n)
        sol_t = 4 * batch * n * 4 / SPEC_BW
        best = min(ts)
        print(f"{n},policy,{tag},{flops/best/1e9:.1f},"
              f"{flops/sorted(ts)[len(ts)//2]/1e9:.1f},{sol_t/best:.3f},"
              f"{best*1e6:.1f},\"{[round(flops/t/1e9) for t in ts]}\"", flush=True)


if __name__ == "__main__":
    main()
