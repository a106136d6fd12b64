"""Round-2 on-chip experiment 1: Gauss cmul + transpose-free four-step.

Measures, on the real TPU chip:
  1. N=4096 headline shape: 4mul vs gauss stage contraction throughput.
  2. Gauss on-chip accuracy (carrier dynamic range + rel err vs numpy).
  3. Large-N local four-step (transpose-free einsum formulation):
     N = 65536 .. 2^20 throughput + speed-of-light fraction.

Run:  python scripts/r2_perf1.py [--quick]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({getattr(dev, 'device_kind', '?')})", flush=True)
    rng = np.random.default_rng(0)

    def gfl(n, b, t):
        return 5.0 * b * n * math.log2(n) / t / 1e9

    def sol(n, b, t):
        return (4 * b * n * 4 / SPEC_BW) / t

    def run_case(n, batch, mode, trials=4):
        plan = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        sp.set_cmul_mode(mode)
        try:
            fft = lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
            ts = [
                bench_op(fft, (re, im), k1=2, k2=10 if quick else 16)
                for _ in range(2 if quick else trials)
            ]
        finally:
            sp.set_cmul_mode(None)
        t = min(ts)
        print(
            f"N={n:7d} B={batch:5d} {mode:5s} factors={plan.factors}: "
            f"{gfl(n, batch, t):8.1f} GF/s  SoL={sol(n, batch, t):.3f}  "
            f"trials={[round(gfl(n, batch, x), 1) for x in ts]}",
            flush=True,
        )
        return t

    # --- 1. headline shape, both cmul modes -------------------------------
    n, b = 4096, 2048
    t4 = run_case(n, b, "4mul")
    tg = run_case(n, b, "gauss")
    print(f"gauss speedup at N={n}: {t4 / tg:.3f}x", flush=True)

    # --- 2. gauss on-chip accuracy ---------------------------------------
    sp.set_cmul_mode("gauss")
    try:
        plan = pf.new_setup(n, pf.COMPLEX)
        # carrier dynamic range at a handful of bins (test_pffft.c:52-61 analog)
        worst = 1e9
        for k in (1, 37, n // 2, n - 5):
            ph = 2 * np.pi * k * np.arange(n) / n
            re = jnp.asarray(np.cos(ph).astype(np.float32))[None]
            im = jnp.asarray(np.sin(ph).astype(np.float32))[None]
            sr, si = jax.jit(
                lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
            )(re, im)
            mag = np.abs(np.asarray(sr)[0] + 1j * np.asarray(si)[0])
            side = np.partition(mag, -2)[-2]
            dyn = 20 * np.log10(mag.max() / max(side, 1e-30))
            worst = min(worst, dyn)
        print(f"gauss on-chip carrier dynrange N={n}: {worst:.1f} dB (bound 140)", flush=True)
        xr = rng.standard_normal((4, n)).astype(np.float32)
        xi = rng.standard_normal((4, n)).astype(np.float32)
        sr, si = jax.jit(
            lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
        )(jnp.asarray(xr), jnp.asarray(xi))
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(sr) + 1j * np.asarray(si)
        print(
            f"gauss on-chip rel err vs numpy: {np.abs(got - ref).max() / np.abs(ref).max():.3e}",
            flush=True,
        )
    finally:
        sp.set_cmul_mode(None)

    # --- 3. large-N four-step (transpose-free) ----------------------------
    cases = [(65536, 256), (131072, 128), (262144, 64)]
    if not quick:
        cases += [(524288, 32), (1048576, 16)]
    for n, batch in cases:
        run_case(n, batch, "gauss", trials=3)
        if n == 65536:
            run_case(n, batch, "4mul", trials=2)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s")
