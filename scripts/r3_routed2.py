"""Round-3: second routed-probe batch.

1. N=64 time-major: is the kernel a win there too?  (Not yet in the
   measured table; envelope tile = 2048.)
2. REAL time-major N=512/2048 through the public API: the half-length
   complex engine routes to the kernel — measure vs forced-xla,
   correctness vs numpy rfft.

Run: python scripts/r3_routed2.py | tee benchmarks/results/routed2_r3.txt
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


def _race(name, routed, forced_xla, data, flops, sol_t):
    from timing import bench_op

    trials = {"routed": [], "xla": []}
    for _ in range(ROUNDS):
        trials["routed"].append(bench_op(routed, data, k1=4, k2=20))
        trials["xla"].append(bench_op(forced_xla, data, k1=4, k2=20))
    wins = sum(1 for tr, tx in zip(trials["routed"], trials["xla"]) if tr < tx)
    for tag in ("routed", "xla"):
        ts = sorted(trials[tag])
        med = ts[len(ts) // 2]
        print(f"  {name} {tag:7s} med {flops/med/1e9:7.1f} GF/s "
              f"(SoL {sol_t/med:.3f}) trials "
              f"{[round(flops/t/1e9) for t in trials[tag]]}", flush=True)
    print(f"  {name} routed wins {wins}/{ROUNDS}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    # --- 1. complex N=64 ---
    n = 64
    b = (64 << 20) // (4 * n)
    b -= b % pk.tb_candidates(n)[0]
    plan = pf.new_setup(n, pf.COMPLEX)
    re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    p5 = pf.new_setup(n, pf.COMPLEX, max_factor=5)
    tb = pk.best_tb(n, b)
    kern = lambda r, i: pk.cfft_pallas_tmajor(p5, r, i, tb=tb)
    xla = lambda r, i: pf.fft.transform_ordered_split_tmajor(plan, (r, i), pf.FORWARD)
    try:
        kr, ki = jax.jit(kern)(re, im)
        ref = np.fft.fft(np.asarray(re[:, :4]).astype(np.float64)
                         + 1j * np.asarray(im[:, :4]).astype(np.float64), axis=0)
        err = float(np.abs(
            (np.asarray(kr[:, :4]) + 1j * np.asarray(ki[:, :4])) - ref
        ).max() / np.abs(ref).max())
        print(f"n=64 b={b} tb={tb}: kernel rel err {err:.2e}", flush=True)
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        _race("c64", kern, xla, (re, im), flops, sol_t)
    except Exception as e:
        print(f"n=64 kernel FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)

    # --- 2. real time-major through the public API ---
    for rn in (512, 2048):
        h = rn // 2
        b = (64 << 20) // (4 * rn)
        cands = pk.tb_candidates(h)
        b -= b % cands[0]
        rplan = pf.new_setup(rn, pf.REAL)
        x = jnp.asarray(rng.standard_normal((rn, b)).astype(np.float32))

        routed = lambda v, p=rplan: pf.fft.transform_ordered_split_tmajor(
            p, v, pf.FORWARD)

        def forced_xla(v, p=rplan):
            dp.set_engine("xla")
            try:
                return pf.fft.transform_ordered_split_tmajor(p, v, pf.FORWARD)
            finally:
                dp.set_engine(None)

        sr, si = jax.jit(routed)(x)
        spec = (np.asarray(sr[:, :4]).astype(np.float64)
                + 1j * np.asarray(si[:, :4]).astype(np.float64))
        ref = np.fft.rfft(np.asarray(x[:, :4]).astype(np.float64), axis=0)
        err = float(np.abs(spec[1:] - ref[1:h]).max() / np.abs(ref).max())
        eng = dp.select_engine(rplan, b, True)
        print(f"real n={rn} b={b} engine={eng}: rel err {err:.2e}", flush=True)
        if err > 1e-5:
            continue
        flops = 2.5 * b * rn * math.log2(rn)
        # real traffic: N in + 2*(N/2) out, f32
        sol_t = (b * rn + 2 * b * h) * 4 / SPEC_BW
        _race(f"r{rn}", routed, forced_xla, (x,), flops, sol_t)


if __name__ == "__main__":
    main()
