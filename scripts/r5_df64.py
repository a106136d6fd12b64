"""Round-5: double-float (two-f32) MXU engine on chip — accuracy + speed.

VERDICT r4 next-4: the pffftd_ surface deserves more than soft-float
(2-4 GF/s).  ops/df64.py runs stage contractions as exact-slice
(Ozaki-style) bf16 MXU matmuls.  This probe, at N=4096 and N=1024:
  * accuracy vs numpy f64 (bound: beat 215 dB = 1.8e-11; expect ~1e-14),
  * throughput: df64 route vs the XLA soft-float f64 path vs f32 engine.

Run: python scripts/r5_df64.py | tee benchmarks/results/df64_r5.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

SPEC_BW = 819e9
ROUNDS = 5


def main():
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (1024, 4096):
        b = max(256, (32 << 20) // (8 * n))
        plan = pf.new_setup(n, pf.COMPLEX, dtype=np.float64)
        print(f"n={n} b={b} f64 factors={plan.factors} "
              f"df64_route={dp._df64_route(plan)}", flush=True)
        z = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
        re64 = jnp.asarray(z.real)
        im64 = jnp.asarray(z.imag)
        re32 = jnp.asarray(z.real.astype(np.float32))
        im32 = jnp.asarray(z.imag.astype(np.float32))
        plan32 = pf.new_setup(n, pf.COMPLEX)

        def df64_fn(r, i):
            return dp._cfft_df64(
                plan, r, i, backward=False, time_major=False)

        def soft_fn(r, i):
            return sp.cfft_plan_split(
                plan, r, i, backward=False, ordered=True)

        def f32_fn(r, i):
            return dp.cfft_dispatch(plan32, r, i, backward=False)

        # correctness on chip (first 4 rows)
        ref = np.fft.fft(z[:4], axis=-1)
        for name, fn, (rr, ii) in (
            ("df64", df64_fn, (re64, im64)),
            ("soft", soft_fn, (re64, im64)),
        ):
            try:
                sr, si = jax.jit(fn)(rr, ii)
                got = (np.asarray(sr[:4], dtype=np.float64)
                       + 1j * np.asarray(si[:4], dtype=np.float64))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                db = -20 * math.log10(err) if err > 0 else 999
                print(f"  {name}: rel err {err:.3e} ({db:.1f} dB)",
                      flush=True)
            except Exception as e:
                print(f"  {name}: FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)

        flops = 5.0 * b * n * math.log2(n)
        for name, fn, data, bw in (
            ("df64", df64_fn, (re64, im64), 8),
            ("soft", soft_fn, (re64, im64), 8),
            ("f32", f32_fn, (re32, im32), 4),
        ):
            try:
                ts = []
                for _ in range(ROUNDS):
                    ts.append(bench_op(fn, data, k1=2, k2=8))
                med = sorted(ts)[len(ts) // 2]
                sol_t = 4 * b * n * bw / SPEC_BW
                print(f"  {name:5s} med {flops/med/1e9:8.1f} GF/s "
                      f"(SoL {sol_t/med:.3f}) trials "
                      f"{[round(flops/t/1e9, 1) for t in ts]}", flush=True)
            except Exception as e:
                print(f"  {name}: TIMING FAIL {type(e).__name__}: {e}"[:200],
                      flush=True)


if __name__ == "__main__":
    main()
