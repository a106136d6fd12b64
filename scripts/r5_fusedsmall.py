"""Round-5: fused one-pass real kernels at small H (64..256).

fusedreal_r5 measured H=512..8192; the route ships H=512..4096.  The
front sizes (real N=128..512, H=64..256) still run the composed path at
~0.14-0.19 — same race, small end.

Run: python scripts/r5_fusedsmall.py | tee benchmarks/results/fusedsmall_r5.txt
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
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (128, 256, 512):
        h = n // 2
        b = (64 << 20) // (4 * n)
        b -= b % 1024
        rplan = pf.new_setup(n, pf.REAL)
        pplan = dp._thin_plan(h)
        x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        sol_f = 2 * b * n * 4 / SPEC_BW
        flops = 2.5 * b * n * math.log2(n)

        def fused_fwd(v):
            sr, si = pk.rfft_pallas_tmajor_fused(
                pplan, v.reshape(h, 2 * b), rplan.real_twiddle)
            return jnp.concatenate([sr, si], axis=0)

        def pub_fwd(v):
            sr, si = pf.fft.transform_ordered_split_tmajor(
                rplan, v, pf.FORWARD)
            return jnp.concatenate([sr, si], axis=0)

        def fused_bwd(sr_, si_):
            br, bi = pk.rfft_bwd_pallas_tmajor_fused(
                pplan, sr_, si_, rplan.real_twiddle)
            y = sp.interleave_to_real_split_tmajor(br, bi)
            return y[:h], y[h:]

        def pub_bwd(sr_, si_):
            y = pf.fft.transform_ordered_split_tmajor(
                rplan, (sr_, si_), pf.BACKWARD)
            return y[:h], y[h:]

        variants = {
            "fwd_fused": (fused_fwd, (x,)),
            "fwd_pub": (pub_fwd, (x,)),
            "bwd_fused": (fused_bwd, (zr, zi)),
            "bwd_pub": (pub_bwd, (zr, zi)),
        }
        ref = np.fft.rfft(np.asarray(x[:, :2]).astype(np.float64), axis=0)
        live = {}
        for name, (fn, data) in variants.items():
            print(f"n={n} {name}: validating...", flush=True)
            try:
                out = fn(*data)
                if name.startswith("fwd"):
                    got = (np.asarray(out[:h, :2]).astype(np.float64)
                           + 1j * np.asarray(out[h:, :2]))
                    err = float(np.abs(got[1:] - ref[1:-1]).max()
                                / np.abs(ref).max())
                    if err > 1e-5:
                        print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                        continue
                else:
                    jax.block_until_ready(out)
                live[name] = (fn, data)
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)
        print(f"n={n} h={h} b={b} live={list(live)}", flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                fn, data = live[k]
                try:
                    trials[k].append(bench_op(fn, data, k1=4, k2=20))
                except Exception as e:
                    print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:10s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol_f/med:.3f}) trials "
                  f"{[round(sol_f/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
