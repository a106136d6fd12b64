"""Round-5: the fused one-pass real transform vs the routed composition.

revroll_r5 proved in-kernel reversal (XOR roll network) lowers and runs
at the copy ceiling; rfft_pallas_tmajor_fused folds the REAL_FINALIZE /
REAL_PREPROCESS split into the FFT kernel — the real forward becomes
ONE HBM pass (packed input -> stages -> in-VMEM mirror+combine -> packed
spectrum).  This probe races, per real N (tmajor, >=64 MB payloads):

  fwd_fused  — the new one-pass kernel
  fwd_pub    — the routed path (packed kern2 at H>=8192; packed direct
               kernel + flat jnp split below)
  bwd_fused  — fused prep+stages + lane-form interleave
  bwd_pub    — routed backward

Winners feed the fused-real route table.

Run: python scripts/r5_fusedreal.py | tee benchmarks/results/fusedreal_r5.txt
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

    for n in (1024, 2048, 4096, 8192, 16384):
        h = n // 2
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        rplan = pf.new_setup(n, pf.REAL)
        pplan = dp._thin_plan(h)
        x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
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

        zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))

        variants = {
            "fwd_fused": (sol_f, fused_fwd, (x,)),
            "fwd_pub": (sol_f, pub_fwd, (x,)),
            "bwd_fused": (sol_f, fused_bwd, (zr, zi)),
            "bwd_pub": (sol_f, pub_bwd, (zr, zi)),
        }

        # correctness: fused fwd vs numpy rfft on 2 columns
        ref = np.fft.rfft(np.asarray(x[:, :2]).astype(np.float64), axis=0)
        live = {}
        for name, (sol, fn, data) in variants.items():
            print(f"n={n} {name}: validating...", flush=True)
            try:
                out = fn(*data)
                if name.startswith("fwd"):
                    fr = np.asarray(out[:h, :2]).astype(np.float64)
                    fi = np.asarray(out[h:, :2]).astype(np.float64)
                    got = fr + 1j * fi
                    err = float(np.abs(got[1:] - ref[1:-1]).max()
                                / np.abs(ref).max())
                    if err > 1e-5:
                        print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                        continue
                else:
                    jax.block_until_ready(out)
                live[name] = (sol, fn, data)
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)

        print(f"n={n} h={h} b={b} live={list(live)}", flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                sol, fn, data = live[k]
                try:
                    trials[k].append(bench_op(fn, data, k1=4, k2=20))
                except Exception as e:
                    print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            sol, fn, data = live[k]
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:10s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol/med:.3f}) trials "
                  f"{[round(sol/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
