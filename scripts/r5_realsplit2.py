"""Round-5: one-pass split-step kernel at the kern2-routed real sizes.

The fused FFT+split kernel covers H<=4096; at H>=8192 the FFT rides
kern2 and the split stays the flat jnp form (~2.7 passes,
realanat_r5.txt).  real_split_tmajor_pallas holds the whole [H, tb]
column in VMEM, so the Hermitian mirror is a free roll network and the
split is ONE pass.  Races, per real N in {16384, 32768, 65536}
(composition pieces, no global route games):

  fwd_flat   — packed kern2 + flat jnp split (the routed path today)
  fwd_skern  — packed kern2 + split kernel
  bwd_flat   — flat prep + kern2 bwd + interleave
  bwd_skern  — split-kernel prep + kern2 bwd + interleave

At H=16384/tb128 the split kernel is a 2M-element wall tile (arb127
config; a failing compile can take ~10 min).

Run: python scripts/r5_realsplit2.py | tee benchmarks/results/realsplit2_r5.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (16384, 32768, 65536):
        h = n // 2
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        rplan = pf.new_setup(n, pf.REAL)
        cplan = pf.new_setup(h, pf.COMPLEX)
        x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        sol_f = 2 * b * n * 4 / SPEC_BW
        flops = 2.5 * b * n * math.log2(n)

        def kern2_fwd(y):
            return dp.cfft_kern2_tmajor_packed(cplan, y)

        def fwd_flat(v):
            ar, ai = kern2_fwd(v.reshape(h, 2 * b))
            sr, si = sp.real_forward_split_planar_tmajor_flat(
                ar, ai, rplan.real_twiddle)
            return jnp.concatenate([sr, si], axis=0)

        def fwd_skern(v):
            ar, ai = kern2_fwd(v.reshape(h, 2 * b))
            sr, si = pk.real_split_tmajor_pallas(
                ar, ai, rplan.real_twiddle)
            return jnp.concatenate([sr, si], axis=0)

        def bwd_flat(sr_, si_):
            pr, pi = sp.real_backward_split_planar_tmajor_flat(
                sr_, si_, rplan.real_twiddle)
            wr, wi = dp.cfft_kern2_tmajor(cplan, pr, pi, backward=True)
            y = sp.interleave_to_real_split_tmajor(wr, wi)
            return y[:h], y[h:]

        def bwd_skern(sr_, si_):
            pr, pi = pk.real_split_tmajor_pallas(
                sr_, si_, rplan.real_twiddle, backward=True)
            wr, wi = dp.cfft_kern2_tmajor(cplan, pr, pi, backward=True)
            y = sp.interleave_to_real_split_tmajor(wr, wi)
            return y[:h], y[h:]

        # the sweep measures PAIRS, and at these sizes the pair costs
        # ~2.3x the sum of the measured parts (sweep_r5b 0.072 vs
        # realpack fwd 0.202 + bwd 0.141 at N=16384) — race the pair
        # compositions too
        def pair_flat(v):
            s = fwd_flat(v)
            a, c = bwd_flat(s[:h], s[h:])
            return jnp.concatenate([a, c], axis=0)

        def pair_skern(v):
            s = fwd_skern(v)
            a, c = bwd_skern(s[:h], s[h:])
            return jnp.concatenate([a, c], axis=0)

        variants = {
            "fwd_flat": (fwd_flat, (x,)),
            "fwd_skern": (fwd_skern, (x,)),
            "bwd_flat": (bwd_flat, (zr, zi)),
            "bwd_skern": (bwd_skern, (zr, zi)),
            "pair_flat": (pair_flat, (x,)),
            "pair_skern": (pair_skern, (x,)),
        }

        ref = np.fft.rfft(np.asarray(x[:, :2]).astype(np.float64), axis=0)
        live = {}
        for name, (fn, data) in variants.items():
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
