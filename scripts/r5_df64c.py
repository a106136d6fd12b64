"""Round-5: df64 at large N — the chain-preference fix's new coverage.

plan.py now prefers a df64-eligible chain (all r <= 128) over the local
four-step for f64 plans, so N > 16384 f64 rides the MXU engine instead
of 3-5 GF/s soft-float.  This probe measures accuracy + throughput at
N = 32768 / 262144 for TAU 7 and 6 (df64b_r5 at N=4096: tau=7 283 dB
37.4 GF/s, tau=6 242 dB 47.0 — does the 242 dB margin survive the
3-stage chains?), plus the public-path f64 transform as routed.

Run: python scripts/r5_df64c.py | tee benchmarks/results/df64c_r5.txt
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
ROUNDS = 4


def main():
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import df64
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (32768, 262144):
        b = max(32, (32 << 20) // (8 * n))
        plan = pf.new_setup(n, pf.COMPLEX, dtype=np.float64)
        print(f"n={n} b={b} factors={plan.factors} "
              f"local_split={plan.local_split is not None}", flush=True)
        z = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
        rr = df64.df_from_f64(z.real)
        ii = df64.df_from_f64(z.imag)
        args = tuple(jnp.asarray(a) for a in (*rr, *ii))
        ref = np.fft.fft(z[:2], axis=-1)
        flops = 5.0 * b * n * math.log2(n)

        for tau, chunks in ((7, 7), (6, 6)):
            df64.TAU, df64.DF_CHUNKS = tau, chunks

            def fn(a, bb, c, d):
                (yh, yl), (vh, vl) = df64.df64_cfft_split(
                    (a, bb), (c, d), plan.stages, backward=False)
                return yh, yl, vh, vl

            try:
                yh, yl, vh, vl = jax.jit(fn)(*args)
                got = (df64.df_to_f64(np.asarray(yh[:2]), np.asarray(yl[:2]))
                       + 1j * df64.df_to_f64(np.asarray(vh[:2]),
                                             np.asarray(vl[:2])))
                err = float(np.abs(got - ref).max() / np.abs(ref).max())
                db = -20 * math.log10(err)
                ts = []
                for _ in range(ROUNDS):
                    try:
                        ts.append(bench_op(fn, args, k1=2, k2=8))
                    except Exception as e:
                        print(f"  trial FAIL {type(e).__name__}"[:100],
                              flush=True)
                if not ts:
                    continue
                med = sorted(ts)[len(ts) // 2]
                print(f"  tau={tau}: {flops/med/1e9:7.1f} GF/s, err "
                      f"{err:.2e} ({db:.1f} dB) trials "
                      f"{[round(flops/t/1e9, 1) for t in ts]}", flush=True)
            except Exception as e:
                print(f"  tau={tau}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)
        df64.TAU, df64.DF_CHUNKS = 7, 7

        # public-path f64 transform (routed df64; bench via split tmajor
        # is n/a for f64 — use the batch-major split entry, 4-in-4-out)
        def pub(a, bb, c, d):
            hr = a.astype(jnp.float64) + bb.astype(jnp.float64)
            hi = c.astype(jnp.float64) + d.astype(jnp.float64)
            sr, si = pf.fft.transform_ordered_split(plan, (hr, hi),
                                                    pf.FORWARD)
            oh = sr.astype(jnp.float32)
            ol = (sr - oh.astype(jnp.float64)).astype(jnp.float32)
            ph = si.astype(jnp.float32)
            pl_ = (si - ph.astype(jnp.float64)).astype(jnp.float32)
            return oh, ol, ph, pl_

        try:
            out = jax.jit(pub)(*args)
            jax.block_until_ready(out)
            ts = []
            for _ in range(ROUNDS):
                try:
                    ts.append(bench_op(pub, args, k1=2, k2=8))
                except Exception as e:
                    print(f"  pub trial FAIL {type(e).__name__}"[:100],
                          flush=True)
            if ts:
                med = sorted(ts)[len(ts) // 2]
                print(f"  public routed: {flops/med/1e9:7.1f} GF/s trials "
                      f"{[round(flops/t/1e9, 1) for t in ts]}", flush=True)
        except Exception as e:
            print(f"  public: FAIL {type(e).__name__}: {e}"[:160], flush=True)


if __name__ == "__main__":
    main()
