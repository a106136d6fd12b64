"""Round-5: df64 slice-budget A/B (TAU/DF_CHUNKS) + VPU-share diagnosis.

df64_r5: 32-39 GF/s (11-13x soft-float) at 282 dB — far past the 215 dB
bound, so there's budget to trim.  TAU=6 cuts 28 -> 21 matmuls (tail
~255 dB); DF_CHUNKS=6 cuts the peel cost.  Also times the bare peel and
the bare twiddle df-cmul to see where the non-MXU time goes.

Run: python scripts/r5_df64b.py | tee benchmarks/results/df64b_r5.txt
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
    n = 4096
    b = max(256, (32 << 20) // (8 * n))
    plan = pf.new_setup(n, pf.COMPLEX, dtype=np.float64)
    z = rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n))
    rr = df64.df_from_f64(z.real)
    ii = df64.df_from_f64(z.imag)
    args = tuple(jnp.asarray(a) for a in (*rr, *ii))
    ref = np.fft.fft(z[:4], axis=-1)
    flops = 5.0 * b * n * math.log2(n)

    for tau, chunks in ((7, 7), (6, 6), (6, 7), (5, 5)):
        df64.TAU, df64.DF_CHUNKS = tau, chunks

        def fn(a, bb, c, d):
            (yh, yl), (vh, vl) = df64.df64_cfft_split(
                (a, bb), (c, d), plan.stages, backward=False)
            return yh, yl, vh, vl

        try:
            yh, yl, vh, vl = jax.jit(fn)(*args)
            got = (df64.df_to_f64(np.asarray(yh[:4]), np.asarray(yl[:4]))
                   + 1j * df64.df_to_f64(np.asarray(vh[:4]),
                                         np.asarray(vl[:4])))
            err = float(np.abs(got - ref).max() / np.abs(ref).max())
            db = -20 * math.log10(err)
            ts = [bench_op(fn, args, k1=2, k2=8) for _ in range(ROUNDS)]
            med = sorted(ts)[len(ts) // 2]
            print(f"tau={tau} chunks={chunks}: {flops/med/1e9:7.1f} GF/s, "
                  f"err {err:.2e} ({db:.1f} dB) trials "
                  f"{[round(flops/t/1e9, 1) for t in ts]}", flush=True)
        except Exception as e:
            print(f"tau={tau} chunks={chunks}: FAIL {type(e).__name__}: "
                  f"{e}"[:160], flush=True)
    df64.TAU, df64.DF_CHUNKS = 7, 7

    # where does the time go? bare peel / bare twiddle cmul / one contraction
    x4 = args[0].reshape(b, 1, 64, 64), args[1].reshape(b, 1, 64, 64)

    def peel(a, bb):
        # shape-preserving wrap (bench_op chains outputs back to inputs)
        cs = df64._peel_aligned(a, bb, 2, 7)[0]
        return sum(cs), bb

    ts = [bench_op(peel, x4, k1=2, k2=8) for _ in range(ROUNDS)]
    print(f"bare peel(7):  {sorted(ts)[len(ts)//2]*1e3:.3f} ms", flush=True)
    w = (jnp.float32(0.6), jnp.float32(1e-9))
    cm = lambda a, bb: df64._df_cmul((a, bb), (bb, a), (w[0], w[1]),
                                     (w[1], w[0]))
    cargs = (args[0], args[1])
    ts = [bench_op(lambda a, bb: sum(
        [jnp.sum(t) for p in cm(a, bb) for t in p]).reshape(1),
        cargs, k1=2, k2=8) for _ in range(ROUNDS)]
    print(f"bare df cmul:  {sorted(ts)[len(ts)//2]*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
