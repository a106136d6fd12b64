"""Round-5: can a reversal be EMULATED in-kernel via rolls?

Mosaic has no `rev` lowering (lane or sublane) — the one-pass real split
kernel is interpret-only and the fused FFT+split real forward is
blocked.  But reversal = XOR with (n-1) on the index, and XOR with a
single bit s is y[i] = x[i XOR s] = select(bit s of i, roll(x, s),
roll(x, -s)) — log2(n) roll-pairs + selects, all VMEM-resident.
pltpu.roll is known to lower (CLAUDE.md).  This probe checks, on chip:

  1. roll on the LANE axis and the SUBLANE axis inside a kernel
  2. the XOR-network reversal on each axis (vs numpy)
  3. a timed [H, tb] sublane-reversal kernel at H=8192 (the fused real
     forward's geometry)

Run: python scripts/r5_revroll.py | tee benchmarks/results/revroll_r5.txt
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from timing import bench_op

    rng = np.random.default_rng(0)

    def rev_axis(x, n, axis):
        """Reversal via the XOR roll network (n = pow2 size of axis)."""

        idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
        s = 1
        while s < n:
            hi = pltpu.roll(x, (n - s) % n, axis)   # x[i + s]
            lo = pltpu.roll(x, s, axis)             # x[i - s]
            x = jnp.where((idx & s) != 0, lo, hi)
            s *= 2
        return x

    CASES = {}

    def k_roll_lane(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 1)

    CASES["roll_lane"] = (k_roll_lane,
                          lambda a: np.roll(a, 3, axis=1))

    def k_roll_sub(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, 0)

    CASES["roll_sub"] = (k_roll_sub,
                         lambda a: np.roll(a, 3, axis=0))

    def k_rev_lane(x_ref, o_ref):
        o_ref[:] = rev_axis(x_ref[:], x_ref.shape[1], 1)

    CASES["rev_lane"] = (k_rev_lane, lambda a: a[:, ::-1])

    def k_rev_sub(x_ref, o_ref):
        o_ref[:] = rev_axis(x_ref[:], x_ref.shape[0], 0)

    CASES["rev_sub"] = (k_rev_sub, lambda a: a[::-1])

    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    spec = pl.BlockSpec((256, 256), lambda: (0, 0), memory_space=pltpu.VMEM)
    for name, (kern, ref) in CASES.items():
        try:
            out = pl.pallas_call(
                kern,
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 << 20),
            )(x)
            got = np.asarray(out)
            want = ref(np.asarray(x))
            ok = np.array_equal(got, want)
            print(f"{name}: {'OK' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:200], flush=True)

    # timed sublane reversal at the fused-real-forward geometry
    h, b, tb = 8192, 1024, 128
    zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    dspec = pl.BlockSpec((h, tb), lambda j: (0, j), memory_space=pltpu.VMEM)

    def k_rev2(ar_ref, ai_ref, or_ref, oi_ref):
        or_ref[:] = rev_axis(ar_ref[:], h, 0)
        oi_ref[:] = rev_axis(ai_ref[:], h, 0)

    try:
        call = lambda a, c: pl.pallas_call(
            k_rev2,
            grid=(b // tb,),
            in_specs=[dspec, dspec],
            out_specs=[dspec, dspec],
            out_shape=[jax.ShapeDtypeStruct((h, b), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(a, c)
        gr, gi = call(zr, zi)
        ok = np.array_equal(np.asarray(gr), np.asarray(zr)[::-1])
        print(f"rev_sub_8192: {'OK' if ok else 'WRONG'}", flush=True)
        pass_t = 4 * h * b * 4 / SPEC_BW
        ts = sorted(bench_op(call, (zr, zi), k1=4, k2=20) for _ in range(5))
        med = ts[len(ts) // 2]
        print(f"rev_sub_8192 timed: {med*1e3:.3f} ms "
              f"({pass_t/med:.3f} of the 2-plane copy SoL) trials "
              f"{[round(t*1e3, 3) for t in ts]}", flush=True)
    except Exception as e:
        print(f"rev_sub_8192: FAIL {type(e).__name__}: {e}"[:200], flush=True)


if __name__ == "__main__":
    main()
