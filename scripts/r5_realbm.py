"""Round-5: batch-major one-pass real split kernel — now compiling?

ops/real_kernel.py was interpret-only (Mosaic rev gap); the roll-network
reversal (revroll_r5) unblocks it.  Race the split step alone on
batch-major [B, H] planes at the route gate's geometries (H >= 2^14):
flat jnp form vs the 3-view kernel, both directions.

Run: python scripts/r5_realbm.py | tee benchmarks/results/realbm_r5.txt
"""

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
    from pffft_tpu.ops import real_kernel as rk
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (1 << 20, 1 << 21):
        h = n // 2
        b = max(8, (64 << 20) // (4 * n) * 2)
        rplan = pf.new_setup(n, pf.REAL)
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        pass_t = 4 * b * h * 4 / SPEC_BW  # 2 planes r+w

        variants = {
            "fwd_flat": (lambda a, c: sp.real_forward_split_planar_flat(
                a, c, rplan.real_twiddle)),
            "fwd_kern": (lambda a, c: rk.real_split_pallas(
                a, c, rplan.real_twiddle)),
            "bwd_flat": (lambda a, c: sp.real_backward_split_planar_flat(
                a, c, rplan.real_twiddle)),
            "bwd_kern": (lambda a, c: rk.real_split_pallas(
                a, c, rplan.real_twiddle, backward=True)),
        }

        live = {}
        for name, fn in variants.items():
            print(f"n={n} {name}: validating...", flush=True)
            try:
                out = jax.jit(fn)(zr, zi)
                jax.block_until_ready(out)
                if name == "fwd_kern":
                    a2, c2 = jax.jit(variants["fwd_flat"])(zr, zi)
                    err = max(
                        float(jnp.abs(out[0] - a2).max()),
                        float(jnp.abs(out[1] - c2).max()),
                    ) / float(jnp.abs(a2).max())
                    if err > 1e-5:
                        print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                        continue
                if name == "bwd_kern":
                    a2, c2 = jax.jit(variants["bwd_flat"])(zr, zi)
                    err = max(
                        float(jnp.abs(out[0] - a2).max()),
                        float(jnp.abs(out[1] - c2).max()),
                    ) / float(jnp.abs(a2).max())
                    if err > 1e-5:
                        print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                        continue
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)

        print(f"n={n} h={h} b={b} live={list(live)}", flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                try:
                    trials[k].append(bench_op(live[k], (zr, zi), k1=4, k2=20))
                except Exception as e:
                    print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:10s} med {med*1e3:7.3f} ms ({pass_t/med:.3f} of the "
                  f"2-plane pass SoL) trials "
                  f"{[round(pass_t/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
