"""Round-4 probe: flat-FMA real split step vs the classic composition.

The one-pass Pallas split kernel is blocked (Mosaic has no `rev`
lowering — realkernel_r4.txt), so the split-step fix is algebraic: the
flat-FMA form (precomputed coefficient vectors, where-mask bin0 instead
of slice+concat) should let XLA fuse the combine into ~2 passes where
the classic e/o composition measured ~5 (real_anatomy_r4.txt).
Races bare split steps and FULL real forwards, both at the anatomy
geometry (large B) and the sweep geometry (batch-mib=32, small B).

Run: python scripts/r4_realsplit.py | tee benchmarks/results/realsplit_r4.txt
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
    from pffft_tpu import fft as pff
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    for n, b in ((1 << 19, 64), (1 << 20, 128), (1 << 20, 8), (1 << 21, 4)):
        h = n // 2
        plan = pf.new_setup(n, pf.REAL)
        tw = plan.real_twiddle
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        # correctness: flat vs classic on-chip
        f1 = jax.jit(lambda a, c: sp.real_forward_split_planar_flat(a, c, tw))
        c1 = jax.jit(lambda a, c: sp.real_forward_split_planar(a, c, tw))
        r2, i2 = f1(zr, zi)
        r1, i1 = c1(zr, zi)
        err = max(float(jnp.abs(r1 - r2).max()), float(jnp.abs(i1 - i2).max()))
        sc = float(jnp.abs(r1).max())
        print(f"N={n} B={b}: flat vs classic rel err {err/sc:.2e}", flush=True)
        if err / sc > 1e-5:
            continue

        def full_fwd(v):  # the shipped route (flat on TPU)
            return pff.transform_ordered_split(plan, v, pf.FORWARD)

        variants = {
            "split_classic": (
                lambda a, c: sp.real_forward_split_planar(a, c, tw), (zr, zi)),
            "split_flat": (
                lambda a, c: sp.real_forward_split_planar_flat(a, c, tw),
                (zr, zi)),
            "bwd_classic": (
                lambda a, c: sp.real_backward_split_planar(a, c, tw), (zr, zi)),
            "bwd_flat": (
                lambda a, c: sp.real_backward_split_planar_flat(a, c, tw),
                (zr, zi)),
            "full_fwd": (full_fwd, (x,)),
        }
        trials = {k: [] for k in variants}
        live = dict(variants)
        for _ in range(ROUNDS):
            for k, (fn, data) in list(live.items()):
                try:
                    trials[k].append(bench_op(fn, data, k1=3, k2=12, repeats=2))
                except Exception as e:
                    print(f"N={n} {k}: FAIL {type(e).__name__}: {str(e)[:80]}",
                          flush=True)
                    live.pop(k)
        bytes_split = 4 * b * h * 4
        bytes_full = 2 * b * n * 4
        for k in variants:
            if not trials[k]:
                continue
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            by = bytes_full if k.startswith("full") else bytes_split
            print(f"N={n} B={b} {k:13s}: med {med*1e3:8.3f} ms "
                  f"SoL {by/SPEC_BW/med:.3f}  "
                  f"trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
