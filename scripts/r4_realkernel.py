"""Round-4 probe: one-pass Pallas real split step vs the jnp composition.

real_anatomy_r4.txt showed the jnp split step costs ~5 HBM passes (0.093
SoL) — 70% of the half-length engine's own time at N=2^20-2^21.  The
kernel (ops/real_kernel.py) does it in one pass (3 reads + 1 write).
Races (a) the bare split step, (b) the FULL routed real forward, against
the jnp forms, interleaved rounds, correctness-gated.

Run: python scripts/r4_realkernel.py | tee benchmarks/results/realkernel_r4.txt
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
    from pffft_tpu.ops import real_kernel as rk
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    for n in (1 << 17, 1 << 19, 1 << 20, 1 << 21):
        h = n // 2
        b = max(8, (32 << 20) // (4 * n))
        plan = pf.new_setup(n, pf.REAL)
        tw = plan.real_twiddle
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        # correctness of the kernel split step on-chip
        kr, ki = jax.jit(lambda a, c: rk.real_split_pallas(a, c, tw))(zr, zi)
        jr, ji = jax.jit(
            lambda a, c: sp.real_forward_split_planar(a, c, tw))(zr, zi)
        err = max(float(jnp.abs(kr - jr).max()), float(jnp.abs(ki - ji).max()))
        scale = float(jnp.abs(jr).max())
        print(f"n={n} b={b} split kernel rel err {err/scale:.2e} "
              f"blocks={rk.pick_blocks(b, h)}", flush=True)
        if err / scale > 1e-5:
            continue

        def full_routed(v):
            return pff.transform_ordered_split(plan, v, pf.FORWARD)

        def full_jnp(v):
            zr_, zi_ = sp.pack_real_input_split(v)
            from pffft_tpu.ops import dispatch as dp
            zr_, zi_ = dp.cfft_dispatch(plan, zr_, zi_, backward=False)
            return sp.real_forward_split_planar(zr_, zi_, tw)

        variants = {
            "split_knl": (lambda a, c: rk.real_split_pallas(a, c, tw), (zr, zi)),
            "split_jnp": (
                lambda a, c: sp.real_forward_split_planar(a, c, tw), (zr, zi)),
            "full_routed": (full_routed, (x,)),
            "full_jnp": (full_jnp, (x,)),
        }
        trials = {k: [] for k in variants}
        live = dict(variants)
        for _ in range(ROUNDS):
            for k, (fn, data) in list(live.items()):
                try:
                    trials[k].append(bench_op(fn, data, k1=3, k2=12, repeats=2))
                except Exception as e:
                    print(f"n={n} {k}: FAIL {type(e).__name__}: {str(e)[:90]}",
                          flush=True)
                    live.pop(k)
        bytes_split = 4 * b * h * 4
        bytes_full = 2 * b * n * 4
        for k in variants:
            if not trials[k]:
                continue
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            by = bytes_split if k.startswith("split") else bytes_full
            print(f"n={n} {k:11s}: med {med*1e3:8.2f} ms  SoL {by/SPEC_BW/med:.3f}"
                  f"  trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
