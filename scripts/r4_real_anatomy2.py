"""Round-4 probe: real-path anatomy at the SWEEP geometry (tiny B, huge H).

sweep_r4_real: N=2^21 B=8 runs at 0.023 sol_med while the complex engine
at the same size/bytes (H=2^20, B=8) runs 0.104 — the flat split should
only cost ~1.5 extra passes.  Time every component at exactly this
geometry: pack, engine, flat split fwd/bwd, classic split, interleave,
full fwd, full bwd — sum-of-parts vs full identifies any hidden pass.

Run: python scripts/r4_real_anatomy2.py | tee benchmarks/results/real_anatomy2_r4.txt
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
    from pffft_tpu import fft as pff
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    for n, b in ((1 << 21, 8), (1 << 20, 8)):
        h = n // 2
        plan = pf.new_setup(n, pf.REAL)
        cplan = pf.new_setup(h, pf.COMPLEX)
        tw = plan.real_twiddle
        print(f"\n# N={n} B={b} engine factors {cplan.factors} "
              f"ls={cplan.local_split}", flush=True)
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))

        variants = {
            "pack": (lambda v: sp.pack_real_input_split(v), (x,)),
            "engine": (
                lambda a, c: dp.cfft_dispatch(cplan, a, c, backward=False),
                (zr, zi)),
            "engine_bwd": (
                lambda a, c: dp.cfft_dispatch(cplan, a, c, backward=True),
                (zr, zi)),
            "split_flat": (
                lambda a, c: sp.real_forward_split_planar_flat(a, c, tw),
                (zr, zi)),
            "split_classic": (
                lambda a, c: sp.real_forward_split_planar(a, c, tw),
                (zr, zi)),
            "bwd_flat": (
                lambda a, c: sp.real_backward_split_planar_flat(a, c, tw),
                (zr, zi)),
            "interleave": (
                lambda a, c: (sp.interleave_to_real_split(a, c),), (zr, zi)),
            "flip": (lambda a, c: sp._reverse_conj_split(a, c), (zr, zi)),
        }
        trials = {k: [] for k in variants}
        live = dict(variants)
        for _ in range(ROUNDS):
            for k, (fn, data) in list(live.items()):
                try:
                    trials[k].append(bench_op(fn, data, k1=4, k2=20, repeats=2))
                except Exception as e:
                    print(f"{k}: FAIL {type(e).__name__}: {str(e)[:90]}",
                          flush=True)
                    live.pop(k)
        # full paths (not carry-preserving: time fwd+bwd PAIR, which is)
        def pair(v):
            sr, si = pff.transform_ordered_split(plan, v, pf.FORWARD)
            return (pff.transform_ordered_split(
                plan, (sr, si), pf.BACKWARD) / n,)

        tp = sorted(bench_op(pair, (x,), k1=3, k2=12, repeats=2)
                    for _ in range(ROUNDS))
        bytes_pair = 2 * (2 * b * n * 4)
        med = tp[len(tp) // 2]
        print(f"full fwd+bwd pair: med {med*1e3:8.3f} ms "
              f"SoL {bytes_pair/SPEC_BW/med:.3f} "
              f"trials(ms) {[round(t*1e3,2) for t in tp]}", flush=True)
        for k in variants:
            if not trials[k]:
                continue
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            by = 2 * b * n * 4 if k in ("pack", "interleave") else 4 * b * h * 4
            print(f"{k:13s}: med {med*1e3:8.3f} ms  SoL {by/SPEC_BW/med:.3f}  "
                  f"trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
