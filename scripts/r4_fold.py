"""Round-4 probe: folded real chain vs the composed path.

The fold absorbs the interleaved<->planar conversions (~65% of the real
transform, real_anatomy2/3_r4) into the first/last stage contractions.
Race the FULL real fwd+bwd pair: fold (shipped gate) vs composed
(gate monkeypatched off), at the sweep geometry and a large-B geometry.

Run: python scripts/r4_fold.py | tee benchmarks/results/fold_r4.txt
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
    from timing import bench_op

    rng = np.random.default_rng(0)
    real_use_fold = pff._use_fold
    for n, b in ((1 << 21, 8), (1 << 20, 8), (1 << 20, 128), (65536, 128),
                 (4096, 2048)):
        plan = pf.new_setup(n, pf.REAL)
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        def make_pair():
            def pair(v, p=plan):
                sr, si = pff.transform_ordered_split(p, v, pf.FORWARD)
                return (
                    pff.transform_ordered_split(p, (sr, si), pf.BACKWARD) / n,
                )
            return pair

        # correctness + roundtrip through the shipped (folded) route
        (y,) = jax.jit(make_pair())(x)
        err = float(jnp.abs(y - x).max())
        print(f"N={n} B={b}: fold roundtrip err {err:.2e} "
              f"(fold={pff._use_fold(plan, b)})", flush=True)

        results = {}
        for tag, fold_on in (("fold", True), ("composed", False)):
            pff._use_fold = (lambda p, bb: real_use_fold(p, bb)) if fold_on \
                else (lambda p, bb: False)
            # the fold gate is not part of dispatch.state_key (it is a
            # pure function of plan/batch/backend in production) — the
            # monkeypatch requires a fresh trace or the A/B compares an
            # executable against itself (the CLAUDE.md trap)
            pff._jitted_split.cache_clear()
            pair = make_pair()  # fresh step: bench_op's loop cache keys on it
            ts = []
            for _ in range(ROUNDS):
                try:
                    ts.append(bench_op(pair, (x,), k1=3, k2=12, repeats=2))
                except Exception as e:
                    print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:80]}",
                          flush=True)
                    break
            pff._use_fold = real_use_fold
            if not ts:
                continue
            ts = sorted(ts)
            results[tag] = ts[len(ts) // 2]
            by = 2 * (2 * b * n * 4)
            print(f"N={n} B={b} {tag:9s}: med {results[tag]*1e3:8.3f} ms "
                  f"SoL {by/SPEC_BW/results[tag]:.3f} "
                  f"trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)
        if len(results) == 2:
            print(f"N={n} B={b}: fold is "
                  f"{results['composed']/results['fold']:.2f}x composed",
                  flush=True)


if __name__ == "__main__":
    main()
