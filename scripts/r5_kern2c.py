"""Round-5: combine-kernel v1 vs v2 vs the pure-copy stream ceiling.

kern2b_r5 showed pass B at 0.2-0.43 SoL and pass A degrading under
sustained load (0.80 early trials -> 0.26).  This probe interleaves all
variants round-robin so they share service conditions: per-round wins
and ratios are the signal, not absolute SoL.

Variants per (n, m, r): pure copy (the geometry's per-pass ceiling),
pass B v1 (single-block, in-kernel stride-r slicing) and v2 (per-slab
refs) at the two best tile configs.

Run: python scripts/r5_kern2c.py | tee benchmarks/results/kern2c_r5.txt
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

CONFS = (
    (8192, 2048, 4),
    (16384, 4096, 4),
    (16384, 2048, 8),
    (32768, 4096, 8),
    (65536, 4096, 16),
)


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n, m, r_ in CONFS:
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        built = dp._build_ksplit(n, m, r_)
        if built is None:
            continue
        _, last = built
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW

        variants = {
            "copy": lambda rr, ii: pk.stream_copy_pallas(rr, ii),
        }
        for mk, tbb in ((256, 128), (128, 256), (None, None)):
            if tbb is not None and (b % tbb or m % mk):
                continue
            for v in (1, 2):
                variants[f"B_v{v}_mk{mk}_tb{tbb}"] = (
                    lambda rr, ii, v=v, mk=mk, tbb=tbb: pk.cfft_combine_tmajor(
                        last, rr, ii, mk=mk, tb=tbb, variant=v))

        # compile/warm everything, dropping failures
        live = {}
        for name, fn in variants.items():
            try:
                out = fn(re, im)
                jax.block_until_ready(out)
                live[name] = fn
            except Exception as e:
                print(f"n={n} ({m},{r_}) {name}: FAIL "
                      f"{type(e).__name__}: {e}"[:160], flush=True)

        print(f"n={n} b={b} conf=({m},{r_}) variants={list(live)}",
              flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        base = sorted(trials["copy"])[ROUNDS // 2] if "copy" in trials else None
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            extra = ""
            if base:
                extra = f" {med/base:.2f}x copy"
            print(f"  {k:22s} med {med*1e3:7.3f} ms (pass-SoL "
                  f"{sol_t/med:.3f}){extra} trials "
                  f"{[round(t*1e3, 2) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
