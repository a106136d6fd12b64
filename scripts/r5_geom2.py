"""Round-5: is the ~0.42 copy ceiling per-grid-step overhead?

geom_r5 measured a flat ~0.42 SoL pure-copy ceiling at every aspect
ratio — but the direct FFT kernel at N=1024/tb1024 (16 grid steps of
4 MB blocks) has measured 0.77.  If the ceiling is per-step overhead,
HUGE copy tiles should lift it, and the combine kernel should scale its
block budget (_COMBINE_ELEMS) up.  Interleaved round-robin.

Run: python scripts/r5_geom2.py | tee benchmarks/results/geom2_r5.txt
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
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)

    print("== copy tiles: small vs huge ==", flush=True)
    for n, b in ((16384, 1024), (65536, 256), (1024, 16384)):
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        variants = {}
        for rows, tb in ((512, 512), (2048, 1024), (4096, 2048),
                         (8192, 1024), (n, 2048), (n, 4096)):
            rows_, tb_ = min(rows, n), min(tb, b)
            if n % rows_ or b % tb_:
                continue
            key = f"copy_{rows_}x{tb_}"
            if key in variants:
                continue
            variants[key] = (
                lambda rr, ii, rows_=rows_, tb_=tb_: pk.stream_copy_pallas(
                    rr, ii, rows=rows_, tb=tb_))
        live = {}
        for name, fn in variants.items():
            try:
                out = fn(re, im)
                jax.block_until_ready(out)
                live[name] = fn
            except Exception as e:
                print(f"[{n},{b}] {name}: FAIL {type(e).__name__}: {e}"[:120],
                      flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        print(f"[{n},{b}]", flush=True)
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"  {k:18s} SoL {sol_t/med:.3f} trials "
                  f"{[round(sol_t/t, 2) for t in trials[k]]}", flush=True)

    print("== combine v2 block budget ==", flush=True)
    for n, m, r_ in ((16384, 4096, 4), (32768, 4096, 8), (65536, 4096, 16)):
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        _, last = dp._build_ksplit(n, m, r_)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        variants = {}
        for mk in (64, 256, 1024, 2048):
            if m % mk:
                continue
            tbb = min(b, 256)
            # block budget: mk*r*tb elements, in+out pairs + double buffer
            variants[f"v2_mk{mk}"] = (
                lambda rr, ii, mk=mk, tbb=tbb: pk.cfft_combine_tmajor(
                    last, rr, ii, mk=mk, tb=tbb, variant=2))
        live = {}
        for name, fn in variants.items():
            try:
                out = fn(re, im)
                jax.block_until_ready(out)
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:120],
                      flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        print(f"n={n} b={b} conf=({m},{r_})", flush=True)
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"  {k:12s} SoL {sol_t/med:.3f} trials "
                  f"{[round(sol_t/t, 2) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
