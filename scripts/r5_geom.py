"""Round-5: per-pass stream ceiling vs plane geometry + combine v2 retest.

kern2c_r5: a PURE COPY Pallas pass over the band's tall-skinny planes
(e.g. [32768, 512]) runs at only 0.40-0.51 SoL — if that's a geometry
law (not service noise), the two-pass engine's ceiling at the upper band
is ~0.25 and the fix is WIDE views, not kernel micro-opts.  This probe:

  1. copy ceiling across aspect ratios at fixed 64 MB/plane
     ([1024, 16384] ... [65536, 256]), two tile configs each;
  2. combine v2 (wide [m, r*B] slab-block view) vs v1 at the kern2 confs.

Run: python scripts/r5_geom.py | tee benchmarks/results/geom_r5.txt
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

    print("== copy ceiling vs geometry (64 MB/plane) ==", flush=True)
    for n in (1024, 2048, 4096, 8192, 16384, 32768, 65536):
        b = (64 << 20) // (4 * n)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        for rows, tb in ((512, 512), (256, 2048), (1024, 256)):
            rows_ = min(rows, n)
            tb_ = min(tb, b)
            try:
                fn = lambda rr, ii, rows_=rows_, tb_=tb_: pk.stream_copy_pallas(
                    rr, ii, rows=rows_, tb=tb_)
                ts = [bench_op(fn, (re, im), k1=4, k2=20)
                      for _ in range(ROUNDS)]
                med = sorted(ts)[len(ts) // 2]
                print(f"  [{n:6d},{b:6d}] tile({rows_},{tb_}): "
                      f"SoL {sol_t/med:.3f} trials "
                      f"{[round(sol_t/t, 2) for t in ts]}", flush=True)
            except Exception as e:
                print(f"  [{n},{b}] tile({rows_},{tb_}): FAIL "
                      f"{type(e).__name__}: {e}"[:140], flush=True)

    print("== combine v1 vs v2 (interleaved) ==", flush=True)
    for n, m, r_ in ((8192, 2048, 4), (16384, 4096, 4), (16384, 2048, 8),
                     (32768, 4096, 8), (65536, 4096, 16)):
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        _, last = dp._build_ksplit(n, m, r_)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        sol_t = 4 * b * n * 4 / SPEC_BW
        variants = {}
        for v in (1, 2):
            for mk, tbb in ((None, None), (128, 256), (64, min(512, b))):
                if tbb is not None and (b % tbb or m % mk):
                    continue
                key = f"v{v}_mk{mk}_tb{tbb}"
                variants[key] = (
                    lambda rr, ii, v=v, mk=mk, tbb=tbb: pk.cfft_combine_tmajor(
                        last, rr, ii, mk=mk, tb=tbb, variant=v))
        live = {}
        for name, fn in variants.items():
            try:
                out = fn(re, im)
                jax.block_until_ready(out)
                live[name] = fn
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:140],
                      flush=True)
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                trials[k].append(bench_op(live[k], (re, im), k1=4, k2=20))
        print(f"n={n} b={b} conf=({m},{r_})", flush=True)
        for k in live:
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"  {k:18s} SoL {sol_t/med:.3f} trials "
                  f"{[round(sol_t/t, 2) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
