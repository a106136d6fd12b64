"""Round-4 probe: compile reliability + perf of the 2M-element wall tiles.

vmem2_r4 showed 4096/tb512 (2M elements) failing the remote compile
under probe load, then compiling clean serially at 0.55 SoL — the wall
is (at least partly) STOCHASTIC, plausibly service-side compile-helper
memory under shared-tenant load.  For each wall tile: 3 independent
compile attempts (distinct batch → distinct executable), then plateau
timing of the survivors.  Outcomes feed _TB_PREF (tiles with >=2/3
success ship ahead of the safe tile, protected by the fft.py
compile-retry fallback).

Run: python scripts/r4_wall.py | tee benchmarks/results/wall_r4.txt
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
    from pffft_tpu.ops import pallas_fft as pk
    from timing import bench_op

    rng = np.random.default_rng(0)
    lim127 = 127 * 1024 * 1024
    configs = [
        ("scr100", dict(scratch=True)),
        ("arb127", dict(scratch=True, vmem_limit=lim127, arbitrary_grid=True)),
    ]
    # 16384/tb128 (0/5 attempts, vmem2+scratch) and 8192/tb256 (0/3+) are
    # dropped: failing compiles cost ~10 min each on this service
    cases = [(4096, 512), (2048, 1024), (1024, 2048)]
    for n, tb in cases:
        f = pk.thin_factors(n, radix16=True)
        plan = pf.new_setup(n, pf.COMPLEX, factors=f, strict=False)
        b = (64 << 20) // (4 * n)
        b = max(tb, b - b % tb)
        rr = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        ii = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        survivors = []
        for tag, kw in configs:
            ok = 0
            for attempt in range(2):
                b_try = tb * (2 + attempt)  # distinct shapes → fresh compiles
                r2 = jnp.asarray(
                    rng.standard_normal((n, b_try)).astype(np.float32))
                i2 = jnp.asarray(
                    rng.standard_normal((n, b_try)).astype(np.float32))
                try:
                    r, i = pk.cfft_pallas_tmajor(plan, r2, i2, tb=tb, **kw)
                    ref = np.fft.fft(
                        np.asarray(r2[:, :2]).astype(np.float64)
                        + 1j * np.asarray(i2[:, :2]).astype(np.float64), axis=0)
                    err = float(np.abs(
                        (np.asarray(r[:, :2]) + 1j * np.asarray(i[:, :2])) - ref
                    ).max() / np.abs(ref).max())
                    if err < 1e-5:
                        ok += 1
                        print(f"n={n} tb={tb} {tag} attempt {attempt}: ok "
                              f"err {err:.1e}", flush=True)
                    else:
                        print(f"n={n} tb={tb} {tag} attempt {attempt}: "
                              f"MISMATCH {err:.2e}", flush=True)
                except Exception as e:
                    print(f"n={n} tb={tb} {tag} attempt {attempt}: FAIL "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)
            print(f"n={n} tb={tb} {tag}: {ok}/2 compile attempts ok", flush=True)
            if ok:
                survivors.append((tag, kw))
        # plateau timing of survivors, interleaved
        trials = {tag: [] for tag, _ in survivors}
        for _ in range(ROUNDS):
            for tag, kw in list(survivors):
                fn = lambda a, c, p=plan, t=tb, k=kw: pk.cfft_pallas_tmajor(
                    p, a, c, tb=t, **k)
                try:
                    trials[tag].append(
                        bench_op(fn, (rr, ii), k1=4, k2=20, repeats=2))
                except Exception as e:
                    print(f"n={n} tb={tb} {tag}: BENCH FAIL "
                          f"{type(e).__name__}", flush=True)
                    survivors = [s for s in survivors if s[0] != tag]
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        for tag, _ in survivors:
            if not trials[tag]:
                continue
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} tb={tb}/{tag}: med {flops/med/1e9:7.1f} GF/s "
                  f"(SoL {sol_t/med:.3f}) trials "
                  f"{[round(flops/t/1e9) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
