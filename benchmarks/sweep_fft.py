"""FFT throughput sweep (bench_pffft.c analog) on the current backend.

Protocol parity with /root/reference/benchmarks/bench_pffft.c: pow2 and
non-pow2 N sweeps, MFlops = 5 (cplx) / 2.5 (real) * N*log2(N) per
transform, markdown table + CSV emitters (bench-fft-table-*.txt /
*-mflops.csv, bench_pffft.c:1304-1399).  TPU-native additions: effective
HBM bandwidth and fraction of measured speed-of-light per entry (the
roofline/PAPI analog, SURVEY.md §5.1), honest deferred-execution-safe
timing (benchmarks/timing.py).

Usage: python benchmarks/sweep_fft.py [--real] [--cplx] [--quick]
       [--non-pow2] [--max-len N] [--batch-mib M] [--csv out.csv]
       [--table out.txt] [--cpu] [--max-factor K]
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--cplx", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--max-len", type=int, default=1 << 17)
    ap.add_argument("--batch-mib", type=int, default=32, help="plane working set target")
    ap.add_argument("--csv", type=str, default=None)
    ap.add_argument("--table", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-factor", type=int, default=None)
    ap.add_argument("--non-pow2", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op, measure_peak_bw

    kinds = []
    if args.real or not args.cplx:
        kinds.append("real")
    if args.cplx or not args.real:
        kinds.append("cplx")

    if args.non_pow2:
        sizes = [96, 160, 192, 384, 480, 640, 768, 800, 2400, 9216]
    else:
        sizes = [1 << k for k in range(6, 25) if (1 << k) <= args.max_len]
    if args.quick:
        sizes = sizes[::2]

    dev = jax.devices()[0]
    bw = measure_peak_bw(64 << 20 if args.quick else 256 << 20)
    print(f"# device={dev.platform} measured peak BW = {bw/1e9:.0f} GB/s", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows = []
    for kind in kinds:
        for n in sizes:
            if not pf.is_valid_size(n, pf.REAL if kind == "real" else pf.COMPLEX):
                continue
            batch = max(8, (args.batch_mib << 20) // (4 * n))
            plan = pf.new_setup(n, pf.REAL if kind == "real" else pf.COMPLEX,
                                max_factor=args.max_factor)
            if kind == "real":
                x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

                def step(v, p=plan):
                    sr, si = pf.fft.transform_ordered_split(p, v, pf.FORWARD)
                    return (pf.fft.transform_ordered_split(p, (sr, si), pf.BACKWARD),)

                t = bench_op(step, (x,)) / 2.0  # per transform (fwd+bwd pair)
                bytes_min = (batch * n + 2 * batch * (n // 2)) * 4
                mf = 2.5 * n * math.log2(n)
            else:
                re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                step = lambda r, i, p=plan: pf.fft.transform_ordered_split(p, (r, i), pf.FORWARD)
                t = bench_op(step, (re, im))
                # unordered (internal layout) variant — the PFFFT-U analog
                stepu = lambda r, i, p=plan: pf.fft.transform_split(p, (r, i), pf.FORWARD)
                tu = bench_op(stepu, (re, im))
                bytes_min = 4 * batch * n * 4
                mf = 5.0 * n * math.log2(n)
            row = dict(kind=kind, n=n, batch=batch,
                       ns_per=round(t / batch * 1e9, 2),
                       gflops=round(mf * batch / t / 1e9, 1),
                       sol=round((bytes_min / bw) / t, 3),
                       factors=str(plan.factors))
            if kind == "cplx":
                row["gflops_unordered"] = round(mf * batch / tu / 1e9, 1)
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.csv:
        import csv

        keys = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys, restval="")
            w.writeheader()
            w.writerows(rows)
    if args.table:
        with open(args.table, "w") as f:
            f.write(f"| kind | N | batch | ns/transform | GFLOP/s | SoL | factors |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            for r in rows:
                f.write(
                    f"| {r['kind']} | {r['n']} | {r['batch']} | {r['ns_per']} "
                    f"| {r['gflops']} | {r['sol']} | {r['factors']} |\n"
                )


if __name__ == "__main__":
    main()
