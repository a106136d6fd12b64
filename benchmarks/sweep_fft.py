"""FFT throughput sweep on the current backend (bench_pffft.c analog).

Protocol parity with /root/reference/benchmarks/bench_pffft.c: calibrated
iteration budgets, >=150 ms windows, MFlops = 5 (cplx) / 2.5 (real) *
N*log2(N) per transform.  Adds the TPU-native metrics: effective HBM
bandwidth and fraction of measured speed-of-light (the PAPI/roofline analog,
SURVEY.md §5.1).

Usage: python benchmarks/sweep_fft.py [--real] [--cplx] [--quick]
       [--max-len N] [--batch-mib M] [--csv out.csv] [--cpu]
"""

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(fn, args, min_dur=0.15):
    out = fn(*args)
    leaves = out if isinstance(out, tuple) else (out,)
    for o in leaves:
        o.block_until_ready()
    t0 = time.perf_counter()
    out = fn(*args)
    (out[0] if isinstance(out, tuple) else out).block_until_ready()
    once = time.perf_counter() - t0
    iters = max(1, min(8192, int(min_dur / max(once, 1e-7)) + 1))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        (out[0] if isinstance(out, tuple) else out).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def peak_bw(jax, jnp, nbytes=256 << 20):
    n = nbytes // 8
    a = jnp.zeros((n,), jnp.float32)
    b = jnp.ones((n,), jnp.float32)
    probe = jax.jit(lambda x, y: x * 1.0000001 + y)
    t = time_fn(probe, (a, b))
    return (3 * n * 4) / t  # 2 reads + 1 write


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--cplx", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--max-len", type=int, default=1 << 17)
    ap.add_argument("--batch-mib", type=int, default=64, help="working-set target per plane set")
    ap.add_argument("--csv", type=str, default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-factor", type=int, default=5)
    ap.add_argument("--non-pow2", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pffft_tpu as pf

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
        sizes = sizes[:: 2]

    dev = jax.devices()[0]
    bw = peak_bw(jax, jnp)
    print(f"# device={dev.platform} measured peak BW = {bw/1e9:.0f} GB/s", file=sys.stderr)

    rng = np.random.default_rng(0)
    rows = []
    for kind in kinds:
        for n in sizes:
            if kind == "real" and not pf.is_valid_size(n, pf.REAL):
                continue
            if kind == "cplx" and not pf.is_valid_size(n, pf.COMPLEX):
                continue
            batch = max(1, (args.batch_mib << 20) // (8 * n))
            plan = pf.new_setup(n, pf.REAL if kind == "real" else pf.COMPLEX,
                                max_factor=args.max_factor)
            if kind == "real":
                x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                fn = jax.jit(lambda v: pf.fft.transform_ordered_split(plan, v, pf.FORWARD))
                targs = (x,)
                bytes_min = (batch * n + 2 * batch * (n // 2)) * 4
                mf = 2.5 * n * math.log2(n)
            else:
                re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
                fn = jax.jit(lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD))
                targs = (re, im)
                bytes_min = 4 * batch * n * 4
                mf = 5.0 * n * math.log2(n)
            t = time_fn(fn, targs)
            gflops = mf * batch / t / 1e9
            sol = (bytes_min / bw) / t
            rows.append(dict(kind=kind, n=n, batch=batch, ns_per=t / batch * 1e9,
                             gflops=round(gflops, 1), sol=round(sol, 3),
                             factors=str(plan.factors)))
            print(json.dumps(rows[-1]))
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
