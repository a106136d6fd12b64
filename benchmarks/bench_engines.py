"""Engine comparison bench: xla (gauss/4mul) vs fused2 vs pallas.

Generates the measured table behind ops/dispatch.py's default (see
benchmarks/results/ENGINES.md) — the multi-arch dispatcher measurement
analog (/root/reference/benchmarks/pf_conv_dispatcher.cpp role).

Usage: python benchmarks/bench_engines.py [--cpu] [--trials T] [--csv out]
"""

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SPEC_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--csv", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    rows = []

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def run(tag, fn, data, n, batch):
        try:
            ts = [bench_op(fn, data, k1=2, k2=10) for _ in range(args.trials)]
        except Exception as e:
            emit(engine=tag, n=n, batch=batch, error=f"{type(e).__name__}: {str(e)[:80]}")
            return
        t = min(ts)
        mf = 5.0 * batch * n * math.log2(n)
        emit(engine=tag, n=n, batch=batch,
             gflops=round(mf / t / 1e9, 1),
             sol=round((4 * batch * n * 4 / SPEC_BW) / t, 3),
             trial_gflops=[round(mf / x / 1e9, 1) for x in ts])

    for n, batch, mf in [(1024, 512, 32), (4096, 2048, 64)]:
        plan = pf.new_setup(n, pf.COMPLEX, max_factor=mf)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

        for mode in ("gauss", "4mul"):
            def step(r, i, p=plan, m=mode):
                sp.set_cmul_mode(m)
                try:
                    return pf.fft.transform_ordered_split(p, (r, i), pf.FORWARD)
                finally:
                    sp.set_cmul_mode(None)

            run(f"xla_{mode}", step, (re, im), n, batch)

        if "fused2" in dp.available_engines(plan, batch, False) and on_tpu:
            from pffft_tpu.ops import fused_stage as fs

            run("fused2", lambda r, i, p=plan: fs.cfft_fused2(p, r, i), (re, im), n, batch)

        # thin-stage pallas kernel (time-major), radix<=5 plan at same N
        if on_tpu:
            from pffft_tpu.ops import pallas_fft as pk

            p5 = pf.new_setup(n, pf.COMPLEX, max_factor=5)
            if pk.supported(p5):
                ret = re.T
                imt = im.T
                run(
                    "pallas_radix",
                    lambda r, i, p=p5: pk.cfft_pallas_tmajor(p, r, i),
                    (ret, imt), n, batch,
                )

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


if __name__ == "__main__":
    main()
