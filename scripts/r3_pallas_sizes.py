"""Round-3 probe: how far does the pallas VPU radix kernel's time-major
win extend across N?

engines_r3.csv (plateau payloads, 8 interleaved rounds) showed the
kernel winning 8/8 at N=1024 time-major (median 0.30 SoL vs 0.17 for the
XLA time-major engine).  This probe races pallas vs xla_tmajor at the
other kernel-supported sizes (VMEM gate: N <= 2048 at TB=128) at
>= 64 MB/plane payloads, interleaved rounds, median-first.

Run:  python scripts/r3_pallas_sizes.py | tee benchmarks/results/pallas_sizes_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 8


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import pallas_fft as pk
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    for n in (256, 512, 2048):
        b = (64 << 20) // (4 * n)  # 64 MB/plane
        b -= b % 128
        p5 = pf.new_setup(n, pf.COMPLEX, max_factor=5)
        pfat = pf.new_setup(n, pf.COMPLEX)
        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

        engines = [
            ("pallas", lambda r, i, p=p5: pk.cfft_pallas_tmajor(p, r, i)),
            ("xla_tmajor", lambda r, i, p=pfat: sp.cfft_stages_split_tmajor(
                r, i, p.stages, backward=False, ordered=True)),
        ]
        # correctness cross-check on a slice
        try:
            kr, ki = jax.jit(engines[0][1])(re[:, :256], im[:, :256])
            er, ei = jax.jit(engines[1][1])(re[:, :256], im[:, :256])
            err = max(float(jnp.abs(kr - er).max()), float(jnp.abs(ki - ei).max()))
            scale = float(jnp.abs(er).max())
            ok = err < 1e-3 * scale
            print(f"n={n} b={b}: kernel-vs-engine rel err {err/scale:.2e} "
                  f"({'OK' if ok else 'WRONG'})", flush=True)
            if not ok:
                continue
        except Exception as e:
            print(f"n={n}: pallas COMPILE FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue

        trials = {tag: [] for tag, _ in engines}
        for _ in range(ROUNDS):
            for tag, fn in engines:
                trials[tag].append(bench_op(fn, (re, im), k1=4, k2=20, repeats=2))
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        wins = sum(trials["pallas"][k] < trials["xla_tmajor"][k] for k in range(ROUNDS))
        for tag, _ in engines:
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"n={n} b={b} {tag}: med {flops/med/1e9:.0f} GF/s "
                  f"(SoL {sol_t/med:.3f}) best {flops/ts[0]/1e9:.0f} "
                  f"trials {[round(flops/t/1e9) for t in ts]}", flush=True)
        print(f"n={n}: pallas round wins {wins}/{ROUNDS}", flush=True)


if __name__ == "__main__":
    main()
