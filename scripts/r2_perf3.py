"""Round-2 on-chip experiment 3: large-N policy shootout + driver bench.

Clean re-measurement (more trials, interleaved configs to decorrelate
service contention) deciding the default TPU stage policy for
engine_n > 65536: max_factor 128 vs 256 across N = 2^16..2^20, both
orderings, then one run of the driver bench for the record.

Run:  python scripts/r2_perf3.py
"""

import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({getattr(dev, 'device_kind', '?')})", flush=True)
    rng = np.random.default_rng(0)

    cases = []
    for n, batch in [(65536, 256), (131072, 128), (262144, 64), (524288, 32), (1048576, 16)]:
        for mf in (128, 256):
            cases.append((n, batch, mf))

    data = {}
    fns = {}
    for n, batch, mf in cases:
        plan = pf.new_setup(n, pf.COMPLEX, max_factor=mf)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        fns[(n, mf)] = (
            plan,
            (lambda p: lambda r, i: pf.fft.transform_ordered_split(p, (r, i), pf.FORWARD))(plan),
            (re, im),
        )
        data[(n, mf)] = []

    # interleave trials round-robin so contention windows hit all configs
    for trial in range(4):
        for n, batch, mf in cases:
            plan, fft, args = fns[(n, mf)]
            t = bench_op(fft, args, k1=2, k2=8)
            data[(n, mf)].append(t)
        print(f"trial {trial} done", flush=True)

    for n, batch, mf in cases:
        plan, _, _ = fns[(n, mf)]
        t = min(data[(n, mf)])
        gf = 5.0 * batch * n * math.log2(n) / t / 1e9
        sol = (4 * batch * n * 4 / SPEC_BW) / t
        kindstr = "4step" if plan.local_split is not None else "chain"
        print(
            f"N={n:8d} mf={mf:3d} {kindstr:5s} factors={plan.factors}: "
            f"{gf:8.1f} GF/s  SoL={sol:.3f}  "
            f"trials={[round(5.0*batch*n*math.log2(n)/x/1e9,1) for x in data[(n, mf)]]}",
            flush=True,
        )

    # driver bench for the record
    print("\n-- bench.py", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")],
        capture_output=True, text=True, timeout=3000,
    )
    print(out.stdout.strip()[-2000:], flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s")
