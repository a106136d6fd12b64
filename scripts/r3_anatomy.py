"""Round-3 on-chip experiment 9: anatomy of a transform at the plateau.

At the reproducible >=64 MB/plane payload, time each component of the
N=4096 (64,64) transform separately: bare copy, bare transpose, bare
twiddle, each stage einsum alone, and the composed forms.  The plateau
measures ~0.15 SoL ordered vs a 2-memory-pass bound of 0.5 — this
decomposition shows where the 3x goes (and is the honest roofline
analysis for the backend).

Run:  python scripts/r3_anatomy.py | tee benchmarks/results/anatomy_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    n, b = 4096, 4096
    r = 64
    m = n // r
    plan = pf.new_setup(n, pf.COMPLEX, strict=False)
    st1, st2 = [s for s in plan.stages if s.r > 1]
    re = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

    c1 = sp._stage_consts(st1, False)
    c2 = sp._stage_consts(st2, False)
    w1 = jnp.asarray(c1[0])  # [64, 64] dft real
    w1i = jnp.asarray(c1[1])

    # one read+write of the pair of planes at spec BW
    pass_t = 2 * b * n * 4 * 2 / SPEC_BW  # 2 planes in + 2 planes out

    def stage1(ar, ai):
        a = ar.reshape(b, r, m)
        c = ai.reshape(b, r, m)
        k1 = jnp.einsum("brm,rt->btm", a + c, w1, precision=sp._PRECISION)
        k2 = jnp.einsum("brm,rt->btm", a, jnp.asarray(c1[3]), precision=sp._PRECISION)
        k3 = jnp.einsum("brm,rt->btm", c, jnp.asarray(c1[2]), precision=sp._PRECISION)
        return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)

    def stage2_tw(ar, ai):
        a = ar.reshape(b, r, r, 1)
        c = ai.reshape(b, r, r, 1)
        a, c = sp._apply_twiddle(a, c, c2[4], 1)
        k1 = jnp.einsum("blrm,rt->btlm", a + c, w1, precision=sp._PRECISION)
        k2 = jnp.einsum("blrm,rt->btlm", a, jnp.asarray(c2[3]), precision=sp._PRECISION)
        k3 = jnp.einsum("blrm,rt->btlm", c, jnp.asarray(c2[2]), precision=sp._PRECISION)
        return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)

    def stage2_notw(ar, ai):
        a = ar.reshape(b, r, r, 1)
        c = ai.reshape(b, r, r, 1)
        k1 = jnp.einsum("blrm,rt->btlm", a + c, w1, precision=sp._PRECISION)
        k2 = jnp.einsum("blrm,rt->btlm", a, jnp.asarray(c2[3]), precision=sp._PRECISION)
        k3 = jnp.einsum("blrm,rt->btlm", c, jnp.asarray(c2[2]), precision=sp._PRECISION)
        return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)

    def stage2_natural(ar, ai):
        # same matmuls, NATURAL output order (no t-l transpose)
        a = ar.reshape(b, r, r, 1)
        c = ai.reshape(b, r, r, 1)
        a, c = sp._apply_twiddle(a, c, c2[4], 1)
        k1 = jnp.einsum("blrm,rt->bltm", a + c, w1, precision=sp._PRECISION)
        k2 = jnp.einsum("blrm,rt->bltm", a, jnp.asarray(c2[3]), precision=sp._PRECISION)
        k3 = jnp.einsum("blrm,rt->bltm", c, jnp.asarray(c2[2]), precision=sp._PRECISION)
        return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)

    def twiddle_only(ar, ai):
        a = ar.reshape(b, r, r, 1)
        c = ai.reshape(b, r, r, 1)
        a, c = sp._apply_twiddle(a, c, c2[4], 1)
        return a.reshape(b, n), c.reshape(b, n)

    def transpose_only(ar, ai):
        a = jnp.swapaxes(ar.reshape(b, r, m), 1, 2).reshape(b, n)
        c = jnp.swapaxes(ai.reshape(b, r, m), 1, 2).reshape(b, n)
        return a, c

    def copy_only(ar, ai):
        return ar * np.float32(1.0000001), ai * np.float32(1.0000001)

    def full_ordered(ar, ai):
        return pf.fft.transform_ordered_split(plan, (ar, ai), pf.FORWARD)

    def full_unordered(ar, ai):
        return pf.fft.transform_split(plan, (ar, ai), pf.FORWARD)

    STEPS = [
        ("copy", copy_only), ("transpose", transpose_only),
        ("twiddle", twiddle_only), ("stage1", stage1),
        ("stage2_notw", stage2_notw), ("stage2_tw", stage2_tw),
        ("stage2_natural", stage2_natural),
        ("full_unordered", full_unordered), ("full_ordered", full_ordered),
    ]
    trials = {t: [] for t, _ in STEPS}
    for _ in range(ROUNDS):
        for t, fn in STEPS:
            trials[t].append(bench_op(fn, (re, im), k1=3, k2=9, repeats=2))
    print(f"\nN={n} B={b} ({b*n*4/1e6:.0f} MB/plane); 1 pass (r+w of the pair) "
          f"= {pass_t*1e6:.0f} us at spec BW", flush=True)
    for t, _ in STEPS:
        ts = sorted(trials[t])
        med = ts[len(ts) // 2]
        print(f"  {t:15s} med {med*1e6:8.0f} us  = {med/pass_t:5.2f} passes  "
              f"{[round(x*1e6) for x in trials[t]]}", flush=True)


if __name__ == "__main__":
    main()
