"""Round-2 on-chip experiment 4: isolate the large-N (>=2^17) bottleneck.

At N=65536 the four-step runs at 0.17-0.27 SoL but at 2^17..2^20 it drops
to 0.06-0.08 under every factor policy (r2_perf3).  Components measured
here at N = 2^17 and 2^20 (payload held at 64 MB/plane-pair):

  1. ordered vs unordered (internal layout) transform — is the final
     spectator-move relayout the cliff?
  2. a bare materialized transpose of the same shape — the backend's
     transpose cost floor.
  3. one stage contraction alone (phase-2-style, no spectators) — the
     MXU/memory floor for a single pass.
  4. chain plans via mf=512 (two dense fat stages, no four-step) vs the
     default four-step.

Run:  python scripts/r2_perf4.py
"""

import math
import os
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
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"backend: {dev.platform}", flush=True)
    rng = np.random.default_rng(0)

    def report(tag, n, batch, ts):
        t = min(ts)
        gf = 5.0 * batch * n * math.log2(n) / t / 1e9
        sol = (4 * batch * n * 4 / SPEC_BW) / t
        print(f"  {tag:28s}: {gf:8.1f} GF/s  SoL={sol:.3f}  t={t*1e6:.0f}us "
              f"trials={[round(x*1e6) for x in ts]}", flush=True)
        return t

    for n, batch in [(131072, 128)]:
        print(f"\n-- N={n} B={batch}", flush=True)
        re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

        plan = pf.new_setup(n, pf.COMPLEX, max_factor=128)
        n1, n2 = plan.factors
        print(f"  four-step factors {plan.factors}", flush=True)

        fo = lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
        report("4step ordered", n, batch, [bench_op(fo, (re, im), k1=2, k2=8) for _ in range(3)])
        fu = lambda r, i: pf.fft.transform_split(plan, (r, i), pf.FORWARD)
        report("4step unordered", n, batch, [bench_op(fu, (re, im), k1=2, k2=8) for _ in range(3)])

        # bare transpose of the four-step's output relayout shape
        def tr(r, i):
            a = jnp.swapaxes(r.reshape(batch, n1, n2), -1, -2)
            b = jnp.swapaxes(i.reshape(batch, n1, n2), -1, -2)
            return a.reshape(batch, n), b.reshape(batch, n)

        report("bare transpose (n1,n2)", n, batch, [bench_op(tr, (re, im), k1=2, k2=8) for _ in range(2)])

        # one stage contraction, phase-2 style: (b*n1 rows, n2) @ (n2->n2)
        r_mat = 256
        dft = np.exp(-2j * np.pi * np.outer(np.arange(r_mat), np.arange(r_mat)) / r_mat)
        wr = jnp.asarray(dft.real.astype(np.float32))
        ws = jnp.asarray((dft.real + dft.imag).astype(np.float32))
        wd = jnp.asarray((dft.imag - dft.real).astype(np.float32))
        prec = jax.lax.Precision.HIGHEST
        m = n // r_mat

        def one_stage(ar, ai):
            a = ar.reshape(batch, m, r_mat)
            c = ai.reshape(batch, m, r_mat)
            k1 = jnp.einsum("bmr,rt->bmt", a + c, wr, precision=prec)
            k2 = jnp.einsum("bmr,rt->bmt", a, wd, precision=prec)
            k3 = jnp.einsum("bmr,rt->bmt", c, ws, precision=prec)
            return (k1 - k3).reshape(batch, n), (k1 + k2).reshape(batch, n)

        report("one dense-256 stage (rows)", n, batch, [bench_op(one_stage, (re, im), k1=2, k2=8) for _ in range(2)])

        # one stage with the engine's actual relayout (btlm axis order)
        l = n // r_mat

        def one_stage_relayout(ar, ai):
            a = ar.reshape(batch, l, r_mat, 1)
            c = ai.reshape(batch, l, r_mat, 1)
            k1 = jnp.einsum("blrm,rt->btlm", a + c, wr, precision=prec)
            k2 = jnp.einsum("blrm,rt->btlm", a, wd, precision=prec)
            k3 = jnp.einsum("blrm,rt->btlm", c, ws, precision=prec)
            return (k1 - k3).reshape(batch, n), (k1 + k2).reshape(batch, n)

        report("one stage + btlm relayout", n, batch, [bench_op(one_stage_relayout, (re, im), k1=2, k2=8) for _ in range(2)])

        # chain via mf=512 (no local split below 512^2 = 2^18)
        if n <= 1 << 18:
            plan5 = pf.new_setup(n, pf.COMPLEX, max_factor=512)
            kindstr = "4step" if plan5.local_split is not None else "chain"
            print(f"  mf=512 -> {kindstr} {plan5.factors}", flush=True)
            f5 = lambda r, i: pf.fft.transform_ordered_split(plan5, (r, i), pf.FORWARD)
            report(f"mf512 {kindstr} ordered", n, batch, [bench_op(f5, (re, im), k1=2, k2=8) for _ in range(3)])


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s", flush=True)
