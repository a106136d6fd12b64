"""Round-3 probe: HYBRID batch-major chain — time-major middle stages.

Motivation (engines_r3.csv): at the honest plateau payload the time-major
stage engine beats the batch-major one 0.166 vs 0.114 SoL at N=4096 —
batch on the vector lanes keeps every stage's minor axis at full 128-lane
utilization, while the batch-major chain's minor axis (the stage span m)
shrinks to 1 by the last stage.  Batch-major callers can't use it because
two materialized transposes (2 extra memory passes) eat the margin.

Hypothesis: absorb the layout change INTO the stage contractions — the
first stage's einsum reads batch-major [b,l,r,m] and writes time-major
[t,l,m,b]; the last stage's einsum reads time-major [l,r,m,b] and writes
batch-major [b,t,l,m].  No materialized transpose exists; XLA lays out
the relayout in the matmul read/write patterns (the same trick as the
spectator-axis four-step, ops/split.py:_stages_lead_spec_split).

Run:  python scripts/r3_hybrid.py | tee benchmarks/results/hybrid_r3.txt
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


def hybrid_chain(re, im, stages, *, backward: bool, ordered: bool):
    """Batch-major planes [.., N] -> [.., N]; middle stages time-major."""

    from pffft_tpu.ops import split as sp

    lead = re.shape[:-1]
    n = re.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    active = [st for st in stages if st.r > 1]
    nst = len(active)
    if nst < 2:
        return sp.cfft_stages_split(re, im, stages, backward=backward, ordered=ordered)

    ar = re.reshape(b, 1, n)
    ai = im.reshape(b, 1, n)
    for idx, st in enumerate(active):
        l, r, m = st.l, st.r, st.m
        consts = sp._stage_consts(st, backward)
        first = idx == 0
        last = idx == nst - 1
        if first:
            ar = ar.reshape(b, l, r, m)
            ai = ai.reshape(b, l, r, m)
            if l > 1:
                ar, ai = sp._apply_twiddle(ar, ai, consts[4], 1)
            # batch-major in, time-major out: flat n-axis order (t, l, m)
            ar, ai = sp._contract_stage(ar, ai, consts, "blrm,rt->tlmb")
            ar = ar.reshape(l * r, m, b)
            ai = ai.reshape(l * r, m, b)
            continue
        ar = ar.reshape(l, r, m, b)
        ai = ai.reshape(l, r, m, b)
        if l > 1:
            ar, ai = sp._apply_twiddle(ar, ai, consts[4], 0)
        if last:
            sub = "lrmb,rt->bltm" if not ordered else "lrmb,rt->btlm"
            ar, ai = sp._contract_stage(ar, ai, consts, sub)
            return ar.reshape(*lead, n), ai.reshape(*lead, n)
        ar, ai = sp._contract_stage(ar, ai, consts, "lrmb,rt->tlmb")
        ar = ar.reshape(l * r, m, b)
        ai = ai.reshape(l * r, m, b)
    raise AssertionError("unreachable")


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    cases = [
        (1024, (64 << 20) // (4 * 1024)),      # (64,16) plateau
        (4096, (64 << 20) // (4 * 4096)),      # (64,64) plateau
        (16384, (64 << 20) // (4 * 16384)),    # (128,128) plateau
        (65536, (64 << 20) // (4 * 65536)),    # (256,256) plateau
    ]
    for n, b in cases:
        plan = pf.new_setup(n, pf.COMPLEX)
        if plan.local_split is not None:
            print(f"n={n}: plan uses local_split, skipping chain A/B", flush=True)
            continue
        re = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))

        classic = lambda r, i, p=plan: sp.cfft_stages_split(
            r, i, p.stages, backward=False, ordered=True)
        hyb = lambda r, i, p=plan: hybrid_chain(
            r, i, p.stages, backward=False, ordered=True)

        # correctness first (small slice, vs classic)
        cr, ci = jax.jit(classic)(re[:64], im[:64])
        hr, hi = jax.jit(hyb)(re[:64], im[:64])
        err = float(
            (jnp.abs(cr - hr).max() + jnp.abs(ci - hi).max())
            / (jnp.abs(cr).max() + 1e-30)
        )
        tag = "OK" if err < 1e-5 else "MISMATCH"
        print(f"n={n} b={b} factors={plan.factors}: hybrid-vs-classic "
              f"rel err {err:.2e} ({tag})", flush=True)
        if err >= 1e-5:
            continue

        trials = {"classic": [], "hybrid": []}
        for _ in range(ROUNDS):
            trials["classic"].append(bench_op(classic, (re, im), k1=4, k2=20))
            trials["hybrid"].append(bench_op(hyb, (re, im), k1=4, k2=20))
        flops = 5.0 * b * n * math.log2(n)
        sol_t = 4 * b * n * 4 / SPEC_BW
        wins = sum(
            1 for tc, th in zip(trials["classic"], trials["hybrid"]) if th < tc
        )
        for name in ("classic", "hybrid"):
            ts = sorted(trials[name])
            med = ts[len(ts) // 2]
            print(
                f"  {name:8s} med {flops/med/1e9:7.1f} GF/s (SoL {sol_t/med:.3f})"
                f" trials {[round(flops/t/1e9) for t in trials[name]]}",
                flush=True,
            )
        print(f"  hybrid wins {wins}/{ROUNDS}", flush=True)


if __name__ == "__main__":
    main()
