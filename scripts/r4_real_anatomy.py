"""Round-4 probe: anatomy of the REAL transform at large N.

sweep_r3_real.csv: N=2^19..2^21 real runs 2.4-3.4x BELOW the complex
engine at the same engine length, though the real path is only a
half-length complex FFT plus an O(N) split step.  Time each component
separately at the plateau payload to find the hidden serialization:

  pack      [B, N] real -> planar [B, H] pair (reshape/slice)
  engine    the half-length complex transform alone (what complex
            sweeps measure at this engine length)
  split     real_forward_split_planar alone (flip + combine + twiddle)
  flip      _reverse_conj_split alone
  combine   the split step with the flip replaced by identity (measures
            the elementwise+twiddle part)
  full      the shipped real forward
  bwd       the shipped real backward

Run: python scripts/r4_real_anatomy.py | tee benchmarks/results/real_anatomy_r4.txt
"""

import math
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
    from pffft_tpu import fft as pff
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    for n in (1 << 19, 1 << 20, 1 << 21):
        h = n // 2
        b = max(128, (64 << 20) // (4 * h))
        plan = pf.new_setup(n, pf.REAL)
        cplan = pf.new_setup(h, pf.COMPLEX)
        print(f"\n# N={n} H={h} B={b} real.factors={plan.factors} "
              f"ls={plan.local_split} cplx.factors={cplan.factors} "
              f"ls={cplan.local_split}", flush=True)
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))

        tw = plan.real_twiddle

        def combine_noflip(ar, ai):
            # split step with the flip replaced by identity (wrong math,
            # same op count minus the reversal)
            cr, ci = ar, -ai
            er, ei = 0.5 * (ar + cr), 0.5 * (ai + ci)
            orr, oi = 0.5 * (ai - ci), -0.5 * (ar - cr)
            twr, twi = sp._split_real_tw(tw)
            wr = jnp.asarray(twr, dtype=ar.dtype)
            wi = jnp.asarray(twi, dtype=ar.dtype)
            xr = er + wr * orr - wi * oi
            xi = ei + wr * oi + wi * orr
            return sp._set_bin0(xr, ar[..., 0]), sp._set_bin0(xi, ai[..., 0])

        variants = {
            "pack": (lambda v: sp.pack_real_input_split(v), (x,)),
            "engine": (
                lambda r, i: dp.cfft_dispatch(cplan, r, i, backward=False),
                (zr, zi),
            ),
            "split": (
                lambda r, i: sp.real_forward_split_planar(r, i, tw),
                (zr, zi),
            ),
            "flip": (lambda r, i: sp._reverse_conj_split(r, i), (zr, zi)),
            "combine": (combine_noflip, (zr, zi)),
            "full": (
                lambda v: pff.transform_ordered_split(plan, v, pf.FORWARD),
                (x,),
            ),
            "bwd": (
                lambda r, i: pff.transform_ordered_split(plan, (r, i), pf.BACKWARD),
                (zr, zi),
            ),
        }
        # bytes actually moved per variant (for a per-component SoL)
        bytes_moved = {
            "pack": 2 * b * n * 4,
            "engine": 4 * b * h * 4,
            "split": 4 * b * h * 4,
            "flip": 4 * b * h * 4,
            "combine": 4 * b * h * 4,
            "full": 2 * b * n * 4,
            "bwd": 2 * b * n * 4,
        }
        trials = {k: [] for k in variants}
        live = dict(variants)
        for _ in range(ROUNDS):
            for k, (fn, data) in list(live.items()):
                try:
                    trials[k].append(bench_op(fn, data, k1=3, k2=12, repeats=2))
                except Exception as e:
                    print(f"N={n} {k}: FAIL {type(e).__name__}: {str(e)[:90]}",
                          flush=True)
                    live.pop(k)
        for k in variants:
            if not trials[k]:
                continue
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            sol = bytes_moved[k] / SPEC_BW / med
            print(f"N={n} {k:8s}: med {med*1e3:8.2f} ms  SoL {sol:.3f}  "
                  f"trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
