"""Round-5: tmajor real-conversion anatomy at the regressed geometry.

realroute_r5: at N=16384 (H=8192, b=1024) the fwd+bwd real pair costs
3.8 ms (xla) / 5.1 ms (kern2) while the two complex FFTs are only
~1.2-1.4 ms — the tmajor conversions (pack/split/interleave) eat 65-75%.
A single HBM pass at spec is ~0.16 ms here, so ~2.4 ms of conversions is
~15 pass-equivalents: something is pathological, likely the axis-0
reverses (zr[::-1]) + concats in _reverse_conj_split_tmajor.  This probe
times each component and two flip alternatives.

All variants are memory-bound elementwise/copy ops: this backend's
memory timing is optimistic in absolute terms (CLAUDE.md) but the
variants are mutually comparable.

Run: python scripts/r5_realanat.py | tee benchmarks/results/realanat_r5.txt
"""

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
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)
    h, b = 8192, 1024
    n = 2 * h
    plan = pf.new_setup(n, pf.REAL)
    tw = plan.real_twiddle
    x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
    zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
    pass_t = 2 * h * b * 4 / SPEC_BW  # one read + one write of ONE plane

    def flip_blocked(v, k=64):
        return v.reshape(h // k, k, b)[::-1, ::-1].reshape(h, b)

    def rconj_blocked(ar, ai):
        fr = flip_blocked(ar)
        fi = flip_blocked(ai)
        # y[k] = conj(z[(H-k) mod H]): roll the flipped array by 1
        return (
            jnp.roll(fr, 1, axis=0),
            -jnp.roll(fi, 1, axis=0),
        )

    def sfwd_noflip(ar, ai):
        # WRONG results — times the split step minus the reverse
        twr, twi = sp._split_real_tw(tw)
        wr = jnp.asarray(twr, dtype=ar.dtype)[:, None]
        wi = jnp.asarray(twi, dtype=ar.dtype)[:, None]
        a = 0.5 * (1.0 + wi)
        c = 0.5 * (1.0 - wi)
        bb = 0.5 * wr
        fr, fi = ar, ai
        xr = a * ar + bb * ai + c * fr + bb * fi
        xi = -bb * ar + a * ai + bb * fr - c * fi
        return xr, xi

    def sfwd_blockedflip(ar, ai):
        twr, twi = sp._split_real_tw(tw)
        wr = jnp.asarray(twr, dtype=ar.dtype)[:, None]
        wi = jnp.asarray(twi, dtype=ar.dtype)[:, None]
        a = 0.5 * (1.0 + wi)
        c = 0.5 * (1.0 - wi)
        bb = 0.5 * wr
        fr, nfi = rconj_blocked(ar, ai)
        fi = -nfi
        xr = a * ar + bb * ai + c * fr + bb * fi
        xi = -bb * ar + a * ai + bb * fr - c * fi
        m = sp._bin0_mask(h, ar.dtype)[:, None]
        xr = (1.0 - m) * xr + m * (ar + ai)
        xi = (1.0 - m) * xi + m * (ar - ai)
        return xr, xi

    variants = {
        # floors
        "copy2": (2, lambda ar, ai: (ar + 1.0, ai + 1.0)),
        # components
        "flip0": (2, lambda ar, ai: (ar[::-1], ai[::-1])),
        "flipb": (2, lambda ar, ai: (flip_blocked(ar), flip_blocked(ai))),
        "roll1": (2, lambda ar, ai: (jnp.roll(ar, 1, axis=0),
                                     jnp.roll(ai, 1, axis=0))),
        "rconj": (2, lambda ar, ai: sp._reverse_conj_split_tmajor(ar, ai)),
        "rconjb": (2, rconj_blocked),
        "sfwd": (2, lambda ar, ai:
                 sp.real_forward_split_planar_tmajor_flat(ar, ai, tw)),
        "sfwd_noflip": (2, sfwd_noflip),
        "sfwd_flipb": (2, sfwd_blockedflip),
        "sbwd": (2, lambda ar, ai:
                 sp.real_backward_split_planar_tmajor_flat(ar, ai, tw)),
        "packint": (2, lambda v: sp.interleave_to_real_split_tmajor(
            *sp.pack_real_input_split_tmajor(v))),
    }

    # correctness spot-check: blocked rconj == reference rconj
    gr, gi = jax.jit(rconj_blocked)(zr, zi)
    rr, ri = jax.jit(
        lambda a, b_: sp._reverse_conj_split_tmajor(a, b_))(zr, zi)
    err = max(float(jnp.abs(gr - rr).max()), float(jnp.abs(gi - ri).max()))
    print(f"rconj_blocked vs reference max abs err: {err:.2e}", flush=True)

    live = {}
    for name, (planes, fn) in variants.items():
        data = (x,) if name == "packint" else (zr, zi)
        try:
            out = jax.jit(fn)(*data)
            jax.block_until_ready(out)
            live[name] = (planes, fn, data)
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {e}"[:160], flush=True)

    print(f"h={h} b={b} live={list(live)}", flush=True)
    trials = {k: [] for k in live}
    for _ in range(ROUNDS):
        for k in live:
            planes, fn, data = live[k]
            try:
                trials[k].append(bench_op(fn, data, k1=4, k2=20))
            except Exception as e:
                print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                      flush=True)
    for k in live:
        planes, fn, data = live[k]
        ts = sorted(trials[k])
        if not ts:
            continue
        med = ts[len(ts) // 2]
        print(f"  {k:12s} med {med*1e3:7.3f} ms ({med/ (planes*pass_t):5.2f}x "
              f"its {planes}-plane pass floor) trials "
              f"{[round(t*1e3, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
