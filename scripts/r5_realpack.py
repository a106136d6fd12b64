"""Round-5: real tmajor N>=16384 — race the forward compositions.

sweep_r5_real_tmajor regressed to 0.065 at N>=16384 when kern2 was
routed at H (r4 xla engine: 0.104-0.135).  Theory: a pallas_call input
cannot fuse the pack's lane slices (XLA materializes both half planes —
one extra HBM pass) and the split step cannot fuse into the combine
kernel's output either, so kern2 pays ~2 extra passes in the REAL
composition while the XLA chain fuses both.  New packed kern2 pass A
(dispatch.cfft_kern2_tmajor_packed: slab index maps into the free
[m, r*2B] wide view) removes the pack pass.  This probe races, per real
N in {16384, 32768, 65536}, the PUBLIC forward under each composition:

  pub      — routed path as shipped (packed kern2 via packed_fwd_route)
  packk2   — classic pack + kern2 (the regressed r5 sweep composition)
  xla      — set_engine('xla') (the r4 composition)
  pallas   — set_engine('pallas') at N=16384 (packed DIRECT kernel,
             H=8192 tb128 scratch)

plus the backward under xla vs kern2.  Winner feeds the real route gate.

Run: python scripts/r5_realpack.py | tee benchmarks/results/realpack_r5.txt
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
    from pffft_tpu.ops import dispatch as dp
    from pffft_tpu.ops import split as sp
    from timing import bench_op

    rng = np.random.default_rng(0)

    for n in (16384, 32768, 65536):
        h = n // 2
        b = (64 << 20) // (4 * n)
        b = max(256, b - b % 256)
        plan = pf.new_setup(n, pf.REAL)
        x = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((h, b)).astype(np.float32))
        sol_f = 2 * b * n * 4 / SPEC_BW  # N reals in, H complex planes out
        flops = 2.5 * b * n * math.log2(n)

        def with_engine(eng, fn):
            def run(*a):
                dp.set_engine(eng)
                try:
                    return fn(*a)
                finally:
                    dp.set_engine(None)
            return run

        fwd = lambda v: pf.fft.transform_ordered_split_tmajor(
            plan, v, pf.FORWARD)
        bwd = lambda r, i: pf.fft.transform_ordered_split_tmajor(
            plan, (r, i), pf.BACKWARD)

        def pack_kern2(v):
            cplan = pf.new_setup(h, pf.COMPLEX)
            ar, ai = sp.pack_real_input_split_tmajor(v)
            ar, ai = dp.cfft_kern2_tmajor(cplan, ar, ai)
            return sp.real_forward_split_planar_tmajor_flat(
                ar, ai, plan.real_twiddle)

        fvar = {
            "fwd_pub": (sol_f, fwd),
            "fwd_packk2": (sol_f, pack_kern2),
            "fwd_xla": (sol_f, with_engine("xla", fwd)),
            "bwd_xla": (sol_f, with_engine("xla", bwd)),
            "bwd_kern2": (sol_f, with_engine("kern2", bwd)),
        }
        if n == 16384:
            fvar["fwd_pallas"] = (sol_f, with_engine("pallas", fwd))

        ref = np.fft.rfft(np.asarray(x[:, :2]).astype(np.float64), axis=0)
        live = {}
        for name, (sol, fn) in fvar.items():
            print(f"n={n} {name}: validating...", flush=True)
            data = (zr, zi) if name.startswith("bwd") else (x,)
            try:
                out = fn(*data)
                if name.startswith("fwd"):
                    sr, si = out
                    got = (np.asarray(sr[:, :2]).astype(np.float64)
                           + 1j * np.asarray(si[:, :2]))
                    got[0] = got[0].real + 0j  # packed bin0 = DC + i*Nyq
                    err = float(
                        np.abs(got[1:] - ref[1:-1]).max() / np.abs(ref).max())
                    if err > 1e-5:
                        print(f"n={n} {name}: MISMATCH {err:.2e}", flush=True)
                        continue
                else:
                    jax.block_until_ready(out)
                live[name] = (sol, fn, data)
            except Exception as e:
                print(f"n={n} {name}: FAIL {type(e).__name__}: {e}"[:160],
                      flush=True)

        print(f"n={n} h={h} b={b} live={list(live)}", flush=True)

        # bench_op chains outputs back to inputs — wrap to shape-
        # preserving forms (axis-0 concat/slice are free placement)
        def chainable(name, fn):
            if name.startswith("fwd"):
                return lambda v: jnp.concatenate(fn(v), axis=0)
            return lambda sr_, si_: (
                lambda y: (y[:h], y[h:]))(fn(sr_, si_))

        timed = {k: (live[k][0], chainable(k, live[k][1]), live[k][2])
                 for k in live}
        trials = {k: [] for k in live}
        for _ in range(ROUNDS):
            for k in live:
                sol, fn, data = timed[k]
                try:
                    trials[k].append(bench_op(fn, data, k1=4, k2=20))
                except Exception as e:
                    print(f"  {k}: trial FAIL {type(e).__name__}"[:120],
                          flush=True)
        for k in live:
            sol, fn, data = live[k]
            ts = sorted(trials[k])
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {k:12s} med {flops/med/1e9:7.1f} GF/s (SoL "
                  f"{sol/med:.3f}) trials "
                  f"{[round(sol/t, 3) for t in trials[k]]}", flush=True)


if __name__ == "__main__":
    main()
