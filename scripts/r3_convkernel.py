"""Round-3 on-chip experiment: fused spectral-convolution Pallas kernel.

One overlap-save block in the frequency domain costs three engine passes
through XLA (fwd FFT, pointwise Hf multiply, bwd FFT — the reference's
pffastconv_apply block loop, /root/reference/src/pffastconv.c:185-196).
The fused kernel (ops/conv_kernel.py) keeps the whole pipeline on one
VMEM tile: 1 HBM read + 1 write per block.

Measures, per engine length at the honest plateau payload (>=64 MB/plane,
time-major planes, CLAUDE.md payload law):
  (a) on-chip correctness of the fused kernel vs numpy's ifft(fft(x)*Hf);
  (b) a tb sweep of the fused kernel (its stage chain is 2x the FFT
      kernel's, so the Mosaic scoped-VMEM ceiling caps tb lower);
  (c) interleaved rounds: conv_fused vs conv_pallas3 (routed kernel FFTs
      + XLA multiply) vs conv_xla3 (forced-xla FFTs + multiply).

Run:  python scripts/r3_convkernel.py | tee benchmarks/results/convkernel_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5
# plateau payloads: [N, B] f32 planes, >=64 MB each, B divisible by every
# tb candidate for that N
SHAPES = {256: 65536, 512: 36864, 1024: 16384}


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu import fft as _fft
    from pffft_tpu import plan as _plan
    from pffft_tpu.ops import conv_kernel as _ck
    from pffft_tpu.ops import dispatch as _dispatch
    from pffft_tpu.ops import pallas_fft as _pk
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n, b in SHAPES.items():
        kplan = _dispatch._thin_plan(n)
        if kplan is None:
            print(f"# n={n}: no kernel plan, skipped", flush=True)
            continue
        xplan = _plan.new_setup(n, _plan.COMPLEX)
        taps = n // 4 + 1
        h = rng.standard_normal(taps).astype(np.float32)
        hfr_np, hfi_np = _ck.filter_spectrum(kplan, h)
        hfr = jnp.asarray(hfr_np)
        hfi = jnp.asarray(hfi_np)

        # ---- (a) correctness at one lane tile
        tb0 = 128
        xr = rng.standard_normal((n, tb0)).astype(np.float32)
        xi = rng.standard_normal((n, tb0)).astype(np.float32)
        hf_unscaled = (hfr_np + 1j * hfi_np).astype(np.complex128) * n
        want = np.fft.ifft(np.fft.fft(xr + 1j * xi, axis=0) * hf_unscaled[:, None], axis=0)
        try:
            gr, gi = jax.jit(
                lambda r, i: _ck.zconv_pallas_tmajor(kplan, r, i, hfr, hfi, tb=tb0)
            )(jnp.asarray(xr), jnp.asarray(xi))
            err = max(
                np.abs(np.asarray(gr) - want.real).max(),
                np.abs(np.asarray(gi) - want.imag).max(),
            )
            print(f"# n={n}: fused kernel vs numpy on-chip, max abs err {err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# n={n}: fused kernel FAILED at tb=128: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue

        re = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        nsamp = n * b

        # ---- (b) fused-kernel tb sweep (quick, one trial per tb)
        fused_steps = {}
        for tb in _pk.tb_candidates(n):
            if b % tb:
                continue

            def make(tb=tb):
                def step(r, i):
                    return _ck.zconv_pallas_tmajor(kplan, r, i, hfr, hfi, tb=tb)
                return step

            st = make()
            try:
                t = bench_op(st, (re, im), k1=2, k2=6, repeats=1)
                fused_steps[tb] = (st, t)
                print(f"# n={n} fused tb={tb:5d}: {nsamp/t/1e6:8.1f} Msamp/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"# n={n} fused tb={tb:5d}: compile FAIL "
                      f"({type(e).__name__}: {str(e)[:100]})", flush=True)
        if not fused_steps:
            print(f"# n={n}: no fused tb compiles, skipped", flush=True)
            continue
        best_tb = min(fused_steps, key=lambda k: fused_steps[k][1])
        fused_step = fused_steps[best_tb][0]

        # ---- (c) interleaved rounds vs the compositions
        # engine choice is baked at trace time; the rounds loop sets the
        # global engine before each bench_op call (first call traces)
        def make_comp(engine, plan):
            def step(r, i):
                sr, si = _fft.transform_ordered_split_tmajor(plan, (r, i), _plan.FORWARD)
                mr = sr * hfr[:, None] - si * hfi[:, None]
                mi = sr * hfi[:, None] + si * hfr[:, None]
                return _fft.transform_ordered_split_tmajor(plan, (mr, mi), _plan.BACKWARD)
            return step

        steps = [
            (f"fused(tb={best_tb})", fused_step, None),
            ("pallas3", make_comp("pallas", kplan), "pallas"),
            ("xla3", make_comp("xla", xplan), "xla"),
        ]
        trials = {t: [] for t, _, _ in steps}
        for _ in range(ROUNDS):
            for t, fn, eng in steps:
                _dispatch.set_engine(eng)
                try:
                    trials[t].append(bench_op(fn, (re, im), k1=2, k2=6, repeats=2))
                except Exception as e:  # noqa: BLE001
                    print(f"#   {t}: FAIL {type(e).__name__}: {str(e)[:100]}",
                          flush=True)
                    trials[t].append(float("inf"))
                finally:
                    _dispatch.set_engine(None)

        mb = nsamp * 4 / 1e6
        print(f"\n== zconv block [{n}, {b}] f32 ({mb:.0f} MB/plane)", flush=True)
        for t, _, _ in steps:
            ts = sorted(x for x in trials[t] if np.isfinite(x))
            if not ts:
                continue
            med = ts[len(ts) // 2]
            # fused ideal traffic: 2 reads + 2 writes of [n, b] f32
            gbs = 4 * nsamp * 4 / med / 1e9
            print(f"  {t:16s} med {nsamp/med/1e6:8.1f} Msamp/s  "
                  f"(eff {gbs:6.1f} GB/s @4-plane)  "
                  f"{[round(nsamp/v/1e6) for v in trials[t] if np.isfinite(v)]}",
                  flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
