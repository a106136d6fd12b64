"""Round-3 on-chip experiment 3: fused-kernel assault at the production
(64, 64) shape + minimal Mosaic repro.

Round-2 findings (benchmarks/results/ENGINES.md): the fused two-stage
kernel compiles at (32, 32) but the remote Mosaic compiler returns HTTP
500 at (64, 64) for every Gauss-style 3-dot variant; the lane-concat form
also failed at (64, 64).  VERDICT r2 asks for one more assault:

  A. lane-concat form at (64, 64), TB in {32, 64} (baseline repro)
  B. textbook 4-mul form (4 independent dots per stage, no 3-dot
     combine pattern)
  C. two chained smaller pallas_calls: [stage1 + twiddle] | [stage2]
     — halves the live-value pressure per kernel
  D. Gauss 3-dot at (64, 64) (known-bad; kept as the minimal repro)

Each variant is compiled and, if it compiles, timed and checked against
the XLA engine.  Output: one line per variant with outcome.

Run:  python scripts/r3_mosaic.py | tee benchmarks/results/mosaic_r3.txt
"""

import functools
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pffft_tpu as pf
    from pffft_tpu.ops import split as sp
    from pffft_tpu.ops import fused_stage as fs
    from timing import bench_op

    n1 = n2 = 64
    n = n1 * n2
    plan = pf.new_setup(n, pf.COMPLEX, factors=(n1, n2), strict=False)
    st1, st2 = [st for st in plan.stages if st.r > 1]
    rng = np.random.default_rng(0)
    B = 512
    re = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    # XLA reference output for correctness
    xr, xi = jax.jit(
        lambda r, i: sp.cfft_plan_split(plan, r, i, backward=False, ordered=True)
    )(re, im)
    xr = np.asarray(xr)
    xi = np.asarray(xi)
    flops_conv = 5.0 * B * n * math.log2(n)
    sol_t = 4 * B * n * 4 / SPEC_BW

    d1 = st1.dft
    d2 = st2.dft
    tw = st2.twiddle  # [n1, n2]
    twt = np.ascontiguousarray(tw.T)

    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    PREC = jax.lax.Precision.HIGHEST

    def mm(a, w):
        return jax.lax.dot_general(
            a, w, (((a.ndim - 1,), (0,)), ((), ())),
            precision=PREC, preferred_element_type=jnp.float32)

    def check_and_time(tag, fn, args):
        try:
            out = jax.jit(fn)(*args)
            gr = np.asarray(out[0])
            gi = np.asarray(out[1])
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{tag}: COMPILE/RUN FAIL: {type(e).__name__}: {msg}", flush=True)
            return
        err = max(abs(gr - xr).max(), abs(gi - xi).max())
        scale = abs(xr).max()
        if err > 1e-2 * scale:
            print(f"{tag}: WRONG RESULT err={err:.3e}", flush=True)
            return
        ts = [bench_op(fn, args, k1=2, k2=10, repeats=2) for _ in range(4)]
        best = min(ts)
        print(f"{tag}: OK {flops_conv/best/1e9:.0f} GF/s best "
              f"(SoL {sol_t/best:.3f}) trials={[round(flops_conv/t/1e9) for t in ts]}",
              flush=True)

    # ---- A: lane-concat fused2 (the existing kernel) at TB 32 and 64 ----
    for tb in (32, 64):
        try:
            fn = lambda r, i, t=tb: fs.cfft_fused2(plan, r, i, tb=t)
            check_and_time(f"A_concat_tb{tb}", fn, (re, im))
        except Exception as e:
            print(f"A_concat_tb{tb}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

    # ---- B: 4-mul form (separate planes, 4 dots per stage) --------------
    b1r, b1i = f32(d1.real), f32(d1.imag)
    b2r, b2i = f32(d2.real), f32(d2.imag)
    twr, twi = f32(twt.real), f32(twt.imag)

    def kernel_4mul(w1r_ref, w1i_ref, tr_ref, ti_ref, w2r_ref, w2i_ref,
                    re_ref, im_ref, or_ref, oi_ref):
        xr = jnp.swapaxes(re_ref[:], 1, 2)  # (tb, j2, j1)
        xi = jnp.swapaxes(im_ref[:], 1, 2)
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        yr = mm(xr, w1r) - mm(xi, w1i)
        yi = mm(xr, w1i) + mm(xi, w1r)
        tr, ti = tr_ref[:], ti_ref[:]
        yr, yi = yr * tr - yi * ti, yr * ti + yi * tr
        yr = jnp.swapaxes(yr, 1, 2)  # (tb, k1, j2)
        yi = jnp.swapaxes(yi, 1, 2)
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        zr = mm(yr, w2r) - mm(yi, w2i)
        zi = mm(yr, w2i) + mm(yi, w2r)
        or_ref[:] = jnp.swapaxes(zr, 1, 2)  # ordered (tb, k2, k1)
        oi_ref[:] = jnp.swapaxes(zi, 1, 2)

    def call_4mul(r, i, tb=64):
        b = r.shape[0]
        tabs = [b1r, b1i, twr, twi, b2r, b2i]
        tab_specs = [pl.BlockSpec(t.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM)
                     for t in tabs]
        in_spec = pl.BlockSpec((tb, n1, n2), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tb, n2, n1), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        zr, zi = pl.pallas_call(
            kernel_4mul,
            grid=(b // tb,),
            in_specs=[*tab_specs, in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        )(*[jnp.asarray(t) for t in tabs], r.reshape(b, n1, n2), i.reshape(b, n1, n2))
        return zr.reshape(b, n), zi.reshape(b, n)

    check_and_time("B_4mul_tb64", call_4mul, (re, im))

    # ---- C: two chained pallas_calls (stage1+twiddle | stage2) ----------
    def kernel_s1(w1r_ref, w1i_ref, tr_ref, ti_ref, re_ref, im_ref, or_ref, oi_ref):
        xr = jnp.swapaxes(re_ref[:], 1, 2)
        xi = jnp.swapaxes(im_ref[:], 1, 2)
        w1r, w1i = w1r_ref[:], w1i_ref[:]
        yr = mm(xr, w1r) - mm(xi, w1i)
        yi = mm(xr, w1i) + mm(xi, w1r)
        tr, ti = tr_ref[:], ti_ref[:]
        or_ref[:] = yr * tr - yi * ti
        oi_ref[:] = yr * ti + yi * tr

    def kernel_s2(w2r_ref, w2i_ref, re_ref, im_ref, or_ref, oi_ref):
        yr = jnp.swapaxes(re_ref[:], 1, 2)
        yi = jnp.swapaxes(im_ref[:], 1, 2)
        w2r, w2i = w2r_ref[:], w2i_ref[:]
        zr = mm(yr, w2r) - mm(yi, w2i)
        zi = mm(yr, w2i) + mm(yi, w2r)
        or_ref[:] = jnp.swapaxes(zr, 1, 2)
        oi_ref[:] = jnp.swapaxes(zi, 1, 2)

    def call_chained(r, i, tb=64):
        b = r.shape[0]
        t1 = [b1r, b1i, twr, twi]
        t1_specs = [pl.BlockSpec(t.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM)
                    for t in t1]
        in_spec = pl.BlockSpec((tb, n1, n2), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        mid_spec = pl.BlockSpec((tb, n2, n1), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        yr, yi = pl.pallas_call(
            kernel_s1,
            grid=(b // tb,),
            in_specs=[*t1_specs, in_spec, in_spec],
            out_specs=[mid_spec, mid_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        )(*[jnp.asarray(t) for t in t1], r.reshape(b, n1, n2), i.reshape(b, n1, n2))
        t2 = [b2r, b2i]
        t2_specs = [pl.BlockSpec(t.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM)
                    for t in t2]
        out_spec = pl.BlockSpec((tb, n2, n1), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        zr, zi = pl.pallas_call(
            kernel_s2,
            grid=(b // tb,),
            in_specs=[*t2_specs, mid_spec, mid_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        )(*[jnp.asarray(t) for t in t2], yr, yi)
        return zr.reshape(b, n), zi.reshape(b, n)

    check_and_time("C_chained_tb64", call_chained, (re, im))

    # ---- D: Gauss 3-dot minimal repro (known bad at r=64) ---------------
    dsum = f32(d1.real + d1.imag)
    ddiff = f32(d1.imag - d1.real)
    dr_ = f32(d1.real)

    def kernel_gauss(wr_ref, ws_ref, wd_ref, re_ref, im_ref, or_ref, oi_ref):
        xr = jnp.swapaxes(re_ref[:], 1, 2)
        xi = jnp.swapaxes(im_ref[:], 1, 2)
        k1 = mm(xr + xi, wr_ref[:])
        k2 = mm(xr, wd_ref[:])
        k3 = mm(xi, ws_ref[:])
        or_ref[:] = jnp.swapaxes(k1 - k3, 1, 2)
        oi_ref[:] = jnp.swapaxes(k1 + k2, 1, 2)

    def call_gauss(r, i, tb=64):
        b = r.shape[0]
        tabs = [dr_, dsum, ddiff]
        tab_specs = [pl.BlockSpec(t.shape, lambda i_: (0, 0), memory_space=pltpu.VMEM)
                     for t in tabs]
        in_spec = pl.BlockSpec((tb, n1, n2), lambda i_: (i_, 0, 0), memory_space=pltpu.VMEM)
        zr, zi = pl.pallas_call(
            kernel_gauss,
            grid=(b // tb,),
            in_specs=[*tab_specs, in_spec, in_spec],
            out_specs=[in_spec, in_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
        )(*[jnp.asarray(t) for t in tabs], r.reshape(b, n1, n2), i.reshape(b, n1, n2))
        return zr.reshape(b, n), zi.reshape(b, n)

    # D computes only stage-1 (repro target, not correctness-comparable)
    try:
        out = jax.jit(call_gauss)(re, im)
        float(jnp.sum(out[0]))
        print("D_gauss3dot_tb64: COMPILED (repro no longer fires)", flush=True)
    except Exception as e:
        print(f"D_gauss3dot_tb64: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
