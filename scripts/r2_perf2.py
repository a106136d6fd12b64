"""Round-2 on-chip experiment 2: radix cost law + factor-shape shootout.

  1. MXU padding law: dense-stage einsum throughput vs contraction size r
     (both the plain and spectator-axis forms) — the data that sets the
     plan_factors policy.
  2. N=65536 factor-shape shootout: chain vs local four-step at several
     max_factor policies.
  3. Dense-256 stage accuracy (carrier dynamic range at N=65536).
  4. Fused two-stage Pallas kernel on-chip: correctness + speed vs XLA.

Run:  python scripts/r2_perf2.py
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
    from pffft_tpu.ops import fused_stage as fs
    from timing import bench_op

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({getattr(dev, 'device_kind', '?')})", flush=True)
    rng = np.random.default_rng(0)

    # --- 1. radix cost law ------------------------------------------------
    # one complex gauss stage over fixed total data (B x 4096), r varies
    print("\n-- radix law: one gauss stage, total elems fixed (B=1024, n=4096)")
    b, n = 1024, 4096
    xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    for r in (4, 8, 16, 32, 64, 128, 256):
        m = n // r
        dft = np.exp(-2j * np.pi * np.outer(np.arange(r), np.arange(r)) / r)
        wr = jnp.asarray(dft.real.astype(np.float32))
        ws = jnp.asarray((dft.real + dft.imag).astype(np.float32))
        wd = jnp.asarray((dft.imag - dft.real).astype(np.float32))
        prec = jax.lax.Precision.HIGHEST

        def stage(ar, ai):
            a = ar.reshape(b, r, m)
            c = ai.reshape(b, r, m)
            k1 = jnp.einsum("brm,rt->btm", a + c, wr, precision=prec)
            k2 = jnp.einsum("brm,rt->btm", a, wd, precision=prec)
            k3 = jnp.einsum("brm,rt->btm", c, ws, precision=prec)
            return (k1 - k3).reshape(b, n), (k1 + k2).reshape(b, n)

        t = min(bench_op(stage, (xr, xi), k1=2, k2=10) for _ in range(2))
        macs = 3 * b * n * r  # 3 gauss matmuls, r MACs/elem each
        bw = 4 * b * n * 4 / t
        print(
            f"  r={r:4d}: {t*1e6:8.1f} us  {macs/t/1e12:7.2f} Tmac/s  "
            f"membw={bw/1e9:6.0f} GB/s  us/elem-pass={t/ (b*n) * 1e9:.3f}",
            flush=True,
        )

    # --- 2. N=65536 factor-shape shootout --------------------------------
    print("\n-- N=65536 shootout (B=256, gauss)")
    n, batch = 65536, 256
    re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    sp.set_cmul_mode("gauss")
    try:
        for mf in (256, 128, 64, 512):
            plan = pf.new_setup(n, pf.COMPLEX, max_factor=mf)
            kindstr = "4step" if plan.local_split is not None else "chain"
            fft = lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
            ts = [bench_op(fft, (re, im), k1=2, k2=8) for _ in range(3)]
            t = min(ts)
            gf = 5.0 * batch * n * math.log2(n) / t / 1e9
            sol = (4 * batch * n * 4 / SPEC_BW) / t
            print(
                f"  mf={mf:4d} {kindstr} factors={plan.factors}: {gf:8.1f} GF/s  SoL={sol:.3f}",
                flush=True,
            )
    finally:
        sp.set_cmul_mode(None)

    # --- 3. dense-256 accuracy -------------------------------------------
    sp.set_cmul_mode("gauss")
    try:
        plan = pf.new_setup(65536, pf.COMPLEX, max_factor=256)
        worst = 1e9
        nn = 65536
        for k in (1, 12345, nn - 7):
            ph = 2 * np.pi * k * np.arange(nn) / nn
            cr = jnp.asarray(np.cos(ph).astype(np.float32))[None]
            ci = jnp.asarray(np.sin(ph).astype(np.float32))[None]
            sr, si = jax.jit(
                lambda r, i: pf.fft.transform_ordered_split(plan, (r, i), pf.FORWARD)
            )(cr, ci)
            mag = np.abs(np.asarray(sr)[0] + 1j * np.asarray(si)[0])
            side = np.partition(mag, -2)[-2]
            worst = min(worst, 20 * np.log10(mag.max() / max(side, 1e-30)))
        print(f"\ndense-256 chain carrier dynrange N=65536: {worst:.1f} dB (bound 140)", flush=True)
    finally:
        sp.set_cmul_mode(None)

    # --- 4. fused pallas kernel ------------------------------------------
    print("\n-- fused two-stage pallas kernel, N=4096 B=2048")
    n, batch = 4096, 2048
    plan = pf.new_setup(n, pf.COMPLEX, max_factor=64)
    re = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    ref = np.fft.fft(
        np.asarray(re[:4]).astype(np.float64) + 1j * np.asarray(im[:4]).astype(np.float64)
    )
    for tb in (64, 128, 256):
        try:
            f = lambda r, i: fs.cfft_fused2(plan, r, i, tb=tb)
            kr, ki = jax.jit(f)(re, im)
            got = np.asarray(kr[:4]) + 1j * np.asarray(ki[:4])
            err = np.abs(got - ref).max() / np.abs(ref).max()
            ts = [bench_op(f, (re, im), k1=2, k2=10) for _ in range(3)]
            t = min(ts)
            gf = 5.0 * batch * n * math.log2(n) / t / 1e9
            sol = (4 * batch * n * 4 / SPEC_BW) / t
            print(
                f"  TB={tb:3d}: {gf:8.1f} GF/s  SoL={sol:.3f}  err={err:.2e}  "
                f"trials={[round(5.0*batch*n*math.log2(n)/x/1e9,1) for x in ts]}",
                flush=True,
            )
        except Exception as e:
            print(f"  TB={tb:3d}: FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    t0 = time.time()
    main()
    print(f"total {time.time() - t0:.0f}s")
