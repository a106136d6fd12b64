"""On-chip smoke: every TPU-facing (split-format) surface, tiny shapes.

Run on the real TPU (default backend): asserts numerical correctness of
each subsystem's planar path against host references.  The on-hardware
counterpart of the CPU test suite — run manually or per round:

    python scripts/tpu_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu import dct, oracle, spectral, resample
    from pffft_tpu.channelizer import Channelizer, design_lowpass
    from pffft_tpu.dsp import mixer_apply_split, mixer_init
    from pffft_tpu.dsp.cic import cicddc_init

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({getattr(dev, 'device_kind', '?')})")
    rng = np.random.default_rng(0)
    ok = 0

    def check(name, err, tol):
        nonlocal ok
        status = "ok" if err < tol else "FAIL"
        print(f"{name:32s} err={err:9.2e} (tol {tol:g}) {status}", flush=True)
        assert err < tol, name
        ok += 1

    # complex FFT fwd+roundtrip (fat-stage policy)
    n = 1024
    plan = pf.new_setup(n, pf.COMPLEX)
    re = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    sr, si = jax.jit(lambda r, i: pf.fft.transform_ordered_split(plan, (r, i)))(re, im)
    ref = np.fft.fft(np.asarray(re).astype(np.float64) + 1j * np.asarray(im).astype(np.float64))
    got = np.asarray(sr) + 1j * np.asarray(si)
    check("cfft (64,?) stages", np.abs(got - ref).max() / np.abs(ref).max(), 1e-5)
    br, bi = pf.fft.transform_ordered_split(plan, (sr, si), pf.BACKWARD)
    check("cfft roundtrip/N", float(jnp.max(jnp.abs(br / n - re))), 1e-4)

    # real FFT + local four-step split
    nb = 1 << 15
    planr = pf.new_setup(nb, pf.REAL, max_factor=128)
    x = rng.standard_normal(nb).astype(np.float32)
    rr, ri = pf.fft.transform_ordered_split(planr, jnp.asarray(x))
    full = np.fft.rfft(x.astype(np.float64))
    packed = full[:-1].copy()
    packed[0] = full[0].real + 1j * full[-1].real
    gotr = np.asarray(rr) + 1j * np.asarray(ri)
    check("rfft local-fourstep 32k", np.abs(gotr - packed).max() / np.abs(full).max(), 1e-4)

    # fastconv pipeline
    h = design_lowpass(65, 0.1).astype(np.float32)
    setup = pf.conv.FastConv(h)
    stream = rng.standard_normal(8192).astype(np.float32)
    y = np.asarray(setup._conv_stream(jnp.asarray(stream), 8000))
    refc = np.convolve(stream.astype(np.float64), h, "valid")[:8000]
    check("fastconv stream", np.abs(y[: len(refc)] - refc).max(), 1e-3)

    # mixer
    st = mixer_init(0.123, 0.5)
    (mr, mi), _ = mixer_apply_split(st, jnp.asarray(stream[:1000]), jnp.zeros(1000, jnp.float32))
    nn = np.arange(1000)
    refm = stream[:1000] * np.exp(1j * (0.5 + 2 * np.pi * 0.123 * nn))
    check("mixer NCO", max(np.abs(np.asarray(mr) - refm.real).max(),
                           np.abs(np.asarray(mi) - refm.imag).max()), 1e-4)

    # CIC DDC planar
    ddc, cst = cicddc_init(8)
    (cr, ci), _ = ddc.apply_split(cst, jnp.asarray(stream[:4096]), jnp.zeros(4096, jnp.float32), 0.05)
    check("cic shapes", 0.0 if cr.shape == (512,) else 1.0, 0.5)

    # channelizer
    ch = Channelizer(64, 4)
    (yr, yi), _ = ch.process_split(
        ch.init_state((2,)),
        jnp.asarray(rng.standard_normal((2, 640)).astype(np.float32)),
        jnp.zeros((2, 640), jnp.float32),
    )
    check("channelizer shapes", 0.0 if yr.shape == (2, 10, 64) else 1.0, 0.5)

    # device DCT
    xx = rng.standard_normal((4, 128)).astype(np.float32)
    check("dct2 device", np.abs(np.asarray(dct.dct2(jnp.asarray(xx))) - oracle.dct2(xx)).max()
          / max(1.0, np.abs(oracle.dct2(xx)).max()), 1e-4)

    # spectrogram + resampler
    p = np.asarray(spectral.spectrogram(jnp.asarray(stream), 256, 64))
    check("spectrogram finite", 0.0 if np.isfinite(p).all() else 1.0, 0.5)
    rso = np.asarray(resample.resample(jnp.asarray(stream[:3000]), 3, 2))
    check("resampler shapes", 0.0 if rso.shape[-1] == 4500 else 1.0, 0.5)

    # arbitrary-N (Bluestein) planar path
    npn = 499  # prime
    bp = pf.BluesteinPlan(npn)
    xr = rng.standard_normal((4, npn)).astype(np.float32)
    xi = rng.standard_normal((4, npn)).astype(np.float32)
    brr, bri = pf.bluestein.transform_any_split(
        bp, (jnp.asarray(xr), jnp.asarray(xi)))
    refb = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    gotb = np.asarray(brr) + 1j * np.asarray(bri)
    check("bluestein prime-N 499", np.abs(gotb - refb).max() / np.abs(refb).max(), 1e-4)

    # spectral zoom (CZT) planar path
    zp = pf.zoom_fft_setup(1024, (0.2, 0.3), 128)
    zr, zi = pf.czt_split(zp, (jnp.asarray(stream[:1024]),
                               jnp.zeros(1024, jnp.float32)))
    k = np.arange(128)
    f = (0.2 + k * (0.1 / 128)) / 2.0  # (f0 + k*step)/fs, fs=2
    refz = (stream[:1024].astype(np.float64)
            @ np.exp(-2j * np.pi * np.outer(np.arange(1024), f)))
    gotz = np.asarray(zr) + 1j * np.asarray(zi)
    check("zoom czt 1024->128", np.abs(gotz - refz).max() / np.abs(refz).max(), 1e-4)

    # 2-D planar transform
    ndp = pf.fftn_setup((48, 96))
    x2r = rng.standard_normal((48, 96)).astype(np.float32)
    x2i = rng.standard_normal((48, 96)).astype(np.float32)
    nr, ni = pf.fftn_split(ndp, (jnp.asarray(x2r), jnp.asarray(x2i)))
    ref2 = np.fft.fft2(x2r.astype(np.float64) + 1j * x2i.astype(np.float64))
    got2 = np.asarray(nr) + 1j * np.asarray(ni)
    check("fft2 planar 48x96", np.abs(got2 - ref2).max() / np.abs(ref2).max(), 1e-4)

    print(f"\nall {ok} TPU smoke checks passed")


if __name__ == "__main__":
    main()
