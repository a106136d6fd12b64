"""Composite pipeline benchmarks: channelizer, fastconv, mixer (TPU-ready).

The bench_mixers.cpp / test_pffastconv.c speed-table analog (SURVEY.md §6):
Msamples/s for the mixer and CIC-style chain, kSamples/s per filter length
for fast convolution, channel-samples/s for the PFB channelizer — all in
split/real format so they run on the TPU backend.

Usage: python benchmarks/bench_pipeline.py [--cpu] [--quick] [--csv out]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--csv", type=str, default=None)
    ap.add_argument("--trials", type=int, default=None, help="best-of-N per point")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated bench names to run (default: all)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import pffft_tpu as pf
    from pffft_tpu.channelizer import Channelizer, design_lowpass
    from pffft_tpu.dsp import mixer_apply_split, mixer_init
    from timing import bench_op, measure_peak_bw

    trials = args.trials or (1 if args.quick else 5)

    def best_of(step, data):
        # MEDIAN of a fixed trial count is the headline (round-3 policy:
        # per-trial throughput varies 2-4x on this backend with
        # physically impossible highs, so best-of-N is a lucky-window
        # statistic); the best is returned too as the upper bound.
        ts = sorted(bench_op(step, data) for _ in range(trials))
        return ts[len(ts) // 2], ts[0]

    rng = np.random.default_rng(0)
    rows = []
    # SoL columns are pinned to the v5e spec HBM roofline (819 GB/s,
    # round-3 policy: comparable across rounds; the measured probe varies
    # run-to-run on this backend and is only printed as info).
    probe_bw = measure_peak_bw(64 << 20 if args.quick else 256 << 20)
    bw = 819e9 if jax.devices()[0].platform == "tpu" else probe_bw
    print(f"# probe BW {probe_bw/1e9:.0f} GB/s (SoL pinned to {bw/1e9:.0f})",
          file=sys.stderr)

    def emit(**row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    # --- mixer: Msamples/s (bench_mixers analog; one NCO over a long stream)
    if want("mixer_shift"):
        n = 1 << 22 if not args.quick else 1 << 20
        xr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        st = mixer_init(0.123)

        def mix_step(r, i):
            (orr, oi), _ = mixer_apply_split(st, r, i)
            return orr, oi

        t, tb = best_of(mix_step, (xr, xi))
        sol = round((4 * n * 4 / bw) / t, 3)
        emit(bench="mixer_shift", samples=n, msamp_s=round(n / t / 1e6, 1),
             msamp_s_best=round(n / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- fast convolution: kSamples/s per filterLen (test_pffastconv table)
    stream_len = 1 << 21 if not args.quick else 1 << 18
    x = jnp.asarray(rng.standard_normal(stream_len).astype(np.float32))
    flens = [32, 128, 1024, 4096] if not args.quick else [128, 1024]
    if not want("fastconv"):
        flens = []
    for flen in flens:
        h = design_lowpass(flen, 0.1).astype(np.float32)
        setup = pf.conv.FastConv(h)
        total = stream_len - setup.nfft + 1
        total = (total // setup.num_out_per_block) * setup.num_out_per_block

        # output length != input: wrap to shape-preserving (loop-chainable)
        def conv_fix(v, s=setup, tot=total):
            y = s._conv_stream(v, tot)
            return (jnp.concatenate([y, v[tot:]]),)

        t, tb = best_of(conv_fix, (x,))
        emit(bench="fastconv", filter_len=flen, nfft=setup.nfft,
             ksamp_s=round(total / t / 1e3, 1),
             ksamp_s_best=round(total / tb / 1e3, 1),
             ns_per_sample=round(t / total * 1e9, 2))

    # --- CIC DDC: Msamples/s (pf_cic bench analog — the one PFDSP component
    # with a C hot loop, /root/reference/src/pf_cic.cpp:87-135; round-2 had
    # no on-chip number and a gather-framed apply)
    from pffft_tpu.dsp.cic import CicDDC

    n_cic = 1 << 22 if not args.quick else 1 << 19
    cic_factors = [16, 64] if not args.quick else [16]
    if not want("cic_ddc"):
        cic_factors = []
    for r_factor in cic_factors:
        ddc = CicDDC(r_factor)
        cst = ddc.init_state()
        cr = jnp.asarray(rng.standard_normal(n_cic).astype(np.float32))
        ci = jnp.asarray(rng.standard_normal(n_cic).astype(np.float32))
        rate_fp = jnp.asarray(np.uint32(round(0.123 * (1 << 32)) & 0xFFFFFFFF))

        def cic_step(r, i, d=ddc, s=cst, rf=rate_fp):
            (yr, yi), _ = d._apply_impl(
                s, r, i, rf, jnp.float32(1.0), d.block_w)
            # shape-preserving wrap for loop chaining
            return jnp.concatenate([yr, r[yr.shape[0]:]]), jnp.concatenate([yi, i[yi.shape[0]:]])

        t, tb = best_of(cic_step, (cr, ci))
        sol = round(((2 * n_cic + 2 * n_cic // r_factor) * 4 / bw) / t, 3)
        emit(bench="cic_ddc", factor=r_factor, samples=n_cic,
             msamp_s=round(n_cic / t / 1e6, 1),
             msamp_s_best=round(n_cic / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- channelizer: channel-samples/s (BASELINE config #5 single-chip)
    if want("channelizer"):
        m, p = (4096, 8) if not args.quick else (512, 8)
        ch = Channelizer(m, p)
        # 1024 frames * 4096 ch * batch 4 = 67 MB/plane: the honest
        # >=64 MB plateau regime (batch_r3.txt payload law); smaller
        # payloads measure bimodally (1.3-29 Gsamp/s trials at 4 MB)
        frames = 1024 if not args.quick else 16
        batch = 4
        sr = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
        si = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
        state = ch.init_state((batch,))

        def chan_step(r, i):
            (yr, yi), _ = ch.process_split(state, r, i)
            # shape-preserving wrap: outputs reshape to input length
            return yr.reshape(r.shape), yi.reshape(i.shape)

        t, tb = best_of(chan_step, (sr, si))
        in_samps = batch * frames * m
        sol = round((4 * in_samps * 4 / bw) / t, 3)  # 2 planes in + 2 out
        emit(bench="channelizer", channels=m, taps_per_channel=p, batch=batch,
             msamp_s=round(in_samps / t / 1e6, 1),
             msamp_s_best=round(in_samps / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

        # channel-major output entry (r5): frames born [M, ..., K], no
        # output transposes — the layout a time-major consumer keeps
        def chan_step_tm(r, i):
            (yr, yi), _ = ch.process_split_tmajor(state, r, i)
            return yr.reshape(r.shape), yi.reshape(i.shape)

        t, tb = best_of(chan_step_tm, (sr, si))
        sol = round((4 * in_samps * 4 / bw) / t, 3)
        emit(bench="channelizer_tmajor", channels=m, taps_per_channel=p,
             batch=batch, msamp_s=round(in_samps / t / 1e6, 1),
             msamp_s_best=round(in_samps / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- STFT: Msamples/s (spectral.py; beyond-parity surface, measured
    # so the archive covers it)
    if want("stft"):
        from pffft_tpu.spectral import stft_split

        n_sig = 1 << 21 if not args.quick else 1 << 18
        n_fft, hop = 1024, 512
        xs = jnp.asarray(rng.standard_normal((4, n_sig)).astype(np.float32))

        def stft_step(v):
            sr, si = stft_split(v, n_fft, hop)
            # shape-preserving wrap for loop chaining: fold a (tiny) function
            # of the spectrum back into the carry so the STFT cannot be DCE'd
            s = (jnp.sum(sr * sr + si * si) * np.float32(1e-12)).astype(v.dtype)
            return (v + s,)

        t, tb = best_of(stft_step, (xs,))
        tot = 4 * n_sig
        # min-traffic model: read input (4 B/sample) + write the packed
        # spectrum (n_fft/2 complex bins per hop samples = 8 B/sample at
        # hop = n_fft/2)
        stft_bytes = tot * (4 + 8 * (n_fft // 2) / hop)
        sol = round((stft_bytes / bw) / t, 3)
        emit(bench="stft", n_fft=n_fft, hop=hop, samples=tot,
             msamp_s=round(tot / t / 1e6, 1),
             msamp_s_best=round(tot / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

        # channel-major output entry (r5): spectra born [H, ..., K], no
        # output moveaxis hops — the layout a spectral pipeline keeps
        from pffft_tpu.spectral import stft_split_tmajor

        def stft_step_tm(v):
            sr, si = stft_split_tmajor(v, n_fft, hop)
            s = (jnp.sum(sr * sr + si * si) * np.float32(1e-12)).astype(v.dtype)
            return (v + s,)

        t, tb = best_of(stft_step_tm, (xs,))
        sol = round((stft_bytes / bw) / t, 3)
        emit(bench="stft_tmajor", n_fft=n_fft, hop=hop, samples=tot,
             msamp_s=round(tot / t / 1e6, 1),
             msamp_s_best=round(tot / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- rational resampler: Msamples/s in (resample.py)
    if want("resample"):
        from pffft_tpu.resample import Resampler

        rs = Resampler(3, 2, taps_per_phase=16)
        n_rs = 1 << 20 if not args.quick else 1 << 17
        xr2 = jnp.asarray(rng.standard_normal((4, n_rs)).astype(np.float32))

        def rs_step(v):
            y = rs(v)
            out_len = y.shape[-1]
            keep = min(out_len, v.shape[-1])
            return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

        t, tb = best_of(rs_step, (xr2,))
        tot = 4 * n_rs
        # min-traffic model: read input + write output (L/M more samples)
        rs_bytes = tot * 4 * (1 + rs.up / rs.down)
        sol = round((rs_bytes / bw) / t, 3)
        emit(bench="resample_3_2", taps_per_phase=16, samples=tot,
             msamp_s=round(tot / t / 1e6, 1),
             msamp_s_best=round(tot / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- partitioned convolution: Msamples/s at reverb-scale filter length
    if want("pconv"):
        from pffft_tpu.pconv import PartitionedConv

        taps, blk = 48000, 512
        ch = 2 if args.quick else 8
        blocks = 64 if args.quick else 256
        hpc = rng.standard_normal(taps).astype(np.float32) * 0.01
        pc = PartitionedConv(hpc, block_len=blk)
        xpc = jnp.asarray(
            rng.standard_normal((ch, blocks * blk)).astype(np.float32))
        sr0, si0, tl0 = pc.init_state((ch,))
        hr0, hi0 = pc._h

        # state/filter planes ride as ARGUMENTS (closure constants blow
        # the remote-compile request limit — CLAUDE.md HTTP 413 rule)
        def pconv_step(v, sr, si, tl, hr, hi):
            y, (nsr, nsi, ntl) = pc._jitted(blocks, 1)(sr, si, tl, v, hr, hi)
            s = (jnp.sum(y * y) * np.float32(1e-12)).astype(v.dtype)
            return v + s, nsr, nsi, ntl, hr, hi

        t, tb = best_of(pconv_step, (xpc, sr0, si0, tl0, hr0, hi0))
        tot = ch * blocks * blk
        # min-traffic model: read input + write output (4 B each) + FDL:
        # per B-sample block read P spectra + write 1, re+im planes at
        # H = B bins -> 8*(P+1) B/sample
        pc_bytes = tot * (8 + 8 * (pc.parts + 1))
        sol = round((pc_bytes / bw) / t, 3)
        emit(bench="pconv_fdl", taps=taps, block=blk, parts=pc.parts,
             samples=tot, msamp_s=round(tot / t / 1e6, 1),
             msamp_s_best=round(tot / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- spectral zoom (CZT): Msamples/s in (bluestein.py; beyond-parity)
    if want("zoom"):
        n_z, m_z = 4096, 512
        bz = 1024 if args.quick else (64 << 20) // (4 * n_z)
        zp = pf.zoom_fft_setup(n_z, (0.2, 0.3), m_z)
        zre = jnp.asarray(rng.standard_normal((bz, n_z)).astype(np.float32))
        zim = jnp.asarray(rng.standard_normal((bz, n_z)).astype(np.float32))

        def zoom_step(r, i):
            zr, zi = pf.czt_split(zp, (r, i))
            s = (jnp.sum(zr * zr + zi * zi) * np.float32(1e-12)).astype(r.dtype)
            return r + s, i

        t, tb = best_of(zoom_step, (zre, zim))
        tot = bz * n_z
        # min-traffic model: read 2 input planes + write 2 m-bin planes
        z_bytes = tot * 4 * 2 * (1 + m_z / n_z)
        sol = round((z_bytes / bw) / t, 3)
        emit(bench="zoom_czt", n=n_z, m=m_z, samples=tot,
             msamp_s=round(tot / t / 1e6, 1),
             msamp_s_best=round(tot / tb / 1e6, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- prime-N Bluestein transform: GFLOP/s (fftw convention at N)
    if want("bluestein"):
        n_b = 4099  # prime
        bb = 256 if args.quick else (64 << 20) // (4 * n_b)
        bp = pf.BluesteinPlan(n_b)
        bre = jnp.asarray(rng.standard_normal((bb, n_b)).astype(np.float32))
        bim = jnp.asarray(rng.standard_normal((bb, n_b)).astype(np.float32))

        def blu_step(r, i):
            zr, zi = pf.bluestein.transform_any_split(bp, (r, i))
            s = (jnp.sum(zr * zr + zi * zi) * np.float32(1e-12)).astype(r.dtype)
            return r + s, i

        t, tb = best_of(blu_step, (bre, bim))
        flops = 5.0 * bb * n_b * np.log2(n_b)
        b_bytes = bb * n_b * 4 * 4  # read 2 planes + write 2 planes
        sol = round((b_bytes / bw) / t, 3)
        emit(bench="bluestein_prime", n=n_b, batch=bb,
             gflops=round(flops / t / 1e9, 1),
             gflops_best=round(flops / tb / 1e9, 1), sol=sol,
             bw_artifact=sol > 1)

    # --- 2-D transform: GFLOP/s (nd.py; row+col 1-D engine composition)
    if want("fft2"):
        n0, n1 = 512, 512
        b2 = 4 if args.quick else (64 << 20) // (4 * n0 * n1)
        ndp = pf.fftn_setup((n0, n1))
        f2r = jnp.asarray(rng.standard_normal((b2, n0, n1)).astype(np.float32))
        f2i = jnp.asarray(rng.standard_normal((b2, n0, n1)).astype(np.float32))

        def fft2_step(r, i):
            zr, zi = pf.fftn_split(ndp, (r, i))
            s = (jnp.sum(zr * zr + zi * zi) * np.float32(1e-12)).astype(r.dtype)
            return r + s, i

        t, tb = best_of(fft2_step, (f2r, f2i))
        flops = 5.0 * b2 * n0 * n1 * np.log2(n0 * n1)
        f_bytes = b2 * n0 * n1 * 4 * 4
        sol = round((f_bytes / bw) / t, 3)
        emit(bench="fft2", shape=f"{n0}x{n1}", batch=b2,
             gflops=round(flops / t / 1e9, 1),
             gflops_best=round(flops / tb / 1e9, 1), sol=sol,
             bw_artifact=sol > 1)

    if args.csv:
        import csv

        keys = sorted({k for r in rows for k in r})
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
