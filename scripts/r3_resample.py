"""Round-3 on-chip experiment 11: resampler hot-path formulations.

pipeline_r3 measured the polyphase resampler at 43 Msamp/s — ~100x below
the neighboring DSP components.  Candidates: (a) the current framing +
per-phase matvec ([blocks, P] @ [P] — output dim 1, pathological MXU
padding), (b) same framing but multiply-reduce on the VPU, (c) shifted
multiply-add convolution (no framing at all: P fused elementwise FMAs
per phase on the padded signal, then a reshape-based stride-M subsample).

Run:  python scripts/r3_resample.py | tee benchmarks/results/resample_r3.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu.resample import Resampler
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    rs = Resampler(3, 2, taps_per_phase=16)
    l, m, p = rs.up, rs.down, rs.p
    n = 1 << 20
    batch = 4
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    def cur(v):
        y = rs(v)
        keep = min(y.shape[-1], v.shape[-1])
        return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

    def mulred(v):
        from pffft_tpu.spectral import frame_signal

        t_in = v.shape[-1]
        n_out = (t_in * l) // m
        blocks = -(-n_out // l)
        left = p - 1
        need = (blocks - 1) * m + max(rs.base_shift) + 1 + left
        xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(left, max(0, need - t_in - left))])
        outs = []
        for s in range(l):
            phi = rs.phase_of_slot[s]
            start = rs.base_shift[s]
            fr = frame_signal(xp[..., start:], p, m)[..., :blocks, :]
            y = (fr * rs.taps_rev[:, phi]).sum(-1)
            outs.append(y)
        y = jnp.stack(outs, axis=-1).reshape(*v.shape[:-1], blocks * l)[..., :n_out]
        keep = min(y.shape[-1], v.shape[-1])
        return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

    def shiftconv(v):
        t_in = v.shape[-1]
        n_out = (t_in * l) // m
        blocks = -(-n_out // l)
        left = p - 1
        span = blocks * m
        # slices go up to start + k + span with start <= max(base_shift),
        # k <= P-1 — pad to cover the widest one
        need = span + max(rs.base_shift) + p - 1 + left
        xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(left, max(0, need - t_in - left))])
        outs = []
        taps = np.asarray(rs.taps_rev)  # [P, L]
        for s in range(l):
            start = rs.base_shift[s]
            # y_j = sum_k taps[k, phi] * xp[j*m + start + k]  (k over P)
            acc = None
            for k in range(p):
                o = start + k
                seg = jax.lax.slice_in_dim(xp, o, o + span, axis=-1)
                seg = seg.reshape(*v.shape[:-1], blocks, m)[..., 0]
                c = np.float32(taps[k, rs.phase_of_slot[s]])
                acc = seg * c if acc is None else acc + seg * c
            outs.append(acc)
        y = jnp.stack(outs, axis=-1).reshape(*v.shape[:-1], blocks * l)[..., :n_out]
        keep = min(y.shape[-1], v.shape[-1])
        return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

    def polyphase(v):
        # Deinterleave x into its M polyphase components ONCE (the only
        # strided access), then every tap term is a CONTIGUOUS shifted
        # slice of a component — no minor-axis-M arrays in the hot loop.
        t_in = v.shape[-1]
        n_out = (t_in * l) // m
        blocks = -(-n_out // l)
        left = p - 1
        # component r needs indices j + ceil((start+k-left..)/m) <= blocks + P
        need_b = blocks + p + max(rs.base_shift) // m + 2
        need = need_b * m
        xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(left, max(0, need - t_in - left))])
        comps = xp.reshape(*v.shape[:-1], need_b, m)  # [..., J, m]
        comps = [comps[..., r] for r in range(m)]  # m contiguous streams
        taps = np.asarray(rs.taps_rev)  # [P, L]
        outs = []
        for s in range(l):
            phi = rs.phase_of_slot[s]
            start = rs.base_shift[s]
            acc = None
            for k in range(p):
                # term x[j*m + start + k - left] (absolute index in xp is
                # j*m + start + k); component r = (start+k) % m at block
                # offset (start+k)//m
                o = start + k
                r, d = o % m, o // m
                seg = jax.lax.slice_in_dim(comps[r], d, d + blocks, axis=-1)
                c = np.float32(taps[k, phi])
                acc = seg * c if acc is None else acc + seg * c
            outs.append(acc)
        y = jnp.stack(outs, axis=-1).reshape(*v.shape[:-1], blocks * l)[..., :n_out]
        keep = min(y.shape[-1], v.shape[-1])
        return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

    def make_mxu():
        # ONE MXU contraction: super-blocks of G*L outputs share a frame.
        # Stride S = G*m (G=128 -> S lane-aligned multiple of 128); frame
        # width W = S + P + m; tap matrix A[W, G*L] is the banded
        # placement A[(o*m)//l + k, o] = taps_rev[k, (o*m) % l].
        from pffft_tpu.spectral import frame_signal

        g_blk = 128
        s_str = g_blk * m
        w_len = s_str + p + m
        taps = np.asarray(rs.taps_rev)  # [P, L]
        a = np.zeros((w_len, g_blk * l), np.float32)
        for o in range(g_blk * l):
            d, phi = (o * m) // l, (o * m) % l
            a[d : d + p, o] = taps[:, phi]
        a_dev = jnp.asarray(a)

        def mxu(v):
            t_in = v.shape[-1]
            n_out = (t_in * l) // m
            jn = -(-n_out // (g_blk * l))
            left = p - 1
            need = (jn - 1) * s_str + w_len + left
            xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(left, max(0, need - t_in - left))])
            fr = frame_signal(xp, w_len, s_str)[..., :jn, :]  # [..., Jn, W]
            y = jax.lax.dot_general(
                fr, a_dev, (((fr.ndim - 1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # [..., Jn, G*L]
            y = y.reshape(*v.shape[:-1], jn * g_blk * l)[..., :n_out]
            keep = min(y.shape[-1], v.shape[-1])
            return (jnp.concatenate([y[..., :keep], v[..., keep:]], axis=-1),)

        return mxu

    mxu = make_mxu()

    # correctness cross-check first (host)
    ref = np.asarray(cur(x)[0])
    for name, fn in (("mulred", mulred), ("shiftconv", shiftconv),
                     ("polyphase", polyphase), ("mxu", mxu)):
        got = np.asarray(fn(x)[0])
        err = np.abs(got - ref).max()
        print(f"# {name} vs current: max abs diff {err:.2e}", flush=True)

    steps = [("current", cur), ("shiftconv", shiftconv),
             ("polyphase", polyphase), ("mxu", mxu)]
    trials = {t: [] for t, _ in steps}
    for _ in range(ROUNDS):
        for t, fn in steps:
            trials[t].append(bench_op(fn, (x,), k1=2, k2=8, repeats=2))
    tot = batch * n
    print(f"\n== resample 3/2 P={p} on [{batch}, {n}]", flush=True)
    for t, _ in steps:
        ts = sorted(trials[t])
        med = ts[len(ts) // 2]
        print(f"  {t:10s} med {tot/med/1e6:9.1f} Msamp/s  "
              f"{[round(tot/v/1e6) for v in trials[t]]}", flush=True)


if __name__ == "__main__":
    main()
