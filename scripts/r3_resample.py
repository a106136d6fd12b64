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
        need = (blocks - 1) * m + max(rs.base_shift) + 1 + left
        xp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(left, max(0, need - t_in - left))])
        span = blocks * m
        x2 = None
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

    # correctness cross-check first (host)
    ref = np.asarray(cur(x)[0])
    for name, fn in (("mulred", mulred), ("shiftconv", shiftconv)):
        got = np.asarray(fn(x)[0])
        err = np.abs(got - ref).max()
        print(f"# {name} vs current: max abs diff {err:.2e}", flush=True)

    steps = [("current", cur), ("mulred", mulred), ("shiftconv", shiftconv)]
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
