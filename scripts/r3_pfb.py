"""Round-3 on-chip experiment 12: Pallas sliding-window PFB FIR kernel.

The channelizer's honest plateau (67 MB/plane) is 1.64 Gsamp/s; its
polyphase stage costs ~P=8 shifted HBM reads through XLA.  The Pallas
kernel (ops/pfb_kernel.py) holds the strip in VMEM: 1 read + 1 write.
Measures: (a) on-chip correctness kernel-vs-chain, (b) standalone stage
timing, (c) full channelizer step timing with each engine, interleaved
rounds at the plateau payload.

Run:  python scripts/r3_pfb.py | tee benchmarks/results/pfb_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu.channelizer import Channelizer
    from pffft_tpu.ops import pfb_kernel
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    m, p, batch, frames = 4096, 8, 4, 1024
    k = frames

    # (a) on-chip correctness, kernel vs chain, production shape
    rows = jnp.asarray(rng.standard_normal((batch, k + p - 1, m)).astype(np.float32))
    wt = jnp.asarray(rng.standard_normal((p, m)).astype(np.float32))

    def chain(r, w):
        acc = r[..., 0:k, :] * w[0]
        for s in range(1, p):
            acc = acc + r[..., s : s + k, :] * w[s]
        return acc

    got = np.asarray(jax.jit(lambda r, w: pfb_kernel.pfb_fir(r, w, k))(rows, wt))
    want = np.asarray(jax.jit(chain)(rows, wt))
    print(f"# kernel vs chain on-chip: max abs diff {np.abs(got - want).max():.2e}",
          flush=True)

    # (b) standalone stage: kernel vs chain (shape-preserving wraps)
    def stage_kernel(r):
        y = pfb_kernel.pfb_fir(r, wt, k)
        return (jnp.concatenate([y, r[..., k:, :]], axis=-2),)

    def stage_chain(r):
        y = chain(r, wt)
        return (jnp.concatenate([y, r[..., k:, :]], axis=-2),)

    # (c) full channelizer step, both engines (per-instance override)
    ch_x = Channelizer(m, p)
    ch_k = Channelizer(m, p)
    ch_k._use_pfb_kernel = lambda kk: pfb_kernel.supported(kk, p, m, np.float32)
    sr = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
    si = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
    st = ch_x.init_state((batch,))

    def step_xla(r, i):
        (yr, yi), _ = ch_x.process_split(st, r, i)
        return yr.reshape(r.shape), yi.reshape(i.shape)

    def step_pallas(r, i):
        (yr, yi), _ = ch_k.process_split(st, r, i)
        return yr.reshape(r.shape), yi.reshape(i.shape)

    # full-pipeline correctness too
    a = np.asarray(jax.jit(step_xla)(sr, si)[0])
    b = np.asarray(jax.jit(step_pallas)(sr, si)[0])
    print(f"# channelizer xla vs pallas on-chip: max abs diff {np.abs(a - b).max():.2e}",
          flush=True)

    steps = [
        ("stage_chain", stage_chain, (rows,)),
        ("stage_kernel", stage_kernel, (rows,)),
        ("chan_xla", step_xla, (sr, si)),
        ("chan_pallas", step_pallas, (sr, si)),
    ]
    trials = {t: [] for t, _, _ in steps}
    for _ in range(ROUNDS):
        for t, fn, data in steps:
            trials[t].append(bench_op(fn, data, k1=2, k2=6, repeats=2))

    n_stage = batch * k * m
    in_samps = batch * frames * m
    print(f"\n== PFB stage [{batch}, {k + p - 1}, {m}] f32 (67 MB out/plane)", flush=True)
    for t, _, _ in steps:
        ts = sorted(trials[t])
        med = ts[len(ts) // 2]
        tot = n_stage if t.startswith("stage") else in_samps
        print(f"  {t:12s} med {tot/med/1e6:8.1f} Msamp/s  "
              f"{[round(tot/v/1e6) for v in trials[t]]}", flush=True)


if __name__ == "__main__":
    main()
