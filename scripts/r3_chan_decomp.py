"""Round-3 experiment 13: where does the channelizer step's time go?

chan step at the plateau payload = 9.6 ms (1.74 Gsamp/s).  Times each
piece in isolation: the history concat, the flip+frame, the polyphase
FIR, and the N=4096 backward FFT over the [4, 1024] frame batch.

Run:  python scripts/r3_chan_decomp.py | tee benchmarks/results/chan_decomp_r3.txt
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

    from pffft_tpu import fft as _fft
    from pffft_tpu import plan as _plan
    from pffft_tpu.channelizer import Channelizer
    from pffft_tpu.ops.split import _flip_last
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    m, p, batch, frames = 4096, 8, 4, 1024
    k = frames
    ch = Channelizer(m, p)
    in_samps = batch * frames * m

    sr = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
    si = jnp.asarray(rng.standard_normal((batch, frames * m)).astype(np.float32))
    ext = jnp.asarray(
        rng.standard_normal((batch, (p + frames) * m)).astype(np.float32)
    )
    vr = jnp.asarray(rng.standard_normal((batch, k, m)).astype(np.float32))
    vi = jnp.asarray(rng.standard_normal((batch, k, m)).astype(np.float32))
    st = ch.init_state((batch,))

    def full(r, i):
        (yr, yi), _ = ch.process_split(st, r, i)
        return yr.reshape(r.shape), yi.reshape(i.shape)

    def flip_frame(e):
        f = _flip_last(e)
        g = f[..., m - 1 : m - 1 + (p + k - 1) * m]
        rows = g.reshape(*g.shape[:-1], p + k - 1, m)
        return (rows.reshape(e.shape[0], -1)[..., : e.shape[-1]],)

    def poly_only(e):
        v = ch._polyphase(e, k)
        return (v.reshape(e.shape[0], -1)[..., : e.shape[-1]],)

    def fft_only(r, i):
        orr, oi = _fft.transform_ordered_split(ch.plan, (r, i), _plan.BACKWARD)
        return orr, oi

    steps = [
        ("full", full, (sr, si)),
        ("flip_frame", flip_frame, (ext,)),
        ("polyphase", poly_only, (ext,)),
        ("fft4096", fft_only, (vr, vi)),
    ]
    trials = {t: [] for t, _, _ in steps}
    for _ in range(ROUNDS):
        for t, fn, data in steps:
            trials[t].append(bench_op(fn, data, k1=2, k2=6, repeats=2))

    print(f"\n== channelizer decomposition, payload {in_samps/1e6:.1f} Msamp", flush=True)
    for t, _, _ in steps:
        ts = sorted(trials[t])
        med = ts[len(ts) // 2]
        print(f"  {t:10s} med {med*1e3:7.2f} ms  ({in_samps/med/1e6:8.1f} Msamp/s)  "
              f"{[round(v*1e3, 2) for v in trials[t]]}", flush=True)


if __name__ == "__main__":
    main()
