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

ROUNDS = 8


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

    def _fit(y, e):
        flat = y.reshape(e.shape[0], -1)
        keep = min(flat.shape[-1], e.shape[-1])
        return jnp.concatenate([flat[..., :keep], e[..., keep:]], axis=-1)

    def flip_frame(e):
        f = _flip_last(e)
        g = f[..., m - 1 : m - 1 + (p + k - 1) * m]
        rows = g.reshape(*g.shape[:-1], p + k - 1, m)
        return (_fit(rows, e),)

    def poly_only(e):
        v = ch._polyphase(e, k)
        return (_fit(v, e),)

    def fft_only(r, i):
        orr, oi = _fft.transform_ordered_split(ch.plan, (r, i), _plan.BACKWARD)
        return orr, oi

    exti = jnp.asarray(
        rng.standard_normal((batch, (p + frames) * m)).astype(np.float32)
    )

    def concat_only(r, i):
        er = jnp.concatenate([st.hist_re, r], axis=-1)
        ei = jnp.concatenate([st.hist_im, i], axis=-1)
        return er[..., : r.shape[-1]], ei[..., : i.shape[-1]]

    def poly_fft(e, e2):
        # polyphase + FFT composed (no history concat, no output reshape)
        vr_ = ch._polyphase(e, k)
        vi_ = ch._polyphase(e2, k)
        orr, oi = _fft.transform_ordered_split(ch.plan, (vr_, vi_), _plan.BACKWARD)
        return _fit(orr, e), _fit(oi, e2)

    def poly_fft_barrier(e, e2):
        # materialize the polyphase output before the FFT: without the
        # barrier XLA fuses the P-term FMA chain into the stage-1
        # contraction operand and recomputes it per tile read
        vr_ = ch._polyphase(e, k)
        vi_ = ch._polyphase(e2, k)
        vr_, vi_ = jax.lax.optimization_barrier((vr_, vi_))
        orr, oi = _fft.transform_ordered_split(ch.plan, (vr_, vi_), _plan.BACKWARD)
        return _fit(orr, e), _fit(oi, e2)

    def full_barrier(r, i):
        er = jnp.concatenate([st.hist_re, r], axis=-1)
        ei = jnp.concatenate([st.hist_im, i], axis=-1)
        vr_ = ch._polyphase(er, k)
        vi_ = ch._polyphase(ei, k)
        vr_, vi_ = jax.lax.optimization_barrier((vr_, vi_))
        yr, yi = _fft.transform_ordered_split(ch.plan, (vr_, vi_), _plan.BACKWARD)
        return yr.reshape(r.shape), yi.reshape(i.shape)

    def fft_flip(r, i):
        # the polyphase ends with a k-axis flip: does a rev PRODUCER
        # feeding the FFT contraction explain the composition blowup?
        orr, oi = _fft.transform_ordered_split(
            ch.plan, (jnp.flip(r, axis=-2), jnp.flip(i, axis=-2)), _plan.BACKWARD
        )
        return orr, oi

    def fft_flip_bar(r, i):
        fr_, fi_ = jax.lax.optimization_barrier(
            (jnp.flip(r, axis=-2), jnp.flip(i, axis=-2))
        )
        orr, oi = _fft.transform_ordered_split(ch.plan, (fr_, fi_), _plan.BACKWARD)
        return orr, oi

    def poly_fft_concat(e, e2):
        # hard materializer: round-trip the polyphase output through the
        # same flat concat the ISOLATED probes used, then FFT.  If this
        # recovers the sum-of-parts time the composition penalty is a
        # layout-assignment artifact, not fusion.
        vr_ = _fit(ch._polyphase(e, k), e)[..., : k * m * 1].reshape(
            e.shape[0], k, m
        )
        vi_ = _fit(ch._polyphase(e2, k), e2)[..., : k * m * 1].reshape(
            e2.shape[0], k, m
        )
        orr, oi = _fft.transform_ordered_split(ch.plan, (vr_, vi_), _plan.BACKWARD)
        return _fit(orr, e), _fit(oi, e2)

    def poly_fft_flat(e, e2):
        # flatten the frame axis into the batch before the FFT (2-D
        # engine entry instead of a leading [b, K] pair)
        vr_ = ch._polyphase(e, k).reshape(-1, m)
        vi_ = ch._polyphase(e2, k).reshape(-1, m)
        orr, oi = _fft.transform_ordered_split(ch.plan, (vr_, vi_), _plan.BACKWARD)
        return _fit(orr, e), _fit(oi, e2)

    steps = [
        ("full", full, (sr, si)),
        ("fft4096", fft_only, (vr, vi)),
        ("poly_fft", poly_fft, (ext, exti)),
        ("poly_fft_cat", poly_fft_concat, (ext, exti)),
        ("poly_fft_flat", poly_fft_flat, (ext, exti)),
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
