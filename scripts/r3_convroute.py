"""Round-3 on-chip experiment: FastConv end-to-end, fused kernel route
vs the XLA pipeline.

Unlike r3_convkernel.py (bare block-convolution engines), this measures
the WHOLE overlap-save path a FastConv.apply call runs — framing (one
stream-sized transpose on the fused route), column pairing/padding, the
spectral block conv, and the valid-sample extraction — at production
filter lengths.  Decides the ops/dispatch._CONV_TABLE entries.

Run:  python scripts/r3_convroute.py | tee benchmarks/results/convroute_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5
# (filter_len, num_blocks): nfft = 2*next_pow2(flen-1), u = nfft - flen + 1
CASES = [(65, 131072), (129, 65536), (257, 32768)]


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu import conv as _conv
    from pffft_tpu.ops import dispatch as _dispatch
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for flen, nb in CASES:
        h = rng.standard_normal(flen).astype(np.float32)
        cv = _conv.FastConv(h)
        nfft, u = cv.nfft, cv.num_out_per_block
        pad_len = (nb + 1) * u
        total = nb * u
        x = jnp.asarray(rng.standard_normal(pad_len).astype(np.float32))

        fused = cv._jitted_fused_stream(nb, True, _dispatch.state_key())
        if fused is None:
            print(f"# nfft={nfft}: fused route unavailable, skipped", flush=True)
            continue
        xpipe = cv._jitted_pipeline(nb, _dispatch.state_key())

        # correctness on-chip, fused vs xla pipeline, a few positions
        yf = np.asarray(fused(x)[:total])
        frames, _, _ = cv._frame(x, total)
        yx = np.asarray(xpipe(frames)[:, :u].reshape(-1)[:total])
        err = np.abs(yf - yx).max() / max(1.0, np.abs(yx).max())
        print(f"# nfft={nfft} u={u} nb={nb}: fused vs xla rel err {err:.2e}",
              flush=True)

        def step_fused(xx):
            y = fused(xx)
            return (jnp.concatenate([y, xx[y.shape[0]:]]),)

        def step_xla(xx):
            fr, _, _ = cv._frame(xx, total)
            y = xpipe(fr)[:, :u].reshape(-1)
            return (jnp.concatenate([y, xx[y.shape[0]:]]),)

        steps = [("fused", step_fused), ("xla", step_xla)]
        trials = {t: [] for t, _ in steps}
        for _ in range(ROUNDS):
            for t, fn in steps:
                try:
                    trials[t].append(bench_op(fn, (x,), k1=2, k2=6, repeats=2))
                except Exception as e:  # noqa: BLE001
                    print(f"#   {t}: FAIL {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    trials[t].append(float("inf"))

        mb = nb * nfft * 4 / 1e6
        print(f"\n== FastConv nfft={nfft} flen={flen} ({mb:.0f} MB frames, "
              f"{total/1e6:.1f} Msamp out)", flush=True)
        for t, _ in steps:
            ts = sorted(v for v in trials[t] if np.isfinite(v))
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {t:6s} med {total/med/1e6:8.1f} Msamp/s  "
                  f"{[round(total/v/1e6) for v in trials[t] if np.isfinite(v)]}",
                  flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
