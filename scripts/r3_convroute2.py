"""Round-3 on-chip experiment: conv route follow-ups.

(a) nfft=64: the fused spectral-conv kernel vs the XLA pipeline
    (convroute_r3.txt measured 128/256/512; the flen=32 bench row runs
    at nfft=64 and has no table entry yet).
(b) nfft=1024/2048: the fused kernel cannot compile (doubled stage
    chain vs the Mosaic scoped-VMEM stack), but a COMPOSED time-major
    pipeline — same framing/packing, kernel-FFT fwd + XLA Hf multiply +
    kernel-FFT bwd through the dispatch-routed transforms — still saves
    the batch-major path's layout and may win where the FFT kernel does
    (N<=1024 time-major, routed_tb_r3.txt).

Run:  python scripts/r3_convroute2.py | tee benchmarks/results/convroute2_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5
# (filter_len, num_blocks, modes): nfft = 2*next_pow2(flen-1) (min 32)
CASES = [
    (33, 262144, ("fused", "tmajor")),
    (513, 16384, ("tmajor",)),
    (1025, 8192, ("tmajor",)),
]


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu import conv as _conv
    from pffft_tpu import fft as _fft
    from pffft_tpu import plan as _plan
    from pffft_tpu.ops import conv_kernel as _ck
    from pffft_tpu.ops import dispatch as _dispatch
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for flen, nb, modes in CASES:
        h = rng.standard_normal(flen).astype(np.float32)
        cv = _conv.FastConv(h)
        nfft, u = cv.nfft, cv.num_out_per_block
        pad_len = (nb + 1) * u
        total = nb * u
        x = jnp.asarray(rng.standard_normal(pad_len).astype(np.float32))
        cols = (nb + 1) // 2
        colsp = -(-cols // 128) * 128

        cplan = _plan.new_setup(nfft, _plan.COMPLEX)
        hfr_np, hfi_np = _ck.filter_spectrum(cplan, np.asarray(cv._g64))
        hfr, hfi = jnp.asarray(hfr_np), jnp.asarray(hfi_np)

        def tmajor_pipe(xx):
            x2 = xx.reshape(nb + 1, u).T
            frames = jnp.concatenate([x2[:, :-1], x2[:, 1:]], axis=0)[:nfft]
            fp = jnp.pad(frames, ((0, 0), (0, 2 * colsp - nb)))
            f3 = fp.reshape(nfft, colsp, 2)
            sr, si = _fft.transform_ordered_split_tmajor(
                cplan, (f3[..., 0], f3[..., 1]), _plan.FORWARD
            )
            mr = sr * hfr[:, None] - si * hfi[:, None]
            mi = sr * hfi[:, None] + si * hfr[:, None]
            yr, yi = _fft.transform_ordered_split_tmajor(
                cplan, (mr, mi), _plan.BACKWARD
            )
            y = jnp.stack([yr, yi], axis=-1).reshape(nfft, 2 * colsp)
            return y[:u, :nb].T.reshape(-1)

        xpipe = cv._jitted_pipeline(nb, _dispatch.state_key())

        def step_xla(xx):
            fr, _, _ = cv._frame(xx, total)
            y = xpipe(fr)[:, :u].reshape(-1)
            return (jnp.concatenate([y, xx[y.shape[0]:]]),)

        def step_tmajor(xx):
            y = tmajor_pipe(xx)
            return (jnp.concatenate([y, xx[y.shape[0]:]]),)

        steps = [("xla", step_xla)]
        if "tmajor" in modes:
            steps.append(("tmajor", step_tmajor))
        if "fused" in modes:
            fused = cv._jitted_fused_stream(nb, True, _dispatch.state_key())
            if fused is None:
                print(f"# nfft={nfft}: fused unavailable", flush=True)
            else:
                def step_fused(xx, f=fused):
                    y = f(xx)
                    return (jnp.concatenate([y, xx[y.shape[0]:]]),)
                steps.append(("fused", step_fused))

        # correctness of each candidate vs the xla pipeline, on-chip
        frames0, _, _ = cv._frame(x, total)
        want = np.asarray(xpipe(frames0)[:, :u].reshape(-1)[:total])
        for t, fn in steps[1:]:
            got = np.asarray(fn(x)[0][:total])
            err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
            print(f"# nfft={nfft} {t} vs xla rel err {err:.2e}", flush=True)

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
        print(f"\n== FastConv nfft={nfft} flen={flen} ({mb:.0f} MB frames)",
              flush=True)
        for t, _ in steps:
            ts = sorted(v for v in trials[t] if np.isfinite(v))
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {t:7s} med {total/med/1e6:8.1f} Msamp/s  "
                  f"{[round(total/v/1e6) for v in trials[t] if np.isfinite(v)]}",
                  flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
