"""Round-3 on-chip experiment: STFT through the time-major route.

stft_split frames batch-major ([K, n_fft]) and runs the batch-major REAL
transform.  The conv route (convroute2_r3.txt) showed the time-major
layout wins end-to-end even when both sides use XLA engines, and the
REAL tmajor transform rides the VPU kernel at N<=2048.  This measures a
time-major STFT composition — chunk transpose framing ([n_fft, K]),
window broadcast on rows, tmajor REAL forward, half-size spectrum planes
transposed back — against the current pipeline, at plateau payloads.

Run:  python scripts/r3_stft_tmajor.py | tee benchmarks/results/stft_tmajor_r3.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 5
# (n_fft, hop, K): frames payload = K * n_fft * 4 bytes >= 64 MB
CASES = [(256, 128, 65536), (512, 256, 32768), (1024, 512, 16384), (2048, 1024, 8192)]


def main():
    import jax
    import jax.numpy as jnp

    from pffft_tpu import fft as _fft
    from pffft_tpu import plan as _plan
    from pffft_tpu import spectral as _sp
    from timing import bench_op

    print(f"# backend={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)

    for n_fft, hop, k in CASES:
        plan = _plan.Plan.create(n_fft, _plan.REAL, strict=False)
        w = _sp.hann(n_fft)
        wj = jnp.asarray(w)
        length = (k - 1) * hop + n_fft
        out_len = k * n_fft
        spans = -(-n_fft // hop)
        total = (k - 1 + spans) * hop
        scale = np.float32(1.0 / np.sqrt(n_fft))

        def stft_b(x):
            fr = _sp.frame_signal(x, n_fft, hop) * wj
            sr, si = _fft.transform_ordered_split(plan, fr)  # [K, H]
            return sr, si

        def stft_t(x):
            xp = jnp.pad(x, (0, max(0, total - length)))[:total]
            chunks = xp.reshape(-1, hop).T  # [hop, Q]
            parts = [chunks[:, s : s + k] for s in range(spans)]
            fr = jnp.concatenate(parts, axis=0)[:n_fft] * wj[:, None]
            sr, si = _fft.transform_ordered_split_tmajor(plan, fr, _plan.FORWARD)
            return sr, si  # [H, K]

        # correctness: tmajor == batch-major, on-chip
        x0 = jnp.asarray(rng.standard_normal(length).astype(np.float32))
        br, bi = jax.jit(stft_b)(x0)
        tr, ti = jax.jit(stft_t)(x0)
        err = max(
            np.abs(np.asarray(tr).T - np.asarray(br)).max(),
            np.abs(np.asarray(ti).T - np.asarray(bi)).max(),
        )
        ref = max(1.0, float(np.abs(np.asarray(br)).max()))
        print(f"# n_fft={n_fft} hop={hop} K={k}: tmajor vs batch rel err "
              f"{err/ref:.2e}", flush=True)

        # shape-preserving carry [out_len]: spectrum planes recycled as input
        def step_b(v):
            sr, si = stft_b(v[:length])
            return (jnp.concatenate([sr, si], axis=-1).reshape(-1) * scale,)

        def step_t(v):
            sr, si = stft_t(v[:length])
            return (jnp.concatenate([sr, si], axis=0).reshape(-1) * scale,)

        # include the [K, H] public layout for the tmajor path (transpose back)
        def step_t_pub(v):
            sr, si = stft_t(v[:length])
            return (jnp.concatenate([sr.T, si.T], axis=-1).reshape(-1) * scale,)

        v0 = jnp.asarray(rng.standard_normal(out_len).astype(np.float32))
        steps = [("batch", step_b), ("tmajor", step_t), ("tmajor_pub", step_t_pub)]
        trials = {t: [] for t, _ in steps}
        for _ in range(ROUNDS):
            for t, fn in steps:
                try:
                    trials[t].append(bench_op(fn, (v0,), k1=2, k2=6, repeats=2))
                except Exception as e:  # noqa: BLE001
                    print(f"#   {t}: FAIL {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    trials[t].append(float("inf"))

        mb = k * n_fft * 4 / 1e6
        print(f"\n== STFT n_fft={n_fft} hop={hop} ({mb:.0f} MB frames, "
              f"{length/1e6:.1f} Msamp in)", flush=True)
        for t, _ in steps:
            ts = sorted(v for v in trials[t] if np.isfinite(v))
            if not ts:
                continue
            med = ts[len(ts) // 2]
            print(f"  {t:10s} med {length/med/1e6:8.1f} Msamp/s  "
                  f"{[round(length/v/1e6) for v in trials[t] if np.isfinite(v)]}",
                  flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
