"""Round-4 probe: fused conv kernel at nfft>=1024 via the scratch chain.

Round 3 routed nfft>=1024 to the composed time-major pipeline because
the fused kernel's DOUBLED (fwd+bwd) stage chain blew the Mosaic stack.
With the scoped-VMEM limit raised and the scratch ping-pong chain, the
kernel may now cover 1024-4096.  End-to-end FastConv race per nfft:
forced fused (scratch) vs forced tmajor (the shipped route) vs XLA.

Run: python scripts/r4_convkernel.py | tee benchmarks/results/convkernel_r4.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp

    import pffft_tpu as pf
    from timing import bench_op

    rng = np.random.default_rng(0)
    stream_len = 1 << 24
    for nfft in (1024, 2048, 4096):
        flen = nfft // 2 + 1
        h = rng.standard_normal(flen).astype(np.float32)
        x = jnp.asarray(rng.standard_normal(stream_len).astype(np.float32))

        variants = []
        for force, tag in ((True, "fused"), ("tmajor", "tmajor"), (False, "xla")):
            cv = pf.conv.FastConv(h)
            cv._force_conv_kernel = force
            u = cv.num_out_per_block
            total = (stream_len - nfft + 1) // u * u

            def fn(v, c=cv, t=total):
                # bench_op chains iterations: pad the valid output back to
                # the input length so the carry is shape-preserving
                y = c._conv_stream(v, t)
                return (jnp.concatenate([y, v[y.shape[0]:]]),)

            try:
                y = jax.jit(fn)(x)[0]
                got = np.asarray(y[:2048])
                want = np.convolve(
                    np.asarray(x[: 2048 + flen - 1]).astype(np.float64),
                    h.astype(np.float64), "valid")
                err = np.abs(got - want).max() / max(1.0, np.abs(want).max())
                if err > 1e-4:
                    print(f"nfft={nfft} {tag}: MISMATCH {err:.2e}", flush=True)
                    continue
                print(f"nfft={nfft} {tag}: ok err {err:.1e}", flush=True)
                variants.append((tag, fn, total))
            except Exception as e:
                print(f"nfft={nfft} {tag}: FAIL {type(e).__name__}: "
                      f"{str(e)[:110]}", flush=True)

        trials = {tag: [] for tag, _, _ in variants}
        for _ in range(ROUNDS):
            for tag, fn, total in list(variants):
                try:
                    trials[tag].append(bench_op(fn, (x,), k1=2, k2=8, repeats=2))
                except Exception:
                    variants = [v for v in variants if v[0] != tag]
        for tag, _, total in variants:
            if not trials[tag]:
                continue
            ts = sorted(trials[tag])
            med = ts[len(ts) // 2]
            print(f"nfft={nfft} {tag:7s}: med {total/med/1e9:6.2f} Gsamp/s "
                  f"trials {[round(total/t/1e9, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
