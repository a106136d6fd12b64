"""Round-4 probe: de-interleave (pack) / interleave formulations.

real_anatomy2_r4: at the sweep geometry (B=8, N=2^21) the full real
fwd+bwd pair costs 14 ms while engine+split sum to 3.3 ms — the
interleaved<->planar conversions are ~75% of the real path.  Race:

  pack_slices   x.reshape(B,H,2)[...,0/1]        (shipped)
  pack_moveaxis one explicit transpose to [2,B,H], then free slices
  pack_lanes    x[:, 0::2] / x[:, 1::2] strided lane slices
  pack_matmul   x.reshape(B,H,2) @ [2,2] identity pair via einsum
  int_stack     stack(-1)+reshape                 (shipped interleave)
  int_moveaxis  stack(0) (cheap) + one transpose + reshape

Run: python scripts/r4_pack.py | tee benchmarks/results/pack_r4.txt
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

import numpy as np

SPEC_BW = 819e9
ROUNDS = 5


def main():
    import jax
    import jax.numpy as jnp

    from timing import bench_op

    rng = np.random.default_rng(0)
    for n, b in ((1 << 21, 8), (1 << 20, 128)):
        h = n // 2
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        zr = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
        zi = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))

        def pack_slices(v):
            v3 = v.reshape(b, h, 2)
            return v3[..., 0], v3[..., 1]

        def pack_moveaxis(v):
            t = jnp.moveaxis(v.reshape(b, h, 2), -1, 0)
            return t[0], t[1]

        def pack_lanes(v):
            return v[:, 0::2], v[:, 1::2]

        sel = jnp.asarray(np.eye(2, dtype=np.float32))

        def pack_matmul(v):
            t = jnp.einsum("bht,tu->ubh", v.reshape(b, h, 2), sel,
                           precision=jax.lax.Precision.HIGHEST)
            return t[0], t[1]

        def int_stack(a, c):
            return (jnp.stack([a, c], axis=-1).reshape(b, n),)

        def int_moveaxis(a, c):
            t = jnp.stack([a, c], axis=0)        # [2, B, H] cheap
            return (jnp.moveaxis(t, 0, -1).reshape(b, n),)

        # correctness
        want_r = np.asarray(x).reshape(b, h, 2)[..., 0]
        for name, fn in (("pack_slices", pack_slices),
                         ("pack_moveaxis", pack_moveaxis),
                         ("pack_lanes", pack_lanes),
                         ("pack_matmul", pack_matmul)):
            rr, _ = jax.jit(fn)(x)
            assert np.array_equal(np.asarray(rr), want_r), name
        want_x = np.empty((b, n), np.float32)
        want_x[:, 0::2] = np.asarray(zr)
        want_x[:, 1::2] = np.asarray(zi)
        for name, fn in (("int_stack", int_stack),
                         ("int_moveaxis", int_moveaxis)):
            (xx,) = jax.jit(fn)(zr, zi)
            assert np.array_equal(np.asarray(xx), want_x), name
        print(f"# N={n} B={b}: all variants correct", flush=True)

        # bench_op needs shape-preserving carries: time each
        # pack+interleave ROUNDTRIP (exactly what a real fwd+bwd pair
        # pays for the conversions combined)
        def rt(pack, inter):
            def step(v):
                a, c = pack(v)
                # barrier: without it XLA cancels pack∘interleave to the
                # identity; in production the engine sits between them
                a, c = jax.lax.optimization_barrier((a, c))
                return inter(a, c)
            return step

        variants = {
            "rt_shipped": (rt(pack_slices, int_stack), (x,)),
            "rt_moveaxis": (rt(pack_moveaxis, int_moveaxis), (x,)),
            "rt_lanes_stack": (rt(pack_lanes, int_stack), (x,)),
            "rt_matmul_mv": (rt(pack_matmul, int_moveaxis), (x,)),
        }
        trials = {k: [] for k in variants}
        live = dict(variants)
        for _ in range(ROUNDS):
            for k, (fn, data) in list(live.items()):
                try:
                    trials[k].append(bench_op(fn, data, k1=3, k2=12, repeats=2))
                except Exception as e:
                    print(f"{k}: FAIL {type(e).__name__}: {str(e)[:80]}",
                          flush=True)
                    live.pop(k)
        by = 4 * b * n * 4  # roundtrip: 2 reads + 2 writes of the stream
        for k in variants:
            if not trials[k]:
                continue
            ts = sorted(trials[k])
            med = ts[len(ts) // 2]
            print(f"N={n} B={b} {k:14s}: med {med*1e3:8.3f} ms "
                  f"SoL {by/SPEC_BW/med:.3f}  "
                  f"trials(ms) {[round(t*1e3, 2) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
