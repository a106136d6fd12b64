"""Virtual-mesh weak-scaling model (the stand-in for unavailable multi-chip
hardware; VERDICT.md round-1 item 9).

Runs the distributed paths on 1/2/4/8 virtual CPU devices and reports, per
shard count:

  * sharded_fastconv_valid and FourStepPlan forward wall-time (virtual CPU
    — *not* a TPU throughput claim, only a sanity check that work scales),
  * the communication model from the compiled HLO: number/bytes of
    all-to-all and collective-permute ops per call, and the
    comm-bytes : compute-bytes ratio (halo/payload for overlap-save,
    transpose/payload for the four-step).

On real ICI the weak-scaling efficiency is governed by those ratios: the
four-step moves each payload byte through all-to-all twice (+once if
ordered), independent of D, and overlap-save exchanges filterLen-1 halo
samples per shard per block — both O(1) in shard count, which is the
architectural argument for the >=85% weak-scaling north star.

Usage: python benchmarks/scaling_mesh.py [--csv out.csv]
"""

import argparse
import json
import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _collective_stats(txt: str) -> dict:
    """Count collective ops and their output bytes in compiled HLO text."""

    out = {"all_to_all": 0, "collective_permute": 0, "all_to_all_bytes": 0,
           "collective_permute_bytes": 0}
    dtype_bytes = {"f32": 4, "f64": 8, "c64": 8, "c128": 16, "s32": 4, "u32": 4,
                   "bf16": 2, "f16": 2, "pred": 1, "s8": 1, "u8": 1}

    def shape_bytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    for line in txt.splitlines():
        m = re.search(
            r"=\s*((?:\([^)]*\)|[\w\[\],{} ]+?))\s*"
            r"(all-to-all(?:-start)?|collective-permute(?:-start)?)\(", line
        )
        if not m:
            continue
        key = "all_to_all" if m.group(2).startswith("all-to-all") else "collective_permute"
        out[key] += 1
        shapes = re.findall(r"(\w+\[[\d,]*\])", m.group(1))
        out[key + "_bytes"] += sum(shape_bytes(s) for s in shapes)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import pffft_tpu as pf
    from pffft_tpu import parallel as pfp

    devs = jax.devices()
    rng = np.random.default_rng(0)
    rows = []

    for d in (1, 2, 4, 8):
        if d > len(devs):
            break
        mesh = Mesh(np.array(devs[:d]), ("d",))

        # ---- four-step FFT: N per shard held constant (weak scaling) ----
        n = 4096 * d
        fp = pfp.FourStepPlan(n, mesh)
        z = jnp.asarray(
            (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        )
        zd = pfp.shard_batch(z, mesh, axis=0)
        fn = jax.jit(lambda v: fp.forward(v))
        txt = fn.lower(zd).compile().as_text()
        st = _collective_stats(txt)
        fn(zd).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            fn(zd).block_until_ready()
        t_fft = (time.perf_counter() - t0) / 5
        payload_shard = 8 * n // d  # c64 payload bytes per shard
        rows.append(dict(
            path="fourstep_cfft", shards=d, n=n,
            wall_us=round(t_fft * 1e6, 1),
            a2a_ops=st["all_to_all"], a2a_bytes=st["all_to_all_bytes"],
            permute_ops=st["collective_permute"],
            # collective bytes per payload byte PER SHARD: the weak-scaling
            # invariant (O(1) in shard count = each byte crosses the wire a
            # fixed number of times)
            comm_ratio=round((st["all_to_all_bytes"] + st["collective_permute_bytes"]) / payload_shard, 3),
        ))

        # ---- sharded overlap-save conv: stream per shard constant ----
        flen = 129
        h = rng.standard_normal(flen).astype(np.float32)
        xs = rng.standard_normal(16384 * d).astype(np.float32)
        xd = pfp.shard_batch(jnp.asarray(xs), mesh, axis=0)
        setup = pf.conv.FastConv(h)
        cf = jax.jit(lambda v: pfp.sharded_fastconv_valid(setup, v, mesh))
        txt = cf.lower(xd).compile().as_text()
        st = _collective_stats(txt)
        cf(xd).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            cf(xd).block_until_ready()
        t_conv = (time.perf_counter() - t0) / 5
        payload_shard = 4 * xs.size // d
        rows.append(dict(
            path="sharded_fastconv", shards=d, n=xs.size,
            wall_us=round(t_conv * 1e6, 1),
            a2a_ops=st["all_to_all"], a2a_bytes=st["all_to_all_bytes"],
            permute_ops=st["collective_permute"],
            comm_ratio=round((st["all_to_all_bytes"] + st["collective_permute_bytes"]) / payload_shard, 4),
        ))

    for r in rows:
        print(json.dumps(r))

    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)


if __name__ == "__main__":
    main()
