"""Pod-scale channelizer (BASELINE.json config #5) on a device mesh.

Runs on the 8-device virtual CPU mesh by default so it works anywhere:
  python examples/example_channelizer_sharded.py
On a real multi-chip slice, drop the CPU forcing below and the same code
shards over ICI.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")  # virtual mesh; remove on a slice

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import pffft_tpu as pf  # noqa: E402
from pffft_tpu import parallel as pfp  # noqa: E402
from pffft_tpu.channelizer import Channelizer, design_lowpass  # noqa: E402


def main() -> None:
    mesh = pfp.make_mesh(8, axis_names=("data", "seq"), shape=(2, 4))
    print(f"mesh: {dict(mesh.shape)}")

    # --- DP: a batch of IQ streams, channelized in parallel --------------
    m, p = 64, 4
    ch = Channelizer(m, p)
    rng = np.random.default_rng(0)
    batch, length = 4, 64 * m
    x = (rng.standard_normal((batch, length)) + 1j * rng.standard_normal((batch, length))
         ).astype(np.complex64)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    state = jax.device_put(
        ch.init_state((batch,)),
        jax.tree.map(lambda _: NamedSharding(mesh, P("data", None)), ch.init_state((batch,))),
    )
    y, _ = jax.jit(ch.process)(state, xd)
    print(f"channelized: {x.shape} -> {y.shape}  (streams x frames x channels)")

    # --- CP: one long stream, FIR-filtered with ICI halo exchange --------
    h = design_lowpass(129, 0.05).astype(np.float32)
    setup = pf.conv.FastConv(h)
    stream = rng.standard_normal(8 * 4096).astype(np.float32)
    mesh1 = pfp.make_mesh(8)  # flat 8-way stream split
    sd1 = pfp.shard_batch(jnp.asarray(stream), mesh1)
    yconv = pfp.sharded_fastconv_valid(setup, sd1, mesh1)
    ref = np.convolve(stream.astype(np.float64), h, "valid")
    err = np.abs(np.asarray(yconv) - ref).max()
    print(f"sharded overlap-save conv: {stream.shape} -> {yconv.shape}, max err {err:.2e}")

    # --- SP/TP: one large FFT across the mesh (four-step) ----------------
    fp4 = pfp.FourStepPlan(1 << 16, mesh1)
    big = (rng.standard_normal(1 << 16) + 1j * rng.standard_normal(1 << 16)).astype(np.complex64)
    spec = fp4.forward(pfp.shard_batch(jnp.asarray(big), mesh1))
    ref = np.fft.fft(big.astype(np.complex128))
    err = np.abs(np.asarray(spec) - ref).max() / np.abs(ref).max()
    print(f"four-step FFT N=65536 over 8 shards ({fp4.n1}x{fp4.n2}), rel err {err:.2e}")


if __name__ == "__main__":
    main()
