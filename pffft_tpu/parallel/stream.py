"""Sharded streaming: overlap-save halo exchange over ICI (the CP analog).

The reference's streaming contract is sequential: ``pffastconv_apply``
consumes a block, the caller carries ``filterLen-1`` tail samples to the
next call (/root/reference/src/pffastconv.c:133-263).  Sharding a stream
over devices turns that carried tail into a **halo**: producing the valid
outputs of shard d requires the first ``filterLen-1`` samples of shard d+1.
We fetch it with one ``jax.lax.ppermute`` (ICI collective-permute) inside
``shard_map`` and then run the ordinary batched overlap-save pipeline
shard-locally — the same structure the reference uses across *calls*,
re-expressed across *devices*.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level, older under experimental
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .. import conv as _conv

__all__ = ["halo_exchange_right", "sharded_fastconv_valid"]


def halo_exchange_right(x_local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Inside shard_map: return the first ``halo`` samples (last axis) of the
    *next* shard; the last shard receives zeros (stream end padding)."""

    n = jax.lax.psum(1, axis_name)
    if halo <= 0:
        return x_local[..., :0]
    head = x_local[..., :halo]
    if n == 1:
        return jnp.zeros_like(head)
    # shard i+1 sends its head to shard i
    perm = [(i, i - 1) for i in range(1, n)]
    return jax.lax.ppermute(head, axis_name, perm)


def sharded_fastconv_valid(
    setup: _conv.FastConv,
    x: jax.Array,
    mesh: Mesh,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Valid-mode fast convolution of a mesh-sharded stream.

    x: [..., L] with the last axis sharded contiguously over ``axis_name``
    (leading axes are batch/channel and may carry their own sharding).
    Returns [..., L - filterLen + 1], matching
    ``np.convolve(x, h, 'valid')`` per row (or correlation with the
    CORRELATION flag) — i.e. the flush-mode output of the reference's
    streaming loop, computed in one step across all shards.
    """

    if setup.cplx_filter or setup.single_fft:
        raise NotImplementedError(
            "sharded streaming supports real-filter modes (NONE / CPLX_INP_OUT)"
        )
    ax = axis_name or mesh.axis_names[0]
    n_shards = mesh.shape[ax]
    f = setup.filter_len
    halo = f - 1
    length = x.shape[-1]
    if length % n_shards:
        raise ValueError(f"stream length {length} must divide over {n_shards} shards")
    l_local = length // n_shards
    if l_local < halo:
        raise ValueError(
            f"per-shard length {l_local} shorter than the filter halo {halo}"
        )

    complex_stream = setup.cplx_stream or jnp.iscomplexobj(x)

    def _rows(fn, arr):
        for _ in range(arr.ndim - 1):
            fn = jax.vmap(fn)
        return fn(arr)

    def local(xl):
        h = halo_exchange_right(xl, halo, ax)
        ext = jnp.concatenate([xl, h], axis=-1)
        conv1 = lambda row: setup._conv_stream(row, l_local)
        if complex_stream:
            yi = _rows(conv1, jnp.real(ext).astype(setup.dtype))
            yq = _rows(conv1, jnp.imag(ext).astype(setup.dtype))
            return yi + 1j * yq
        return _rows(conv1, ext.astype(setup.dtype))

    spec = P(*([None] * (x.ndim - 1)), ax)
    y = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)
    return y[..., : length - f + 1]
