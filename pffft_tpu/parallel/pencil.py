"""Pencil-decomposed distributed 2-D FFT over a device mesh.

The classic multi-device n-d FFT: shard the ROW axis, transform the
contiguous column axis locally, re-shard with one tiled ``all_to_all``
transpose over ICI, transform the other axis locally.  Exactly two
collectives per direction (one with ``transposed=True`` output), each
moving the payload once — the same O(1)-in-D communication shape as the
four-step 1-D plan (fourstep.py).

The reference has no n-d or distributed surface at all; this pairs with
the local :mod:`pffft_tpu.nd` module as its scaling story.

Complex-dtype convention matches the rest of :mod:`pffft_tpu.parallel`
(validated on the virtual CPU mesh + driver dryrun; the single-chip TPU
path stays planar).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import plan as _plan
from ..ops import dispatch as _dispatch
from .fourstep import _fft_axis, shard_map

__all__ = ["Pencil2D"]


class Pencil2D:
    """Distributed complex 2-D FFT of extents ``(n0, n1)``.

    The operand's trailing two axes are the transform axes; axis -2
    (length n0) is sharded over the mesh axis, axis -1 is local.  Both
    extents must be 2/3/5-smooth and divisible by the shard count.

    ``forward(x)`` -> spectrum with the SAME sharding as the input
    (costs 2 all_to_all); ``forward(x, transposed=True)`` skips the
    final transpose collective and returns the spectrum with axes
    swapped, sharded the same way — useful when the consumer is a
    pointwise multiply followed by ``backward(..., transposed=True)``,
    which accepts that layout (a full conv round trip then costs 2
    collectives instead of 4).
    Unscaled: ``backward(forward(x)) == n0 * n1 * x``.
    """

    def __init__(self, shape: Sequence[int], mesh: Mesh, *,
                 dtype="float32", axis_name: Optional[str] = None):
        self.n0, self.n1 = (int(s) for s in shape)
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.n_shards = int(mesh.shape[self.axis])
        d = self.n_shards
        if self.n0 % d or self.n1 % d:
            raise ValueError(
                f"extents {(self.n0, self.n1)} must be divisible by the "
                f"shard count {d}")
        self.dtype = np.dtype(dtype)
        self.plan0 = _plan.Plan.create(self.n0, _plan.COMPLEX, dtype, strict=False)
        self.plan1 = _plan.Plan.create(self.n1, _plan.COMPLEX, dtype, strict=False)
        self.cdtype = self.plan0.cdtype
        self._map_cache: dict = {}

    # --- shard-local cores (xl is one shard) ------------------------------
    def _a2a(self, x, split: int, concat: int):
        return jax.lax.all_to_all(
            x, self.axis, split_axis=x.ndim + split,
            concat_axis=x.ndim + concat, tiled=True)

    def _fwd_core(self, xl: jax.Array, transposed: bool) -> jax.Array:
        y = _fft_axis(xl, self.plan1, False, -1)     # rows (local, full n1)
        y = self._a2a(y, -1, -2)                     # [.., n0, n1/D]
        y = _fft_axis(y, self.plan0, False, -2)      # cols (local, full n0)
        if transposed:
            return jnp.swapaxes(y, -1, -2)           # [.., n1/D, n0]
        return self._a2a(y, -2, -1)                  # [.., n0/D, n1]

    def _bwd_core(self, sl: jax.Array, transposed: bool) -> jax.Array:
        if transposed:
            y = jnp.swapaxes(sl, -1, -2)             # [.., n0, n1/D]
        else:
            y = self._a2a(sl, -1, -2)
        y = _fft_axis(y, self.plan0, True, -2)
        y = self._a2a(y, -2, -1)                     # [.., n0/D, n1]
        return _fft_axis(y, self.plan1, True, -1)

    # --- shard_map wrappers -----------------------------------------------
    def _map(self, backward: bool, transposed: bool, ndim: int):
        # per-instance cache (a class-level lru_cache would pin self for
        # process lifetime) keyed on dispatch.state_key(): the engine
        # traced inside bakes in cmul/engine/spec2 globals at trace time
        # (the repo's trace-time-globals rule, CLAUDE.md)
        key = (backward, transposed, ndim, _dispatch.state_key())
        fn = self._map_cache.get(key)
        if fn is None:
            spec = P(*([None] * (ndim - 2)), self.axis, None)
            core = self._bwd_core if backward else self._fwd_core
            fn = jax.jit(shard_map(
                functools.partial(core, transposed=transposed),
                mesh=self.mesh, in_specs=(spec,), out_specs=spec,
                check_vma=False))
            self._map_cache[key] = fn
        return fn

    def _check(self, x, transposed_in: bool) -> jax.Array:
        want = (self.n1, self.n0) if transposed_in else (self.n0, self.n1)
        if x.shape[-2:] != want:
            raise ValueError(
                f"trailing axes {x.shape[-2:]} do not match plan "
                f"{'transposed ' if transposed_in else ''}extents {want}")
        return jnp.asarray(x).astype(self.cdtype.type)

    # --- public -------------------------------------------------------------
    def forward(self, x: jax.Array, transposed: bool = False) -> jax.Array:
        """[..., n0, n1] -> spectrum ([..., n1, n0] if transposed)."""

        x = self._check(x, False)
        return self._map(False, transposed, x.ndim)(x)

    def backward(self, s: jax.Array, transposed: bool = False) -> jax.Array:
        """Unscaled inverse; with ``transposed=True`` accepts the
        transposed spectrum layout from ``forward(..., transposed=True)``."""

        s = self._check(s, transposed)
        return self._map(True, transposed, s.ndim)(s)

    def __repr__(self) -> str:  # pragma: no cover
        return (f"Pencil2D(({self.n0}, {self.n1}), D={self.n_shards}, "
                f"{self.dtype.name})")
