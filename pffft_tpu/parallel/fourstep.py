"""Four-step (Bailey) decomposition: one large-N FFT over a device mesh.

This is the TP/SP analog named in BASELINE.json and SURVEY.md §5.7.  The
reference's own engine is a miniature of the idea: its 4-lane SIMD complex
FFT is a two-level N = 4 x (N/4) decomposition with a transpose+twiddle
"finalize" (/root/reference/src/pffft_priv_impl.h:1195-1270).  Here the same
factorization is scaled up so the two levels are *device-local FFT phases*
and the transposes are explicit ``jax.lax.all_to_all`` collectives over ICI.

Algebra (decimation in time over n = n1*N2 + n2, bins k = k1 + N1*k2):

    A[k1, n2] = CFFT_N1 over n1 of x[n1, n2]                    (column FFTs)
    Y[k1, k2] = CFFT_N2 over n2 of ( A[k1, n2] * W_N^{k1*n2} )  (row FFTs)
    X[k1 + N1*k2] = Y[k1, k2]

Distribution (everything inside one ``shard_map`` so each FFT phase is
provably shard-local — no partitioner guessing):

    local [N1/D, N2]  --all_to_all-->  [N1, N2/D]   column FFTs + twiddle
                      --all_to_all-->  [N1/D, N2]   row FFTs
    ordered output: one more all_to_all + local transpose.

The k1-major flattening of Y is the plan's **internal order** — the
distributed rendition of pffft's unordered z-domain layout
(pffft.h:126-132): free to produce, pointwise convolution works in it, and
:meth:`FourStepPlan.reorder` (one all-to-all) maps to canonical order.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import plan as _plan
from ..ops import stages as _stages
from ..ops.split import _flip_last as _flip_last_local

try:  # jax >= 0.8 top-level, older under experimental
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["FourStepPlan", "fourstep_cfft", "fourstep_icfft", "fourstep_rfft", "fourstep_irfft"]


def _split_n(n: int, n1: Optional[int], n_shards: int) -> Tuple[int, int]:
    """Choose N = N1 * N2 with both factors 2/3/5-smooth and divisible by the
    shard count (so both FFT phases are exactly shard-local), preferring
    balanced factors (minimum total twiddle/transpose imbalance)."""

    if n1 is not None:
        if n % n1:
            raise ValueError(f"N1={n1} does not divide N={n}")
        return n1, n // n1

    best = None
    for cand in _smooth_divisors(n):
        n2 = n // cand
        if cand % n_shards or n2 % n_shards:
            continue
        score = abs(math.log(cand) - math.log(n2))
        if best is None or score < best[0]:
            best = (score, cand)
    if best is None:
        raise ValueError(
            f"cannot split N={n} into two 2/3/5-smooth factors each divisible "
            f"by {n_shards} shards"
        )
    return best[1], n // best[1]


def _smooth_divisors(n: int):
    fs = _plan.decompose_smooth(n)
    divs = {1}
    for p in fs:
        divs |= {d * p for d in divs}
    return sorted(divs)


def _twiddle_np(n1: int, n2: int, cdtype) -> np.ndarray:
    """W_N^{k1*n2} (forward sign), exact integer phase reduction then float64
    trig, matching the conditioning policy of plan.py twiddles."""

    n = n1 * n2
    k1 = np.arange(n1, dtype=np.int64)[:, None]
    m2 = np.arange(n2, dtype=np.int64)[None, :]
    e = (k1 * m2) % n
    ang = (2.0 * np.pi / n) * e.astype(np.float64)
    return (np.cos(ang) - 1j * np.sin(ang)).astype(cdtype)


def _fft_axis(a: jax.Array, sub_plan, backward: bool, axis: int) -> jax.Array:
    """Plan-level complex FFT along ``axis`` (engine works on the last axis)."""

    if axis in (-1, a.ndim - 1):
        return _stages.cfft_plan(a, sub_plan, backward=backward, ordered=True)
    a = jnp.swapaxes(a, axis, -1)
    a = _stages.cfft_plan(a, sub_plan, backward=backward, ordered=True)
    return jnp.swapaxes(a, axis, -1)


class FourStepPlan:
    """Distributed plan for one complex FFT of length N = N1 * N2.

    Read-only and jit-shareable, like a local :class:`~pffft_tpu.plan.Plan`.
    ``kind=REAL`` adds the half-length split step (N must then be even; the
    complex engine runs at N/2, mirroring the local real path in ops/real.py).
    """

    def __init__(
        self,
        n: int,
        mesh: Mesh,
        *,
        kind=_plan.COMPLEX,
        dtype="float32",
        axis_name: Optional[str] = None,
        n1: Optional[int] = None,
        max_factor=None,
    ):
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.n_shards = mesh.shape[self.axis]
        self.kind = _plan._coerce_kind(kind)
        self.n = int(n)
        self.dtype = np.dtype(dtype)

        engine_n = self.n // 2 if self.kind == _plan.REAL else self.n
        self.engine_n = engine_n
        self.n1, self.n2 = _split_n(engine_n, n1, self.n_shards)
        # local sub-plans run with no SIMD-granularity constraint
        self.plan1 = _plan.Plan.create(self.n1, _plan.COMPLEX, dtype, strict=False, max_factor=max_factor)
        self.plan2 = _plan.Plan.create(self.n2, _plan.COMPLEX, dtype, strict=False, max_factor=max_factor)
        self.cdtype = self.plan1.cdtype
        self._jit_cache: dict = {}
        # twiddle enters sharded over n2 (the layout of the phase that uses it)
        self._tw_dev = jax.device_put(
            _twiddle_np(self.n1, self.n2, self.cdtype),
            NamedSharding(mesh, P(None, self.axis)),
        )
        if self.kind == _plan.REAL:
            self._real_tw_dev = jax.device_put(
                _plan._real_split_twiddle(self.n, -1, self.cdtype),
                NamedSharding(mesh, P(self.axis)),
            )

    # --- shard-local cores (run inside shard_map; x2l is one shard) -----
    def _a2a(self, x, split: int, concat: int):
        return jax.lax.all_to_all(
            x, self.axis, split_axis=x.ndim + split, concat_axis=x.ndim + concat, tiled=True
        )

    def _fwd_core(self, xl: jax.Array, twl: jax.Array, ordered: bool) -> jax.Array:
        lead = xl.shape[:-1]
        x2l = xl.reshape(*lead, self.n1 // self.n_shards, self.n2)
        a = self._a2a(x2l, -1, -2)                      # [.., N1, N2/D]
        a = _fft_axis(a, self.plan1, False, -2)  # column FFTs (local)
        a = a * twl                                     # W_N^{k1*n2}
        a = self._a2a(a, -2, -1)                        # [.., N1/D, N2]
        y = _fft_axis(a, self.plan2, False, -1)  # row FFTs (local)
        if ordered:
            y = self._a2a(y, -1, -2)                    # [.., N1, N2/D]
            y = jnp.swapaxes(y, -1, -2)                 # [.., N2/D, N1]
        return y.reshape(*lead, -1)

    def _bwd_core(self, sl: jax.Array, twl: jax.Array, ordered: bool) -> jax.Array:
        lead = sl.shape[:-1]
        if ordered:
            y = sl.reshape(*lead, self.n2 // self.n_shards, self.n1)
            y = jnp.swapaxes(y, -1, -2)                 # [.., N1, N2/D]
            y = self._a2a(y, -2, -1)                    # [.., N1/D, N2]
        else:
            y = sl.reshape(*lead, self.n1 // self.n_shards, self.n2)
        a = _fft_axis(y, self.plan2, True, -1)   # row IFFTs (local)
        a = self._a2a(a, -1, -2)                        # [.., N1, N2/D]
        a = a * jnp.conj(twl)
        a = _fft_axis(a, self.plan1, True, -2)   # column IFFTs (local)
        x2 = self._a2a(a, -2, -1)                       # [.., N1/D, N2]
        return x2.reshape(*lead, -1)

    # --- real split steps.  The Hermitian mirror y[k] = z[(H-k) mod H]
    # crosses shard boundaries, so it runs INSIDE shard_map as a local flip
    # plus two explicit ppermutes (shard reversal + boundary rotate) — the
    # distributed rendition of the reference's shuffle-free reversed_copy
    # (pffft_priv_impl.h:1125).  Left to the SPMD partitioner, the same
    # computation compiled to serializing gathers (round-1 finding;
    # asserted gather-free in test_parallel). -----------------------------
    def _sconstrain(self, x):
        spec = P(*([None] * (x.ndim - 1)), self.axis)
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    def _rev1_local(self, f: jax.Array) -> jax.Array:
        """Shard-local piece of the global y[k] = z[(H-k) mod H] mirror."""

        ax, d = self.axis, self.n_shards
        # local flip: blocked 2D both-axes reverse for large shard-local
        # lengths — a flat lax.rev on a large minor axis serializes on the
        # TPU backend (same workaround as ops/split.py:_flip_last)
        f = _flip_last_local(f)
        if d > 1:
            # global flip: shard s now holds flip-block D-1-s -> swap shards
            f = jax.lax.ppermute(f, ax, [(i, d - 1 - i) for i in range(d)])
            # rotate right by one element across the shard boundary
            prev = jax.lax.ppermute(
                f[..., -1:], ax, [(i, (i + 1) % d) for i in range(d)]
            )
        else:
            prev = f[..., -1:]
        return jnp.concatenate([prev, f[..., :-1]], axis=-1)

    def _bin0_mask(self, length: int):
        on_shard0 = jax.lax.axis_index(self.axis) == 0
        return (jnp.arange(length) == 0) & on_shard0

    def _real_post_fwd_core(self, zfl: jax.Array, rtwl: jax.Array) -> jax.Array:
        zc = jnp.conj(self._rev1_local(zfl))
        e = 0.5 * (zfl + zc)
        o = -0.5j * (zfl - zc)
        s = e + rtwl * o
        z0 = zfl[..., 0:1]
        packed0 = (jnp.real(z0) + jnp.imag(z0)) + 1j * (jnp.real(z0) - jnp.imag(z0))
        mask = self._bin0_mask(zfl.shape[-1])
        return jnp.where(mask, packed0.astype(s.dtype), s)

    def _real_pre_bwd_core(self, sl: jax.Array, rtwl: jax.Array) -> jax.Array:
        mask = self._bin0_mask(sl.shape[-1])
        dc = jnp.real(sl[..., 0:1]).astype(sl.dtype)
        nyq = jnp.imag(sl[..., 0:1]).astype(sl.dtype)
        xa = jnp.where(mask, dc, sl)
        xb = jnp.where(mask, nyq, self._rev1_local(xa))
        xbc = jnp.conj(xb)
        e = xa + xbc
        o = jnp.conj(rtwl) * (xa - xbc)
        return e + 1j * o

    def _real_post_map(self, backward: bool, ndim: int):
        data_spec = P(*([None] * (ndim - 1)), self.axis)
        core = self._real_pre_bwd_core if backward else self._real_post_fwd_core
        return shard_map(
            core,
            mesh=self.mesh,
            in_specs=(data_spec, P(self.axis)),
            out_specs=data_spec,
            check_vma=False,
        )

    def _real_fwd(self, x, tw, real_tw):
        lead = x.shape[:-1]
        xz = x.reshape(*lead, self.engine_n, 2)
        z = (xz[..., 0] + 1j * xz[..., 1]).astype(self.cdtype)
        zf = self._c_map(False, True, z.ndim)(self._sconstrain(z), tw)
        s = self._real_post_map(False, zf.ndim)(self._sconstrain(zf), real_tw)
        return self._sconstrain(s)

    def _real_bwd(self, s, tw, real_tw):
        z2 = self._real_post_map(True, s.ndim)(self._sconstrain(s), real_tw)
        w = self._c_map(True, True, z2.ndim)(self._sconstrain(z2), tw)
        lead = w.shape[:-1]
        out = jnp.stack([jnp.real(w), jnp.imag(w)], axis=-1).reshape(*lead, self.n)
        return self._sconstrain(out.astype(self.dtype.type))

    # --- shard_map wrappers ----------------------------------------------
    def _c_map(self, backward: bool, ordered: bool, ndim: int):
        ax = self.axis
        data_spec = P(*([None] * (ndim - 1)), ax)
        tw_spec = P(None, ax)
        core = self._bwd_core if backward else self._fwd_core
        fn = shard_map(
            functools.partial(core, ordered=ordered),
            mesh=self.mesh,
            in_specs=(data_spec, tw_spec),
            out_specs=data_spec,
            check_vma=False,
        )
        return fn

    def _jitted(self, backward: bool, ordered: bool, ndim: int):
        # per-instance executable cache (an lru_cache on the bound method
        # would pin self process-wide), keyed on dispatch.state_key():
        # the split engine traced inside bakes cmul/engine/spec2 globals
        # in at trace time (trace-time-globals rule, CLAUDE.md)
        from ..ops import dispatch as _dispatch

        key = (backward, ordered, ndim, _dispatch.state_key())
        cached = self._jit_cache.get(key)
        if cached is not None:
            return cached
        if self.kind == _plan.REAL:
            fn = self._real_bwd if backward else self._real_fwd
            jfn = jax.jit(fn)
            out = lambda x: jfn(x, self._tw_dev, self._real_tw_dev)
        else:
            jfn = jax.jit(self._c_map(backward, ordered, ndim))
            out = lambda x: jfn(x, self._tw_dev)
        self._jit_cache[key] = out
        return out

    # --- public ----------------------------------------------------------
    def forward(self, x: jax.Array, ordered: bool = True) -> jax.Array:
        """Forward transform of [..., N] (last axis sharded over the mesh).

        REAL kind: [..., N] real -> [..., N/2] complex, pffft bin0 packing.
        """

        if self.kind == _plan.REAL:
            return self._jitted(False, True, x.ndim)(x.astype(self.dtype.type))
        return self._jitted(False, ordered, x.ndim)(x.astype(self.cdtype.type))

    def backward(self, s: jax.Array, ordered: bool = True) -> jax.Array:
        """Unscaled inverse: backward(forward(x)) == N * x (pffft.h:134)."""

        if self.kind == _plan.REAL:
            return self._jitted(True, True, s.ndim)(s.astype(self.cdtype.type))
        return self._jitted(True, ordered, s.ndim)(s.astype(self.cdtype.type))

    def reorder(self, z: jax.Array, to_canonical: bool = True) -> jax.Array:
        """zreorder analog between the internal (k1-major) and canonical
        orders; costs one all-to-all transpose."""

        lead = z.shape[:-1]
        if to_canonical:
            y = z.reshape(*lead, self.n1, self.n2)
            y = jnp.swapaxes(y, -1, -2)
        else:
            y = z.reshape(*lead, self.n2, self.n1)
            y = jnp.swapaxes(y, -1, -2)
        return y.reshape(*lead, self.engine_n)

    def input_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P(*([None] * (ndim - 1)), self.axis))

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"FourStepPlan(N={self.n}={self.n1}x{self.n2}, {self.kind.value}, "
            f"{self.n_shards} shards over '{self.axis}')"
        )


# Functional conveniences -----------------------------------------------------


def fourstep_cfft(plan: FourStepPlan, x: jax.Array, ordered: bool = True) -> jax.Array:
    return plan.forward(x, ordered=ordered)


def fourstep_icfft(plan: FourStepPlan, s: jax.Array, ordered: bool = True) -> jax.Array:
    return plan.backward(s, ordered=ordered)


def fourstep_rfft(plan: FourStepPlan, x: jax.Array) -> jax.Array:
    return plan.forward(x)


def fourstep_irfft(plan: FourStepPlan, s: jax.Array) -> jax.Array:
    return plan.backward(s)
