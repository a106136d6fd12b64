"""Object API: the pffft.hpp ``Fft<T>`` analog.

Mirrors the C++ header-only wrapper surface
(/root/reference/include/pffft/pffft.hpp:125-394): a type-parameterized
transform object with ``prepareLength``-style replanning, ordered
forward/inverse, internal-layout transforms, spectrum reorder, and
frequency-domain convolution — re-expressed over jnp arrays.

Differences (JAX-native, deliberate):
  * no work buffers / AlignedVector: XLA owns memory.  The vector factory
    methods return zeroed jnp arrays of the right shape/dtype instead of
    aligned allocations (PFAlloc's role, pffft.hpp:977-1056).
  * all methods accept leading batch axes.
  * ``scale_with`` replaces the C++ user's manual 1/N multiply.

Type mapping (pffft.hpp Types<T>, :52-95):
  float32    -> REAL transform, fp32 engine
  float64    -> REAL transform, fp64 engine (pffftd_ parity)
  complex64  -> COMPLEX transform, fp32
  complex128 -> COMPLEX transform, fp64
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import plan as _plan

__all__ = ["Fft"]

_KIND_BY_DTYPE = {
    np.dtype(np.float32): (_plan.REAL, "float32"),
    np.dtype(np.float64): (_plan.REAL, "float64"),
    np.dtype(np.complex64): (_plan.COMPLEX, "float32"),
    np.dtype(np.complex128): (_plan.COMPLEX, "float64"),
}


class Fft:
    """pffft::Fft<T> analog.

    >>> f = Fft(np.float32, 1024)
    >>> spec = f.forward(x)                      # [..., 512] complex packed
    >>> y = f.inverse(spec) / f.length           # == x
    """

    def __init__(self, dtype=np.float32, length: Optional[int] = None):
        dt = np.dtype(dtype)
        if dt not in _KIND_BY_DTYPE:
            raise TypeError(
                f"unsupported Fft dtype {dt}; use float32/float64/complex64/complex128"
            )
        self._kind, self._scalar = _KIND_BY_DTYPE[dt]
        self._dtype = dt
        self._plan: Optional[_plan.Plan] = None
        if length is not None:
            self.prepare_length(length)

    # --- plan management (pffft.hpp:158-209) ---------------------------
    def prepare_length(self, n: int) -> "Fft":
        """prepareLength parity: (re)plan for transform size n."""

        self._plan = _plan.Plan.create(n, self._kind, self._scalar)
        return self

    prepareLength = prepare_length  # C++ spelling

    @property
    def plan(self) -> _plan.Plan:
        if self._plan is None:
            raise RuntimeError("call prepare_length(n) first")
        return self._plan

    @property
    def length(self) -> int:
        """getLength parity."""

        return self.plan.n

    @property
    def spectrum_size(self) -> int:
        """getSpectrumSize parity: complex bins in the (packed) spectrum."""

        return self.plan.spectrum_size

    @property
    def internal_layout_size(self) -> int:
        """getInternalLayoutSize parity: scalar floats in the internal
        z-domain representation (2 per complex bin)."""

        return 2 * self.plan.spectrum_size

    @property
    def is_complex_transform(self) -> bool:
        return self.plan.kind == _plan.COMPLEX

    # --- static helpers (pffft.hpp Types/statics) ----------------------
    @staticmethod
    def is_valid_size(n: int, dtype=np.float32) -> bool:
        kind, _ = _KIND_BY_DTYPE[np.dtype(dtype)]
        return _plan.is_valid_size(n, kind)

    @staticmethod
    def nearest_transform_size(n: int, dtype=np.float32, higher: bool = True) -> int:
        kind, _ = _KIND_BY_DTYPE[np.dtype(dtype)]
        return _plan.nearest_transform_size(n, kind, higher)

    @staticmethod
    def simd_size() -> int:
        return _plan.simd_size()

    # --- ordered transforms (pffft.hpp:232-266) ------------------------
    def forward(self, x: jax.Array) -> jax.Array:
        """Ordered forward transform (canonical spectrum)."""

        return _fft.transform_ordered(self.plan, jnp.asarray(x), _plan.FORWARD)

    def inverse(self, spectrum: jax.Array) -> jax.Array:
        """Ordered unscaled inverse: inverse(forward(x)) == N * x."""

        return _fft.transform_ordered(self.plan, jnp.asarray(spectrum), _plan.BACKWARD)

    # --- internal-layout transforms (pffft.hpp:268-318) ----------------
    def forward_to_internal_layout(self, x: jax.Array) -> jax.Array:
        return _fft.transform(self.plan, jnp.asarray(x), _plan.FORWARD)

    def inverse_from_internal_layout(self, z: jax.Array) -> jax.Array:
        return _fft.transform(self.plan, jnp.asarray(z), _plan.BACKWARD)

    forwardToInternalLayout = forward_to_internal_layout
    inverseFromInternalLayout = inverse_from_internal_layout

    def reorder_spectrum(self, z: jax.Array, direction=_plan.FORWARD) -> jax.Array:
        """reorderSpectrum parity: internal <-> canonical (pffft.hpp:320-340)."""

        return _fft.zreorder(self.plan, jnp.asarray(z), direction)

    reorderSpectrum = reorder_spectrum

    # --- frequency-domain convolution (pffft.hpp:342-365) --------------
    def convolve(self, a: jax.Array, b: jax.Array, scaling=1.0) -> jax.Array:
        """convolve parity: pointwise multiply of internal-layout spectra."""

        return _fft.zconvolve_no_accu(self.plan, jnp.asarray(a), jnp.asarray(b), scaling)

    def convolve_accumulate(self, a: jax.Array, b: jax.Array, ab: jax.Array, scaling=1.0) -> jax.Array:
        return _fft.zconvolve_accumulate(
            self.plan, jnp.asarray(a), jnp.asarray(b), jnp.asarray(ab), scaling
        )

    convolveAccumulate = convolve_accumulate

    # --- vector factories (pffft.hpp valueVector/spectrumVector,
    #     AlignedVector's role) ----------------------------------------
    def value_vector(self, *batch: int) -> jax.Array:
        """Zeroed time-domain array [*batch, N]."""

        return jnp.zeros((*batch, self.length), dtype=self._dtype)

    def spectrum_vector(self, *batch: int) -> jax.Array:
        """Zeroed canonical-spectrum array [*batch, spectrum_size] complex."""

        return jnp.zeros((*batch, self.spectrum_size), dtype=self.plan.cdtype)

    def internal_layout_vector(self, *batch: int) -> jax.Array:
        """Zeroed internal-layout array (complex bins, z-domain order)."""

        return jnp.zeros((*batch, self.spectrum_size), dtype=self.plan.cdtype)

    valueVector = value_vector
    spectrumVector = spectrum_vector
    internalLayoutVector = internal_layout_vector

    def __repr__(self) -> str:  # pragma: no cover
        n = self._plan.n if self._plan else None
        return f"Fft(dtype={self._dtype.name}, length={n})"
