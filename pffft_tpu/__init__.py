"""pffft_tpu: a TPU-native FFT / fast-convolution / DSP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
marton78/pffft (PFFFT + PFFASTCONV + PFDSP + validation/bench harness):
batched mixed-radix real & complex FFTs on the MXU, overlap-save FFT
convolution, NCO mixers / carrier generators / CIC decimation, and
mesh-sharded large-N / streaming execution over ICI.

Quick start::

    import jax.numpy as jnp
    import pffft_tpu as pf

    plan = pf.new_setup(1024, pf.REAL)
    x = jnp.ones((8, 1024))            # batch of 8 signals
    spec = pf.transform_ordered(plan, x, pf.FORWARD)   # [8, 512] complex
    back = pf.transform_ordered(plan, spec, pf.BACKWARD) / plan.n
"""

from .plan import (
    Plan,
    Direction,
    TransformKind,
    FORWARD,
    BACKWARD,
    REAL,
    COMPLEX,
    new_setup,
    min_fft_size,
    is_valid_size,
    nearest_transform_size,
    next_power_of_two,
    is_power_of_two,
    simd_size,
    simd_arch,
)
from .fft import (
    transform,
    transform_ordered,
    zreorder,
    zconvolve_accumulate,
    zconvolve_no_accu,
    transform_split,
    transform_ordered_split,
    transform_ordered_split_tmajor,
    transform_split_inplace,
    transform_ordered_split_inplace,
    zconvolve_split,
    cfft,
    icfft,
    rfft_packed,
    irfft_packed,
    spectrum_unpack,
    spectrum_pack,
    fftfreq,
    rfftfreq,
    fftshift,
    ifftshift,
)

# Submodules as attributes (pffft_tpu.conv / .dsp / .channelizer / .parallel)
from . import conv
from . import dct
from . import dsp
from . import spectral
from . import resample
from . import channelizer
from . import fft
from . import parallel
from . import tune
from .tune import tuned_setup
from . import bluestein
from . import pconv
from .pconv import PartitionedConv
from . import nd
from .nd import fftn_setup, fftn_split, fftn, ifftn, fft2, ifft2, rfftn, irfftn
from .bluestein import (
    BluesteinPlan,
    new_setup_any,
    next_smooth_size,
    rfft_any,
    irfft_any,
    CztPlan,
    czt,
    czt_split,
    zoom_fft,
    zoom_fft_setup,
)

__version__ = "0.3.0"

__all__ = [
    "Plan",
    "Direction",
    "TransformKind",
    "FORWARD",
    "BACKWARD",
    "REAL",
    "COMPLEX",
    "new_setup",
    "min_fft_size",
    "is_valid_size",
    "nearest_transform_size",
    "next_power_of_two",
    "is_power_of_two",
    "simd_size",
    "simd_arch",
    "transform",
    "transform_ordered",
    "zreorder",
    "zconvolve_accumulate",
    "zconvolve_no_accu",
    "transform_split",
    "transform_ordered_split",
    "transform_ordered_split_tmajor",
    "transform_split_inplace",
    "transform_ordered_split_inplace",
    "zconvolve_split",
    "conv",
    "dct",
    "dsp",
    "spectral",
    "resample",
    "channelizer",
    "fft",
    "parallel",
    "tune",
    "tuned_setup",
    "bluestein",
    "pconv",
    "PartitionedConv",
    "nd",
    "fftn_setup",
    "fftn_split",
    "fftn",
    "ifftn",
    "fft2",
    "ifft2",
    "rfftn",
    "irfftn",
    "BluesteinPlan",
    "new_setup_any",
    "next_smooth_size",
    "rfft_any",
    "irfft_any",
    "CztPlan",
    "czt",
    "czt_split",
    "zoom_fft",
    "zoom_fft_setup",
    "cfft",
    "icfft",
    "rfft_packed",
    "irfft_packed",
    "spectrum_unpack",
    "fftfreq",
    "rfftfreq",
    "fftshift",
    "ifftshift",
    "spectrum_pack",
    "__version__",
]
