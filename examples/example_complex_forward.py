"""Forward complex FFT via the Fft object API — the TPU rendition of
examples/example_cpp11_cplx_dbl_fwd.cpp (double precision, object wrapper).

Run: python examples/example_complex_forward.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # the pffftd_ (double) surface

import jax.numpy as jnp  # noqa: E402

from pffft_tpu.wrapper import Fft  # noqa: E402


def forward_complex(n: int) -> None:
    if not Fft.is_valid_size(n, np.complex128):
        print(
            f"Error: invalid N={n}; nearest valid: "
            f"{Fft.nearest_transform_size(n, np.complex128, True)}",
            file=sys.stderr,
        )
        return

    f = Fft(np.complex128, n)
    x = np.empty(n, dtype=np.complex128)
    x.real = np.arange(n)
    x.imag = -1.0 - np.arange(n)

    spec = np.asarray(f.forward(jnp.asarray(x)))
    print(f"output is a complex spectrum with {f.spectrum_size} bins")
    for k in range(f.spectrum_size):
        print(f"Y[{k}] = {spec[k].real:.6f} + i * {spec[k].imag:.6f}")


if __name__ == "__main__":
    forward_complex(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
