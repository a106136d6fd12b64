"""Forward real FFT — the TPU rendition of examples/example_c_real_flt_fwd.c.

Run: python examples/example_real_forward.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# demo runs anywhere: force CPU (the axon TPU runtime has no complex
# dtype support for host fetches; the TPU path uses the split-format API)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pffft_tpu as pf


def forward_real(n: int) -> None:
    # validity checks mirroring the C example
    if n < pf.min_fft_size(pf.REAL):
        print(f"Error: minimum FFT length is {pf.min_fft_size(pf.REAL)}", file=sys.stderr)
        return
    if not pf.is_valid_size(n, pf.REAL):
        print(
            f"Error: N={n} is not decomposable into small prime factors. "
            f"Next valid size: {pf.nearest_transform_size(n, pf.REAL, True)}; "
            f"next power of 2: {pf.next_power_of_two(n)}",
            file=sys.stderr,
        )
        return

    plan = pf.new_setup(n, pf.REAL)

    # same input as the C example: X[2k] = 2k, X[2k+1] = -1-2k
    x = np.empty(n, dtype=np.float32)
    x[0::2] = np.arange(0, n, 2)
    x[1::2] = -1 - np.arange(0, n, 2)

    # forward ordered transform: [N] real -> [N/2] packed complex spectrum
    spec = pf.transform_ordered(plan, jnp.asarray(x), pf.FORWARD)

    print(f"output is a complex spectrum with {plan.spectrum_size} packed bins")
    s = np.asarray(spec)
    for k in range(plan.spectrum_size):
        print(f"Y[{k}] = {s[k].real:.6f} + i * {s[k].imag:.6f}")


if __name__ == "__main__":
    forward_real(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
