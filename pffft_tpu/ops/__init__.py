"""Core compute ops: staged FFT engine, real split steps, Pallas kernels."""
