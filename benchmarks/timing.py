"""Trustworthy TPU timing: device-side loops + forced fetch + slope method.

The axon TPU runtime defers execution: dispatches return immediately and
``block_until_ready()`` does NOT guarantee the computation ran — only a
host fetch of result data forces it.  Naive dispatch-loop timing therefore
measures dispatch latency (~16 us), not compute.  This harness:

  1. chains K iterations of the op *on device* with ``lax.fori_loop``
     (one dispatch, data dependence between iterations prevents skipping);
  2. forces completion by fetching a scalar derived from the final carry;
  3. times two iteration counts K1 < K2 and reports the slope
     (t2 - t1) / (K2 - K1), cancelling dispatch + fetch + loop-setup
     constants.

This is the calibration-discipline analog of the reference's bench protocol
(process-time + calibrated windows, bench_pffft.c:495-530) adapted to an
asynchronous accelerator runtime.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["bench_op", "measure_peak_bw"]


def _fetch(out) -> float:
    """Force execution: fully reduce EVERY leaf and fetch the scalar.

    The axon runtime is lazy at the graph level: fetching a slice can
    evaluate only that slice's dependency cone, silently skipping the rest
    of an elementwise pipeline.  A full-array reduction over all outputs
    leaves nothing dead.
    """

    total = None
    for leaf in jax.tree_util.tree_leaves(out):
        s = jnp.sum(leaf)
        total = s if total is None else total + s
    return float(total)


def _looped(step: Callable, iters: int):
    """One jitted dispatch running ``step`` iters times with a carried tuple."""

    @jax.jit
    def run(args):
        def body(_, c):
            out = step(*c)
            return out if isinstance(out, tuple) else (out,)

        return jax.lax.fori_loop(0, iters, body, args)

    return run


def bench_op(
    step: Callable,
    args: Tuple,
    *,
    k1: int = 4,
    k2: int = 20,
    repeats: int = 3,
) -> float:
    """Seconds per invocation of ``step`` (shape-preserving tuple->tuple)."""

    args = tuple(args)
    run1 = _looped(step, k1)
    run2 = _looped(step, k2)
    # compile + first-execution warm-up (first fetch can be pathologically slow)
    _fetch(run1(args))
    _fetch(run2(args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fetch(run1(args))
        t1 = time.perf_counter()
        _fetch(run2(args))
        t2 = time.perf_counter()
        slope = ((t2 - t1) - (t1 - t0)) / (k2 - k1)
        if slope > 0:
            best = min(best, slope)
    if not (best < float("inf")):
        # constants dominated the window; rerun with a longer loop
        if k2 < 4096:
            return bench_op(step, args, k1=k2, k2=k2 * 5, repeats=repeats)
        return 1e-9
    return best


def measure_peak_bw(nbytes: int = 512 << 20) -> float:
    """Peak sustainable HBM bandwidth (bytes/s) via a saturating
    elementwise kernel: 2 plane reads + 2 plane writes per iteration."""

    n = nbytes // 16
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 0.5, jnp.float32)

    def probe(x, y):
        return x * 1.0000001 + y * 0.999999, y * 1.0000002 - x * 0.000001

    t = bench_op(probe, (a, b))
    return 16 * n / t
