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
import numpy as np

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
        if jnp.iscomplexobj(leaf):
            # sum both planes so neither dependency cone is skipped
            s = jnp.sum(jnp.real(leaf)) + jnp.sum(jnp.imag(leaf))
        else:
            s = jnp.sum(leaf)
        total = s if total is None else total + s
    return float(total)


_LOOP_CACHE: dict = {}


def _looped(step: Callable, iters: int):
    """One jitted dispatch running ``step`` iters times with a carried tuple.

    An ``optimization_barrier`` separates iterations: without it XLA can
    unroll the loop and fuse a chain of elementwise iterations into ONE
    pass over memory (measured: a 40-iteration elementwise 'benchmark'
    costing one iteration's HBM traffic, apparent bandwidth 15x the
    physical peak).

    Cached per (step, iters): a fresh closure per call would miss the jit
    cache and recompile on EVERY trial — on this backend's 20-60 s remote
    compiles that silently turned best-of-N sweeps into hour-long runs.
    """

    key = (step, iters)
    hit = _LOOP_CACHE.get(key)
    if hit is not None:
        return hit

    @jax.jit
    def run(args):
        def body(_, c):
            out = step(*c)
            out = out if isinstance(out, tuple) else (out,)
            return jax.lax.optimization_barrier(out)

        return jax.lax.fori_loop(0, iters, body, args)

    if len(_LOOP_CACHE) > 512:  # unbounded growth guard
        _LOOP_CACHE.clear()
    _LOOP_CACHE[key] = run
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
    """Effective peak memory bandwidth (bytes/s) of the current backend.

    Probe: ``v -> v*c + mean(v)`` chained with barriers — every element of
    iteration k+1 depends on ALL of iteration k, so iterations cannot be
    fused or row-pipelined.  Counted as ONE read + ONE write per iteration
    (the minimum truthful traffic), which makes this the most generous
    baseline and the derived speed-of-light fractions conservative.

    Note (measured, see CLAUDE.md): this backend reports memory speeds
    well above the physical HBM spec of the advertised chip; treat the
    returned value as the backend's effective optimum for *relative*
    comparisons, not as hardware ground truth.
    """

    n = max(1024, nbytes // 4)
    y = jnp.ones((n,), jnp.float32)

    def probe(v):
        return (v * 0.999 + jnp.mean(v),)

    t = bench_op(probe, (y,))
    return 2 * n * 4 / t
