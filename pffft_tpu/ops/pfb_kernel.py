"""Pallas sliding-window polyphase-FIR kernel (the PFB hot loop).

The channelizer's polyphase stage computes, per plane,

    out[k, phi] = sum_{s=0}^{P-1} w[s, phi] * rows[k + s, phi]

(`Channelizer._polyphase`: a P-term multiply-accumulate of shifted row
slices).  Through XLA that fuses into one kernel but with NO
sliding-window reuse: each of the P shifted views is a separate HBM
read, so the stage costs ~P reads + 1 write.  This kernel holds a
[K + P - 1, TB_M] strip of `rows` in VMEM and produces all K outputs of
the strip with P in-register FMAs — 1.0x read + 1x write, the
sliding-window reuse XLA cannot express.

This is the VPU analog of the reference's hand-fused convolution passes
(/root/reference/src/pffastconv.c:163-198 dotprod loops): pure
elementwise FMAs, no matmuls — deliberately outside the axon Mosaic
3-dot crash territory (see ops/fused_stage.py docstring).

Layout: rows [..., Q, M] with Q >= K + P - 1, weights [P, M], out
[..., K, M].  M (lanes) is blocked by TB_M (multiple of 128); the k
strip stays whole per block, so (K + P - 1) * TB_M * 4 B must fit VMEM
— `supported()` enforces the budget and callers fall back to the XLA
chain otherwise.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supported", "pfb_fir", "DEFAULT_TB_M"]

DEFAULT_TB_M = 256  # lane block: VMEM strip ~(K+P)*TB_M*4B*3 live values

# strip + acc + one product term live at once; keep well under the 16 MB
# scoped VMEM limit (Mosaic counts live stage values, CLAUDE.md)
_VMEM_BUDGET = 10 << 20


def _lane_block(m: int, tb_m: int) -> int:
    """Largest multiple of 128 that divides m, capped at tb_m (0 if none)."""

    best = 0
    d = 128
    while d <= min(m, tb_m):
        if m % d == 0:
            best = d
        d += 128
    return best


def supported(k: int, p: int, m: int, dtype, tb_m: int = DEFAULT_TB_M) -> bool:
    if np.dtype(dtype) != np.float32:
        return False
    if p < 1:
        return False
    tb = _lane_block(m, tb_m)
    if not tb:
        return False
    live = (k + p - 1) + k + k  # strip + acc + product, in rows of tb lanes
    return live * tb * 4 <= _VMEM_BUDGET


def _make_kernel(p: int, k: int):
    def kernel(w_ref, x_ref, o_ref):
        x = x_ref[0]  # (Q, tb_m)
        w = w_ref[:]  # (P, tb_m); keep operands 2-D for Mosaic
        acc = x[0:k] * w[0:1]
        for s in range(1, p):
            acc = acc + x[s : s + k] * w[s : s + 1]
        o_ref[0] = acc

    return kernel


@functools.lru_cache(maxsize=64)
def _build(k: int, p: int, m: int, q: int, tb_m: int, interpret: bool):
    tb = _lane_block(m, tb_m)
    kernel = _make_kernel(p, k)

    def call(rows, weights):
        b = rows.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(b, m // tb),
            in_specs=[
                pl.BlockSpec((p, tb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, q, tb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, k, tb), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((b, k, m), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * b * p * k * m,
                bytes_accessed=4 * b * m * (q + k),
                transcendentals=0,
            ),
        )(weights, rows)

    return call


def pfb_fir(
    rows: jax.Array,
    weights: jax.Array,
    k: int,
    *,
    tb_m: int = DEFAULT_TB_M,
    interpret: bool = False,
) -> jax.Array:
    """out[..., k_, phi] = sum_s weights[s, phi] * rows[..., k_ + s, phi].

    rows [..., Q, M] (Q >= K + P - 1), weights [P, M] -> [..., K, M].
    """

    p, m = weights.shape
    lead = rows.shape[:-2]
    q = rows.shape[-2]
    if q < k + p - 1:
        raise ValueError(f"rows axis {q} < K + P - 1 = {k + p - 1}")
    if not supported(k, p, m, rows.dtype, tb_m):
        raise ValueError(f"pfb_fir unsupported for K={k} P={p} M={m} {rows.dtype}")
    q_used = k + p - 1
    flat = rows[..., :q_used, :].reshape(-1, q_used, m)
    out = _build(k, p, m, q_used, tb_m, interpret)(flat, weights.astype(jnp.float32))
    return out.reshape(*lead, k, m)
