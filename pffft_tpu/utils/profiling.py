"""Profiling / observability: the PAPI + host-info analog (SURVEY.md §5.1).

The reference wires optional PAPI hardware counters into its benches
(benchmarks/papi_perf_counter.h) and bundles host metadata with results
(bench/unix_info.sh).  The TPU equivalents here:

  * :func:`trace` — context manager around ``jax.profiler`` emitting an
    xplane trace directory for xprof/tensorboard;
  * :func:`device_info` — platform/topology/memory metadata dict (the
    lscpu/cpuinfo analog);
  * :class:`Roofline` — bytes/flops accounting against measured peak
    bandwidth (the instructions/IPC analog for a bandwidth-bound library).
"""

from __future__ import annotations

import contextlib
import dataclasses
import platform
from typing import Optional

__all__ = ["trace", "device_info", "Roofline"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope: ``with trace('/tmp/tb'): run()``."""

    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_info() -> dict:
    """Device + host metadata for benchmark bundles (unix_info analog)."""

    import jax

    devs = jax.devices()
    d0 = devs[0]
    info = {
        "platform": d0.platform,
        "device_kind": getattr(d0, "device_kind", "unknown"),
        "num_devices": len(devs),
        "process_count": jax.process_count(),
        "coords": getattr(d0, "coords", None),
        "jax_version": jax.__version__,
        "python": platform.python_version(),
        "host": platform.platform(),
    }
    try:
        stats = d0.memory_stats()
        if stats:
            info["hbm_bytes_limit"] = stats.get("bytes_limit")
            info["hbm_bytes_in_use"] = stats.get("bytes_in_use")
    except Exception:
        pass
    return info


@dataclasses.dataclass
class Roofline:
    """Speed-of-light accounting for a bandwidth-bound op.

    >>> r = Roofline(bytes_moved=..., flops=..., seconds=..., peak_bw=...)
    >>> r.sol_fraction, r.gflops, r.effective_bw
    """

    bytes_moved: int
    flops: float
    seconds: float
    peak_bw: Optional[float] = None  # bytes/s; None = unknown

    @property
    def effective_bw(self) -> float:
        return self.bytes_moved / self.seconds

    @property
    def gflops(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def sol_seconds(self) -> Optional[float]:
        if self.peak_bw is None:
            return None
        return self.bytes_moved / self.peak_bw

    @property
    def sol_fraction(self) -> Optional[float]:
        s = self.sol_seconds
        return None if s is None else s / self.seconds

    def as_dict(self) -> dict:
        return {
            "seconds": self.seconds,
            "gflops": round(self.gflops, 2),
            "effective_bw_GBps": round(self.effective_bw / 1e9, 2),
            "sol_fraction": None if self.sol_fraction is None else round(self.sol_fraction, 4),
        }
