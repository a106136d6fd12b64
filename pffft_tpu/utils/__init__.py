"""Utilities: profiling, device/topology info, roofline accounting."""

from .profiling import trace, device_info, Roofline

__all__ = ["trace", "device_info", "Roofline"]
