"""Shared utilities (jit caching with hoisted constants)."""
from .jitcache import HoistedJit

__all__ = ["HoistedJit"]
