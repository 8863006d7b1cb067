"""Utility layer: constants, ranges, hashing, metrics, parallel helpers.

Covers the capabilities of the reference's utils.{h,cpp} (L1 in SURVEY.md §1),
re-expressed for a numpy/JAX host program.
"""

from .ranges import Range, get_bounds
from .hashing import FNV_OFFSET_BASIS, FNV_PRIME, fnv1a_bytes, fnv1a_runs
from .metrics import PhaseTimer, read_timer, memory_usage, in_megabytes, in_gigabytes

__all__ = [
    "Range",
    "get_bounds",
    "FNV_OFFSET_BASIS",
    "FNV_PRIME",
    "fnv1a_bytes",
    "fnv1a_runs",
    "PhaseTimer",
    "read_timer",
    "memory_usage",
    "in_megabytes",
    "in_gigabytes",
]
