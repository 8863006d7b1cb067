"""Shared CLI helpers: pattern files, format listing, reporting.

Parity with the reference CLI plumbing (bwt_merge.cpp:205-299,
formats.cpp:449-479, utils.cpp:38-96).
"""

from __future__ import annotations

import sys
from typing import List

import numpy as np

from ..formats import FORMATS
from ..models.fmi import FMI
from ..utils.metrics import in_gigabytes, in_megabytes, memory_usage


def read_rows(path: str, skip_empty: bool = True) -> List[str]:
    """Read pattern lines (reference readRows; bwt_merge.cpp:156)."""
    rows: List[str] = []
    with open(path, "r") as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            if line or not skip_empty:
                rows.append(line)
    return rows


def print_formats(out=sys.stderr) -> None:
    """List registered formats (reference printFormats, formats.cpp:455-479)."""
    print("Supported formats:", file=out)
    for tag, fmt in FORMATS.items():
        print(f"  {tag:<14} {fmt.name}", file=out)
    print("", file=out)


def check_format(tag: str, tool: str, kind: str) -> None:
    if tag not in FORMATS:
        print(f"{tool}: Invalid {kind} format: {tag}", file=sys.stderr)
        sys.exit(1)


def verify_fmi(fmi: FMI, role: str, patterns: List[str],
               results: np.ndarray, verbose: bool = True,
               use_device: bool = False) -> None:
    """Query every pattern and ACCUMULATE counts into `results`
    (reference verifyFMI, bwt_merge.cpp:263-285).  With use_device, the
    queries run as one batched device backward search (the device analog of
    the reference's ParallelLoop over patterns, bwt_merge.cpp:276-279)."""
    if not patterns:
        return
    import time

    start = time.monotonic()
    if use_device:
        from ..ops.rank_jax import batch_count

        counts = batch_count(fmi.device_index, patterns, fmi.alpha.char2comp)
    else:
        counts = fmi.verify(patterns)
    results += counts
    seconds = time.monotonic() - start
    if verbose:
        total = sum(len(p) for p in patterns)
        rate = len(patterns) / seconds if seconds > 0 else float("inf")
        print(f"{role}: {len(patterns)} patterns, {int(counts.sum())} occurrences "
              f"({seconds:.2f} s, {rate:.0f} patterns/s, "
              f"{in_megabytes(total) / max(seconds, 1e-9):.2f} MB/s)")


def report_totals(seconds: float, bytes_processed: int) -> None:
    print(f"Total time:       {seconds:.2f} seconds "
          f"({in_megabytes(bytes_processed) / max(seconds, 1e-9):.2f} MB/s)")
    print(f"Peak memory:      {in_gigabytes(memory_usage()):.3f} GB")
    print("")
