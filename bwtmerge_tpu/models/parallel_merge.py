"""Range-parallel host interleave: the merge phase's interleave walk split
by ascending A-position ranges across a thread pool.

The reference's interleave is one consumer thread walking both RLE inputs
(bwt.cpp:215-282) — inherently serial.  Here every incoming rank-array
chunk already owns a disjoint ascending A-position range, so each chunk's
interleave runs independently: the native `interleave_chunk` kernel is
initialized at the range cursors (A at position lo, B at rank b_offset —
the per-process trick of the multihost fragment writer,
parallel/distributed.py interleave_range_chunks, applied to THREADS) and
releases the GIL, so fragments overlap on the host cores while results
are yielded strictly in order.  Fragment seams may split maximal runs;
wrap the stream in `coalesce_run_chunks` before a writer.

Measured on the 4-core target VM at the bench shape (102+51 Mbp, 36M RA
runs, 116M output runs): bare interleave 1.1-1.3 s serial vs 0.8-1.0 s
at 3-4 workers (~1.4x) — but with the format writer in the chain the
PARALLEL path is SLOWER (2.0-2.3 s vs 1.1-1.8 s serial): the serial
chain already overlaps interleave/writer/decode across the 4 cores via
prefetch threads and reuses a persistent buffer ring, while fragments
allocate fresh output arrays (first-touch page faults, ~50 us each on
this VM class) and add coalesce work.  So the serial native chain stays
the default merge backend HERE; this module is the measured, tested
alternative for hosts with more cores than the pipeline's thread count
(byte-identity pinned by tests/test_merge.py TestParallelInterleave).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def interleave_stream_chunks_parallel(a_runs, b_runs, ra_chunks,
                                      workers: int = 3,
                                      max_inflight: int | None = None):
    """Generator of merged (syms, lens) run chunks — same contract as
    native.interleave_stream_chunks followed by coalesce_run_chunks at the
    consumer, but with per-chunk ranges interleaved concurrently.

    ra_chunks must be ascending sorted-unique (values strictly increase
    across chunk boundaries — what every RA stream in this codebase
    yields).  `max_inflight` bounds memory at O(inflight * fragment).
    """
    from ..parallel.distributed import interleave_range_chunks

    a_cum = np.cumsum(np.asarray(a_runs.lens), dtype=np.int64)
    b_cum = np.cumsum(np.asarray(b_runs.lens), dtype=np.int64)
    if max_inflight is None:
        max_inflight = workers + 2

    def fragment(rv, rc, lo, hi, b_off, last):
        return list(interleave_range_chunks(
            a_runs, b_runs, iter([(rv, rc)]), lo, hi, b_off, last,
            a_cum=a_cum, b_cum=b_cum))

    ex = ThreadPoolExecutor(workers)
    try:
        pending: deque = deque()
        lo = 0
        b_off = 0
        for rv, rc in ra_chunks:
            rv = np.ascontiguousarray(rv, dtype=np.int64)
            rc = np.ascontiguousarray(rc, dtype=np.int64)
            if rv.size == 0:
                continue
            hi = int(rv[-1]) + 1
            pending.append(ex.submit(fragment, rv, rc, lo, hi, b_off, False))
            lo = hi
            b_off += int(np.sum(rc, dtype=np.int64))
            while len(pending) >= max_inflight:
                yield from pending.popleft().result()
        # drain fragment: advance A from lo through its tail
        pending.append(ex.submit(fragment, np.zeros(0, np.int64),
                                 np.zeros(0, np.int64), lo, 2**62, b_off,
                                 True))
        while pending:
            yield from pending.popleft().result()
    finally:
        # cancel queued fragments too: without it an early generator close
        # (or a raising fragment) leaves in-flight tasks burning cores and
        # pinning the large run arrays until they finish
        ex.shutdown(wait=False, cancel_futures=True)
