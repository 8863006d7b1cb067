"""Benchmark: rank-array (search) phase throughput of the TPU merge engine.

Measures the BASELINE.json headline metric — merge throughput in Mbases/sec
per chip for the rank-array phase (backward-searching every sequence of B
through the FM-index of A), plus end-to-end merge wall time — on one real
chip, and prints ONE JSON line.

vs_baseline compares against the reference's best published search+merge
insertion rate: 9.40 Mbp/s on a 32-thread 2x Opteron 6378 node
(paper.tex:266; BASELINE.md).

Synthetic workload: random DNA read collections (the paper's workloads are
read collections of ~100 bp reads), cached under .bench_cache/ so repeated
runs skip the host-side suffix-array construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

A_READS, B_READS, READ_LEN = 160_000, 80_000, 50
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_MBP_S = 9.40  # reference best sweep config (paper.tex:266)


def _fixture(name: str, n_reads: int, seed: int):
    """Read collection BWT, cached as an SGA-format file."""
    from bwtmerge_tpu.formats import read_bwt, write_bwt
    from bwtmerge_tpu.models import oracle
    from bwtmerge_tpu.models.fmi import FMI
    from bwtmerge_tpu.utils.alphabet import Alphabet

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"{name}.sga")
    if not os.path.exists(path):
        rng = np.random.default_rng(seed)
        seqs = [rng.integers(1, 5, size=READ_LEN).astype(np.int64)
                for _ in range(n_reads)]
        runs = oracle.build_bwt(seqs)
        write_bwt(path, "sga", runs, Alphabet())
    runs, _, alpha = read_bwt(path, "sga")
    return FMI(runs=runs, alpha=alpha)


def main() -> None:
    t_setup = time.monotonic()
    import jax

    from bwtmerge_tpu.ops.rank_jax import DeviceFMIndex
    from bwtmerge_tpu.ops.search_jax import RankArrayAccumulator, wavefront_search

    a = _fixture("bench_a", A_READS, 1)
    b = _fixture("bench_b", B_READS, 2)

    a_idx = DeviceFMIndex.build(a.runs, a.alpha.counts())
    b_idx = DeviceFMIndex.build(b.runs, b.alpha.counts())
    jax.block_until_ready(a_idx.occ)
    setup_s = time.monotonic() - t_setup

    def run_search():
        acc = RankArrayAccumulator()
        wavefront_search(a_idx, b_idx, (0, b.sequences() - 1), a.sequences(),
                         acc.emit, min_bucket=1 << 15, growth=4)
        return acc.finish()

    # warmup: compiles every bucket size used
    t0 = time.monotonic()
    run_search()
    warmup_s = time.monotonic() - t0

    t0 = time.monotonic()
    values, counts = run_search()
    search_s = time.monotonic() - t0
    assert int(counts.sum()) == b.size(), "rank array does not cover B"

    t0 = time.monotonic()
    from bwtmerge_tpu.models.merge import _interleave, MergeConfig

    merged = _interleave(a.runs, b.runs, values, counts, MergeConfig())
    interleave_s = time.monotonic() - t0
    assert merged.size() == a.size() + b.size()

    inserted_mbases = b.size() / 1e6
    search_rate = inserted_mbases / search_s
    e2e_rate = inserted_mbases / (search_s + interleave_s)

    print(json.dumps({
        "metric": "rank-array phase merge throughput",
        "value": round(search_rate, 3),
        "unit": "Mbases/s/chip",
        "vs_baseline": round(search_rate / BASELINE_MBP_S, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "a_bases": a.size(), "b_bases": b.size(),
            "search_s": round(search_s, 3),
            "interleave_s": round(interleave_s, 3),
            "end_to_end_Mbases_s": round(e2e_rate, 3),
            "warmup_compile_s": round(warmup_s, 1),
            "setup_s": round(setup_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
