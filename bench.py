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

A_READS, B_READS, READ_LEN = 131_000, 65_500, 50
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_MBP_S = 9.40  # reference best sweep config (paper.tex:266)


def _fixture(name: str, n_reads: int, seed: int):
    """Read collection BWT, cached as an SGA-format file."""
    from bwtmerge_tpu.formats import read_bwt, write_bwt
    from bwtmerge_tpu.models import oracle
    from bwtmerge_tpu.models.fmi import FMI
    from bwtmerge_tpu.utils.alphabet import Alphabet

    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"{name}_{n_reads}x{READ_LEN}.sga")
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

    # Persistent compile cache: the remote TPU compile path is slow (~30 s per
    # program) and occasionally flaky; warm runs skip it entirely.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bwtmerge_tpu.ops.rank_jax import DeviceFMIndex
    from bwtmerge_tpu.ops.search_jax import wavefront_search_device2

    def lap(msg, t=[t_setup]):
        now = time.monotonic()
        print(f"# setup: {msg} {now - t[0]:.1f}s", file=sys.stderr)
        t[0] = now

    a = _fixture("bench_a", A_READS, 1)
    b = _fixture("bench_b", B_READS, 2)
    lap("fixtures")

    a_idx = DeviceFMIndex.build(a.runs, a.alpha.counts())
    b_idx = DeviceFMIndex.build(b.runs, b.alpha.counts())
    lap("index build+dispatch")
    _ = np.asarray(a_idx.rec[0])  # force upload
    lap("upload")
    setup_s = time.monotonic() - t_setup

    # Whole search phase = ONE compiled program (frontier never exceeds the
    # number of B sequences; emissions never exceed |B| + sequences).
    fcap = 1 << max(10, (b.sequences() - 1).bit_length())
    ecap = b.size() + b.sequences() + fcap + 16

    from bwtmerge_tpu.ops.search_jax import search_and_pack, unpack_search

    def run_search():
        # sort + byte-pack on device (8 B/run -> 2 B/run over the host link);
        # exactly two device reads per search
        dc8, meta_exc = search_and_pack(
            a_idx, b_idx, jnp.int32(0), jnp.int32(b.sequences() - 1),
            a.sequences(), frontier_cap=fcap, emit_cap=ecap)
        v, c, ovf = unpack_search(dc8, meta_exc)
        assert not ovf, "device search overflowed its static buffers"
        return v, c

    t0 = time.monotonic()
    run_search()  # compile + first run
    warmup_s = time.monotonic() - t0

    search_s = float("inf")
    for _ in range(3):  # steady-state: best of 3 (the relay adds jitter)
        t0 = time.monotonic()
        raw_values, raw_counts = run_search()
        search_s = min(search_s, time.monotonic() - t0)

    # device-only time: blocking on the scalar emission count completes the
    # whole compiled program without pulling the big RA buffers over the link
    device_search_s = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        _, _, n_only, _ = wavefront_search_device2(
            a_idx, b_idx, jnp.int32(0), jnp.int32(b.sequences() - 1),
            a.sequences(), frontier_cap=fcap, emit_cap=ecap)
        int(n_only)
        device_search_s = min(device_search_s, time.monotonic() - t0)

    from bwtmerge_tpu.ops.search_np import compact_sorted_rank_array

    t0 = time.monotonic()
    values, counts = compact_sorted_rank_array(raw_values, raw_counts)
    compact_s = time.monotonic() - t0
    assert int(counts.sum()) == b.size(), "rank array does not cover B"

    t0 = time.monotonic()
    from bwtmerge_tpu.models.merge import _interleave, MergeConfig

    merged = _interleave(a.runs, b.runs, values, counts, MergeConfig())
    interleave_s = time.monotonic() - t0
    assert merged.size() == a.size() + b.size()

    inserted_mbases = b.size() / 1e6
    search_rate = inserted_mbases / search_s
    e2e_rate = inserted_mbases / (search_s + compact_s + interleave_s)

    print(json.dumps({
        "metric": "rank-array phase merge throughput",
        "value": round(search_rate, 3),
        "unit": "Mbases/s/chip",
        "vs_baseline": round(search_rate / BASELINE_MBP_S, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "a_bases": a.size(), "b_bases": b.size(),
            "search_s": round(search_s, 3),
            "device_search_s": round(device_search_s, 3),
            "device_Mbases_s": round(b.size() / 1e6 / device_search_s, 3),
            "compact_s": round(compact_s, 3),
            "interleave_s": round(interleave_s, 3),
            "end_to_end_Mbases_s": round(e2e_rate, 3),
            "warmup_compile_s": round(warmup_s, 1),
            "setup_s": round(setup_s, 1),
        },
    }))


def _supervise() -> int:
    """Run main() in a worker subprocess with timeout + retries.

    The remote TPU attachment occasionally wedges mid-upload or mid-compile
    (observed ~1-in-3 runs); a wedged PJRT client never recovers within the
    process, so the retry unit must be a fresh process.  The parent never
    imports jax.  Fixture construction and the persistent XLA compile cache
    live on disk, so retries are cheap.
    """
    import subprocess

    deadline_per_try = int(os.environ.get("BENCH_TRY_TIMEOUT_S", "420"))
    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                timeout=deadline_per_try, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} timed out after "
                  f"{deadline_per_try}s; retrying", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(f"# bench attempt {attempt + 1} failed (rc={proc.returncode})",
              file=sys.stderr)
    print(json.dumps({"metric": "rank-array phase merge throughput",
                      "value": 0.0, "unit": "Mbases/s/chip",
                      "vs_baseline": 0.0,
                      "extra": {"error": "all bench attempts failed"}}))
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        sys.exit(_supervise())
