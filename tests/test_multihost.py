"""True multi-process test of the cross-host rank-range exchange + merge.

Spawns TWO jax processes (CPU backend, gloo collectives, localhost
coordinator, 2 virtual devices each -> 4 global devices); each searches its
own block of B's sequences on its local mesh, then the rank array is
EXCHANGED BY A-POSITION RANGE (one all_to_all; each process k-way merges
only its own range — O(|RA|/P) per-process peak, asserted in the worker),
each process interleaves its range into an output shard, and the shards
concatenate in rank order into the merged file.  Both the combined rank
array and the merged SGA file must be bit-equal to the single-process
result — the evidence path for the >= 80% multi-host scaling target
(BASELINE.md) and VERDICT r2 item #3.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.ops import search_np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_rank_array(tmp_path):
    out = str(tmp_path / "combined.npz")
    port = _free_port()
    env = {
        **{k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")},
        # clean interpreter: no preloaded platform plugin, CPU backend,
        # 2 virtual devices per process
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outputs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=600)
            outputs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    got = np.load(out)

    # single-process ground truth for the same deterministic workload
    rng = np.random.default_rng(55)
    a_seqs = oracle.random_collection(rng, 24, 20, 60)
    b_seqs = oracle.random_collection(rng, 22, 20, 60)
    fa = FMI.from_runs(oracle.build_bwt(a_seqs))
    fb = FMI.from_runs(oracle.build_bwt(b_seqs))
    want_v, want_c = search_np.build_rank_array(
        fa.rank_index, fa.alpha.C.astype(np.int64),
        fb.rank_index, fb.alpha.C.astype(np.int64),
        fa.sequences(), fb.sequences())

    assert np.array_equal(got["values"], want_v)
    assert np.array_equal(got["counts"], want_c)
    # the exchange stayed range-bounded: process 0 held a strict subset
    assert int(got["range_runs"]) < want_v.size

    # the sharded merged output is byte-identical to the single-process
    # streaming merge of the same inputs
    from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi_to_file

    merged = str(tmp_path / "merged_multihost.sga")
    want_file = str(tmp_path / "merged_single.sga")
    merge_fmi_to_file(fa, fb, want_file, "sga",
                      MergeConfig(backend="numpy"))
    with open(merged, "rb") as f1, open(want_file, "rb") as f2:
        assert f1.read() == f2.read()

    # native output: per-process fragment encode + sample-table stitch must
    # also be byte-identical to the single-process streaming writer
    merged_nat = str(tmp_path / "merged_multihost.native")
    want_nat = str(tmp_path / "merged_single.native")
    merge_fmi_to_file(fa, fb, want_nat, "native",
                      MergeConfig(backend="numpy"))
    with open(merged_nat, "rb") as f1, open(want_nat, "rb") as f2:
        assert f1.read() == f2.read()


def test_word_split_roundtrip():
    """Cross-process RA payloads travel as int32 word pairs (jax x64 is
    off); values beyond 2^31 — terabase-scale a-positions — must survive."""
    import numpy as np

    from bwtmerge_tpu.parallel.distributed import _join_words, _split_words

    x = np.array([0, 1, 2**31 - 1, 2**31, 2**40 + 123, 2**62 - 1], np.int64)
    lo, hi = _split_words(x)
    assert lo.dtype == np.int32 and hi.dtype == np.int32
    assert np.array_equal(_join_words(lo, hi), x)
