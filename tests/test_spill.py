"""Out-of-core rank array: spill codec round-trip, streaming k-way merge vs
the in-memory oracle, and a full merge forced through the spill path."""

import os

import numpy as np
import pytest

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi
from bwtmerge_tpu.models.spill import RankArraySpill
from bwtmerge_tpu.ops.search_np import compact_rank_array


class TestRACodec:
    def test_round_trip(self, rng):
        from bwtmerge_tpu.native import ra_decode_chunk, ra_encode

        values = np.cumsum(rng.integers(1, 1000, size=5000)).astype(np.int64)
        counts = rng.integers(1, 1 << 40, size=5000).astype(np.int64)
        data = np.frombuffer(ra_encode(values, counts), dtype=np.uint8)

        state = np.zeros(2, dtype=np.int64)
        got_v, got_c = [], []
        while True:
            v, c = ra_decode_chunk(data, state, 700)
            if v.size == 0:
                break
            got_v.append(v)
            got_c.append(c)
        assert np.array_equal(np.concatenate(got_v), values)
        assert np.array_equal(np.concatenate(got_c), counts)


class TestSpillStream:
    def test_kway_merge_matches_oracle(self, rng, tmp_path):
        spill = RankArraySpill(temp_dir=str(tmp_path),
                               spill_threshold_runs=5000, compact_every=2000)
        all_v, all_c = [], []
        for _ in range(40):
            v = rng.integers(0, 50000, size=1500).astype(np.int64)
            c = rng.integers(1, 10, size=1500).astype(np.int64)
            spill.emit(v, c)
            all_v.append(v)
            all_c.append(c)
        assert spill.n_spill_files > 1  # the k-way path is actually exercised
        want = compact_rank_array(np.concatenate(all_v), np.concatenate(all_c))

        chunks = list(spill.stream(chunk_runs=3000))
        got_v = np.concatenate([c[0] for c in chunks])
        got_c = np.concatenate([c[1] for c in chunks])
        assert np.all(np.diff(got_v) > 0), "chunks must be globally sorted unique"
        assert np.array_equal(got_v, want[0])
        assert np.array_equal(got_c, want[1])
        # temp files cleaned up (reference RankArray destructor semantics)
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".bwtmerge")]

    def test_finish_without_spill(self, rng, tmp_path):
        spill = RankArraySpill(temp_dir=str(tmp_path))
        v = rng.integers(0, 100, size=50).astype(np.int64)
        c = np.ones(50, dtype=np.int64)
        spill.emit(v, c)
        want = compact_rank_array(v, c)
        got = spill.finish()
        assert np.array_equal(got[0], want[0])
        assert np.array_equal(got[1], want[1])

    def test_empty(self, tmp_path):
        spill = RankArraySpill(temp_dir=str(tmp_path))
        assert spill.finish()[0].size == 0


class TestCrashCleanup:
    def test_atexit_registry_removes_abandoned_spills(self, rng, tmp_path):
        """A spill abandoned mid-merge (crash profile) is removed by the
        atexit hook — unlike the reference, which leaks the temp files when
        the RankArray destructor never runs (support.cpp:532-536)."""
        from bwtmerge_tpu.models import spill as spill_mod

        spill = RankArraySpill(temp_dir=str(tmp_path),
                               spill_threshold_runs=1000, compact_every=500)
        for _ in range(5):
            spill.emit(rng.integers(0, 10000, size=800).astype(np.int64),
                       np.ones(800, dtype=np.int64))
        assert spill.n_spill_files >= 1
        on_disk = [f for f in os.listdir(tmp_path) if f.startswith(".bwtmerge")]
        assert on_disk
        # simulate interpreter exit without consuming the stream
        removed = spill_mod.cleanup_spills()
        assert removed >= len(on_disk)
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".bwtmerge")]

    def test_consumed_spills_leave_registry_empty(self, rng, tmp_path):
        """Normal consumption unregisters each file, so the exit hook has
        nothing to do."""
        from bwtmerge_tpu.models import spill as spill_mod

        spill = RankArraySpill(temp_dir=str(tmp_path),
                               spill_threshold_runs=1000, compact_every=500)
        for _ in range(5):
            spill.emit(rng.integers(0, 10000, size=800).astype(np.int64),
                       np.ones(800, dtype=np.int64))
        assert spill.n_spill_files >= 1
        list(spill.stream())
        assert not spill_mod._live_spills
        assert spill_mod.cleanup_spills() == 0


class TestStreamingInterleave:
    def test_matches_direct(self, rng):
        from bwtmerge_tpu.native import interleave_native, interleave_streaming

        a_seqs = oracle.random_collection(rng, 6, 20, 80)
        b_seqs = oracle.random_collection(rng, 5, 20, 80)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        from bwtmerge_tpu.ops import search_np

        values, counts = search_np.build_rank_array(
            a.rank_index, a.alpha.C.astype(np.int64),
            b.rank_index, b.alpha.C.astype(np.int64),
            a.sequences(), b.sequences())
        want = interleave_native(a.runs, b.runs, values, counts)

        # feed in small ascending chunks
        def chunks():
            step = 37
            for i in range(0, values.size, step):
                yield values[i:i + step], counts[i:i + step]

        got = interleave_streaming(a.runs, b.runs, chunks())
        assert got == want
        assert got == oracle.merge_collections([a_seqs, b_seqs])


class TestOutOfCoreMerge:
    @pytest.mark.parametrize("backend", ["numpy", "jax"])
    def test_merge_through_spill_path(self, rng, tmp_path, backend):
        a_seqs = oracle.random_collection(rng, 10, 20, 80)
        b_seqs = oracle.random_collection(rng, 8, 20, 80)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        # force spills: tiny buffers
        cfg = MergeConfig(backend=backend, temp_dir=str(tmp_path),
                          run_buffer_runs=64, merge_buffers=2,
                          thread_buffer_mb=1, sequence_blocks=3)
        cfg.thread_buffer_mb = 0  # compact_every floor kicks in (1024)
        merged = merge_fmi(a, b, cfg)
        assert merged.runs == oracle.merge_collections([a_seqs, b_seqs])
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".bwtmerge")]
