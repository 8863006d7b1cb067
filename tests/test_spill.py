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


class TestNativeMergePair:
    def test_matches_numpy_merge(self, rng):
        from bwtmerge_tpu.native import ra_merge_pair
        from bwtmerge_tpu.ops.search_np import merge_rank_arrays

        for _ in range(50):
            na, nb = rng.integers(0, 200, 2)
            va = np.unique(rng.integers(0, 500, na)).astype(np.int64)
            vb = np.unique(rng.integers(0, 500, nb)).astype(np.int64)
            ka = rng.integers(1, 9, va.size).astype(np.int64)
            kb = rng.integers(1, 9, vb.size).astype(np.int64)
            v1, c1 = ra_merge_pair((va, ka), (vb, kb))
            v2, c2 = merge_rank_arrays((va, ka), (vb, kb))
            assert np.array_equal(v1, v2)
            assert np.array_equal(c1, c2)

    def test_into_caller_buffers(self, rng):
        from bwtmerge_tpu.native import ra_merge_pair

        va = np.array([1, 3, 5], np.int64)
        vb = np.array([2, 3, 9], np.int64)
        ka = np.array([10, 20, 30], np.int64)
        kb = np.array([1, 2, 3], np.int64)
        ov = np.empty(6, np.int64)
        ok = np.empty(6, np.int64)
        v, c = ra_merge_pair((va, ka), (vb, kb), ov, ok)
        assert v.base is ov and c.base is ok
        assert v.tolist() == [1, 2, 3, 5, 9]
        assert c.tolist() == [10, 1, 22, 30, 3]


class TestMergeSortedParts:
    def test_fold_matches_concat_compact(self, rng):
        from bwtmerge_tpu.models.spill import _merge_sorted_parts

        for k in (1, 2, 3, 5, 8):
            parts = []
            for _ in range(k):
                v = np.unique(rng.integers(0, 300, rng.integers(1, 100)))
                parts.append((v.astype(np.int64),
                              rng.integers(1, 9, v.size).astype(np.int64)))
            got_v, got_c = _merge_sorted_parts([p for p in parts])
            want_v, want_c = compact_rank_array(
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))
            assert np.array_equal(got_v, want_v)
            assert np.array_equal(got_c, want_c)


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
