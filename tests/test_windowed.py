"""Windowed (bounded-memory) interleave and file-to-file destructive merge.

The reference frees consumed input blocks mid-merge (BlockArray::clearUntil,
bwt.cpp:233-265) so the merge phase never holds inputs + output together;
native/windowed.py reproduces that profile over chunk streams.  These tests
pin (a) correctness of the window rebasing + RA rewriting against the oracle
and the batch interleave, and (b) the bounded-occupancy claim itself.
"""

import numpy as np
import pytest

from bwtmerge_tpu.formats import read_bwt, write_bwt
from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.merge import MergeConfig, merge_files
from bwtmerge_tpu.models.runs import RunArrays
from bwtmerge_tpu.native.windowed import (_bounded_ra,
                                          interleave_windowed_chunks)
from bwtmerge_tpu.ops.search_np import build_rank_array


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _ra_for(a, b):
    return build_rank_array(
        a.rank_index, a.alpha.C.astype(np.int64),
        b.rank_index, b.alpha.C.astype(np.int64),
        a.sequences(), b.sequences())


def _chunked(syms, lens, n):
    for s in range(0, syms.size, n):
        yield syms[s:s + n], lens[s:s + n]


class TestBoundedRA:
    def test_rewrite_preserves_semantics(self, rng):
        """Gap fills and count splits must not change total counts nor the
        covered A span, and every sub-chunk must respect both bounds."""
        v = np.sort(rng.integers(0, 100_000, 500)).astype(np.int64)
        c = rng.integers(0, 5_000, 500).astype(np.int64)
        limit = 1024
        prev = 0
        tot_c = 0
        for rv, rc in _bounded_ra([(v, c)], limit):
            assert rv.size > 0
            assert int(rv[-1]) - prev <= limit
            assert int(rc.sum()) <= limit
            assert np.all(np.diff(rv) >= 0)
            prev = int(rv[-1])
            tot_c += int(rc.sum())
        assert prev == int(v[-1])
        assert tot_c == int(c.sum())


class TestWindowedInterleave:
    @pytest.mark.parametrize("window,src_chunk,ra_chunk", [
        (1 << 20, 1 << 20, 1 << 20),   # everything fits in one window
        (512, 64, 100),                # many refills + RA splitting
        (1024, 7, 13),                 # ragged tiny source chunks
    ])
    def test_matches_oracle(self, rng, window, src_chunk, ra_chunk):
        a_seqs = oracle.random_collection(rng, 14, 30, 90)
        b_seqs = oracle.random_collection(rng, 11, 30, 90)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        v, c = _ra_for(a, b)

        stats = {}
        got = [(s.copy(), l.copy()) for s, l in interleave_windowed_chunks(
            _chunked(a.runs.syms, a.runs.lens, src_chunk),
            _chunked(b.runs.syms, b.runs.lens, src_chunk),
            _chunked(v, c, ra_chunk),
            window_positions=window, stats=stats)]
        syms = np.concatenate([p[0] for p in got])
        lens = np.concatenate([p[1] for p in got])
        assert RunArrays.from_runs(syms, lens) == \
            oracle.merge_collections([a_seqs, b_seqs])
        assert np.all(syms[1:] != syms[:-1])  # maximal-run clean everywhere
        assert stats["max_window_positions"] > 0

    def test_tiny_b_forces_gap_fills(self, rng):
        """|A| >> |B|: huge A gaps between consecutive RA values must be
        walked in window-sized steps, never materializing A."""
        a_seqs = oracle.random_collection(rng, 40, 40, 120)
        b_seqs = oracle.random_collection(rng, 1, 10, 10)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        v, c = _ra_for(a, b)

        stats = {}
        got = [(s.copy(), l.copy()) for s, l in interleave_windowed_chunks(
            _chunked(a.runs.syms, a.runs.lens, 32),
            _chunked(b.runs.syms, b.runs.lens, 32),
            [(v, c)], window_positions=1024, stats=stats)]
        syms = np.concatenate([p[0] for p in got])
        lens = np.concatenate([p[1] for p in got])
        assert RunArrays.from_runs(syms, lens) == \
            oracle.merge_collections([a_seqs, b_seqs])
        # bounded: window never exceeded limit + one source-chunk overshoot
        # (1024 is the implementation's window floor)
        max_run = int(max(a.runs.lens.max(), b.runs.lens.max()))
        slack = 32 * max_run  # one 32-run source chunk of maximal runs
        assert stats["max_window_positions"] <= 1024 + slack + max_run

    def test_tiny_a_forces_count_splits(self, rng):
        """|B| >> |A|: single RA runs carry huge counts and must be split."""
        a_seqs = oracle.random_collection(rng, 1, 10, 10)
        b_seqs = oracle.random_collection(rng, 40, 40, 120)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        v, c = _ra_for(a, b)

        got = [(s.copy(), l.copy()) for s, l in interleave_windowed_chunks(
            _chunked(a.runs.syms, a.runs.lens, 32),
            _chunked(b.runs.syms, b.runs.lens, 32),
            [(v, c)], window_positions=256)]
        syms = np.concatenate([p[0] for p in got])
        lens = np.concatenate([p[1] for p in got])
        assert RunArrays.from_runs(syms, lens) == \
            oracle.merge_collections([a_seqs, b_seqs])

    def test_corrupt_ra_raises(self, rng):
        a_seqs = oracle.random_collection(rng, 5, 20, 60)
        b_seqs = oracle.random_collection(rng, 4, 20, 60)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        v, c = _ra_for(a, b)
        v = v.copy()
        v[-1] = a.size() + 10_000  # beyond |A|
        with pytest.raises(ValueError):
            list(interleave_windowed_chunks(
                _chunked(a.runs.syms, a.runs.lens, 64),
                _chunked(b.runs.syms, b.runs.lens, 64),
                [(v, c)], window_positions=512))


class TestMergeFiles:
    @pytest.mark.parametrize("fmt", ["sga", "native"])
    def test_matches_in_memory_merge(self, rng, tmp_path, fmt):
        a_seqs = oracle.random_collection(rng, 16, 40, 110)
        b_seqs = oracle.random_collection(rng, 13, 40, 110)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        ap, bp, op = (str(tmp_path / n) for n in ("a.in", "b.in", "out"))
        write_bwt(ap, fmt, a.runs, a.alpha)
        write_bwt(bp, fmt, b.runs, b.alpha)

        stats = {}
        merge_files(ap, bp, op, in_fmt=fmt, out_fmt=fmt,
                    config=MergeConfig(backend="numpy"),
                    window_positions=2048, stats=stats)
        runs, _, _ = read_bwt(op, fmt)
        assert runs == oracle.merge_collections([a_seqs, b_seqs])
        assert stats["max_window_positions"] > 0

    def test_jax_backend(self, rng, tmp_path):
        """merge_files over the jax backend: the RA comes from the device
        search (PackedDeviceRA / spill), the interleave stays windowed."""
        a_seqs = oracle.random_collection(rng, 10, 30, 90)
        b_seqs = oracle.random_collection(rng, 8, 30, 90)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        ap, bp, op = (str(tmp_path / n) for n in ("a.sga", "b.sga", "out.sga"))
        write_bwt(ap, "sga", a.runs, a.alpha)
        write_bwt(bp, "sga", b.runs, b.alpha)

        merge_files(ap, bp, op, in_fmt="sga", out_fmt="sga",
                    config=MergeConfig(backend="jax"),
                    window_positions=4096)
        runs, _, _ = read_bwt(op, "sga")
        assert runs == oracle.merge_collections([a_seqs, b_seqs])
