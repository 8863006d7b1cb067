"""Streaming writers: chunked output must be byte-identical to the batch
writers, and the fully streaming merge must match the in-memory merge."""

import os

import numpy as np
import pytest

from bwtmerge_tpu.formats import read_bwt, write_bwt
from bwtmerge_tpu.formats.streaming import write_bwt_stream
from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi, merge_fmi_to_file
from bwtmerge_tpu.utils.alphabet import Alphabet


def _chunks_of(runs, sizes):
    pos = 0
    for s in sizes:
        yield runs.syms[pos:pos + s], runs.lens[pos:pos + s]
        pos += s
    if pos < runs.n_runs:
        yield runs.syms[pos:], runs.lens[pos:]


@pytest.fixture
def merged_runs(rng):
    colls = [oracle.random_collection(rng, 6, 20, 80) for _ in range(2)]
    return oracle.merge_collections(colls)


class TestStreamingWriters:
    @pytest.mark.parametrize("fmt", ["native", "sga"])
    def test_byte_identical_to_batch(self, tmp_path, merged_runs, fmt, rng):
        alpha = Alphabet.from_counts(merged_runs.counts(6))
        batch = str(tmp_path / f"batch.{fmt}")
        stream = str(tmp_path / f"stream.{fmt}")
        write_bwt(batch, fmt, merged_runs, alpha)

        sizes = []
        left = merged_runs.n_runs
        while left > 0:
            s = int(rng.integers(1, 40))
            sizes.append(min(s, left))
            left -= sizes[-1]
        write_bwt_stream(stream, fmt, _chunks_of(merged_runs, sizes), alpha)

        assert open(batch, "rb").read() == open(stream, "rb").read()

    def test_single_chunk(self, tmp_path, merged_runs):
        alpha = Alphabet.from_counts(merged_runs.counts(6))
        p1, p2 = str(tmp_path / "a.native"), str(tmp_path / "b.native")
        write_bwt(p1, "native", merged_runs, alpha)
        write_bwt_stream(p2, "native", [(merged_runs.syms, merged_runs.lens)], alpha)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_native_round_trip(self, tmp_path, merged_runs):
        alpha = Alphabet.from_counts(merged_runs.counts(6))
        path = str(tmp_path / "s.native")
        write_bwt_stream(path, "native",
                         _chunks_of(merged_runs, [7] * 50), alpha)
        runs, _, alpha2 = read_bwt(path, "native")
        assert runs == merged_runs


class TestStreamingMerge:
    @pytest.mark.parametrize("backend", ["numpy", "jax"])
    def test_matches_in_memory_merge(self, tmp_path, rng, backend):
        a_seqs = oracle.random_collection(rng, 8, 20, 80)
        b_seqs = oracle.random_collection(rng, 7, 20, 80)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))

        batch_path = str(tmp_path / "batch.native")
        from bwtmerge_tpu.models.fmi import serialize_fmi
        merged = merge_fmi(a, b, MergeConfig(backend=backend))
        serialize_fmi(merged, batch_path, "native")

        stream_path = str(tmp_path / "stream.native")
        # tiny buffers force actual spill-chunked streaming
        cfg = MergeConfig(backend=backend, temp_dir=str(tmp_path),
                          run_buffer_runs=64, merge_buffers=2)
        cfg.thread_buffer_mb = 0
        merge_fmi_to_file(a, b, stream_path, "native", cfg)

        assert open(batch_path, "rb").read() == open(stream_path, "rb").read()
        runs, _, _ = read_bwt(stream_path, "native")
        assert runs == oracle.merge_collections([a_seqs, b_seqs])


class TestParallelChunkInterleave:
    """The ctx-based parallel chunked interleave vs the oracle: same runs
    for ragged chunk boundaries, many slices, and withheld-run coalescing."""

    @pytest.mark.parametrize("chunk_runs", [17, 64, 10_000])
    def test_matches_serial(self, rng, chunk_runs):
        from bwtmerge_tpu.native.api import interleave_stream_chunks
        from bwtmerge_tpu.models.runs import RunArrays
        from bwtmerge_tpu.ops.search_np import build_rank_array

        a_seqs = oracle.random_collection(rng, 12, 30, 90)
        b_seqs = oracle.random_collection(rng, 10, 30, 90)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        v, c = build_rank_array(
            a.rank_index, a.alpha.C.astype(np.int64),
            b.rank_index, b.alpha.C.astype(np.int64),
            a.sequences(), b.sequences())

        def chunks():
            for s in range(0, v.size, chunk_runs):
                yield v[s:s + chunk_runs], c[s:s + chunk_runs]

        got = [(s.copy(), l.copy()) for s, l in
               interleave_stream_chunks(a.runs, b.runs, chunks())]
        syms = np.concatenate([p[0] for p in got])
        lens = np.concatenate([p[1] for p in got])
        merged = RunArrays.from_runs(syms, lens)
        want = oracle.merge_collections([a_seqs, b_seqs])
        assert merged == want
        # maximal-run clean across every chunk boundary
        assert np.all(syms[1:] != syms[:-1])

    def test_forced_many_threads(self, rng, monkeypatch):
        """More slices than chunks have runs for some chunks: the serial
        fallback and the sliced path must coexist within one merge."""
        import bwtmerge_tpu.native.api as api_mod

        monkeypatch.setattr(os, "cpu_count", lambda: 9)
        self.test_matches_serial(rng, 23)


class TestStreamingReaders:
    """Chunked input readers (streaming_read.py): reference PlainData/RopeData
    read files in bounded 1 MB buffers (formats.cpp:126-216); no repo reader
    may materialize the whole file or the decoded text."""

    FMTS = ("native", "plain_default", "plain_sorted", "rfm", "sdsl",
            "ropebwt", "sga")

    @pytest.fixture()
    def written(self, tmp_path, rng):
        runs = oracle.build_bwt(oracle.random_collection(rng, 20, 50, 200))
        alpha = Alphabet.from_counts(runs.counts(6))
        paths = {}
        for fmt in self.FMTS:
            p = str(tmp_path / f"x.{fmt}")
            write_bwt(p, fmt, runs, alpha)
            paths[fmt] = p
        return runs, paths

    def test_chunked_matches_batch_all_formats(self, written):
        from bwtmerge_tpu.formats.formats import FORMATS
        from bwtmerge_tpu.formats.streaming_read import read_bwt_streaming

        runs, paths = written
        for fmt in self.FMTS:
            # tiny chunks force many seams
            got_runs, got_counts, got_alpha = read_bwt_streaming(
                paths[fmt], fmt, chunk_bytes=257)
            want_runs, want_counts, want_alpha = FORMATS[fmt].read(paths[fmt])
            assert got_runs == want_runs, fmt
            assert got_runs.is_maximal(), fmt
            assert np.array_equal(got_counts, want_counts), fmt
            assert got_alpha == want_alpha, fmt

    def test_chunks_are_bounded_and_clean(self, written):
        from bwtmerge_tpu.formats.streaming_read import read_bwt_chunks

        runs, paths = written
        chunk_bytes = 512
        for fmt in ("sga", "plain_default", "native"):
            total = 0
            for syms, lens in read_bwt_chunks(paths[fmt], fmt,
                                              chunk_bytes=chunk_bytes):
                # bounded: a chunk never yields more runs than its input
                # window can encode (longest case: plain, 1 byte/position,
                # plus one run withheld from the previous window)
                assert syms.size <= chunk_bytes + 1, fmt
                assert np.all(syms[1:] != syms[:-1]), fmt  # maximal in chunk
                total += int(lens.sum())
            assert total == runs.size(), fmt

    def test_read_paths_never_decode(self, written, monkeypatch):
        from bwtmerge_tpu.models.runs import RunArrays

        runs, paths = written

        def boom(self):
            raise AssertionError("read path called RunArrays.decode()")

        monkeypatch.setattr(RunArrays, "decode", boom)
        for fmt in self.FMTS:
            got, _, _ = read_bwt(paths[fmt], fmt)
            assert got == runs, fmt

    def test_truncated_file_raises(self, written, tmp_path):
        runs, paths = written
        data = open(paths["sga"], "rb").read()
        p = str(tmp_path / "trunc.sga")
        open(p, "wb").write(data[: len(data) - 7])
        with pytest.raises(ValueError, match="truncated"):
            read_bwt(p, "sga")


class TestInt32Chunks:
    def test_int32_chunks_with_splits_byte_identical(self, tmp_path, rng):
        """int32-lens chunks (the interleave chain's layout) must produce
        byte-identical files, including when over-wide runs arrive split
        into adjacent same-symbol entries (the writers re-coalesce)."""
        import numpy as np
        from bwtmerge_tpu.formats.streaming import write_bwt_stream
        from bwtmerge_tpu.models.runs import RunArrays
        from bwtmerge_tpu.utils.alphabet import Alphabet

        syms = rng.integers(0, 5, size=4000).astype(np.uint8)
        lens = rng.integers(1, 200, size=4000).astype(np.int64)
        runs = RunArrays(syms, lens).coalesced()
        alpha = Alphabet.from_counts(runs.counts(6))

        for fmt in ("sga", "native"):
            want = str(tmp_path / f"w.{fmt}")
            write_bwt_stream(want, fmt,
                             [(runs.syms, runs.lens)], alpha)

            # int32 stream with every 3rd run split into two entries
            s_parts, l_parts = [], []
            for i in range(runs.syms.size):
                s, l = int(runs.syms[i]), int(runs.lens[i])
                if i % 3 == 0 and l > 1:
                    s_parts += [s, s]
                    l_parts += [l - 1, 1]
                else:
                    s_parts.append(s)
                    l_parts.append(l)
            split_s = np.asarray(s_parts, np.uint8)
            split_l = np.asarray(l_parts, np.int32)
            got = str(tmp_path / f"g.{fmt}")
            # ragged chunking exercises cross-call state; cuts respect the
            # writer contract (no same-symbol adjacency ACROSS chunks —
            # the producer withholds trailing groups to guarantee it)
            cuts = [0]
            for c in (17, 1000, 2345):
                while c < split_s.size and split_s[c - 1] == split_s[c]:
                    c += 1
                cuts.append(min(c, split_s.size))
            cuts.append(split_s.size)
            write_bwt_stream(got, fmt,
                             [(split_s[a:b], split_l[a:b])
                              for a, b in zip(cuts, cuts[1:])], alpha)
            assert open(got, "rb").read() == open(want, "rb").read(), fmt
