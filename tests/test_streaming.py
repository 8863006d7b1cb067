"""Streaming writers: chunked output must be byte-identical to the batch
writers, and the fully streaming merge must match the in-memory merge."""

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
