"""bwt_build: construction from raw reads + RLO reordering.

RLO (reverse-lexicographic read order) is the run-count-minimizing order the
reference paper benchmarks (paper.tex:278); reordering reads never changes
pattern occurrence counts, so an RLO BWT is query-equivalent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from bwtmerge_tpu.formats import read_bwt
from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.build import (build_from_reads, read_plain_reads,
                                       rlo_order)
from bwtmerge_tpu.models.fmi import FMI

COMP2CHAR = np.frombuffer(b"$ACGTN", np.uint8)


class TestRLOOrder:
    def test_matches_python_sort(self, rng):
        seqs = [rng.integers(1, 6, int(rng.integers(1, 12)))
                for _ in range(50)]
        got = rlo_order(seqs)
        want = sorted(range(len(seqs)),
                      key=lambda i: tuple(seqs[i][::-1].tolist()))
        # ties (equal reads) may permute; compare the sorted key sequence
        got_keys = [tuple(seqs[i][::-1].tolist()) for i in got]
        want_keys = [tuple(seqs[i][::-1].tolist()) for i in want]
        assert got_keys == want_keys

    def test_suffix_sorts_before_longer_read(self):
        # reversed("GA")=="AG" is a prefix of reversed("GAT"+...)
        seqs = [np.array([3, 1, 4]), np.array([3, 1])]  # GAT, GA
        assert rlo_order(seqs).tolist() == [1, 0]

    def test_empty_collection(self):
        assert rlo_order([]).size == 0


class TestBuildFromReads:
    def test_rlo_is_query_equivalent_and_smaller(self, rng):
        # repetitive collection: many shared suffixes -> RLO shrinks runs
        base = rng.integers(1, 5, 40)
        reads = [np.concatenate([rng.integers(1, 5, int(rng.integers(0, 6))),
                                 base[int(rng.integers(0, 20)):]])
                 for _ in range(60)]
        reads = [r for r in reads if r.size]
        plain, _ = build_from_reads(reads, rlo=False)
        rlo, order = build_from_reads(reads, rlo=True)
        assert sorted(order.tolist()) == list(range(len(reads)))
        # same multiset of symbols
        assert np.array_equal(plain.counts(6), rlo.counts(6))
        # RLO never loses to the original order on a shared-suffix collection
        assert rlo.n_runs <= plain.n_runs
        # query-equivalent: occurrence counts identical for every pattern
        fa, fb = FMI.from_runs(plain), FMI.from_runs(rlo)
        pats = [rng.integers(1, 5, int(rng.integers(2, 7))) for _ in range(20)]
        pats.append(base[:8])
        assert np.array_equal(fa.verify(pats), fb.verify(pats))

    def test_oracle_equivalence(self, rng):
        reads = [rng.integers(1, 6, int(rng.integers(1, 20)))
                 for _ in range(15)]
        runs, order = build_from_reads(reads, rlo=True)
        want = oracle.build_bwt([reads[i] for i in order])
        assert runs == want


class TestExtractAll:
    def test_matches_per_sequence_extract(self, rng):
        reads = [rng.integers(1, 6, int(rng.integers(1, 15)))
                 for _ in range(12)]
        fmi = FMI.from_runs(oracle.build_bwt(reads))
        got = fmi.extract_all()
        assert len(got) == fmi.sequences()
        for k, g in enumerate(got):
            assert np.array_equal(g, fmi.extract_sequence(k)), k

    def test_empty_collection(self):
        from bwtmerge_tpu.models.runs import RunArrays

        fmi = FMI.from_runs(RunArrays.from_values(np.zeros(0, np.uint8)))
        assert fmi.extract_all() == []


class TestRLOReorderExisting:
    def test_reorder_is_query_equivalent(self, rng):
        from bwtmerge_tpu.models.build import rlo_reorder

        base = rng.integers(1, 5, 30)
        reads = [np.concatenate([rng.integers(1, 5, int(rng.integers(0, 4))),
                                 base[int(rng.integers(0, 15)):]])
                 for _ in range(30)]
        orig = FMI.from_runs(oracle.build_bwt(reads))
        rlo = FMI.from_runs(rlo_reorder(orig))
        assert rlo.runs.n_runs <= orig.runs.n_runs
        assert np.array_equal(orig.runs.counts(6), rlo.runs.counts(6))
        pats = [rng.integers(1, 5, int(rng.integers(2, 6)))
                for _ in range(15)]
        assert np.array_equal(orig.verify(pats), rlo.verify(pats))
        # rebuild equals a direct RLO build of the same reads
        want, _ = build_from_reads(reads, rlo=True)
        assert rlo.runs == want

    def test_convert_cli_rlo(self, rng, tmp_path):
        from bwtmerge_tpu.formats import write_bwt
        from bwtmerge_tpu.models.build import alphabet_for

        reads = [rng.integers(1, 4, 10) for _ in range(10)]
        runs = oracle.build_bwt(reads)
        src = str(tmp_path / "in.sga")
        write_bwt(src, "sga", runs, alphabet_for(runs))
        dst = str(tmp_path / "out.native")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        r = subprocess.run(
            [sys.executable, "-m", "bwtmerge_tpu.cli.bwt_convert",
             src, dst, "-i", "sga", "-o", "native", "--rlo"],
            capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        assert "RLO reorder:" in r.stdout
        got, _, _ = read_bwt(dst, "native")
        want, _ = build_from_reads(reads, rlo=True)
        assert got == want


class TestReadPlainReads:
    def test_parses_and_skips_blank_lines(self, tmp_path):
        p = tmp_path / "reads.txt"
        p.write_bytes(b"ACGT\n\nNNA\r\nT\n")
        reads = read_plain_reads(str(p))
        assert [r.tolist() for r in reads] == [[1, 2, 3, 4], [5, 5, 1], [4]]

    def test_unknown_chars_map_to_N(self, tmp_path):
        # reference PlainFormat semantics: every non-ACGT byte is N
        p = tmp_path / "reads.txt"
        p.write_bytes(b"ACXT\n")
        assert read_plain_reads(str(p))[0].tolist() == [1, 2, 5, 4]

    def test_rejects_endmarker_character(self, tmp_path):
        p = tmp_path / "reads.txt"
        p.write_bytes(b"ACGT\nAC$T\n")
        with pytest.raises(ValueError, match=r"reads.txt:2"):
            read_plain_reads(str(p))

    def test_packed_matches_list_form(self, tmp_path):
        from bwtmerge_tpu.models.build import read_plain_reads_packed

        p = tmp_path / "reads.txt"
        p.write_bytes(b"ACGT\r\n\nGGN\nTT")  # crlf, blank, no trailing \n
        reads = read_plain_reads(str(p))
        flat, lens = read_plain_reads_packed(str(p))
        assert lens.tolist() == [r.size for r in reads]
        assert flat.tolist() == np.concatenate(reads).tolist()

    def test_packed_empty_file(self, tmp_path):
        from bwtmerge_tpu.models.build import read_plain_reads_packed

        p = tmp_path / "reads.txt"
        p.write_bytes(b"")
        flat, lens = read_plain_reads_packed(str(p))
        assert flat.size == 0 and lens.size == 0


class TestBuildCLI:
    def _write_reads(self, path, reads):
        with open(path, "wb") as f:
            for r in reads:
                f.write(COMP2CHAR[r].tobytes() + b"\n")

    def _run(self, *args):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        return subprocess.run(
            [sys.executable, "-m", "bwtmerge_tpu.cli.bwt_build", *args],
            capture_output=True, text=True, env=env)

    def test_build_then_merge_invariant(self, rng, tmp_path):
        a_reads = [rng.integers(1, 6, 12) for _ in range(8)]
        b_reads = [rng.integers(1, 6, 12) for _ in range(6)]
        ra, rb = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
        self._write_reads(ra, a_reads)
        self._write_reads(rb, b_reads)
        oa, ob = str(tmp_path / "a.sga"), str(tmp_path / "b.sga")
        r = self._run(ra, oa, "-o", "sga", "--quiet")
        assert r.returncode == 0, r.stderr
        r = self._run(rb, ob, "-o", "sga", "--rlo", "--quiet")
        assert r.returncode == 0, r.stderr

        runs_a, _, _ = read_bwt(oa, "sga")
        assert runs_a == oracle.build_bwt(a_reads)
        runs_b, _, _ = read_bwt(ob, "sga")
        fa, fb = FMI.from_runs(runs_a), FMI.from_runs(runs_b)
        from bwtmerge_tpu.models.merge import merge_fmi

        merged = merge_fmi(fa, fb)
        pats = [rng.integers(1, 6, 4) for _ in range(10)]
        assert np.array_equal(fa.verify(pats) + fb.verify(pats),
                              merged.verify(pats))

    def test_invalid_reads_fail_cleanly(self, tmp_path):
        p = str(tmp_path / "bad.txt")
        with open(p, "w") as f:
            f.write("ACG$\n")
        r = self._run(p, str(tmp_path / "out.sga"), "-o", "sga", "--quiet")
        assert r.returncode == 1
        assert "bad.txt:1" in r.stderr

    def test_empty_input_fails_cleanly(self, tmp_path):
        p = str(tmp_path / "empty.txt")
        open(p, "w").close()
        r = self._run(p, str(tmp_path / "out.sga"), "-o", "sga", "--quiet")
        assert r.returncode == 1
        assert "no reads" in r.stderr
