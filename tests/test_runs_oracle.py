import numpy as np
import pytest

from bwtmerge_tpu.models.runs import RunArrays
from bwtmerge_tpu.models import oracle


class TestRunArrays:
    def test_from_values_roundtrip(self, rng):
        vals = rng.integers(0, 6, 500).astype(np.uint8)
        r = RunArrays.from_values(vals)
        assert r.is_maximal()
        assert np.array_equal(r.decode(), vals)
        assert r.size() == 500

    def test_coalesce(self):
        r = RunArrays(np.array([1, 1, 2, 0, 2, 2], np.uint8),
                      np.array([3, 2, 4, 0, 1, 1], np.int64))
        c = r.coalesced()
        # zero-length run dropped, so the 2-runs around it all merge
        assert c.syms.tolist() == [1, 2]
        assert c.lens.tolist() == [5, 6]
        assert c.is_maximal()
        assert np.array_equal(c.decode(), r.decode())

    def test_counts_sequences(self):
        r = RunArrays.from_values(np.array([0, 1, 1, 2, 0, 5], np.uint8))
        assert r.counts().tolist() == [2, 2, 1, 0, 0, 1]
        assert r.sequences() == 2


class TestSuffixArray:
    def test_matches_naive(self, rng):
        for n in (1, 2, 5, 50, 200):
            text = rng.integers(0, 4, n)
            text[-1] = -1  # unique terminator keeps suffixes distinct
            sa = oracle.suffix_array(text)
            naive = sorted(range(n), key=lambda i: text[i:].tolist())
            assert sa.tolist() == naive


class TestBuildBwt:
    def test_single_sequence_known(self):
        # 'ACGT' -> comp [1,2,3,4]; check invariants and LF reconstruction.
        bwt = oracle.build_bwt([np.array([1, 2, 3, 4])])
        assert bwt.size() == 5
        assert bwt.sequences() == 1

    def test_counts_and_invariants(self, rng):
        seqs = oracle.random_collection(rng, 10, 5, 40)
        bwt = oracle.build_bwt(seqs)
        total = sum(len(s) for s in seqs) + len(seqs)
        assert bwt.size() == total
        assert bwt.sequences() == len(seqs)
        counts = bwt.counts()
        expect = np.zeros(6, np.int64)
        expect[0] = len(seqs)
        for s in seqs:
            np.add.at(expect, s, 1)
        assert np.array_equal(counts, expect)

    def test_extraction_roundtrip(self, rng):
        """LF-walking each endmarker row must recover each original sequence."""
        from bwtmerge_tpu.models.fmi import FMI

        seqs = oracle.random_collection(rng, 6, 3, 25)
        fmi = FMI.from_runs(oracle.build_bwt(seqs))
        recovered = [fmi.extract_sequence(k) for k in range(len(seqs))]
        for s, r in zip(seqs, recovered):
            assert np.array_equal(s, r), (s, r)


class TestPatternCounts:
    def test_find_matches_oracle(self, rng):
        from bwtmerge_tpu.models.fmi import FMI

        seqs = oracle.random_collection(rng, 8, 10, 60, sigma=5)
        fmi = FMI.from_runs(oracle.build_bwt(seqs))
        for _ in range(30):
            plen = int(rng.integers(1, 6))
            pattern = rng.integers(1, 5, plen)
            expect = oracle.count_occurrences(seqs, pattern)
            assert fmi.count(pattern) == expect, pattern

    def test_find_existing_substrings(self, rng):
        from bwtmerge_tpu.models.fmi import FMI

        seqs = oracle.random_collection(rng, 5, 20, 50)
        fmi = FMI.from_runs(oracle.build_bwt(seqs))
        for s in seqs:
            for start in (0, len(s) // 2):
                pattern = s[start : start + 8]
                assert fmi.count(pattern) >= 1
