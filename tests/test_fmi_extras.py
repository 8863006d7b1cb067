"""FMI query-surface parity: Psi, extract, hash, pattern verification."""

import numpy as np

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI


def _fmi(seqs):
    return FMI.from_runs(oracle.build_bwt(seqs))


class TestPsi:
    def test_LF_of_psi_is_identity(self, rng):
        seqs = oracle.random_collection(rng, 6, 10, 60)
        fmi = _fmi(seqs)
        i = np.arange(fmi.size(), dtype=np.int64)
        psi = fmi.psi(i)
        lf, _ = fmi.LF_step(psi)
        assert np.array_equal(lf, i)

    def test_psi_of_LF_identity_off_endmarkers(self, rng):
        seqs = oracle.random_collection(rng, 5, 10, 50)
        fmi = _fmi(seqs)
        i = np.arange(fmi.size(), dtype=np.int64)
        lf, sym = fmi.LF_step(i)
        keep = sym != 0  # LF into the endmarker block is not invertible by Psi
        assert np.array_equal(fmi.psi(lf[keep]), i[keep])


class TestExtract:
    def test_matches_decoded(self, rng):
        seqs = oracle.random_collection(rng, 4, 10, 50)
        fmi = _fmi(seqs)
        decoded = fmi.runs.decode()
        assert np.array_equal(fmi.extract(0, fmi.size() - 1), decoded)
        assert np.array_equal(fmi.extract(5, 20), decoded[5:21])


class TestHash:
    def test_representation_independent(self, rng):
        seqs = oracle.random_collection(rng, 4, 10, 50)
        fmi = _fmi(seqs)
        # same content, non-maximal run split -> same hash
        from bwtmerge_tpu.models.runs import RunArrays

        syms = np.repeat(fmi.runs.syms, 2)
        lens = np.empty(fmi.runs.lens.size * 2, dtype=np.int64)
        lens[0::2] = fmi.runs.lens - 1
        lens[1::2] = 1
        split = FMI.from_runs(RunArrays.from_runs(syms, lens))
        assert split.hash() == fmi.hash()


class TestBatchCount:
    def test_matches_sequential_count(self, rng):
        seqs = oracle.random_collection(rng, 8, 5, 60)
        fmi = _fmi(seqs)
        pats = [seqs[0][:7], seqs[1][:3], np.array([1, 2, 3, 4, 5]),
                np.array([], dtype=np.int64), seqs[2]]
        want = np.array([fmi.count(p) for p in pats])
        want[3] = fmi.size()  # empty pattern counts every suffix
        got = fmi.batch_count(pats)
        assert np.array_equal(got, want)
