"""Device suffix-array / BWT construction vs the numpy oracle."""

import numpy as np
import pytest

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.build import rlo_order
from bwtmerge_tpu.ops.sa_jax import (build_bwt_device, rlo_order_device,
                                     suffix_array_device)


class TestSuffixArrayDevice:
    def test_matches_oracle_random(self, rng):
        for n in (1, 2, 5, 100, 1000, 5000):
            text = rng.integers(0, 8, n).astype(np.int64)
            got = suffix_array_device(text)
            want = oracle.suffix_array(text)
            assert np.array_equal(got, want), n

    def test_repetitive_text(self, rng):
        # long equal runs force many doubling rounds
        text = np.repeat(rng.integers(0, 3, 40), 50).astype(np.int64)
        # make suffixes distinct the way collections do: unique tail values
        text = np.concatenate([text + 10, [0]])
        assert np.array_equal(suffix_array_device(text),
                              oracle.suffix_array(text))

    def test_empty(self):
        assert suffix_array_device(np.zeros(0, np.int64)).size == 0


class TestBuildBWTDevice:
    @pytest.mark.parametrize("n_seqs,min_len,max_len", [
        (1, 1, 1), (3, 1, 8), (60, 20, 60), (40, 1, 200),
    ])
    def test_matches_oracle(self, rng, n_seqs, min_len, max_len):
        col = oracle.random_collection(rng, n_seqs, min_len, max_len)
        got = build_bwt_device(col)
        want = oracle.build_bwt(col)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)

    def test_identical_reads(self, rng):
        col = [np.array([1, 2, 3, 4], np.int64)] * 17
        got = build_bwt_device(col)
        want = oracle.build_bwt(col)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)

    def test_rejects_endmarkers_in_reads(self):
        with pytest.raises(ValueError, match="comp values >= 1"):
            build_bwt_device([np.array([1, 0, 2], np.int64)])


class TestBuildFromReadsBackends:
    def test_jax_backend_matches_numpy(self, rng):
        from bwtmerge_tpu.models.build import build_from_reads

        col = oracle.random_collection(rng, 60, 5, 80)
        for rlo in (False, True):
            r_np, o_np = build_from_reads(col, rlo=rlo, backend="numpy")
            r_dev, o_dev = build_from_reads(col, rlo=rlo, backend="jax")
            assert np.array_equal(o_np, o_dev), rlo
            assert np.array_equal(r_np.syms, r_dev.syms), rlo
            assert np.array_equal(r_np.lens, r_dev.lens), rlo

    def test_sharded_backend_matches_numpy(self, rng):
        from bwtmerge_tpu.models.build import build_from_reads

        col = oracle.random_collection(rng, 30, 5, 50)
        for rlo in (False, True):
            r_np, o_np = build_from_reads(col, rlo=rlo, backend="numpy")
            r_sh, o_sh = build_from_reads(col, rlo=rlo, backend="sharded")
            assert np.array_equal(o_np, o_sh), rlo
            assert np.array_equal(r_np.syms, r_sh.syms), rlo
            assert np.array_equal(r_np.lens, r_sh.lens), rlo

    def test_packed_tuple_input(self, rng):
        from bwtmerge_tpu.ops.sa_jax import build_bwt_device

        col = oracle.random_collection(rng, 20, 5, 40)
        flat = np.concatenate(col).astype(np.int32)
        lengths = np.array([s.size for s in col], np.int64)
        got = build_bwt_device((flat, lengths))
        want = oracle.build_bwt(col)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)


class TestRLOOrderDevice:
    def test_matches_numpy_lexsort(self, rng):
        for trial in range(5):
            col = oracle.random_collection(rng, 50, 1, 70)
            got = rlo_order_device(col)
            want = rlo_order(col)
            assert np.array_equal(got, want), trial

    def test_suffix_read_sorts_first(self):
        col = [np.array([2, 1, 3], np.int64),   # reversed: 3 1 2
               np.array([1, 3], np.int64),      # reversed: 3 1   (prefix)
               np.array([3], np.int64)]         # reversed: 3     (prefix)
        got = rlo_order_device(col)
        assert got.tolist() == [2, 1, 0]

    def test_long_reads_cross_key_boundary(self, rng):
        # reads longer than 20 chars need multiple packed int64 keys
        col = oracle.random_collection(rng, 40, 55, 90)
        assert np.array_equal(rlo_order_device(col), rlo_order(col))

    def test_empty_and_trivial(self):
        assert rlo_order_device([]).size == 0
        assert rlo_order_device([np.zeros(0, np.int64)]).tolist() == [0]
