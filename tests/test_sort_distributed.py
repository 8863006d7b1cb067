"""Mesh-distributed sort + sharded suffix array vs host oracles
(8-virtual-device CPU mesh; conftest forces the platform)."""

import numpy as np
import pytest

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.parallel.mesh import make_mesh
from bwtmerge_tpu.parallel.sort_distributed import (
    _oddeven_rounds, build_bwt_sharded, rlo_order_sharded,
    sharded_sample_sort, sharded_sort, suffix_array_sharded)


class TestOddEvenNetwork:
    @pytest.mark.parametrize("p", [1, 2, 4, 8, 16])
    def test_network_sorts_blocks(self, p, rng):
        # simulate the blockwise merge-split on the host over random blocks
        s = 8
        blocks = [np.sort(rng.integers(0, 100, s)) for _ in range(p)]
        for pairs in _oddeven_rounds(p):
            for lo, hi in pairs:
                merged = np.sort(np.concatenate([blocks[lo], blocks[hi]]))
                blocks[lo], blocks[hi] = merged[:s], merged[s:]
        got = np.concatenate(blocks)
        assert np.array_equal(got, np.sort(got))


class TestShardedSort:
    def test_matches_lexsort(self, rng):
        mesh = make_mesh(8)
        n = 8 * 64
        k1 = rng.integers(0, 7, n).astype(np.int32)     # heavy duplicates
        k2 = rng.integers(0, 5, n).astype(np.int32)
        uid = np.arange(n, dtype=np.int32)
        payload = rng.integers(0, 1000, n).astype(np.int32)
        out = sharded_sort((k1, k2, uid, payload), num_keys=3, mesh=mesh)
        got = [np.asarray(o) for o in out]
        order = np.lexsort((uid, k2, k1))
        assert np.array_equal(got[0], k1[order])
        assert np.array_equal(got[1], k2[order])
        assert np.array_equal(got[2], uid[order])
        assert np.array_equal(got[3], payload[order])

    def test_single_device_mesh(self, rng):
        mesh = make_mesh(1)
        n = 64
        k = rng.integers(0, 100, n).astype(np.int32)
        (out,) = sharded_sort((k,), num_keys=1, mesh=mesh)
        assert np.array_equal(np.asarray(out), np.sort(k))

    def test_rejects_indivisible(self, rng):
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="not divisible"):
            sharded_sort((np.zeros(10, np.int32),), num_keys=1, mesh=mesh)

    @pytest.mark.parametrize("tie_maker", [
        lambda rng, n: np.zeros(n, np.int32),                  # all equal
        lambda rng, n: (np.arange(n) % 2).astype(np.int32),    # two values
        lambda rng, n: rng.integers(0, 5, n).astype(np.int32),  # few values
    ])
    def test_tied_keys_preserve_payloads(self, rng, tie_maker):
        # tied keys straddling a merge-split keep boundary must not lose or
        # duplicate payloads (canonical concat order in the comparator)
        mesh = make_mesh(8)
        n = 8 * 64
        k = tie_maker(rng, n)
        pay = np.arange(n, dtype=np.int32)
        ks, ps = map(np.asarray,
                     sharded_sort((k, pay), num_keys=1, mesh=mesh))
        assert np.array_equal(ks, np.sort(k))
        assert np.array_equal(np.sort(ps), pay)      # a permutation
        assert np.array_equal(k[ps], ks)             # pairing intact


class TestSampleSort:
    @pytest.mark.parametrize("p", [2, 4, 8])
    def test_matches_lexsort(self, rng, p):
        mesh = make_mesh(p)
        n = p * 256
        k1 = rng.integers(0, 4, n).astype(np.int32)
        k2 = rng.integers(0, 10**6, n).astype(np.int32)
        uid = np.arange(n, dtype=np.int32)
        o1, o2, ou = map(np.asarray, sharded_sample_sort(
            (k1, k2, uid), num_keys=3, mesh=mesh))
        want = np.lexsort((uid, k2, k1))
        assert np.array_equal(o1, k1[want])
        assert np.array_equal(o2, k2[want])
        assert np.array_equal(ou, uid[want])

    @pytest.mark.parametrize("tie_maker", [
        lambda rng, n: np.zeros(n, np.int32),                  # overflow
        lambda rng, n: (np.arange(n) % 2).astype(np.int32),
        lambda rng, n: (rng.integers(0, 2, n)
                        * rng.integers(0, 100, n)).astype(np.int32),
    ])
    def test_skew_and_overflow_fallback(self, rng, tie_maker):
        # degenerate distributions overflow the bucket capacities; the
        # wrapper must fall back to the odd-even path, never drop data
        mesh = make_mesh(8)
        n = 8 * 128
        k = tie_maker(rng, n)
        pay = np.arange(n, dtype=np.int32)
        ks, ps = map(np.asarray,
                     sharded_sample_sort((k, pay), num_keys=1, mesh=mesh))
        assert np.array_equal(ks, np.sort(k))
        assert np.array_equal(np.sort(ps), pay)
        assert np.array_equal(k[ps], ks)

    def test_small_shards_delegate(self, rng):
        # shards below the sampling regime route straight to sharded_sort
        mesh = make_mesh(8)
        n = 8 * 4
        k = rng.integers(0, 100, n).astype(np.int32)
        (ks,) = sharded_sample_sort((k,), num_keys=1, mesh=mesh)
        assert np.array_equal(np.asarray(ks), np.sort(k))


class TestShardedSuffixArray:
    @pytest.mark.parametrize("n", [5, 63, 64, 200, 1000])
    def test_matches_oracle(self, rng, n):
        mesh = make_mesh(8)
        text = rng.integers(0, 6, n).astype(np.int64)
        got = suffix_array_sharded(text, mesh=mesh)
        want = oracle.suffix_array(text)
        assert np.array_equal(got, want), n

    def test_repetitive_text(self, rng):
        mesh = make_mesh(8)
        text = np.repeat(rng.integers(0, 2, 20), 30).astype(np.int64)
        assert np.array_equal(suffix_array_sharded(text, mesh=mesh),
                              oracle.suffix_array(text))

    @pytest.mark.parametrize("n", [200, 1000])
    def test_sample_sort_rounds_match_oracle(self, rng, n):
        # sample-sort doubling rounds (with per-round odd-even fallback on
        # capacity overflow) must produce the identical suffix array
        mesh = make_mesh(8)
        text = rng.integers(0, 6, n).astype(np.int64)
        got = suffix_array_sharded(text, mesh=mesh, sort_method="sample")
        assert np.array_equal(got, oracle.suffix_array(text))

    def test_sample_sort_repetitive(self, rng):
        # heavy rank ties force fallback rounds; output must be unchanged
        mesh = make_mesh(8)
        text = np.repeat(rng.integers(0, 2, 20), 30).astype(np.int64)
        got = suffix_array_sharded(text, mesh=mesh, sort_method="sample")
        assert np.array_equal(got, oracle.suffix_array(text))

    def test_rejects_unknown_method(self, rng):
        with pytest.raises(ValueError, match="sort_method"):
            suffix_array_sharded(np.zeros(64, np.int64),
                                 mesh=make_mesh(8), sort_method="quantum")


class TestShardedBWTBuild:
    def test_matches_oracle(self, rng):
        mesh = make_mesh(8)
        col = oracle.random_collection(rng, 40, 10, 60)
        got = build_bwt_sharded(col, mesh=mesh)
        want = oracle.build_bwt(col)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)

    def test_matches_single_device_build(self, rng):
        from bwtmerge_tpu.ops.sa_jax import build_bwt_device

        mesh = make_mesh(8)
        col = oracle.random_collection(rng, 25, 5, 40)
        got = build_bwt_sharded(col, mesh=mesh)
        want = build_bwt_device(col)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)


class TestShardedRLO:
    @pytest.mark.parametrize("m", [1, 7, 8, 40, 100])
    def test_matches_host_order(self, rng, m):
        from bwtmerge_tpu.models.build import rlo_order

        mesh = make_mesh(8)
        seqs = [rng.integers(1, 6, rng.integers(1, 35))
                for _ in range(m)]
        got = rlo_order_sharded(seqs, mesh=mesh)
        want = rlo_order(seqs)
        assert np.array_equal(got, want)

    def test_sample_method_matches(self, rng):
        from bwtmerge_tpu.models.build import rlo_order

        mesh = make_mesh(8)
        seqs = [rng.integers(1, 6, rng.integers(1, 35)) for _ in range(64)]
        got = rlo_order_sharded(seqs, mesh=mesh, sort_method="sample")
        assert np.array_equal(got, rlo_order(seqs))

    def test_duplicate_reads_stay_stable(self, rng):
        # equal reads must keep original order (np.lexsort is stable);
        # the sharded sort adds the index as a tie-breaking key
        from bwtmerge_tpu.models.build import rlo_order

        mesh = make_mesh(8)
        base = [rng.integers(1, 6, 12) for _ in range(5)]
        seqs = [base[i % 5] for i in range(50)]
        got = rlo_order_sharded(seqs, mesh=mesh)
        assert np.array_equal(got, rlo_order(seqs))

    def test_sharded_rlo_build_matches_host(self, rng):
        from bwtmerge_tpu.models.build import build_from_reads

        col = oracle.random_collection(rng, 30, 8, 50)
        got, got_order = build_from_reads(col, rlo=True, backend="sharded")
        want, want_order = build_from_reads(col, rlo=True, backend="numpy")
        assert np.array_equal(got_order, want_order)
        assert np.array_equal(got.syms, want.syms)
        assert np.array_equal(got.lens, want.lens)
