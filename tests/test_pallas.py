"""Streamed-rank Pallas kernel (ops/rank_pallas.py) vs the gather path.

Runs in interpreter mode on the CPU test mesh; the compiled kernel is
exercised and benchmarked on real TPU hardware by bench.py (BENCH_r02:
~3.3 ns/query marginal vs ~33 ns/query for the XLA gather at Q = 1M).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.ops.rank_jax import LANES, DeviceFMIndex
from bwtmerge_tpu.ops.rank_pallas import (HAVE_PALLAS, ranks_all_unsorted,
                                          streamed_probe, streamed_ranks_all)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="no pallas backend")


@pytest.fixture(scope="module")
def index(request):
    rng = np.random.default_rng(3)
    runs = oracle.build_bwt(oracle.random_collection(rng, 60, 100, 400))
    return DeviceFMIndex.build(runs, runs.counts(6)), runs


class TestStreamedRanks:
    def test_sorted_matches_gather(self, index, rng):
        idx, runs = index
        n = runs.size()
        q = np.sort(rng.integers(0, n + 1, size=1000)).astype(np.int32)
        want = np.asarray(idx.ranks_all(jnp.asarray(q)))
        got = np.asarray(streamed_ranks_all(idx, jnp.asarray(q),
                                            interpret=True))
        assert np.array_equal(got, want)

    def test_unsorted_wrapper(self, index, rng):
        idx, runs = index
        n = runs.size()
        q = rng.integers(0, n + 1, size=500).astype(np.int32)
        want = np.asarray(idx.ranks_all(jnp.asarray(q)))
        got = np.asarray(ranks_all_unsorted(idx, jnp.asarray(q),
                                            interpret=True))
        assert np.array_equal(got, want)

    def test_symbol_row_matches_access(self, index, rng):
        idx, runs = index
        n = runs.size()
        q = np.sort(rng.integers(0, n, size=400)).astype(np.int32)
        out = np.asarray(streamed_probe(idx.rec, jnp.asarray(q),
                                        interpret=True))
        want_sym = np.asarray(idx.access(jnp.asarray(q)))
        assert np.array_equal(out[LANES], want_sym)

    def test_sentinel_tail_is_ignored(self, index, rng):
        idx, runs = index
        n = runs.size()
        q = np.sort(rng.integers(0, n + 1, size=300)).astype(np.int32)
        sent = np.full(100, 2**31 - 1, dtype=np.int32)
        out = np.asarray(streamed_ranks_all(
            idx, jnp.asarray(np.concatenate([q, sent])), interpret=True))
        want = np.asarray(idx.ranks_all(jnp.asarray(q)))
        assert np.array_equal(out[:300], want)


class TestStreamedSearchDriver:
    def test_streamed_search_matches_numpy(self, rng):
        """Full streamed-probe search driver (tiny workload — interpreter
        mode runs every probe through the Pallas emulator)."""
        from bwtmerge_tpu.models.fmi import FMI
        from bwtmerge_tpu.ops import search_np
        from bwtmerge_tpu.ops.search_jax import wavefront_search_device2
        from bwtmerge_tpu.ops.search_np import compact_rank_array

        a_seqs = oracle.random_collection(rng, 5, 8, 14)
        b_seqs = oracle.random_collection(rng, 4, 8, 14)
        a = FMI.from_runs(oracle.build_bwt(a_seqs))
        b = FMI.from_runs(oracle.build_bwt(b_seqs))
        want = search_np.build_rank_array(
            a.rank_index, a.alpha.C.astype(np.int64),
            b.rank_index, b.alpha.C.astype(np.int64),
            a.sequences(), b.sequences())

        a_idx = DeviceFMIndex.build(a.runs, a.alpha.counts())
        b_idx = DeviceFMIndex.build(b.runs, b.alpha.counts())
        v, c, n, ovf = wavefront_search_device2(
            a_idx, b_idx, jnp.int32(0), jnp.int32(b.sequences() - 1),
            a.sequences(), frontier_cap=512, emit_cap=2048, streamed=True)
        assert not bool(ovf)
        n = int(n)
        got = compact_rank_array(np.asarray(v[:n], np.int64),
                                 np.asarray(c[:n], np.int64))
        assert np.array_equal(got[0], want[0])
        assert np.array_equal(got[1], want[1])


class TestBackwardSearchStreamed:
    def test_matches_gather_search(self, index, rng):
        from bwtmerge_tpu.ops.rank_jax import backward_search
        from bwtmerge_tpu.ops.rank_pallas import backward_search_streamed

        idx, runs = index
        q, max_len = 128, 12
        pats = rng.integers(1, 6, size=(q, max_len)).astype(np.int32)
        lens = rng.integers(1, max_len + 1, q).astype(np.int32)
        sp_w, ep_w = backward_search(idx, jnp.asarray(pats),
                                     jnp.asarray(lens), max_len)
        sp_g, ep_g = backward_search_streamed(idx, jnp.asarray(pats),
                                              jnp.asarray(lens), max_len,
                                              interpret=True)
        assert np.array_equal(np.asarray(sp_g), np.asarray(sp_w))
        assert np.array_equal(np.asarray(ep_g), np.asarray(ep_w))
