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
