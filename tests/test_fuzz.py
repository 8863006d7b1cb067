"""Randomized merge fuzzing: many seeds, varied shapes, k-way folds, both
backends, spill and non-spill configurations — everything must agree with the
suffix-array oracle and the pattern-count invariant."""

import numpy as np
import pytest

from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi


def _fmi(seqs):
    return FMI.from_runs(oracle.build_bwt(seqs))


@pytest.mark.parametrize("seed", range(8))
def test_pairwise_fuzz(seed, tmp_path):
    rng = np.random.default_rng(1000 + seed)
    n_a = int(rng.integers(1, 12))
    n_b = int(rng.integers(1, 12))
    a_seqs = oracle.random_collection(rng, n_a, 1, int(rng.integers(2, 120)))
    b_seqs = oracle.random_collection(rng, n_b, 1, int(rng.integers(2, 120)))
    a, b = _fmi(a_seqs), _fmi(b_seqs)

    backend = "jax" if seed % 2 else "numpy"
    cfg = MergeConfig(backend=backend, temp_dir=str(tmp_path),
                      sequence_blocks=int(rng.integers(1, 5)))
    if seed % 3 == 0:  # force spills sometimes
        cfg.run_buffer_runs = 32
        cfg.merge_buffers = 2
        cfg.thread_buffer_mb = 0
    merged = merge_fmi(a, b, cfg)
    assert merged.runs == oracle.merge_collections([a_seqs, b_seqs])

    # pattern-count invariant on random probes
    for _ in range(4):
        src = a_seqs if rng.random() < 0.5 else b_seqs
        s = src[int(rng.integers(0, len(src)))]
        k = int(rng.integers(1, min(6, s.size + 1)))
        start = int(rng.integers(0, s.size - k + 1))
        p = s[start:start + k]
        assert merged.count(p) == a.count(p) + b.count(p)


def test_kway_fold_fuzz(tmp_path):
    rng = np.random.default_rng(777)
    colls = [oracle.random_collection(rng, int(rng.integers(1, 6)), 5, 60)
             for _ in range(5)]
    fmis = [_fmi(c) for c in colls]
    index = fmis[0]
    for inc in fmis[1:]:
        index = merge_fmi(index, inc, MergeConfig(backend="numpy",
                                                  temp_dir=str(tmp_path)))
    assert index.runs == oracle.merge_collections(colls)
    # hash is representation-independent and content-correct
    direct = FMI.from_runs(oracle.merge_collections(colls))
    assert index.hash() == direct.hash()


def test_pathological_shapes(tmp_path):
    """Single-base sequences, identical reads, one-sequence collections."""
    rng = np.random.default_rng(9)
    cases = [
        ([np.array([1])], [np.array([2])]),
        ([np.array([1, 1, 1, 1])] * 3, [np.array([1, 1, 1, 1])] * 2),
        ([rng.integers(1, 6, 50)], [rng.integers(1, 6, 3)]),
    ]
    for a_seqs, b_seqs in cases:
        a, b = _fmi(list(a_seqs)), _fmi(list(b_seqs))
        for backend in ("numpy", "jax"):
            merged = merge_fmi(a, b, MergeConfig(backend=backend,
                                                 temp_dir=str(tmp_path)))
            assert merged.runs == oracle.merge_collections([a_seqs, b_seqs])


@pytest.mark.parametrize("seed", range(6))
def test_windowed_interleave_fuzz(seed):
    """Windowed (bounded-memory) interleave vs the oracle under random
    window sizes, source chunkings, and RA chunkings — incl. degenerate
    single-run chunks and giant count/gap splits."""
    from bwtmerge_tpu.models.runs import RunArrays
    from bwtmerge_tpu.native.windowed import interleave_windowed_chunks
    from bwtmerge_tpu.ops.search_np import build_rank_array

    rng = np.random.default_rng(4242 + seed)
    n_a = int(rng.integers(1, 20))
    n_b = int(rng.integers(1, 20))
    a_seqs = oracle.random_collection(rng, n_a, 1, int(rng.integers(2, 150)))
    b_seqs = oracle.random_collection(rng, n_b, 1, int(rng.integers(2, 150)))
    a, b = _fmi(a_seqs), _fmi(b_seqs)
    v, c = build_rank_array(
        a.rank_index, a.alpha.C.astype(np.int64),
        b.rank_index, b.alpha.C.astype(np.int64),
        a.sequences(), b.sequences())

    def chunked(syms, lens, n):
        for s in range(0, syms.size, n):
            yield syms[s:s + n], lens[s:s + n]

    window = int(rng.integers(1, 5000))  # floor-clamped to 1024 inside
    src = int(rng.integers(1, 40))
    rac = int(rng.integers(1, max(2, v.size + 1)))
    got = [(s.copy(), l.copy()) for s, l in interleave_windowed_chunks(
        chunked(a.runs.syms, a.runs.lens, src),
        chunked(b.runs.syms, b.runs.lens, src),
        chunked(v, c, rac), window_positions=window)]
    if got:
        syms = np.concatenate([p[0] for p in got])
        lens = np.concatenate([p[1] for p in got])
        merged = RunArrays.from_runs(syms, lens)
        assert np.all(syms[1:] != syms[:-1])
    else:
        merged = RunArrays.empty()
    assert merged == oracle.merge_collections([a_seqs, b_seqs])
