"""K-way pairwise-decomposition fold (models/kfold.py, ops/kfold_jax.py)
vs the sequential left-fold oracle.

The decomposition's correctness hinges on two delicate facts the tests pin:
per-suffix alignment of the summed sorted walks (monotonicity argument) and
the endmarker tie convention (earlier pieces' endmarkers first — the
reference root-run convention, fmi.cpp:286-287).  Duplicate reads ACROSS
pieces exercise the tie-breaking hardest.
"""

import numpy as np
import pytest

from bwtmerge_tpu.models.build import build_from_reads
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.kfold import merge_files_many, merge_fmi_many
from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _random_reads(rng, n, max_len=30):
    return [rng.integers(1, 6, size=int(rng.integers(1, max_len))
                         ).astype(np.uint8) for _ in range(n)]


def _fmi(reads):
    runs, _ = build_from_reads(reads, backend="numpy")
    return FMI.from_runs(runs)


def _leftfold(reads_list, tmp_path):
    fmis = [_fmi(r) for r in reads_list]
    acc = fmis[0]
    for f in fmis[1:]:
        acc = merge_fmi(acc, f, MergeConfig(backend="numpy",
                                            temp_dir=str(tmp_path)))
    return acc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_merge_many_equals_leftfold(tmp_path, seed):
    rng = np.random.default_rng(seed)
    reads_list = [_random_reads(rng, int(rng.integers(2, 10)))
                  for _ in range(4)]
    # duplicate reads across pieces: the hardest tie case
    reads_list[2][0] = reads_list[0][0].copy()
    reads_list[3][-1] = reads_list[1][0].copy()

    want = _leftfold(reads_list, tmp_path)
    got = merge_fmi_many([_fmi(r) for r in reads_list],
                         MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    np.testing.assert_array_equal(got.runs.syms, want.runs.syms)
    np.testing.assert_array_equal(got.runs.lens, want.runs.lens)
    np.testing.assert_array_equal(got.alpha.C, want.alpha.C)
    assert got.hash() == want.hash()


def test_merge_many_identical_pieces(tmp_path):
    # every piece identical: maximal duplicate-suffix pressure
    rng = np.random.default_rng(7)
    reads = _random_reads(rng, 5, 12)
    reads_list = [list(reads) for _ in range(3)]
    want = _leftfold(reads_list, tmp_path)
    got = merge_fmi_many([_fmi(r) for r in reads_list],
                         MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    assert got.runs == want.runs


def test_merge_many_single_char_reads(tmp_path):
    reads_list = [
        [np.array([2], np.uint8), np.array([3, 1], np.uint8)],
        [np.array([5], np.uint8)],
        [np.array([1], np.uint8), np.array([1], np.uint8)],
    ]
    want = _leftfold(reads_list, tmp_path)
    got = merge_fmi_many([_fmi(r) for r in reads_list],
                         MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    assert got.runs == want.runs


def test_merge_files_many_streaming(tmp_path, rng):
    from bwtmerge_tpu.formats import read_bwt, write_bwt

    reads_list = [_random_reads(rng, 8) for _ in range(3)]
    paths = []
    for i, reads in enumerate(reads_list):
        f = _fmi(reads)
        p = str(tmp_path / f"p{i}.sga")
        write_bwt(p, "sga", f.runs, f.alpha)
        paths.append(p)
    out = str(tmp_path / "merged.native")
    stats = {}
    merge_files_many(paths, out, "sga", "native",
                     MergeConfig(backend="jax", temp_dir=str(tmp_path)),
                     window_positions=256, stats=stats)
    got, _, got_alpha = read_bwt(out, "native")
    want = _leftfold(reads_list, tmp_path)
    assert got == want.runs
    np.testing.assert_array_equal(got_alpha.C, want.alpha.C)
    assert stats.get("fold_steps") == 2


def test_merge_files_many_trie_fallback(tmp_path, rng, monkeypatch):
    from bwtmerge_tpu.formats import read_bwt, write_bwt

    monkeypatch.setenv("BWTMERGE_SEARCH", "trie")
    reads_list = [_random_reads(rng, 5) for _ in range(3)]
    paths = []
    for i, reads in enumerate(reads_list):
        f = _fmi(reads)
        p = str(tmp_path / f"p{i}.sga")
        write_bwt(p, "sga", f.runs, f.alpha)
        paths.append(p)
    out = str(tmp_path / "merged.sga")
    merge_files_many(paths, out, "sga", "sga",
                     MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    got, _, _ = read_bwt(out, "sga")
    want = _leftfold(reads_list, tmp_path)
    assert got == want.runs


def test_merge_many_mismatched_alphabet(tmp_path, rng):
    from bwtmerge_tpu.utils.alphabet import AlphabeticOrder, create_alphabet

    a = _fmi(_random_reads(rng, 3))
    b = _fmi(_random_reads(rng, 3))
    sorted_alpha = create_alphabet(AlphabeticOrder.SORTED)
    sorted_alpha.C = b.alpha.C.copy()
    b.alpha = sorted_alpha
    with pytest.raises(ValueError, match="alphabet"):
        merge_fmi_many([a, b, a], MergeConfig(backend="jax",
                                              temp_dir=str(tmp_path)))


def test_cli_kway_fold(tmp_path, rng):
    from bwtmerge_tpu.cli.bwt_merge import main as merge_main
    from bwtmerge_tpu.formats import read_bwt, write_bwt

    reads_list = [_random_reads(rng, 6) for _ in range(3)]
    paths = []
    for i, reads in enumerate(reads_list):
        f = _fmi(reads)
        p = str(tmp_path / f"p{i}.sga")
        write_bwt(p, "sga", f.runs, f.alpha)
        paths.append(p)
    # patterns: first read of each piece as characters
    pat_file = str(tmp_path / "pats.txt")
    with open(pat_file, "w") as fh:
        for reads in reads_list:
            fh.write("".join("$ACGTN"[c] for c in reads[0]) + "\n")
    out = str(tmp_path / "out.sga")
    rc = merge_main(paths + [out, "-i", "sga", "-o", "sga", "--quiet",
                             "--backend", "jax", "--fold", "kway",
                             "-v", pat_file, "-d", str(tmp_path)])
    assert rc == 0
    got, _, _ = read_bwt(out, "sga")
    want = _leftfold(reads_list, tmp_path)
    assert got == want.runs
