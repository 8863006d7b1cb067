"""Walk search (ops/walk_jax.py): the per-read backward-walk fast path.

Pins the round-4 claim the module is built on: the walk's emissions are the
SAME rank-array multiset as the reverse-trie search's (buildRA,
reference fmi.cpp:261-334) — verified against the numpy trie oracle — plus
the c-plane rank primitive, the device decode, the sidecar round trip, and
the end-to-end merge equality walk vs trie.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from bwtmerge_tpu.formats.sidecar import (creads_layout, load_creads,
                                          sidecar_path, write_sidecar,
                                          write_sidecar_reads)
from bwtmerge_tpu.models.build import build_from_reads
from bwtmerge_tpu.models.fmi import FMI
from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi
from bwtmerge_tpu.ops.search_np import build_rank_array, compact_rank_array
from bwtmerge_tpu.ops.walk_jax import (blocked_walk_and_pack, build_cplanes,
                                       decode_creads, walk_and_pack_device,
                                       _rank_known_char)


def _random_reads(rng, n, max_len=30):
    return [rng.integers(1, 6, size=int(rng.integers(1, max_len))
                         ).astype(np.uint8) for _ in range(n)]


def _fmi(reads):
    runs, _ = build_from_reads(reads, backend="numpy")
    return FMI.from_runs(runs)


def _creads_of(reads):
    lens = np.array([len(r) for r in reads], np.uint32)
    flat = np.concatenate([np.asarray(r, np.uint8) for r in reads])
    return creads_layout(lens, flat)


def _trie_ra(a, b):
    return build_rank_array(a.rank_index, a.alpha.C.astype(np.int64),
                            b.rank_index, b.alpha.C.astype(np.int64),
                            a.sequences(), b.sequences())


def test_cplane_rank_matches_rank_index(rng):
    reads = _random_reads(rng, 8, 60)
    a = _fmi(reads)
    idx = a.device_index
    cpl = build_cplanes(idx.rec)
    q = rng.integers(0, a.size() + 1, size=257).astype(np.int32)
    c = rng.integers(1, 6, size=257).astype(np.int32)
    got = np.asarray(_rank_known_char(cpl, idx.C, jnp.asarray(q),
                                      jnp.asarray(c)))
    want = (a.alpha.C.astype(np.int64)[c]
            + a.rank_index.rank(q.astype(np.int64), c.astype(np.int64)))
    np.testing.assert_array_equal(got, want)


def test_cplanes_slab_matches_oneshot(rng, monkeypatch):
    """The slab-chunked cplane builder (large record tables whose one-shot
    program the remote compiler rejects) must equal the one-shot result,
    including the clamped-and-trimmed final slab."""
    from bwtmerge_tpu.ops import walk_jax

    a = _fmi(_random_reads(rng, 30, 40))
    rec = a.device_index.rec
    full = np.asarray(walk_jax._cplanes_of(rec))
    monkeypatch.setattr(walk_jax, "CPLANE_SLAB", 8)
    slabbed = np.asarray(walk_jax.build_cplanes(rec))
    np.testing.assert_array_equal(full, slabbed)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_walk_pack_equals_trie_oracle(rng, seed):
    r = np.random.default_rng(seed)
    a = _fmi(_random_reads(r, int(r.integers(2, 10))))
    reads_b = _random_reads(r, int(r.integers(2, 10)))
    b = _fmi(reads_b)
    want_v, want_k = _trie_ra(a, b)

    creads = _creads_of(reads_b)
    packed = blocked_walk_and_pack(a.device_index, creads, n_blocks=2,
                                   a_sequences=a.sequences())
    got_v, got_k = packed.finish()
    got_v, got_k = compact_rank_array(got_v, got_k)
    np.testing.assert_array_equal(got_v, want_v)
    np.testing.assert_array_equal(got_k, want_k)


def test_walk_single_program_contract(rng):
    a = _fmi(_random_reads(rng, 5))
    reads_b = _random_reads(rng, 7)
    b = _fmi(reads_b)
    creads = _creads_of(reads_b)
    idx = a.device_index
    cpl = build_cplanes(idx.rec)
    dc8, meta, exc4, esc = walk_and_pack_device(
        cpl, idx.C, jnp.asarray(creads), jnp.int32(a.sequences()),
        jnp.int32(len(reads_b)))
    from bwtmerge_tpu.ops.search_jax import unpack_search

    v, k, ovf = unpack_search(dc8, meta, exc4, esc)
    assert not ovf
    want_v, want_k = _trie_ra(a, b)
    np.testing.assert_array_equal(v, want_v)
    np.testing.assert_array_equal(k, want_k)


def test_decode_creads_roundtrip(rng):
    reads = _random_reads(rng, 9, 40)
    b = _fmi(reads)
    creads = decode_creads(b.device_index, b.sequences(), b.size())
    assert creads is not None
    # decoded lanes are the same multiset of reads (order may differ)
    dec = []
    for i in range(creads.shape[1]):
        col = creads[:, i]
        n = int((col > 0).sum())
        assert (col[:n] > 0).all() and (col[n:] == 0).all()
        if n:                                 # bucket-pad lanes are empty
            dec.append(tuple(int(x) for x in col[:n][::-1]))  # text order
    assert sorted(dec) == sorted(tuple(int(x) for x in r) for r in reads)


def test_sidecar_roundtrip(tmp_path, rng):
    reads = _random_reads(rng, 6)
    p = str(tmp_path / "x.bwt")
    write_sidecar_reads(sidecar_path(p), reads)
    creads = load_creads(sidecar_path(p))
    np.testing.assert_array_equal(creads, _creads_of(reads))


def test_merge_walk_equals_trie(rng, tmp_path, monkeypatch):
    reads_a = _random_reads(rng, 6)
    reads_b = _random_reads(rng, 8)
    a1, b1 = _fmi(reads_a), _fmi(reads_b)
    a2, b2 = _fmi(reads_a), _fmi(reads_b)
    b1.attach_creads(_creads_of(reads_b))

    monkeypatch.setenv("BWTMERGE_SEARCH", "walk")
    m_walk = merge_fmi(a1, b1, MergeConfig(backend="jax",
                                           temp_dir=str(tmp_path)))
    monkeypatch.setenv("BWTMERGE_SEARCH", "trie")
    m_trie = merge_fmi(a2, b2, MergeConfig(backend="jax",
                                           temp_dir=str(tmp_path)))
    np.testing.assert_array_equal(m_walk.runs.syms, m_trie.runs.syms)
    np.testing.assert_array_equal(m_walk.runs.lens, m_trie.runs.lens)
    assert m_walk.hash() == m_trie.hash()


def test_merge_walk_forced_decodes_without_sidecar(rng, tmp_path, monkeypatch):
    reads_a = _random_reads(rng, 4)
    reads_b = _random_reads(rng, 5)
    a1, b1 = _fmi(reads_a), _fmi(reads_b)
    a2, b2 = _fmi(reads_a), _fmi(reads_b)

    monkeypatch.setenv("BWTMERGE_SEARCH", "walk")
    m_walk = merge_fmi(a1, b1, MergeConfig(backend="jax",
                                           temp_dir=str(tmp_path)))
    monkeypatch.delenv("BWTMERGE_SEARCH")
    m_ref = merge_fmi(a2, b2, MergeConfig(backend="numpy",
                                          temp_dir=str(tmp_path)))
    assert m_walk.hash() == m_ref.hash()
    np.testing.assert_array_equal(m_walk.runs.syms, m_ref.runs.syms)


@pytest.mark.skipif(not os.environ.get("BWTMERGE_SLOW_TESTS"),
                    reason="needs the full 26M-lane shape (minutes); "
                           "set BWTMERGE_SLOW_TESTS=1")
def test_walk_pack_bench_scale_block():
    """Regression guard for the emission-buffer aliasing bug: at the bench
    shape (524288 lanes x 50 steps) XLA CPU aliased the while_loop-carried
    emission buffer and downstream in-jit consumers read 128 stale lanes
    (host copies of the same buffer were correct).  This runs the scan-based
    _walk_emit + concatenate pack at 131072 lanes x 50 steps — a quarter of
    the racing shape, full-shape check lives in the bench pipeline — and
    must round-trip exactly."""
    r = np.random.default_rng(7)
    m_a, m_b, L = 200_000, 524_288 // 4, 50  # small A, full-bucket B lanes
    flat_a = r.integers(1, 5, size=m_a * L).astype(np.int32)
    a = _fmi((flat_a, np.full(m_a, L, np.int64)))
    flat_b = r.integers(1, 5, size=m_b * L).astype(np.int32)
    creads = creads_layout(np.full(m_b, L, np.uint32),
                           flat_b.astype(np.uint8))
    from bwtmerge_tpu.ops.walk_jax import _SENT, _walk_emit, build_cplanes

    idx = a.device_index
    cpl = build_cplanes(idx.rec)
    emits, n_live = _walk_emit(cpl, idx.C, jnp.asarray(creads),
                               jnp.int32(a.sequences()))
    ev = np.asarray(emits).reshape(-1)
    assert int(n_live) == m_b * L and (ev != _SENT).all()
    vals = np.sort(np.concatenate([ev.astype(np.int64),
                                   [a.sequences()]]))
    packed = blocked_walk_and_pack(idx, creads, n_blocks=1,
                                   a_sequences=a.sequences())
    got_v, got_k = packed.finish()
    assert int(got_k.sum()) == m_b * L + m_b
    keep = np.ones(vals.size, bool)
    keep[1:] = vals[1:] != vals[:-1]
    st = np.flatnonzero(keep)
    uv = vals[st]
    uc = np.add.reduceat(
        np.concatenate([np.ones(ev.size, np.int64), [m_b]])[np.argsort(
            np.concatenate([ev.astype(np.int64), [a.sequences()]]),
            kind="stable")], st)
    np.testing.assert_array_equal(got_v, uv)
    np.testing.assert_array_equal(got_k, uc)


def test_walk_empty_and_single_char_reads(tmp_path, monkeypatch):
    # 1-char reads: each contributes exactly one emission beyond the root
    reads_a = [np.array([2], np.uint8), np.array([3, 1, 4], np.uint8)]
    reads_b = [np.array([5], np.uint8), np.array([1], np.uint8),
               np.array([2, 2], np.uint8)]
    a, b = _fmi(reads_a), _fmi(reads_b)
    b.attach_creads(_creads_of(reads_b))
    monkeypatch.setenv("BWTMERGE_SEARCH", "walk")
    m = merge_fmi(a, b, MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    a2, b2 = _fmi(reads_a), _fmi(reads_b)
    m_ref = merge_fmi(a2, b2, MergeConfig(backend="numpy",
                                          temp_dir=str(tmp_path)))
    assert m.hash() == m_ref.hash()


def test_sidecar_hash_rejects_corruption(tmp_path, rng):
    # v2 sidecars carry an FNV-1a of the packed chars; a flipped byte in
    # the chars region must fail the load (round-5 trust-gate hardening)
    p = str(tmp_path / "x.sga")
    reads = _random_reads(rng, 6)
    write_sidecar_reads(sidecar_path(p), reads)
    raw = bytearray(open(sidecar_path(p), "rb").read())
    raw[-1] ^= 0x0F  # corrupt a packed char byte
    open(sidecar_path(p), "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="hash mismatch"):
        load_creads(sidecar_path(p))


def test_composition_matched_wrong_sidecar_rejected(tmp_path, monkeypatch):
    # A sidecar whose reads are a ROTATION of B's true reads has identical
    # read count and per-character totals (the round-4 gate accepted it and
    # corrupted silently) — the LF spot-walk must reject it, and the merge
    # must fall back to the trie and still produce the correct result.
    reads_b = [np.full(i + 2, (i % 5) + 1, np.uint8) for i in range(6)]
    reads_a = [np.array([1, 2, 3], np.uint8), np.array([4, 4], np.uint8)]
    a, b = _fmi(reads_a), _fmi(reads_b)
    rotated = reads_b[1:] + reads_b[:1]   # every lane's content changes

    from bwtmerge_tpu.models.merge import _creads_consistent

    assert _creads_consistent(_creads_of(reads_b), b)
    assert not _creads_consistent(_creads_of(rotated), b)

    b.attach_creads(_creads_of(rotated))
    b.creads_path = None
    monkeypatch.setenv("BWTMERGE_SEARCH", "auto")
    m = merge_fmi(a, b, MergeConfig(backend="jax", temp_dir=str(tmp_path)))
    a2, b2 = _fmi(reads_a), _fmi(reads_b)
    m_ref = merge_fmi(a2, b2, MergeConfig(backend="numpy",
                                          temp_dir=str(tmp_path)))
    assert m.hash() == m_ref.hash()


def test_sparse_rank_matches_full(rng):
    from bwtmerge_tpu.ops.rank_np import SparseRankIndex

    reads = _random_reads(rng, 40, 80)
    f = _fmi(reads)
    sparse = SparseRankIndex.build(f.runs, f.alpha.sigma, stride=8)
    q = rng.integers(0, f.size(), size=200).astype(np.int64)
    want_r, want_s = f.rank_index.inverse_select(q)
    got_r, got_s = sparse.inverse_select(q)
    np.testing.assert_array_equal(got_s, want_s)
    np.testing.assert_array_equal(got_r, want_r)


def test_mesh_walk_equals_numpy(rng, tmp_path, monkeypatch):
    # multi-device walk: lanes sharded over the 8-device CPU mesh,
    # cplanes replicated (round-5: merge no longer forces trie at n_dev>1)
    reads_a = _random_reads(rng, 10, 40)
    # skewed mix: a few 10x-longer reads (weighted lane shards must balance)
    reads_b = _random_reads(rng, 12, 12) + _random_reads(rng, 2, 120)
    a, b = _fmi(reads_a), _fmi(reads_b)
    b.attach_creads(_creads_of(reads_b))
    monkeypatch.setenv("BWTMERGE_SEARCH", "walk")
    m = merge_fmi(a, b, MergeConfig(backend="jax", devices=8,
                                    temp_dir=str(tmp_path)))
    a2, b2 = _fmi(reads_a), _fmi(reads_b)
    m_ref = merge_fmi(a2, b2, MergeConfig(backend="numpy",
                                          temp_dir=str(tmp_path)))
    np.testing.assert_array_equal(m.runs.syms, m_ref.runs.syms)
    np.testing.assert_array_equal(m.runs.lens, m_ref.runs.lens)


def test_sharded_walk_balance_skewed(rng):
    # the per-device emitted-run balance bound must hold under an
    # adversarial mix (10% of reads 10x longer, clustered at the end)
    from bwtmerge_tpu.parallel.mesh import (make_mesh,
                                            sharded_walk_packed_ra)

    reads_a = _random_reads(rng, 8, 30)
    reads_b = [rng.integers(1, 6, size=12).astype(np.uint8)
               for _ in range(72)] + \
              [rng.integers(1, 6, size=120).astype(np.uint8)
               for _ in range(8)]
    a = _fmi(reads_a)
    creads = _creads_of(reads_b)
    mesh = make_mesh(8)
    packed = sharded_walk_packed_ra(a.device_index, creads, mesh=mesh,
                                    a_sequences=a.sequences())
    per_dev = [int(m[3, 0]) for _, m, _, _ in packed.shards]
    balance = max(per_dev) / max(min(per_dev), 1)
    assert balance <= 1.5, f"walk lane balance too skewed: {per_dev}"
    # and the merged multiset must equal the single-device walk's
    from bwtmerge_tpu.ops.search_np import compact_sorted_rank_array

    vs, cs = packed.finish()
    want_v, want_c = _trie_ra(a, _fmi(reads_b))
    np.testing.assert_array_equal(vs, want_v)
    np.testing.assert_array_equal(cs, want_c)
