"""RLE codec: Python spec vs C++ runtime, byte-level invariants."""

import numpy as np
import pytest

from bwtmerge_tpu.formats import codec
from bwtmerge_tpu.models.runs import RunArrays
from bwtmerge_tpu import native


def random_runs(rng, n, max_len=100):
    syms = rng.integers(0, 6, n).astype(np.uint8)
    # make maximal
    for i in range(1, n):
        if syms[i] == syms[i - 1]:
            syms[i] = (syms[i] + 1) % 6
    lens = rng.integers(1, max_len, n).astype(np.int64)
    return syms, lens


class TestPythonCodec:
    def test_roundtrip_small(self, rng):
        syms, lens = random_runs(rng, 200)
        data = codec.encode_runs(syms, lens)
        d_syms, d_lens = codec.decode_runs(data)
        got = RunArrays.from_runs(d_syms, d_lens)
        assert got == RunArrays(syms, lens)

    def test_roundtrip_long_runs(self, rng):
        """Runs long enough to need varints and block splitting."""
        syms = np.array([1, 2, 3, 4, 5, 1], np.uint8)
        lens = np.array([42, 43, 1000, 10**6, 41, 10**9], np.int64)
        data = codec.encode_runs(syms, lens)
        d_syms, d_lens = codec.decode_runs(data)
        assert RunArrays.from_runs(d_syms, d_lens) == RunArrays(syms, lens)

    def test_run_of_42_has_zero_varint(self):
        """A run of exactly MAX_RUN encodes as head byte + 0x00 (support.h:261-279)."""
        data = codec.encode_runs([3], [42])
        assert len(data) == 2
        assert data[0] == 3 + 6 * 41
        assert data[1] == 0

    def test_single_byte_runs(self):
        for l in range(1, 42):
            data = codec.encode_runs([2], [l])
            assert len(data) == 1
            assert data[0] == 2 + 6 * (l - 1)

    def test_no_multibyte_crosses_block(self, rng):
        """No multi-byte encoding crosses a 64-byte boundary: every byte at a
        block start must be a head byte (the decoder can start at any block)."""
        syms, lens = random_runs(rng, 300, max_len=5000)
        data = codec.encode_runs(syms, lens)
        # Decode each 64-byte block independently; total must match.
        total = 0
        for start in range(0, len(data), 64):
            block = data[start : start + 64]
            _, d_lens = codec.decode_runs(block)
            total += int(d_lens.sum())
        assert total == int(lens.sum())

    def test_offsets(self, rng):
        syms, lens = random_runs(rng, 50, max_len=300)
        data = codec.encode_runs(syms, lens)
        d_syms, d_lens, offsets = codec.decode_runs_with_offsets(data)
        assert offsets[0] == 0
        assert np.all(np.diff(offsets) > 0)


class TestNativeCodec:
    def test_matches_python_bytes(self, rng):
        for trial in range(5):
            syms, lens = random_runs(rng, 500, max_len=10000)
            py = codec.encode_runs(syms, lens)
            cc = native.rle_encode(syms, lens)
            assert py == cc

    def test_decode_matches_python(self, rng):
        syms, lens = random_runs(rng, 500, max_len=10000)
        data = codec.encode_runs(syms, lens)
        py_s, py_l = codec.decode_runs(data)
        cc_s, cc_l = native.rle_decode(data)
        assert np.array_equal(py_s, cc_s)
        assert np.array_equal(py_l, cc_l)

    def test_decode_offsets(self, rng):
        syms, lens = random_runs(rng, 100, max_len=10000)
        data = codec.encode_runs(syms, lens)
        _, _, py_off = codec.decode_runs_with_offsets(data)
        _, _, cc_off = native.rle_decode(data, with_offsets=True)
        assert np.array_equal(py_off, cc_off)

    def test_hash_matches_python(self, rng):
        from bwtmerge_tpu.utils.hashing import fnv1a_runs

        syms, lens = random_runs(rng, 20, max_len=30)
        assert native.rle_hash(syms, lens) == fnv1a_runs(syms, lens)


class TestNativeInterleave:
    def test_matches_numpy(self, rng):
        from bwtmerge_tpu.ops import interleave_np
        from bwtmerge_tpu.models import oracle

        a_seqs = oracle.random_collection(rng, 4, 10, 40)
        b_seqs = oracle.random_collection(rng, 4, 10, 40)
        a = oracle.build_bwt(a_seqs)
        b = oracle.build_bwt(b_seqs)
        ra = oracle.rank_array_oracle(a_seqs, b_seqs)
        values, counts = np.unique(ra, return_counts=True)
        np_out = interleave_np.interleave(a, b, values, counts.astype(np.int64))
        cc_out = native.interleave_native(a, b, values, counts.astype(np.int64))
        assert np_out == cc_out
        assert cc_out.is_maximal()

    def test_parallel_matches_serial(self, rng):
        from bwtmerge_tpu.models import oracle

        # large enough that the parallel path engages (nra >= 4 * threads)
        a_seqs = oracle.random_collection(rng, 30, 30, 120)
        b_seqs = oracle.random_collection(rng, 30, 30, 120)
        a = oracle.build_bwt(a_seqs)
        b = oracle.build_bwt(b_seqs)
        ra = oracle.rank_array_oracle(a_seqs, b_seqs)
        values, counts = np.unique(ra, return_counts=True)
        counts = counts.astype(np.int64)
        serial = native.interleave_native(a, b, values, counts, threads=1)
        for t in (2, 3, 8):
            par = native.interleave_native(a, b, values, counts, threads=t)
            assert par == serial, f"threads={t}"
            assert par.is_maximal()

    def test_corrupt_rank_array_raises(self, rng):
        from bwtmerge_tpu.models import oracle

        a_seqs = oracle.random_collection(rng, 4, 10, 40)
        b_seqs = oracle.random_collection(rng, 4, 10, 40)
        a = oracle.build_bwt(a_seqs)
        b = oracle.build_bwt(b_seqs)
        ra = oracle.rank_array_oracle(a_seqs, b_seqs)
        values, counts = np.unique(ra, return_counts=True)
        counts = counts.astype(np.int64)

        import pytest

        # counts not covering |B| (a corrupt spill must error, not hang)
        with pytest.raises(ValueError):
            native.interleave_native(a, b, values[:-1], counts[:-1])
        # value beyond |A|
        bad_v = values.copy()
        bad_v[-1] = a.size() + 7
        with pytest.raises(ValueError):
            native.interleave_native(a, b, bad_v, counts)
        # chunked path: counts overrunning |B| mid-stream
        from bwtmerge_tpu.native import interleave_streaming

        over_c = counts.copy()
        over_c[0] += b.size()
        with pytest.raises(ValueError):
            interleave_streaming(a, b, iter([(values, over_c)]))


class TestNativeRaDecode:
    """native/src/radecode.cpp vs a straight numpy re-derivation."""

    @staticmethod
    def _numpy_ref(nib, esc, exc_idx, exc_d, exc_c, carry):
        delta = (nib & np.uint8(15)).astype(np.int64)
        counts = (nib >> 4).astype(np.int64)
        em = (nib & np.uint8(15)) == 15  # marker byte: escape lane
        delta[em] = esc[0].astype(np.int64)
        counts[em] = esc[1].astype(np.int64)
        if exc_idx.size:
            delta[exc_idx] = exc_d
            counts[exc_idx] = exc_c
        values = np.cumsum(delta) + carry
        head = np.ones(values.size, np.bool_)
        head[1:] = values[1:] != values[:-1]
        su = np.flatnonzero(head)
        return values[su], np.add.reduceat(counts, su)

    @staticmethod
    def _make_plane(rng, m, dup_rate=0.2, exc_rate=0.1, huge_rate=0.0):
        delta = rng.geometric(0.4, size=m).astype(np.int64)
        delta[rng.random(m) < dup_rate] = 0          # duplicate a-positions
        wide = rng.random(m) < exc_rate
        delta[wide] += 20                             # > 14: escape lane
        counts = rng.integers(1, 5, size=m).astype(np.int64)
        counts[rng.random(m) < 0.03] += 100           # > 15: escape lane
        if huge_rate:
            delta[rng.random(m) < huge_rate] += 1000  # > 254: exc4 row
        fits = (delta <= 14) & (counts <= 15)
        nib = np.where(fits, delta | (counts << 4), 15).astype(np.uint8)
        lanes = np.flatnonzero(~fits)
        fits8 = (delta <= 254) & (counts <= 254)
        esc = np.stack([np.where(fits8, delta, 255)[lanes],
                        np.where(fits8, counts, 255)[lanes]]).astype(np.uint8)
        exc_idx = np.flatnonzero(~fits8).astype(np.int64)
        return (nib, esc, exc_idx, delta[exc_idx].copy(),
                counts[exc_idx].copy(), delta, counts)

    def test_single_window_matches_numpy(self, rng):
        rng = np.random.default_rng(7)
        nib, esc, ei, ed, ec, delta, counts = self._make_plane(
            rng, 4096, huge_rate=0.02)
        assert ei.size > 0  # the >254 outlier path is exercised
        state = np.zeros(5, np.int64)
        v, c = native.ra_decode_nib_chunk(nib, esc, ei, ed, ec, state,
                                          finish=True)
        wv, wc = self._numpy_ref(nib, esc, ei, ed, ec, 0)
        assert np.array_equal(v, wv)
        assert np.array_equal(c, wc)
        assert np.all(np.diff(v) > 0)
        assert c.sum() == counts.sum()

    def test_windowed_stream_matches_one_shot(self, rng):
        rng = np.random.default_rng(8)
        nib, esc, ei, ed, ec, _, _ = self._make_plane(
            rng, 10_000, dup_rate=0.5, huge_rate=0.01)
        want_v, want_c = self._numpy_ref(nib, esc, ei, ed, ec, 0)
        for chunk in (37, 256, 9_999):
            state = np.zeros(5, np.int64)  # [4] = running escape cursor
            parts = []
            for s in range(0, nib.size, chunk):
                m = min(chunk, nib.size - s)
                lo = np.searchsorted(ei, s)
                hi = np.searchsorted(ei, s + m)
                parts.append(native.ra_decode_nib_chunk(
                    nib[s:s + m], esc, ei[lo:hi] - s, ed[lo:hi], ec[lo:hi],
                    state, finish=(s + m == nib.size)))
            v = np.concatenate([p[0] for p in parts])
            c = np.concatenate([p[1] for p in parts])
            assert np.array_equal(v, want_v), chunk
            assert np.array_equal(c, want_c), chunk
            # every yielded window is internally strictly ascending
            for pv, _ in parts:
                assert np.all(np.diff(pv) > 0)

    def test_escape_stream_overrun_raises(self, rng):
        rng = np.random.default_rng(9)
        nib, esc, ei, ed, ec, _, _ = self._make_plane(rng, 1000)
        state = np.zeros(5, np.int64)
        short = esc[:, :-1]  # one pair short
        with pytest.raises(ValueError):
            native.ra_decode_nib_chunk(nib, short, ei, ed, ec, state,
                                       finish=True)

    def test_all_duplicates_collapse_to_one_run(self):
        nib = np.full(64, 1 << 4, np.uint8)  # delta 0, count 1 everywhere
        none = np.zeros(0, np.int64)
        esc0 = np.zeros((2, 0), np.uint8)
        state = np.zeros(5, np.int64)
        v, c = native.ra_decode_nib_chunk(nib[:32], esc0, none, none, none,
                                          state, finish=False)
        assert v.size == 0  # whole window held as the pending run
        v, c = native.ra_decode_nib_chunk(nib[32:], esc0, none, none, none,
                                          state, finish=True)
        assert np.array_equal(v, [0]) and np.array_equal(c, [64])

    def test_empty_plane(self):
        none = np.zeros(0, np.int64)
        state = np.zeros(5, np.int64)
        v, c = native.ra_decode_nib_chunk(np.zeros(0, np.uint8),
                                          np.zeros((2, 0), np.uint8),
                                          none, none, none, state,
                                          finish=True)
        assert v.size == 0 and c.size == 0
