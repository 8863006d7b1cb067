"""File format round-trips and byte-level layout checks."""

import struct

import numpy as np
import pytest

from bwtmerge_tpu.formats import (
    FORMATS, read_bwt, write_bwt, NativeHeader, RopeHeader, SGAHeader,
)
from bwtmerge_tpu.formats import sdsl_compat as sdsl
from bwtmerge_tpu.models import oracle
from bwtmerge_tpu.models.runs import RunArrays
from bwtmerge_tpu.utils.alphabet import Alphabet, AlphabeticOrder, create_alphabet

import io


@pytest.fixture
def bwt(rng):
    return oracle.build_bwt(oracle.random_collection(rng, 8, 20, 100))


def _alpha_for(fmt, runs):
    base = create_alphabet(FORMATS[fmt].order()) if fmt != "native" else Alphabet()
    return Alphabet.from_counts(runs.counts(), base.char2comp, base.comp2char)


class TestHeaders:
    def test_native_header_layout(self):
        h = NativeHeader(sequences=7, bases=1234)
        h.set_order(AlphabeticOrder.SORTED)
        data = h.to_bytes()
        assert len(data) == 24
        assert data[:4] == b"!BWT"
        h2 = NativeHeader.from_bytes(data)
        assert h2.check() and h2.sequences == 7 and h2.bases == 1234
        assert h2.order() == AlphabeticOrder.SORTED

    def test_sga_header_layout(self):
        h = SGAHeader(sequences=3, bases=99, bytes_=55)
        data = h.to_bytes()
        assert len(data) == 30
        assert data[:2] == b"\xca\xca"
        h2 = SGAHeader.from_bytes(data)
        assert h2.check() and h2.bytes_ == 55

    def test_rope_header(self):
        data = RopeHeader().to_bytes()
        assert data == b"RLE\x06"
        assert RopeHeader.from_bytes(data).check()


class TestRoundTrips:
    @pytest.mark.parametrize("fmt", list(FORMATS))
    def test_roundtrip(self, tmp_path, bwt, fmt):
        path = str(tmp_path / f"test.{fmt}")
        alpha = _alpha_for(fmt, bwt)
        write_bwt(path, fmt, bwt, alpha)
        runs, counts, alpha2 = read_bwt(path, fmt)
        assert runs == bwt
        assert np.array_equal(counts, bwt.counts())

    def test_cross_format_conversion(self, tmp_path, bwt):
        """any fmt -> native -> any fmt preserves the BWT (bwt_convert parity)."""
        sga = str(tmp_path / "a.sga")
        nat = str(tmp_path / "a.native")
        plain = str(tmp_path / "a.plain")
        write_bwt(sga, "sga", bwt, _alpha_for("sga", bwt))
        runs1, _, alpha1 = read_bwt(sga, "sga")
        write_bwt(nat, "native", runs1, alpha1)
        runs2, _, alpha2 = read_bwt(nat, "native")
        write_bwt(plain, "plain_default", runs2, alpha2)
        runs3, _, _ = read_bwt(plain, "plain_default")
        assert runs3 == bwt

    def test_plain_bytes_exact(self, tmp_path, bwt):
        """plain_default is the raw character stream."""
        path = str(tmp_path / "p.txt")
        write_bwt(path, "plain_default", bwt, _alpha_for("plain_default", bwt))
        raw = open(path, "rb").read()
        expect = bytes(Alphabet().comp2char[bwt.decode()])
        assert raw == expect

    def test_sga_run_count_in_header(self, tmp_path, bwt):
        path = str(tmp_path / "x.sga")
        write_bwt(path, "sga", bwt, _alpha_for("sga", bwt))
        raw = open(path, "rb").read()
        h = SGAHeader.from_bytes(raw)
        assert h.bytes_ == len(raw) - SGAHeader.SIZE
        assert h.bases == bwt.size()
        assert h.sequences == bwt.sequences()

    def test_rfm_framing(self, tmp_path, bwt):
        path = str(tmp_path / "x.rfm")
        write_bwt(path, "rfm", bwt, _alpha_for("rfm", bwt))
        raw = open(path, "rb").read()
        (bits,) = struct.unpack("<Q", raw[:8])
        assert bits == bwt.size() * 8
        assert len(raw) == 8 + ((bits // 8 + 7) // 8) * 8


class TestSdslCompat:
    def test_pack_unpack(self, rng):
        for width in (1, 3, 7, 8, 13, 31, 40, 63, 64):
            vals = rng.integers(0, 1 << min(width, 62), 1000).astype(np.uint64)
            words = sdsl.pack_bits(vals, width)
            back = sdsl.unpack_bits(words, width, vals.size)
            assert np.array_equal(vals, back), width

    def test_bit_vector_roundtrip(self, rng):
        bits = (rng.random(1000) < 0.3).astype(np.uint8)
        buf = io.BytesIO()
        sdsl.write_bit_vector(buf, bits)
        buf.seek(0)
        assert np.array_equal(sdsl.read_bit_vector(buf), bits)

    def test_int_vector_roundtrip(self, rng):
        vals = rng.integers(0, 1000, 500).astype(np.uint64)
        buf = io.BytesIO()
        sdsl.write_int_vector(buf, vals, 17, fixed_width=False)
        buf.seek(0)
        back, width = sdsl.read_int_vector(buf, None)
        assert width == 17
        assert np.array_equal(back, vals)

    def test_sd_vector_roundtrip(self, rng):
        size = 100000
        positions = np.sort(rng.choice(size, 5000, replace=False)).astype(np.uint64)
        buf = io.BytesIO()
        sdsl.write_sd_vector(buf, positions, size)
        end = buf.tell()
        buf.seek(0)
        back, sz = sdsl.read_sd_vector(buf)
        assert buf.tell() == end  # parser consumed exactly the structure
        assert sz == size
        assert np.array_equal(back, positions)

    def test_sd_vector_sparse_and_dense(self, rng):
        for size, ones in [(10, 1), (1 << 20, 3), (100, 100), (64, 0)]:
            positions = np.sort(rng.choice(size, ones, replace=False)).astype(np.uint64) \
                if ones else np.zeros(0, np.uint64)
            buf = io.BytesIO()
            sdsl.write_sd_vector(buf, positions, size)
            buf.seek(0)
            back, sz = sdsl.read_sd_vector(buf)
            assert sz == size and np.array_equal(back, positions)


class TestCorruptInputs:
    def test_corrupt_native_header_raises(self, tmp_path, bwt):
        path = str(tmp_path / "x.native")
        alpha = _alpha_for("native", bwt)
        write_bwt(path, "native", bwt, alpha)
        data = bytearray(open(path, "rb").read())
        data[0] ^= 0xFF  # break the magic tag
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="native"):
            read_bwt(path, "native")

    def test_corrupt_sga_header_raises(self, tmp_path, bwt):
        path = str(tmp_path / "x.sga")
        write_bwt(path, "sga", bwt, _alpha_for("sga", bwt))
        data = bytearray(open(path, "rb").read())
        data[0] ^= 0xFF
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="SGA"):
            read_bwt(path, "sga")

    def test_unknown_format_tag(self, tmp_path):
        with pytest.raises(ValueError, match="invalid BWT format"):
            read_bwt(str(tmp_path / "nope"), "bogus")
