"""Golden-byte tests: exact serialized bytes pinned for every format.

Round-trip tests prove the writers against the repo's OWN readers; these pin
the bytes against INDEPENDENTLY hand-derived constants so a deviation from
the reference layout cannot hide behind a symmetric reader bug.  Derivations
(commented inline) follow the reference sources line by line:

  Run codec           support.h:256-282 (64-byte block rule, MAX_RUN 42)
  ByteCode varint     support.h:160-213 (LSB-first, 0x80 continuation)
  headers             formats.h:44-62, 175-207; formats.cpp:483-604
  SGA / Rope codes    formats.cpp:367-445
  int_vector framing  sdsl int_vector<w>::serialize — u64 size-in-bits, then
                      LSB-first little-endian u64 words (utils.h:374-425)
  Alphabet section    support.cpp:34-171 (char2comp[256], comp2char[sigma],
                      C[sigma+1] as int_vector<64>, u64 sigma)
  sd_vector           sdsl sd_vector.hpp: u64 m_size, u8 m_wl,
                      m_low int_vector<0>, m_high bit_vector, then
                      select_support_mcl over high 1-bits and 0-bits
  select_support_mcl  sdsl select_support_mcl.hpp: u64 arg_cnt; superblock
                      int_vector<0> (one entry per 4096 args, width
                      bits::hi(word-padded bit size)+1); mini-or-long
                      indicator bit_vector (empty when no superblock spans >
                      log^4 n bits); per superblock an int_vector<0> of 64
                      relative every-64th-arg positions (miniblock)

The fixture BWT is the collection ["ACGT"]: suffix order $, ACGT$, CGT$,
GT$, T$ gives BWT chars T $ A C G = comps [4, 0, 1, 2, 3].
"""

import io
import struct

import numpy as np
import pytest

from bwtmerge_tpu.formats import write_bwt
from bwtmerge_tpu.formats.codec import encode_runs
from bwtmerge_tpu.models.runs import RunArrays
from bwtmerge_tpu.utils.alphabet import Alphabet

BWT_COMPS = [4, 0, 1, 2, 3]


@pytest.fixture()
def tiny_runs():
    return RunArrays.from_values(np.array(BWT_COMPS, dtype=np.uint8))


@pytest.fixture()
def tiny_alpha(tiny_runs):
    return Alphabet.from_counts(tiny_runs.counts(6))


def written_bytes(fmt, runs, alpha, tmp_path):
    p = str(tmp_path / f"g.{fmt}")
    write_bwt(p, fmt, runs, alpha)
    return open(p, "rb").read()


def u64(x):
    return struct.pack("<Q", x)


def u32(x):
    return struct.pack("<I", x)


class TestRunCodecGolden:
    """Hand-encoded byte strings per support.h:256-282."""

    def test_short_run_one_byte(self):
        # (c, l) with l <= 41 is the single byte c + 6*(l-1)
        assert encode_runs([1], [1]) == bytes([1])
        assert encode_runs([3], [41]) == bytes([3 + 6 * 40])

    def test_long_run_head_plus_varint(self):
        # l = 100: head byte c + 6*41, then ByteCode varint of 100-42 = 58
        assert encode_runs([1], [100]) == bytes([1 + 6 * 41, 58])
        # l = 42 exactly: head + varint 0
        assert encode_runs([2], [42]) == bytes([2 + 6 * 41, 0])

    def test_multibyte_varint(self):
        # l = 342: remainder 300 = 0b100101100 -> 0x2C|0x80, 0x02
        assert encode_runs([1], [342]) == bytes([1 + 6 * 41, 0xAC, 0x02])

    def test_block_boundary_split(self):
        # 63 single-position runs fill bytes 0..62; the long run starts at
        # byte 63 with ONE byte left in the 64-byte block: the head is capped
        # at basic = MAX_RUN-1 = 41 (support.h:262-266) and NO varint fits,
        # so the remaining 59 re-enter the loop in a fresh block:
        # 59 >= 42 -> head 3 + 6*41, varint 59-42 = 17.
        syms = [1, 2] * 31 + [1] + [3]
        lens = [1] * 63 + [100]
        want = bytes([1, 2] * 31 + [1]) + bytes([3 + 6 * 40, 3 + 6 * 41, 17])
        assert encode_runs(syms, lens) == want


class TestFlatFormatsGolden:
    def test_plain_default(self, tiny_runs, tiny_alpha, tmp_path):
        # chars through the $ACGTN map (support.cpp:63)
        assert written_bytes("plain_default", tiny_runs, tiny_alpha,
                             tmp_path) == b"T$ACG"

    def test_plain_sorted(self, tiny_runs, tiny_alpha, tmp_path):
        # SORTED swaps comp2char[4] <-> [5] (formats.cpp:42-45): comp 4 -> N
        assert written_bytes("plain_sorted", tiny_runs, tiny_alpha,
                             tmp_path) == b"N$ACG"

    def test_rfm(self, tiny_runs, tiny_alpha, tmp_path):
        # int_vector<8> of raw comps: u64 40 bits, 5 bytes + 3 pad to a word
        want = u64(40) + bytes(BWT_COMPS) + b"\x00" * 3
        assert written_bytes("rfm", tiny_runs, tiny_alpha, tmp_path) == want

    def test_sdsl(self, tiny_runs, tiny_alpha, tmp_path):
        # int_vector<8> of characters in SORTED order (formats.cpp:267-277)
        want = u64(40) + b"N$ACG" + b"\x00" * 3
        assert written_bytes("sdsl", tiny_runs, tiny_alpha, tmp_path) == want

    def test_ropebwt(self, tiny_runs, tiny_alpha, tmp_path):
        # u32 tag 0x06454C52 ("RLE\x06"), then codes len<<3 | comp
        want = b"RLE\x06" + bytes([(1 << 3) | c for c in BWT_COMPS])
        assert written_bytes("ropebwt", tiny_runs, tiny_alpha,
                             tmp_path) == want

    def test_sga(self, tiny_runs, tiny_alpha, tmp_path):
        # u16 0xCACA, u64 sequences=1, u64 bases=5, u64 codes=5, u32 flags=0;
        # codes comp<<5 | len
        want = (b"\xca\xca" + u64(1) + u64(5) + u64(5) + u32(0)
                + bytes([(c << 5) | 1 for c in BWT_COMPS]))
        assert written_bytes("sga", tiny_runs, tiny_alpha, tmp_path) == want


# -- hand-assembled sdsl structures ---------------------------------------------


def iv0(values_words: bytes, bits: int, width: int) -> bytes:
    """Serialized int_vector<0>: u64 bits, u8 width, then the data words."""
    return u64(bits) + bytes([width]) + values_words


def bv(bits: int, words: bytes) -> bytes:
    """Serialized bit_vector: u64 bit count, then the words."""
    return u64(bits) + words


W0 = u64(0)  # one all-zero 64-bit data word
W1 = u64(1)


def mcl(arg_cnt, sb_word, sb_width, mini_word, mini_width) -> bytes:
    """select_support_mcl with one superblock, no long blocks: u64 arg_cnt,
    superblock iv0 (width = bits::hi(padded size)+1), EMPTY indicator
    bit_vector, one miniblock iv0 of 64 entries (= mini_width data words)."""
    return (u64(arg_cnt)
            + iv0(sb_word, sb_width, sb_width)      # one entry => bits=width
            + bv(0, b"")                            # no long superblocks
            + iv0(mini_word * mini_width, 64 * mini_width, mini_width))


def sd_vector_bytes(size, wl, low_bits, low_width, low_words, high_bits,
                    high_words, sel1, sel0) -> bytes:
    return (u64(size) + bytes([wl])
            + iv0(low_words, low_bits, low_width)
            + bv(high_bits, high_words)
            + sel1 + sel0)


class TestSelectMclLongSuperblock:
    def test_long_superblock_bytes(self):
        """A superblock spanning more than log^4(n) bits serializes as a LONG
        superblock: absolute positions of all 4096 arg slots at width
        bits::hi(last arg)+1, with the mini-or-long indicator bit CLEAR
        (select_support_mcl.hpp; the indicator marks miniblocks).

        args {0, 2^21-2} over 2^21 bits: logn = 22, logn^4 = 234,256 <
        span = 2,097,150 -> long.
        """
        from bwtmerge_tpu.formats.sdsl_compat import (build_select_mcl,
                                                      write_select_mcl)

        n_bits = 1 << 21
        last = n_bits - 2
        mcl_s = build_select_mcl(np.array([0, last], dtype=np.uint64), n_bits)
        out = io.BytesIO()
        write_select_mcl(out, mcl_s)

        width = last.bit_length()            # bits::hi(last)+1 = 21
        word0 = last << width                # arg #1 at bit offset 21 (<64)
        n_words = (4096 * width + 63) // 64  # 4096 absolute-position slots
        want = (u64(2)
                + iv0(u64(0), 22, 22)        # superblock start, width logn
                + bv(1, u64(0))              # ONE superblock, long -> bit 0
                + u64(4096 * width) + bytes([width])
                + u64(word0) + b"\x00" * (8 * (n_words - 1)))
        assert out.getvalue() == want


class TestNativeFormatGolden:
    def test_native_bytes(self, tiny_runs, tiny_alpha, tmp_path):
        data = written_bytes("native", tiny_runs, tiny_alpha, tmp_path)

        out = io.BytesIO()
        # NativeHeader: u32 tag "!BWT", u32 flags (low byte = AO_DEFAULT = 0),
        # u64 sequences = 1, u64 bases = 5 (formats.h:44-62)
        out.write(b"!BWT" + u32(0) + u64(1) + u64(5))
        # BlockArray: u64 byte count, data, zero-padded to 8 MB blocks
        # (support.cpp:229-350).  5 runs of length 1 encode to 1 byte each.
        out.write(u64(5) + bytes(BWT_COMPS))
        out.write(b"\x00" * (8 * 1024 * 1024 - 5))

        # samples[c] for c = 0..4: CumulativeArray over per-block counts of c
        # = [1] with 1 block: encoded 1-bit positions {count + block_index} =
        # {1} in a universe of count + blocks = 2 (support.h:295-380).
        #   sd_vector: size 2, ones {1}: logm=1, logn=2 -> wl=1; low=[1];
        #   high has 1 + (2>>1) + 1 = 3 bits, one at (1>>1)+0 = 0 -> 0b001.
        #   select1 over {0} of 3 bits: word-padded size 64 -> sb width 7;
        #   span 0 -> mini width 1.  select0 over {1,2}: sb word 1, span 1 ->
        #   mini width 1, entries rel first = {0}.
        sel1 = mcl(1, W0, 7, W0, 1)
        sel0 = mcl(2, W1, 7, W0, 1)
        sample_c = sd_vector_bytes(2, 1, 1, 1, W1, 3, W1, sel1, sel0)
        for _c in range(5):
            out.write(sample_c)
            out.write(u64(1))  # CumulativeArray m_size = blocks
        # samples[5]: no N characters: positions {0}, universe 0 + 1 block:
        #   size 1, ones {0}: logm=1, logn=1 -> equal -> logm-- -> wl=1;
        #   low=[0]; high = 1 + (1>>1) + 1 = 2 bits, one at 0 -> 0b01.
        sel1 = mcl(1, W0, 7, W0, 1)
        sel0 = mcl(1, W1, 7, W0, 1)
        out.write(sd_vector_bytes(1, 1, 1, 1, W0, 2, W1, sel1, sel0))
        out.write(u64(1))

        # block_boundaries: last text position of the single block = {4} in
        # universe 5: logm=1, logn=3 -> wl=2; low=[4 & 3]=[0]; high has
        # 1 + (5>>2) + 1 = 3 bits, one at (4>>2)+0 = 1 -> 0b010.
        #   select0 over {0,2}: span 2 -> mini width 2 (two data words).
        sel1 = mcl(1, W1, 7, W0, 1)
        sel0 = mcl(2, W0, 7, W0, 2)   # span 2 -> width 2 -> two data words
        out.write(sd_vector_bytes(5, 2, 2, 2, W0, 3, u64(0b010), sel1, sel0))

        # Alphabet (support.cpp:160-171): char2comp int_vector<8>[256],
        # comp2char int_vector<8>[6], C int_vector<64>[7], u64 sigma.
        char2comp = bytearray(256)
        for i in range(256):
            char2comp[i] = 5
        char2comp[0] = char2comp[ord("$")] = 0
        for i, ch in enumerate("ACGT"):
            char2comp[ord(ch)] = char2comp[ord(ch.lower())] = i + 1
        out.write(u64(256 * 8) + bytes(char2comp))
        out.write(u64(6 * 8) + b"$ACGTN" + b"\x00" * 2)
        C = [0, 1, 2, 3, 4, 5, 5]
        out.write(u64(7 * 64) + b"".join(u64(x) for x in C))
        out.write(u64(6))

        want = out.getvalue()
        assert len(data) == len(want), (len(data), len(want))
        # compare in sections for a debuggable failure
        assert data[:24] == want[:24], "header"
        assert data[24:32] == want[24:32], "BlockArray byte count"
        assert data[32:37] == want[32:37], "RLE payload"
        first_diff = next((i for i in range(len(want))
                           if data[i] != want[i]), None)
        assert data == want, f"first differing byte at offset {first_diff}"


def pack_bits(values, width) -> bytes:
    """LSB-first int_vector<0> data words for `values` at `width` bits each
    (independent re-derivation of sdsl's packing, for expected bytes)."""
    n_bits = len(values) * width
    words = [0] * ((n_bits + 63) // 64)
    for j, v in enumerate(values):
        bit = j * width
        w, off = bit // 64, bit % 64
        words[w] |= (int(v) << off) & 0xFFFFFFFFFFFFFFFF
        if off + width > 64:
            words[w + 1] |= int(v) >> (64 - off)
    return b"".join(u64(w) for w in words)


class TestNativeMultiBlockGolden:
    """Native file whose RLE payload spans THREE 64-byte blocks, with every
    rank/select structure hand-derived (VERDICT r2 #5): a misreading of the
    multi-block sd_vector / CumulativeArray / select layout cannot hide
    behind the single-block golden.

    Run stream: 128 alternating single-position runs (1,1),(2,1) fill RLE
    blocks 0 and 1 exactly (64 one-byte runs each); block 2 holds (0,8)
    (one byte 0 + 6*7 = 42) and (3,100) (head 3 + 6*41, varint 58).
    Text blocks end at positions 63, 127, 235; per-block char counts:
      c0 (0,0,8)  c1 (32,32,0)  c2 (32,32,0)  c3 (0,0,100)  c4/c5 zero.
    """

    def test_three_block_native_bytes(self, tmp_path):
        syms = [1, 2] * 64 + [0, 3]
        lens = [1] * 128 + [8, 100]
        runs = RunArrays(np.array(syms, np.uint8), np.array(lens, np.int64))
        alpha = Alphabet.from_counts(runs.counts(6))
        data = written_bytes("native", runs, alpha, tmp_path)

        out = io.BytesIO()
        # header: 8 sequences (count of comp 0), 236 bases
        out.write(b"!BWT" + u32(0) + u64(8) + u64(236))
        rle = bytes([1, 2] * 64) + bytes([0 + 6 * 7, 3 + 6 * 41, 58])
        assert len(rle) == 131  # 3 x 64-byte blocks
        out.write(u64(131) + rle + b"\x00" * (8 * 1024 * 1024 - 131))

        # CumulativeArray per char c: sd_vector ones at prefix-sum-through-
        # block-k + k, universe total_c + 3 blocks (support.h:295-380), then
        # u64 m_size = 3.  Derivations follow sdsl sd_vector.hpp:
        # wl = (hi(n)+1) - (hi(m)+1) [logm-- when equal]; low = ones & mask;
        # high = m + (n>>wl) + 1 bits with ones at (one>>wl)+i.
        def mcl3(arg_cnt, sb_pos, span, mini=None):
            width = max(span.bit_length(), 1)
            return (u64(arg_cnt)
                    + iv0(u64(sb_pos), 7, 7)
                    + bv(0, b"")
                    + iv0(pack_bits(mini or [0] * 64, width), 64 * width,
                          width))

        # c0: ones {0,1,10} in 11 -> wl=2, low {0,1,2}w2, high 6 bits {0,1,4}
        c0 = (sd_vector_bytes(11, 2, 6, 2, u64(0b100100), 6, u64(0b10011),
                              mcl3(3, 0, 4),       # sel1 args {0,1,4}
                              mcl3(3, 2, 3))       # sel0 args {2,3,5}
              + u64(3))
        # c1/c2: ones {32,65,66} in 67 -> wl=5, low {0,1,2}w5,
        # high 6 bits {1,3,4}
        c12 = (sd_vector_bytes(67, 5, 15, 5, u64(0 | 1 << 5 | 2 << 10),
                               6, u64(0b11010),
                               mcl3(3, 1, 3),      # sel1 {1,3,4}
                               mcl3(3, 0, 5))      # sel0 {0,2,5}
               + u64(3))
        # c3: ones {0,1,102} in 103 -> wl=5, low {0,1,6}w5,
        # high 7 bits {0,1,5}
        c3 = (sd_vector_bytes(103, 5, 15, 5, u64(0 | 1 << 5 | 6 << 10),
                              7, u64(0b100011),
                              mcl3(3, 0, 5),       # sel1 {0,1,5}
                              mcl3(4, 2, 4))       # sel0 {2,3,4,6}
              + u64(3))
        # c4/c5: ones {0,1,2} in 3 -> logm==logn -> wl=1, low {0,1,0}w1,
        # high 5 bits {0,1,3}
        c45 = (sd_vector_bytes(3, 1, 3, 1, u64(0b010), 5, u64(0b1011),
                               mcl3(3, 0, 3),      # sel1 {0,1,3}
                               mcl3(2, 2, 2))      # sel0 {2,4}
               + u64(3))
        out.write(c0 + c12 + c12 + c3 + c45 + c45)

        # block_boundaries: ones {63,127,235} in 236 -> wl=6,
        # low {63,63,43}w6, high 7 bits {0,2,5}
        out.write(sd_vector_bytes(
            236, 6, 18, 6, u64(63 | 63 << 6 | 43 << 12), 7, u64(0b100101),
            mcl3(3, 0, 5),                         # sel1 {0,2,5}
            mcl3(4, 1, 5)))                        # sel0 {1,3,4,6}

        # Alphabet: default $ACGTN maps; C = cumsum(8,64,64,100,0,0)
        char2comp = bytearray([5] * 256)
        char2comp[0] = char2comp[ord("$")] = 0
        for i, ch in enumerate("ACGT"):
            char2comp[ord(ch)] = char2comp[ord(ch.lower())] = i + 1
        out.write(u64(256 * 8) + bytes(char2comp))
        out.write(u64(6 * 8) + b"$ACGTN" + b"\x00" * 2)
        C = [0, 8, 72, 136, 236, 236, 236]
        out.write(u64(7 * 64) + b"".join(u64(x) for x in C))
        out.write(u64(6))

        want = out.getvalue()
        first_diff = next((i for i in range(min(len(want), len(data)))
                           if data[i] != want[i]), None)
        assert len(data) == len(want), (len(data), len(want), first_diff)
        assert data == want, f"first differing byte at offset {first_diff}"


class TestSdVectorSecondSuperblockGolden:
    def test_4097_ones_two_select_superblocks(self):
        """sd_vector with 4097 ones: its select_support_mcl structures carry
        a SECOND superblock (one per 4096 args) — pinning the superblock
        table, the empty mini-or-long indicator, and BOTH miniblocks
        (select_support_mcl.hpp; VERDICT r2 #5).

        ones = {0..4096} in universe 8192: logm 13, logn 14 -> wl 1;
        low bit i = i & 1; high = 4097 + 4096 + 1 = 8194 bits with ones at
        floor(3i/2).
        """
        from bwtmerge_tpu.formats.sdsl_compat import write_sd_vector

        m, n = 4097, 8192
        ones = np.arange(m, dtype=np.uint64)
        out = io.BytesIO()
        write_sd_vector(out, ones, n)
        data = out.getvalue()

        # low: 4097 1-bit entries, bit i = i & 1
        low = pack_bits([i & 1 for i in range(m)], 1)
        # high: ones at floor(3i/2)
        hi_pos = [(3 * i) // 2 for i in range(m)]
        hi_words = [0] * ((8194 + 63) // 64)
        for p in hi_pos:
            hi_words[p // 64] |= 1 << (p % 64)
        high = b"".join(u64(w) for w in hi_words)

        # select1 over the 4097 high ones (positions floor(3i/2)):
        #   2 superblocks; table entries {pos(arg0)=0, pos(arg4096)=6144} at
        #   width hi(word-padded 8256)+1 = 14; no long superblocks (spans
        #   6142 and 0 < logn^4 = 14^4) -> EMPTY indicator; miniblocks:
        #   sb0 entries 96j (span 6142 -> width 13), sb1 zeros (width 1).
        sel1 = (u64(m)
                + iv0(pack_bits([0, 6144], 14), 28, 14)
                + bv(0, b"")
                + iv0(pack_bits([96 * j for j in range(64)], 13), 64 * 13, 13)
                + iv0(pack_bits([0] * 64, 1), 64, 1))
        # select0 over the 4097 high zeros: zero arg j at 3j+2 (j < 2048)
        # then 4097+j; superblock entries {2, 8193}; spans 8190 and 0.
        def zpos(j):
            return 3 * j + 2 if j < 2048 else 4097 + j
        sel0 = (u64(m)
                + iv0(pack_bits([2, 8193], 14), 28, 14)
                + bv(0, b"")
                + iv0(pack_bits([zpos(64 * j) - 2 for j in range(64)], 13),
                      64 * 13, 13)
                + iv0(pack_bits([0] * 64, 1), 64, 1))

        want = (u64(n) + bytes([1])
                + iv0(low, m, 1)
                + bv(8194, high)
                + sel1 + sel0)
        first_diff = next((i for i in range(min(len(want), len(data)))
                           if data[i] != want[i]), None)
        assert len(data) == len(want), (len(data), len(want), first_diff)
        assert data == want, f"first differing byte at offset {first_diff}"


class TestBlockArrayMultiBlockGolden:
    def test_payload_spanning_two_8mb_blocks(self, tmp_path):
        """Native BlockArray section with > 8 MB of RLE bytes: the payload
        must zero-pad to TWO 8 MB blocks (support.cpp:229-350; the 8 MB
        mmap granularity is part of the on-disk framing).  The samples are
        structural (147k blocks), so only the header + BlockArray section
        is pinned; the reader round-trip guards the rest.
        """
        n_runs = 9 * (1 << 20)  # 9 MB of one-byte runs
        syms = np.tile(np.array([1, 2], np.uint8), n_runs // 2)
        runs = RunArrays(syms, np.ones(n_runs, np.int64))
        alpha = Alphabet.from_counts(runs.counts(6))
        p = str(tmp_path / "big.native")
        write_bwt(p, "native", runs, alpha)
        data = open(p, "rb").read()

        assert data[:4] == b"!BWT"
        assert data[8:16] == u64(0)          # sequences
        assert data[16:24] == u64(n_runs)    # bases
        assert data[24:32] == u64(n_runs)    # BlockArray byte count
        pattern = bytes([1, 2] * 4096)
        assert data[32:32 + 8192] == pattern
        end = 32 + n_runs
        assert data[end - 8192:end] == pattern
        # zero padding to exactly two 8 MB blocks
        pad_end = 32 + 2 * 8 * 1024 * 1024
        assert data[end:pad_end] == b"\x00" * (pad_end - end)
        assert data[pad_end:pad_end + 1] != b""  # samples follow

        from bwtmerge_tpu.formats import read_bwt
        got, _, _ = read_bwt(p, "native")
        assert got == runs
