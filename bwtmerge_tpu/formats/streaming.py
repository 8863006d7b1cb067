"""Streaming format writers: serialize a BWT from run chunks, never holding
the whole sequence in memory.

The batch writers (formats.py) take a full RunArrays; at terabase scale the
merged output must flow straight from the streaming interleave
(native interleave_stream_chunks) to disk.  State carried across chunks:

  * the 64-byte-block RLE encoder offset (rle_encode_at) — the Run codec's
    block-splitting rule is position-dependent (support.h:256-282)
  * per-RLE-block sample accumulators for the native format's rank tables
    (BWT::build's single scan, bwt.cpp:477-512, incrementalized): text
    position and per-char cumulative counts at each 64-byte block end
  * cumulative char counts / sequence counts for the headers

Headers that carry totals (NativeHeader, SGAHeader) are back-patched with a
seek on close, so targets must be real seekable files.  Output block tables
cost O(bytes/64) memory; everything else is O(chunk).
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

from ..models.runs import SIGMA
from ..utils.alphabet import Alphabet, identify_alphabet
from . import codec, sdsl_compat as sdsl
from .formats import BLOCK_ARRAY_BLOCK, RLE_BLOCK, SGAFormat
from .headers import NativeHeader, SGAHeader


class StreamingNativeWriter:
    """Chunked writer for the native format (byte-identical to
    NativeFormat.write for the same run stream)."""

    def __init__(self, path: str, alpha: Alphabet):
        self.alpha = alpha
        self.f = open(path, "wb")
        self.f.write(b"\x00" * (NativeHeader.SIZE + 8))  # header + u64 n_bytes
        self.n_bytes = 0
        self.char_counts = np.zeros(SIGMA, dtype=np.int64)
        self.text_pos = 0
        self.sequences = 0
        # finalized per-block samples
        self._block_end_pos: List[np.ndarray] = []
        self._block_char_cum: List[np.ndarray] = []
        # the trailing (possibly still open) block's current stats
        self._open_block = None  # (block_idx, end_pos, char_cum[SIGMA])
        self._closed = False

    def write_chunk(self, syms: np.ndarray, lens: np.ndarray) -> None:
        """Append a run chunk.  Adjacent chunks must not need coalescing
        (interleave_stream_chunks guarantees maximal runs across chunks)."""
        if syms.size == 0:
            return
        from ..native import rle_decode, rle_encode_at

        data = rle_encode_at(syms, lens, self.n_bytes)
        self.f.write(data)

        # stored-run partition of this chunk, with global byte offsets
        s_syms, s_lens, s_offs = rle_decode(data, with_offsets=True)
        s_offs = s_offs + self.n_bytes
        blocks = s_offs // RLE_BLOCK

        cum_len = self.text_pos + np.cumsum(s_lens)
        onehot = np.zeros((s_syms.size, SIGMA), dtype=np.int64)
        onehot[np.arange(s_syms.size), s_syms] = s_lens
        char_cum = self.char_counts[None, :] + np.cumsum(onehot, axis=0)

        # last stored run of each block present in this chunk
        is_last = np.empty(blocks.size, dtype=bool)
        is_last[-1] = True
        np.not_equal(blocks[1:], blocks[:-1], out=is_last[:-1])
        li = np.flatnonzero(is_last)
        blk_ids = blocks[li]
        blk_end = cum_len[li]
        blk_cc = char_cum[li]

        if self._open_block is not None and blk_ids[0] == self._open_block[0]:
            pass  # first row updates/extends the open block — just use it
        elif self._open_block is not None:
            # the open block closed exactly at the previous chunk boundary
            ob, oe, occ_ = self._open_block
            self._block_end_pos.append(np.array([oe]))
            self._block_char_cum.append(occ_[None, :])
        # all rows except the final one are closed blocks
        if blk_ids.size > 1:
            self._block_end_pos.append(blk_end[:-1])
            self._block_char_cum.append(blk_cc[:-1])
        self._open_block = (int(blk_ids[-1]), int(blk_end[-1]), blk_cc[-1].copy())

        self.n_bytes += len(data)
        self.text_pos = int(cum_len[-1])
        self.char_counts = char_cum[-1].copy()
        self.sequences = int(self.char_counts[0])

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        if self._open_block is not None:
            _, oe, occ_ = self._open_block
            self._block_end_pos.append(np.array([oe]))
            self._block_char_cum.append(occ_[None, :])

        f = self.f
        # BlockArray zero padding to 8 MB blocks
        n_big = (self.n_bytes + BLOCK_ARRAY_BLOCK - 1) // BLOCK_ARRAY_BLOCK
        f.write(b"\x00" * (n_big * BLOCK_ARRAY_BLOCK - self.n_bytes))

        block_end_pos = (np.concatenate(self._block_end_pos)
                         if self._block_end_pos else np.zeros(0, np.int64))
        block_char_cum = (np.concatenate(self._block_char_cum)
                          if self._block_char_cum else np.zeros((0, SIGMA), np.int64))
        n_blocks = block_end_pos.size
        for c in range(SIGMA):
            positions = block_char_cum[:, c] + np.arange(n_blocks, dtype=np.int64)
            sdsl.write_sd_vector(f, positions.astype(np.uint64),
                                 int(self.char_counts[c]) + n_blocks)
            f.write(struct.pack("<Q", n_blocks))
        sdsl.write_sd_vector(f, (block_end_pos - 1).astype(np.uint64),
                             self.text_pos)
        # serialize a C array derived from the ACTUAL streamed counts (the
        # caller's alpha provides the char mappings; its C may be stale)
        alpha = Alphabet.from_counts(self.char_counts, self.alpha.char2comp,
                                     self.alpha.comp2char)
        sdsl.write_int_vector(f, alpha.char2comp.astype(np.uint64), 8,
                              fixed_width=True)
        sdsl.write_int_vector(f, alpha.comp2char.astype(np.uint64), 8,
                              fixed_width=True)
        sdsl.write_int_vector(f, alpha.C.astype(np.uint64), 64,
                              fixed_width=True)
        f.write(struct.pack("<Q", alpha.sigma))

        header = NativeHeader(sequences=self.sequences, bases=self.text_pos)
        header.set_order(identify_alphabet(self.alpha))
        f.seek(0)
        f.write(header.to_bytes())
        f.write(struct.pack("<Q", self.n_bytes))
        f.close()


class StreamingSGAWriter:
    """Chunked writer for the SGA format (byte-identical to SGAFormat.write).

    SGA codes come from the STORED run partition (64-byte-block splits), so
    each chunk is first re-encoded through the native Run codec at the
    running block offset, then split at MAX_RUN=31.
    """

    def __init__(self, path: str):
        self.f = open(path, "wb")
        self.f.write(b"\x00" * SGAHeader.SIZE)
        self.rle_offset = 0
        self.n_codes = 0
        self.bases = 0
        self.sequences = 0
        self._closed = False

    def write_chunk(self, syms: np.ndarray, lens: np.ndarray) -> None:
        if syms.size == 0:
            return
        from ..native import rle_decode, rle_encode_at

        data = rle_encode_at(syms, lens, self.rle_offset)
        s_syms, s_lens = rle_decode(data)
        self.rle_offset += len(data)

        max_run = SGAFormat.MAX_RUN
        n_codes = (s_lens + max_run - 1) // max_run
        out_syms = np.repeat(s_syms, n_codes)
        out_lens = np.full(int(n_codes.sum()), max_run, dtype=np.int64)
        last_idx = np.cumsum(n_codes) - 1
        out_lens[last_idx] = s_lens - (n_codes - 1) * max_run
        self.f.write(SGAFormat._encode_codes(out_syms, out_lens).tobytes())

        self.n_codes += out_syms.size
        self.bases += int(np.sum(lens))
        self.sequences += int(np.sum(lens[syms == 0]))

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        header = SGAHeader(sequences=self.sequences, bases=self.bases,
                           bytes_=self.n_codes)
        self.f.seek(0)
        self.f.write(header.to_bytes())
        self.f.close()


STREAM_WRITERS = {
    "native": lambda path, alpha: StreamingNativeWriter(path, alpha),
    "sga": lambda path, alpha: StreamingSGAWriter(path),
}


def write_bwt_stream(path: str, fmt: str, chunks, alpha: Alphabet) -> None:
    """Write a BWT from an iterator of (syms, lens) run chunks."""
    if fmt not in STREAM_WRITERS:
        raise ValueError(f"no streaming writer for format: {fmt}")
    w = STREAM_WRITERS[fmt](path, alpha)
    for syms, lens in chunks:
        w.write_chunk(np.asarray(syms, dtype=np.uint8),
                      np.asarray(lens, dtype=np.int64))
    w.close()
