"""BWT construction from raw reads, with optional RLO reordering.

Beyond-parity feature: the reference consumes BWTs prebuilt by external tools
(ropebwt / ropebwt2 — paper.tex:274 benchmarks them as the producers), so the
"reads -> mergeable BWT" step needs a second codebase.  Here it is built in:
a vectorized multi-string suffix-array construction (models/oracle.py, prefix
doubling over the whole collection) plus optional **reverse-lexicographic
(RLO) read ordering**, which the paper measures cutting both build time and
memory substantially on real read sets (paper.tex:278: RLO made BWT-merge
1.21x faster and 1.09x smaller than RopeBWT2) because sorting reads by their
reversed text groups equal suffixes and shrinks the run count of the BWT.

Reordering the reads of a collection never changes pattern occurrence counts
(each read keeps its own endmarker; only endmarker ranks permute), so an
RLO-built BWT is query-equivalent to the original-order BWT — pinned by
tests/test_build.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..utils.alphabet import DEFAULT_CHAR2COMP, Alphabet
from .runs import RunArrays
from . import oracle


def rlo_order(sequences: Sequence[np.ndarray]) -> np.ndarray:
    """Permutation sorting reads into reverse-lexicographic order.

    RLO compares the REVERSED reads lexicographically; a read that is a
    suffix of a longer read sorts first (the pad value 0 compares below
    every character).  Vectorized: one [m, max_len] key matrix of reversed
    reads + a single np.lexsort — no Python-level comparisons.
    """
    m = len(sequences)
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    seqs = [np.asarray(s) for s in sequences]
    max_len = max((s.size for s in seqs), default=0)
    if max_len == 0:
        return np.arange(m, dtype=np.int64)
    keys = np.zeros((m, max_len), dtype=np.uint8)
    for i, s in enumerate(seqs):
        keys[i, : s.size] = s[::-1]
    # lexsort's LAST key is primary: column 0 (each read's final character)
    # is the most significant position in reverse-lexicographic order
    return np.lexsort(tuple(keys[:, j] for j in range(max_len - 1, -1, -1)))


# Collections below this many total positions build faster on the host than
# the device path's dispatch + compile-cache lookup + transfers cost.
_DEVICE_BUILD_MIN_POSITIONS = 1 << 20


def _use_device_build(backend: str, n_positions: int) -> bool:
    if backend == "numpy":
        return False
    if backend == "jax":
        return True
    # auto: device only when the collection is big enough to pay for the
    # dispatch and a device backend is actually present
    if n_positions < _DEVICE_BUILD_MIN_POSITIONS:
        return False
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - jax always present in this env
        return False


def build_from_reads(sequences: Sequence[np.ndarray], rlo: bool = False,
                     backend: str = "auto") -> Tuple[RunArrays, np.ndarray]:
    """BWT of a read collection (comp values 1..sigma-1 per read).

    With rlo=True the reads are first sorted reverse-lexicographically
    (run-count-minimizing heuristic, paper.tex:278).  Returns the RunArrays
    and the read order actually used (identity when rlo=False).

    backend: 'numpy' (host prefix doubling, models/oracle.py), 'jax' (device
    lax.sort prefix doubling, ops/sa_jax.py — ~100x at 100 Mbp), or 'auto'
    (device when present and the collection exceeds ~1M positions).
    """
    from ..ops.sa_jax import pack_collection

    flat, lengths = pack_collection(sequences)
    n_positions = int(lengths.sum()) + lengths.size
    device = _use_device_build(backend, n_positions)
    if device:
        from ..ops.sa_jax import (_reorder_packed, build_bwt_device,
                                  rlo_order_device)

        if rlo:
            order = rlo_order_device((flat, lengths))
            packed = _reorder_packed(flat, lengths, order)
        else:
            order = np.arange(lengths.size, dtype=np.int64)
            packed = (flat, lengths)
        return build_bwt_device(packed), order
    seqs = [np.asarray(s, dtype=np.int64) for s in sequences]
    order = rlo_order(seqs) if rlo else np.arange(len(seqs), dtype=np.int64)
    return oracle.build_bwt([seqs[i] for i in order]), order


def rlo_reorder(fmi, backend: str = "auto") -> RunArrays:
    """RLO-reorder the reads of an EXISTING BWT (bwt_convert --rlo).

    Extracts every read with batched lockstep LF walks (FMI.extract_all),
    sorts them reverse-lexicographically, and rebuilds — turning an
    arbitrary-order BWT into the run-count-minimizing order without access
    to the original reads.  Query-equivalent by construction.
    """
    runs, _ = build_from_reads(fmi.extract_all(), rlo=True, backend=backend)
    return runs


def read_plain_reads(path: str, char2comp: np.ndarray = DEFAULT_CHAR2COMP
                     ) -> List[np.ndarray]:
    """Parse a plain reads file: one read per line (empty lines skipped).

    Character mapping follows the reference's PlainFormat semantics
    (support.cpp:39-62): ACGT/acgt map to comps 1..4, every other byte maps
    to N — EXCEPT endmarker characters ('$' and NUL, comp 0), which are never
    legal inside a read and raise with the offending file:line."""
    reads: List[np.ndarray] = []
    with open(path, "rb") as f:
        for ln, raw in enumerate(f, 1):
            line = raw.rstrip(b"\r\n")
            if not line:
                continue
            chars = np.frombuffer(line, dtype=np.uint8)
            comps = char2comp[chars].astype(np.int64)
            if (comps == 0).any():
                j = int(np.flatnonzero(comps == 0)[0])
                raise ValueError(
                    f"{path}:{ln}: endmarker character {chr(chars[j])!r} "
                    f"inside a read")
            reads.append(comps)
    return reads


def alphabet_for(runs: RunArrays, sigma: int = 6) -> Alphabet:
    return Alphabet.from_counts(runs.counts(sigma))
