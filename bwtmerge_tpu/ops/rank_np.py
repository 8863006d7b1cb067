"""Batched rank/LF over an RLE BWT — numpy backend.

Replaces the reference's per-query block decode (BWT::rank, bwt.cpp:318-341;
one sd_vector rank + <=64-byte sequential Run::read scan per query) with a
vectorized two-array form: searchsorted over run start positions + per-run
cumulative occurrence tables. This is also the memory layout the device index
mirrors (ops/rank_jax.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..models.runs import RunArrays, SIGMA


@dataclass
class RankIndex:
    """Flat rank index over maximal runs.

    run_starts: int64[R+1]  text position where run r starts; [R] = size
    occ:        int64[R+1, sigma]  occ[r, c] = # of c in positions [0, run_starts[r])
    syms:       uint8[R]
    """

    syms: np.ndarray
    run_starts: np.ndarray
    occ: np.ndarray

    @classmethod
    def build(cls, runs: RunArrays, sigma: int = SIGMA) -> "RankIndex":
        r = runs.n_runs
        run_starts = np.zeros(r + 1, dtype=np.int64)
        np.cumsum(runs.lens, out=run_starts[1:])
        occ = np.zeros((r + 1, sigma), dtype=np.int64)
        if r:
            onehot = np.zeros((r, sigma), dtype=np.int64)
            onehot[np.arange(r), runs.syms] = runs.lens
            np.cumsum(onehot, axis=0, out=occ[1:])
        return cls(syms=runs.syms.copy(), run_starts=run_starts, occ=occ)

    @property
    def size(self) -> int:
        return int(self.run_starts[-1])

    def rank(self, positions, comp) -> np.ndarray:
        """rank(i, c) = # of c in [0, i) for each (i, c) pair; vectorized."""
        i = np.minimum(np.asarray(positions, dtype=np.int64), self.size)
        c = np.asarray(comp, dtype=np.int64)
        k = np.searchsorted(self.run_starts, i, side="right") - 1
        k = np.minimum(k, self.syms.size - 1) if self.syms.size else np.zeros_like(k)
        if self.syms.size == 0:
            return np.zeros_like(i)
        partial = np.where(self.syms[k] == c, i - self.run_starts[k], 0)
        return self.occ[k, c] + partial

    def ranks_all(self, positions) -> np.ndarray:
        """rank(i, c) for all comp values at once: int64[len(positions), sigma]."""
        i = np.minimum(np.asarray(positions, dtype=np.int64), self.size)
        if self.syms.size == 0:
            return np.zeros((i.size, self.occ.shape[1]), dtype=np.int64)
        k = np.searchsorted(self.run_starts, i, side="right") - 1
        k = np.minimum(k, self.syms.size - 1)
        res = self.occ[k].copy()
        res[np.arange(i.size), self.syms[k]] += i - self.run_starts[k]
        return res

    def select(self, i, comp) -> np.ndarray:
        """Position of the i-th (1-based) occurrence of comp
        (reference BWT::select, bwt.cpp:405-427)."""
        i = np.asarray(i, dtype=np.int64)
        c = int(comp)
        k = np.searchsorted(self.occ[:, c], i, side="left") - 1
        k = np.maximum(k, 0)
        return self.run_starts[k] + (i - 1 - self.occ[k, c])

    def access(self, positions) -> np.ndarray:
        """BWT[i] (reference BWT::operator[], bwt.cpp:429-443)."""
        i = np.asarray(positions, dtype=np.int64)
        k = np.searchsorted(self.run_starts, i, side="right") - 1
        return self.syms[np.minimum(k, self.syms.size - 1)]

    def inverse_select(self, positions):
        """(rank(i, BWT[i]), BWT[i]) per position (bwt.cpp:445-464)."""
        i = np.asarray(positions, dtype=np.int64)
        k = np.searchsorted(self.run_starts, i, side="right") - 1
        k = np.minimum(k, self.syms.size - 1)
        sym = self.syms[k]
        rnk = self.occ[k, sym] + (i - self.run_starts[k])
        return rnk, sym
