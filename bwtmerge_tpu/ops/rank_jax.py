"""Device-resident FM-index: batched rank/LF over an RLE BWT in JAX.

TPU-first replacement for the reference's per-query block decode
(BWT::rank, bwt.cpp:318-341: one sd_vector rank + a <=64-byte sequential
Run::read scan per query).  The BWT lives on device as a TWO-LEVEL segmented
structure (the vector analog of the reference's 64-byte blocks + per-block
samples, bwt.h:49-50,174-176):

  hdr:        int32[NB]          first text position of each segment
  seg_starts: int32[NB, SEG]     run start positions within the segment
  seg_syms:   int32[NB, SEG]     run symbols
  seg_lens:   int32[NB, SEG]     run lengths
  seg_occ:    int32[NB, LANES]   per-char occ at each segment start

A rank query is then:
  1. binary search `hdr` (small — ~0.8 MB per 1e8 runs — stays in cache)
  2. ONE contiguous row gather of the segment (SEG*12 B, 1-3 HBM lines)
  3. VPU masked reductions for the intra-segment partial counts

versus a naive searchsorted over all runs = ~log2(R) dependent scattered HBM
gathers per query, which measured 25x slower on a v5e.  All queries are
batched [Q]-vectors; this is the per-step primitive of the whole merge engine
(SURVEY.md §3.2).

Positions are int32 by design: a per-chip BWT shard never exceeds 2^31
positions (HBM bounds the shard long before that); global positions at
terabase scale live in host int64 and are re-based per shard
(parallel/mesh.py).  int32 is the TPU's native integer width.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.runs import RunArrays

SIGMA = 6
LANES = 8   # sigma padded to the VPU-friendly width
SEG = 64    # runs per segment (one 768 B row of starts+syms+lens)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceFMIndex:
    """Segmented run-length FM-index resident in device memory."""

    hdr: jax.Array         # int32[NB]
    seg_starts: jax.Array  # int32[NB, SEG]
    seg_syms: jax.Array    # int32[NB, SEG]
    seg_lens: jax.Array    # int32[NB, SEG]
    seg_occ: jax.Array     # int32[NB, LANES]
    C: jax.Array           # int32[LANES+1] cumulative char counts
    size: int              # static: total positions
    n_runs: int            # static: real (unpadded) run count

    # -- pytree plumbing ------------------------------------------------------

    def tree_flatten(self):
        return ((self.hdr, self.seg_starts, self.seg_syms, self.seg_lens,
                 self.seg_occ, self.C), (self.size, self.n_runs))

    @classmethod
    def tree_unflatten(cls, aux, children):
        hdr, seg_starts, seg_syms, seg_lens, seg_occ, C = children
        size, n_runs = aux
        return cls(hdr=hdr, seg_starts=seg_starts, seg_syms=seg_syms,
                   seg_lens=seg_lens, seg_occ=seg_occ, C=C,
                   size=size, n_runs=n_runs)

    # -- construction ---------------------------------------------------------

    @classmethod
    def build(cls, runs: RunArrays, C: np.ndarray | None = None) -> "DeviceFMIndex":
        """Upload a host RLE BWT into the segmented device layout."""
        r = runs.n_runs
        size = runs.size()
        if size >= 2**31:
            raise ValueError(
                f"BWT shard of {size} positions exceeds int32 device layout; "
                "shard it first (parallel/mesh.py)")
        nb = max(1, -(-max(r, 1) // SEG))
        rp = nb * SEG

        starts = np.full(rp, size + 1, dtype=np.int32)  # pad: past any query
        lens = np.zeros(rp, dtype=np.int32)
        syms = np.zeros(rp, dtype=np.int32)
        if r:
            starts[:r] = np.concatenate(([0], np.cumsum(runs.lens[:-1])))
            lens[:r] = runs.lens
            syms[:r] = runs.syms

        occ_seg = np.zeros((nb, LANES), dtype=np.int64)
        if r:
            onehot = np.zeros((rp, LANES), dtype=np.int64)
            onehot[np.arange(r), runs.syms] = runs.lens
            seg_tot = onehot.reshape(nb, SEG, LANES).sum(axis=1)
            occ_seg[1:] = np.cumsum(seg_tot[:-1], axis=0)

        counts = runs.counts(SIGMA) if C is None else np.asarray(C)
        c_arr = np.zeros(LANES + 1, dtype=np.int32)
        c_arr[: counts.size + 1] = np.concatenate(([0], np.cumsum(counts)))
        c_arr[counts.size + 1:] = c_arr[counts.size]

        return cls(
            hdr=jnp.asarray(starts.reshape(nb, SEG)[:, 0]),
            seg_starts=jnp.asarray(starts.reshape(nb, SEG)),
            seg_syms=jnp.asarray(syms.reshape(nb, SEG)),
            seg_lens=jnp.asarray(lens.reshape(nb, SEG)),
            seg_occ=jnp.asarray(occ_seg.astype(np.int32)),
            C=jnp.asarray(c_arr),
            size=size,
            n_runs=r,
        )

    # -- the segment probe (shared by every query) ----------------------------

    def _probe(self, i: jax.Array):
        """For each query position i: the segment row and intra-segment run.

        Returns (row_syms [Q,SEG], row_lens [Q,SEG], occ_base [Q,LANES],
        k [Q] run-in-segment index, partial [Q] positions consumed inside
        that run, in_run [Q,SEG] mask of runs strictly before k).
        """
        i = i.astype(jnp.int32)
        j = jnp.searchsorted(self.hdr, i, side="right") - 1
        j = jnp.clip(j, 0, self.hdr.shape[0] - 1)
        row_starts = self.seg_starts[j]                      # [Q, SEG]
        row_syms = self.seg_syms[j]
        row_lens = self.seg_lens[j]
        occ_base = self.seg_occ[j]                           # [Q, LANES]
        within = row_starts <= i[:, None]                    # [Q, SEG]
        k = jnp.maximum(jnp.sum(within.astype(jnp.int32), axis=1) - 1, 0)
        start_k = jnp.take_along_axis(row_starts, k[:, None], axis=1)[:, 0]
        len_k = jnp.take_along_axis(row_lens, k[:, None], axis=1)[:, 0]
        partial = jnp.clip(i - start_k, 0, len_k)
        before = within & (row_starts < start_k[:, None])    # runs before k
        return row_syms, row_lens, occ_base, k, partial, before

    # -- core queries (all batched) -------------------------------------------

    @jax.jit
    def ranks_all(self, i: jax.Array) -> jax.Array:
        """rank(i, c) for every c: int32[Q, LANES].  i in [0, size]."""
        row_syms, row_lens, occ_base, k, partial, before = self._probe(i)
        sym_k = jnp.take_along_axis(row_syms, k[:, None], axis=1)[:, 0]
        # intra-segment occ: sum of lens of runs before k, per char lane
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2)
        onehot = (row_syms[:, :, None] == lanes)             # [Q, SEG, LANES]
        masked = jnp.where(onehot & before[:, :, None], row_lens[:, :, None], 0)
        intra = jnp.sum(masked, axis=1)                      # [Q, LANES]
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], LANES), 1)
        return occ_base + intra + jnp.where(lane_ids == sym_k[:, None],
                                            partial[:, None], 0)

    @jax.jit
    def rank(self, i: jax.Array, c: jax.Array) -> jax.Array:
        """rank(i, c) per (i, c) pair: int32[Q]."""
        row_syms, row_lens, occ_base, k, partial, before = self._probe(i)
        c = c.astype(jnp.int32)
        sym_k = jnp.take_along_axis(row_syms, k[:, None], axis=1)[:, 0]
        intra = jnp.sum(jnp.where((row_syms == c[:, None]) & before,
                                  row_lens, 0), axis=1)
        base = jnp.take_along_axis(occ_base, c[:, None], axis=1)[:, 0]
        return base + intra + jnp.where(sym_k == c, partial, 0)

    @jax.jit
    def inverse_select(self, i: jax.Array):
        """(rank(i, BWT[i]), BWT[i]) per position (bwt.cpp:445-464)."""
        row_syms, row_lens, occ_base, k, partial, before = self._probe(i)
        sym = jnp.take_along_axis(row_syms, k[:, None], axis=1)[:, 0]
        intra = jnp.sum(jnp.where((row_syms == sym[:, None]) & before,
                                  row_lens, 0), axis=1)
        base = jnp.take_along_axis(occ_base, sym[:, None], axis=1)[:, 0]
        return base + intra + partial, sym

    @jax.jit
    def access(self, i: jax.Array) -> jax.Array:
        row_syms, _, _, k, _, _ = self._probe(i)
        return jnp.take_along_axis(row_syms, k[:, None], axis=1)[:, 0]

    # -- LF layer (fmi.h:146-193) ---------------------------------------------

    @jax.jit
    def LF_all(self, i: jax.Array) -> jax.Array:
        """LF(i, c) = C[c] + rank(i, c) for every c at once: int32[Q, LANES]."""
        return self.C[:LANES][None, :] + self.ranks_all(i)

    @jax.jit
    def LF(self, i: jax.Array, c: jax.Array) -> jax.Array:
        return self.C[c] + self.rank(i, c)

    @jax.jit
    def LF_step(self, i: jax.Array):
        """(LF(i), BWT[i]) batched (utils.h:335-341)."""
        rnk, sym = self.inverse_select(i)
        return self.C[sym] + rnk, sym

    def char_range(self, c: jax.Array):
        """Closed SA range of character c: (C[c], C[c+1]-1)."""
        return self.C[c], self.C[c + 1] - 1


# -- backward search ----------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_len",))
def backward_search(index: DeviceFMIndex, patterns: jax.Array,
                    lengths: jax.Array, max_len: int):
    """Batched backward search: closed SA ranges for a batch of patterns.

    patterns: int32[Q, max_len] comp values, right-aligned padding ignored via
    `lengths`.  Returns (sp, ep) int32[Q] each; empty matches have ep < sp.
    The device analog of FMI::find (fmi.h:195-209), vectorized over queries
    instead of characters.
    """
    q = patterns.shape[0]
    last = patterns[jnp.arange(q), lengths - 1]
    sp = index.C[last]
    ep = index.C[last + 1] - 1

    def body(t, carry):
        sp, ep = carry
        # character at distance t+1 from the end, per query
        idx = lengths - 2 - t
        active = (idx >= 0) & (ep >= sp)
        c = patterns[jnp.arange(q), jnp.clip(idx, 0, max_len - 1)]
        new_sp = index.C[c] + index.rank(sp, c)
        new_ep = index.C[c] + index.rank(ep + 1, c) - 1
        sp = jnp.where(active, new_sp, sp)
        ep = jnp.where(active, new_ep, ep)
        return sp, ep

    sp, ep = jax.lax.fori_loop(0, max_len - 1, body, (sp, ep))
    return sp, ep


def batch_count(index: DeviceFMIndex, patterns_np, char2comp: np.ndarray) -> np.ndarray:
    """Occurrence counts for a list of str/bytes patterns (host convenience)."""
    if not patterns_np:
        return np.zeros(0, dtype=np.int64)
    comps = []
    for p in patterns_np:
        if isinstance(p, str):
            p = p.encode()
        if isinstance(p, (bytes, bytearray)):
            arr = char2comp[np.frombuffer(bytes(p), dtype=np.uint8)]
        else:
            arr = np.asarray(p)
        comps.append(arr.astype(np.int32))
    max_len = max(c.size for c in comps)
    q = len(comps)
    pat = np.zeros((q, max_len), dtype=np.int32)
    lens = np.zeros(q, dtype=np.int32)
    for j, c in enumerate(comps):
        pat[j, : c.size] = c
        lens[j] = c.size
    sp, ep = backward_search(index, jnp.asarray(pat), jnp.asarray(lens), max_len)
    return np.maximum(0, np.asarray(ep, dtype=np.int64) - np.asarray(sp, dtype=np.int64) + 1)
