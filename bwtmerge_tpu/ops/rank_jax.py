"""Device-resident FM-index: batched rank/LF over an RLE BWT in JAX.

TPU-first replacement for the reference's per-query block decode
(BWT::rank, bwt.cpp:318-341: one sd_vector rank + a <=64-byte sequential
Run::read scan per query).  Instead of pointer-chasing byte streams, the BWT
lives on device as three flat tensors:

  run_starts: int32[Rp]      text position where run r starts (pad = size+1)
  syms:       int32[Rp]      run symbol (comp value)
  occ:        int32[Rp, 8]   occ[r, c] = # of c in positions [0, run_starts[r])
                             (sigma padded to 8 lanes for the VPU)

A rank query is then: binary-search run_starts for the covering run (XLA
while-loop of gathers, O(log R)), gather one occ row, and add the intra-run
partial — thousands of queries per batched call, no host sync.  This is the
per-step primitive of the whole merge engine (SURVEY.md §3.2).

Positions are int32 by design: a per-chip BWT shard never exceeds 2^31
positions (16-32 GB HBM bounds the shard long before that); global positions
at terabase scale live in host int64 and are re-based per shard
(parallel/mesh.py).  int32 is the TPU's native integer width — int64 is
emulated at 2x cost.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.runs import RunArrays

SIGMA = 6
LANES = 8  # sigma padded to the VPU sublane-friendly width


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DeviceFMIndex:
    """Run-length FM-index resident in device memory.

    Mirrors the host RankIndex (ops/rank_np.py) with TPU-friendly layout and
    dtypes; built once per BWT and reused by every search step.
    """

    run_starts: jax.Array  # int32[Rp]
    syms: jax.Array        # int32[Rp]
    occ: jax.Array         # int32[Rp, LANES]
    C: jax.Array           # int32[LANES+1] cumulative char counts (C[c], C[sigma]=size)
    size: int              # static: total positions
    n_runs: int            # static: real (unpadded) run count

    # -- pytree plumbing ------------------------------------------------------

    def tree_flatten(self):
        return (self.run_starts, self.syms, self.occ, self.C), (self.size, self.n_runs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        run_starts, syms, occ, C = children
        size, n_runs = aux
        return cls(run_starts=run_starts, syms=syms, occ=occ, C=C,
                   size=size, n_runs=n_runs)

    # -- construction ---------------------------------------------------------

    @classmethod
    def build(cls, runs: RunArrays, C: np.ndarray | None = None,
              pad_to: int = 128) -> "DeviceFMIndex":
        """Upload a host RLE BWT; pads run count to a multiple of `pad_to`."""
        r = runs.n_runs
        size = runs.size()
        if size >= 2**31:
            raise ValueError(
                f"BWT shard of {size} positions exceeds int32 device layout; "
                "shard it first (parallel/mesh.py)")
        rp = max(pad_to, -(-max(r, 1) // pad_to) * pad_to)

        starts = np.full(rp, size + 1, dtype=np.int32)
        if r:
            starts[:r] = np.concatenate(([0], np.cumsum(runs.lens[:-1])))

        syms = np.zeros(rp, dtype=np.int32)
        syms[:r] = runs.syms

        occ = np.zeros((rp, LANES), dtype=np.int32)
        if r:
            onehot = np.zeros((r, LANES), dtype=np.int64)
            onehot[np.arange(r), runs.syms] = runs.lens
            occ_real = np.zeros((r, LANES), dtype=np.int64)
            np.cumsum(onehot[:-1], axis=0, out=occ_real[1:])
            occ[:r] = occ_real.astype(np.int32)
            # padded rows hold the final totals so queries at i == size work
            occ[r:] = (occ_real[-1] + onehot[-1]).astype(np.int32)

        counts = runs.counts(SIGMA) if C is None else np.asarray(C)
        c_arr = np.zeros(LANES + 1, dtype=np.int32)
        c_arr[: counts.size + 1] = np.concatenate(([0], np.cumsum(counts)))
        c_arr[counts.size + 1:] = c_arr[counts.size]

        return cls(
            run_starts=jnp.asarray(starts),
            syms=jnp.asarray(syms),
            occ=jnp.asarray(occ),
            C=jnp.asarray(c_arr),
            size=size,
            n_runs=r,
        )

    # -- core queries (all batched, all jit-safe) -----------------------------

    def covering_run(self, i: jax.Array) -> jax.Array:
        """Index of the run containing position i (i == size -> last run)."""
        k = jnp.searchsorted(self.run_starts, i.astype(jnp.int32), side="right") - 1
        return jnp.clip(k, 0, max(self.n_runs - 1, 0))

    @jax.jit
    def ranks_all(self, i: jax.Array) -> jax.Array:
        """rank(i, c) for every c: int32[Q, LANES].  i in [0, size]."""
        i = i.astype(jnp.int32)
        k = self.covering_run(i)
        base = self.occ[k]                                   # [Q, LANES]
        partial = jnp.clip(i - self.run_starts[k], 0, None)  # [Q]
        sym = self.syms[k]                                   # [Q]
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (i.shape[0], LANES), 1)
                  == sym[:, None])
        return base + jnp.where(onehot, partial[:, None], 0)

    @jax.jit
    def rank(self, i: jax.Array, c: jax.Array) -> jax.Array:
        """rank(i, c) per (i, c) pair: int32[Q]."""
        i = i.astype(jnp.int32)
        k = self.covering_run(i)
        partial = jnp.where(self.syms[k] == c,
                            jnp.clip(i - self.run_starts[k], 0, None), 0)
        return jnp.take_along_axis(self.occ[k], c[:, None].astype(jnp.int32),
                                   axis=1)[:, 0] + partial

    @jax.jit
    def inverse_select(self, i: jax.Array):
        """(rank(i, BWT[i]), BWT[i]) per position (bwt.cpp:445-464)."""
        i = i.astype(jnp.int32)
        k = self.covering_run(i)
        sym = self.syms[k]
        base = jnp.take_along_axis(self.occ[k], sym[:, None], axis=1)[:, 0]
        return base + jnp.clip(i - self.run_starts[k], 0, None), sym

    @jax.jit
    def access(self, i: jax.Array) -> jax.Array:
        return self.syms[self.covering_run(i.astype(jnp.int32))]

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
