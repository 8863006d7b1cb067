"""Block-sharded device FM-index: BWTs larger than one chip's HBM.

The single-device layout (ops/rank_jax.py) replicates the record table per
chip; at terabase scale the table exceeds HBM (2 B/position).  Here the
table's BLOCK ROWS are sharded across the mesh — shard d owns the contiguous
slab of 32-position blocks [d*S, (d+1)*S) — and a batched rank query works
shard-locally + one psum:

    every shard receives every query (queries are small: Q * 4 B);
    a shard probes only queries whose block it owns, contributing 0 lanes
    otherwise (the occ columns in each record are GLOBAL cumulative counts,
    so the owner's answer is complete by itself);
    psum over the mesh assembles the full answer.

This is the standard sharded-table-lookup pattern (cf. embedding shards):
compute is duplicated n_dev-fold on the (tiny) query batch while memory
capacity scales with the mesh — the right trade when HBM, not FLOPs, binds
(SURVEY.md §7 "HBM budget at terabase scale").  The all-gather of queries
and the psum ride ICI inside jit; no host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.runs import RunArrays
from ..parallel.mesh import SEQ_AXIS, make_mesh
from .rank_jax import BLK, LANES, REC, SIGMA, DeviceFMIndex


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ShardedFMIndex:
    """Record table sharded by block rows over a 1-D mesh."""

    rec: jax.Array    # int32[NBLK_padded, REC], sharded P(SEQ_AXIS, None)
    C: jax.Array      # int32[LANES+1], replicated
    size: int         # static
    n_shards: int     # static
    slab: int         # static: block rows per shard

    def tree_flatten(self):
        return ((self.rec, self.C), (self.size, self.n_shards, self.slab))

    @classmethod
    def tree_unflatten(cls, aux, children):
        rec, C = children
        size, n_shards, slab = aux
        return cls(rec=rec, C=C, size=size, n_shards=n_shards, slab=slab)

    @classmethod
    def build(cls, runs: RunArrays, C: np.ndarray | None = None,
              mesh: Optional[Mesh] = None) -> "ShardedFMIndex":
        """Build on host and scatter block slabs across the mesh.

        (At true terabase scale the host would stream slabs shard by shard;
        the layout and query path are identical.)
        """
        mesh = mesh or make_mesh()
        n = mesh.devices.size
        local = DeviceFMIndex.build(runs, C)
        rec_h = np.asarray(local.rec)
        nblk = rec_h.shape[0]
        slab = -(-nblk // n)
        padded = np.zeros((slab * n, REC), dtype=np.int32)
        padded[:nblk] = rec_h
        rec = jax.device_put(jnp.asarray(padded),
                             NamedSharding(mesh, P(SEQ_AXIS, None)))
        C_dev = jax.device_put(local.C, NamedSharding(mesh, P()))
        return cls(rec=rec, C=C_dev, size=local.size, n_shards=n, slab=slab)

    # -- queries (call inside jit; shard_map routes the probe) ---------------

    def ranks_all(self, i: jax.Array, mesh: Mesh) -> jax.Array:
        """rank(i, c) for every c: int32[Q, LANES]; i replicated."""
        slab = self.slab

        def shard_fn(rec_local, C, i):
            # rec_local: [slab, REC] this shard's slab; i: [Q] (replicated)
            res = _probe_local(rec_local, slab, i)
            return jax.lax.psum(res, SEQ_AXIS)

        fn = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(SEQ_AXIS, None), P(), P()),
                           out_specs=P())
        return fn(self.rec, self.C, i)

    def LF_all(self, i: jax.Array, mesh: Mesh) -> jax.Array:
        return self.C[:LANES][None, :] + self.ranks_all(i, mesh)


def sharded_backward_search_blocked(index: ShardedFMIndex, mesh: Mesh,
                                    patterns: np.ndarray, lengths: np.ndarray
                                    ) -> np.ndarray:
    """Backward search against a block-sharded index (host loop over pattern
    characters; each step is one sharded ranks_all over ICI)."""
    q, max_len = patterns.shape
    sp = np.asarray(index.C)[patterns[np.arange(q), lengths - 1]]
    ep = np.asarray(index.C)[patterns[np.arange(q), lengths - 1] + 1] - 1
    C = np.asarray(index.C)
    for t in range(max_len - 2, -1, -1):
        idx = lengths - 2 - (max_len - 2 - t)
        active = (idx >= 0) & (ep >= sp)
        c = patterns[np.arange(q), np.clip(idx, 0, max_len - 1)]
        bounds = np.concatenate([sp, ep + 1]).astype(np.int32)
        ranks = np.asarray(index.ranks_all(jnp.asarray(bounds), mesh))
        r_sp = ranks[:q][np.arange(q), c]
        r_ep = ranks[q:][np.arange(q), c]
        sp = np.where(active, C[c] + r_sp, sp)
        ep = np.where(active, C[c] + r_ep - 1, ep)
    return np.maximum(0, ep - sp + 1)


# -- wavefront search against sharded indexes ---------------------------------
#
# The configs[4] workload shape (SURVEY.md §6): the merged index no longer
# fits one chip, so BOTH record tables are block-sharded across the mesh and
# the whole search runs as ONE compiled shard_map program — frontier state
# replicated, every batched rank probe answered by the owning shard and
# psum-combined over ICI.  Rank compute is duplicated mesh-wide (HBM capacity
# is what binds, not FLOPs); emissions land replicated on every shard.


def _probe_local(rec_local: jax.Array, slab: int, i: jax.Array) -> jax.Array:
    """Shard-local ranks_all contribution (0 lanes for unowned queries)."""
    from .rank_jax import _count_lanes, _decode_row

    d = jax.lax.axis_index(SEQ_AXIS)
    j = (i.astype(jnp.int32) >> 5) - d * slab
    owned = (j >= 0) & (j < slab)
    row = rec_local[jnp.clip(j, 0, slab - 1)]
    occ_base, syms, before, _ = _decode_row(row, i)
    res = occ_base + _count_lanes(syms, before)
    return jnp.where(owned[:, None], res, 0)


def wavefront_search_sharded(a_idx: ShardedFMIndex, b_idx: ShardedFMIndex,
                             mesh: Mesh, b_sp0: int, b_ep0: int,
                             a_sequences: int,
                             frontier_cap: int = 4096,
                             emit_cap: int = 65536):
    """Whole search as one shard_map program over block-sharded indexes.

    Returns host (values int64[K], counts int64[K], overflowed) — the
    replicated emission buffers are read back once from shard 0.
    """
    cap = frontier_cap
    a_slab, b_slab = a_idx.slab, b_idx.slab

    def kernel(a_rec, b_rec, C_a, C_b, sp0v, ep0v):
        sp0s = sp0v[0]
        ep0s = ep0v[0]
        zero = (sp0s * 0).astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]

        def ranks_a(i):
            return jax.lax.psum(_probe_local(a_rec, a_slab, i), SEQ_AXIS)

        def ranks_b(i):
            return jax.lax.psum(_probe_local(b_rec, b_slab, i), SEQ_AXIS)

        a_pos = (jnp.zeros(cap, jnp.int32) + zero).at[0].set(a_sequences + zero)
        b_sp = jnp.zeros(cap, jnp.int32).at[0].set(sp0s)
        b_ep = jnp.full(cap, -1, jnp.int32).at[0].set(ep0s)
        count = jnp.where(ep0s >= sp0s, jnp.int32(1), jnp.int32(0))
        values = jnp.zeros(emit_cap, jnp.int32) + zero
        counts = jnp.zeros(emit_cap, jnp.int32) + zero
        window = min(cap, emit_cap)

        def cond(st):
            return (st[3] > 0) & ~st[7]

        def body(st):
            a_pos, b_sp, b_ep, count, values, counts, n_emit, ovf = st
            valid = lane < count
            safe = n_emit + cap <= emit_cap
            start = jnp.where(safe, n_emit, 0)
            values = jax.lax.dynamic_update_slice(values, a_pos[:window], (start,))
            counts = jax.lax.dynamic_update_slice(
                counts, jnp.where(valid, b_ep - b_sp + 1, 0)[:window], (start,))
            n_emit = n_emit + count
            ovf = ovf | ~safe

            rb_sp = ranks_b(b_sp)
            rb_ep = ranks_b(b_ep + 1)
            ra = ranks_a(a_pos)
            cs = jnp.arange(1, SIGMA, dtype=jnp.int32)
            csp = C_b[cs][None, :] + rb_sp[:, 1:SIGMA]
            cep = C_b[cs][None, :] + rb_ep[:, 1:SIGMA] - 1
            ca = C_a[cs][None, :] + ra[:, 1:SIGMA]
            keep = (cep >= csp) & valid[:, None]

            keep_f = keep.reshape(-1)
            child_count = jnp.sum(keep_f.astype(jnp.int32))
            key = jnp.where(keep_f, jnp.int32(0), jnp.int32(1))
            _, oa, osp, oep = jax.lax.sort(
                (key, ca.reshape(-1), csp.reshape(-1),
                 jnp.where(keep_f, cep.reshape(-1), -1)),
                num_keys=1, is_stable=False)
            ovf = ovf | (child_count > cap)
            return (oa[:cap], osp[:cap], oep[:cap],
                    jnp.minimum(child_count, cap), values, counts, n_emit, ovf)

        st = (a_pos, b_sp, b_ep, count, values, counts, zero, zero != 0)
        st = jax.lax.while_loop(cond, body, st)
        return st[4], st[5], st[6], st[7]

    fn = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(SEQ_AXIS, None), P(SEQ_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P())))

    values, counts, n_emit, ovf = fn(
        a_idx.rec, b_idx.rec, a_idx.C, b_idx.C,
        jnp.asarray([b_sp0], jnp.int32), jnp.asarray([b_ep0], jnp.int32))
    n = int(np.asarray(n_emit))
    return (np.asarray(values[:n], dtype=np.int64),
            np.asarray(counts[:n], dtype=np.int64),
            bool(np.asarray(ovf)))
