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
        """Stream record-table slabs host -> owning device, one at a time.

        No device (and no host temporary) ever holds more than one shard's
        slab: the host nibble-packs each slab's 32-position blocks from the
        run stream, uploads 0.5 B/position to the owning device, and that
        device derives its own [slab, REC] records; slab-start occ bases
        come from a host prefix over the run lengths, so the occ columns
        remain GLOBAL cumulative counts.  This is what makes "BWT larger
        than one chip's HBM" real rather than a scatter of a single-device
        build (the whole point of the design, paper.tex:186-205).
        """
        from .rank_jax import SIGMA as _SIGMA, _build_rec_device

        mesh = mesh or make_mesh()
        n = mesh.devices.size
        devices = mesh.devices.reshape(-1)
        size = runs.size()
        if size >= 2**31:
            raise ValueError("shard the collection first: 2^31 positions "
                             "per block-sharded index (int32 layout)")
        nblk = size // BLK + 1
        slab = -(-nblk // n)
        slab_pos = slab * BLK

        counts = runs.counts(_SIGMA) if C is None else np.asarray(C)
        c_arr = np.zeros(LANES + 1, dtype=np.int32)
        c_arr[: counts.size + 1] = np.concatenate(([0], np.cumsum(counts)))
        c_arr[counts.size + 1:] = c_arr[counts.size]

        # slab-start global occ bases: one prefix pass over the runs
        starts = runs.run_starts()
        bases = np.zeros((n, LANES), dtype=np.int32)
        onehot_cum = np.zeros(LANES, dtype=np.int64)
        cum = np.concatenate((starts, [size]))
        for d in range(1, n):
            p = min(d * slab_pos, size)
            # counts of each char in [prev boundary, p)
            lo, hi = min((d - 1) * slab_pos, size), p
            i0 = int(np.searchsorted(cum, lo, side="right")) - 1
            i1 = int(np.searchsorted(cum, hi, side="left"))
            if i1 > i0:
                s = runs.syms[i0:i1]
                l = runs.lens[i0:i1].copy()
                l[0] -= lo - cum[i0]
                l[-1] -= cum[i1] - hi
                onehot_cum += np.bincount(s, weights=l,
                                          minlength=LANES).astype(np.int64)
            bases[d] = onehot_cum
        base_rows = jnp.asarray(bases)

        add_base = jax.jit(
            lambda nib, base: _build_rec_device(nib).at[:, :LANES].add(
                base[None, :]),
            static_argnames=())

        shards = []
        chunks = runs.iter_chunks(slab_pos)
        for d in range(n):
            # host temp: ONE slab of nibbles (0.5 B/position)
            nib = np.full(slab_pos // 2, _SIGMA | (_SIGMA << 4),
                          dtype=np.uint8)
            lo = min(d * slab_pos, size)
            if lo < size:
                c_syms, c_lens = next(chunks)
                win = np.repeat(c_syms, c_lens)
                if win.size % BLK:
                    win = np.concatenate(
                        [win, np.full((-win.size) % BLK, _SIGMA, np.uint8)])
                blk2 = win.reshape(-1, BLK)
                packed = (blk2[:, :16] | (blk2[:, 16:] << 4)).astype(np.uint8)
                nib[: packed.size] = packed.reshape(-1)
            nib_dev = jax.device_put(jnp.asarray(nib), devices[d])
            shards.append(add_base(nib_dev, jax.device_put(base_rows[d],
                                                           devices[d])))

        rec = jax.make_array_from_single_device_arrays(
            (slab * n, REC), NamedSharding(mesh, P(SEQ_AXIS, None)), shards)
        C_dev = jax.device_put(jnp.asarray(c_arr), NamedSharding(mesh, P()))
        return cls(rec=rec, C=C_dev, size=size, n_shards=n, slab=slab)

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
