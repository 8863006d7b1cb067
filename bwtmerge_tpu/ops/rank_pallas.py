"""Pallas streamed-rank kernel: batched ranks_all for SORTED queries.

The XLA gather path (rank_jax.DeviceFMIndex.ranks_all) pays ~34 ns of HBM
random-access latency per query row regardless of batch size.  This kernel
flips the access pattern: the grid marches the record table HBM -> VMEM tile
by tile at STREAMING bandwidth (Pallas auto-pipelines the tile loads), and
each tile answers exactly the queries whose blocks fall inside it — queries
must be sorted, so the per-tile query ranges are plain offsets computed with
one searchsorted outside the kernel and scalar-prefetched in.

Inside a tile, "gather row by index" is reformulated as one-hot matmuls on
the MXU.  The backend's MXU multiplies in bf16 regardless of
preferred_element_type (measured: fp32 one-hot gathers of >2^8 values come
back off by 1e-3 relative), so every matmul operand is kept <= 2^8, where
bf16 is exact and the single nonzero term per one-hot row accumulates
exactly in the fp32 accumulator:

  occ_q   = tile_base + onehot @ lo8(rel_occ) + (onehot @ hi8(rel_occ)) << 8
  syms_q  = onehot @ unpacked_symbols          (values <= SIGMA)

rel_occ is the in-tile relative occ (<= TILE*BLK = 2^15), so two byte planes
suffice.  The in-block prefix count then runs on the VPU over the gathered
32 symbols, identical math to rank_jax._count_lanes.

Chunked query processing writes through fixed-size DMAs; a tile's final
chunk may overrun into the next tile's query range — those rows are
recomputed and overwritten by the next (sequential) grid step, and the
output is padded by one chunk so the last tile's overrun lands in scratch
rows.  Reference counterpart: the per-query block decode BWT::rank
(bwt.cpp:318-341), whose batched analog this replaces for large sorted
batches (ROADMAP #1 / the block-sharded streaming case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .rank_jax import BLK, LANES, REC

try:  # Pallas imports fail cleanly on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

TILE = 1024       # record-table rows (blocks) per grid step
QT = 256          # queries per DMA chunk


def _kernel(qs_ref, rec_ref, q_hbm, out_hbm, qbuf, obuf, sem_in, sem_out):
    t = pl.program_id(0)
    q0 = qs_ref[t]
    q1 = qs_ref[t + 1]

    rec = rec_ref[:]                               # [TILE, REC] (pipelined)
    occ = rec[:, :LANES]
    base = occ[0:1, :]                             # occ at tile start [1, 8]
    rel = occ - base                               # <= TILE*BLK = 2^15
    lo = (rel & 0xFF).astype(jnp.float32)          # byte planes: bf16-exact
    hi = (rel >> 8).astype(jnp.float32)
    words = rec[:, LANES:].astype(jnp.uint32)
    syms = jnp.concatenate(
        [((words >> s) & 0xFF).astype(jnp.float32) for s in (0, 8, 16, 24)],
        axis=1)                                    # [TILE, BLK] permuted

    tile_iota = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    # permuted lane -> in-block position map (rank_jax._POS_OF_LANE), built
    # from iota in-kernel (captured constants are rejected by pallas_call)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    pos_of_lane = 4 * (lane & 7) + (lane >> 3)     # [1, BLK]

    def chunk(i, _):
        start = q0 + i * QT
        copy_in = pltpu.make_async_copy(
            q_hbm.at[0, pl.ds(start, QT)], qbuf.at[0], sem_in)
        copy_in.start()
        copy_in.wait()
        q = qbuf[0, :]                                       # [QT]
        blk = (q >> 5) - t * TILE
        valid = (blk >= 0) & (blk < TILE)
        oh = ((blk[:, None] == tile_iota) & valid[:, None]).astype(jnp.float32)

        occ_lo = jnp.dot(oh, lo, preferred_element_type=jnp.float32)
        occ_hi = jnp.dot(oh, hi, preferred_element_type=jnp.float32)
        occ_q = (base + occ_lo.astype(jnp.int32)
                 + (occ_hi.astype(jnp.int32) << 8))          # [QT, LANES]

        syms_q = jnp.dot(oh, syms,
                         preferred_element_type=jnp.float32).astype(jnp.int32)
        before = pos_of_lane < (q & (BLK - 1))[:, None]      # [QT, BLK]
        cols = [jnp.sum(((syms_q == c) & before).astype(jnp.int32),
                        axis=1, keepdims=True) for c in range(LANES)]
        obuf[:] = occ_q + jnp.concatenate(cols, axis=1)

        copy_out = pltpu.make_async_copy(
            obuf, out_hbm.at[pl.ds(start, QT), :], sem_out)
        copy_out.start()
        copy_out.wait()
        return 0

    jax.lax.fori_loop(0, pl.cdiv(q1 - q0, QT), chunk, 0)


@functools.partial(jax.jit, static_argnames=("nblk", "interpret"))
def _streamed_ranks_padded(rec: jax.Array, q_sorted: jax.Array, nblk: int,
                           interpret: bool = False) -> jax.Array:
    ntiles = pl.cdiv(nblk, TILE)
    q = q_sorted.astype(jnp.int32)
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * (TILE * BLK)
    qs = jnp.searchsorted(q, bounds, side="left").astype(jnp.int32)
    q_pad = jnp.pad(q, (0, QT), constant_values=jnp.int32(2**31 - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TILE, REC), lambda t, qs: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),       # queries stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # output stays in HBM
        scratch_shapes=[
            pltpu.VMEM((1, QT), jnp.int32),
            pltpu.VMEM((QT, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q_sorted.shape[0] + QT, LANES),
                                       jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(qs, rec, q_pad.reshape(1, -1))


def streamed_ranks_all(index, q_sorted: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """ranks_all for a SORTED query batch by streaming the record table.

    index: DeviceFMIndex; q_sorted: int32[Q] non-decreasing positions in
    [0, size] (trailing int32-max sentinels allowed — their rows are
    untouched scratch).  Returns int32[Q, LANES].
    """
    nblk = index.rec.shape[0]
    out = _streamed_ranks_padded(index.rec, q_sorted, nblk=nblk,
                                 interpret=interpret)
    return out[: q_sorted.shape[0]]


def ranks_all_unsorted(index, q: jax.Array, interpret: bool = False):
    """Convenience wrapper: sort -> streamed kernel -> unpermute."""
    order = jnp.argsort(q)
    ans = streamed_ranks_all(index, q[order], interpret=interpret)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ans[inv]
