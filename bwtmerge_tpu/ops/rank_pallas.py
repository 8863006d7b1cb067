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

TILE = 1024       # record-table blocks per grid step (rel <= TILE*BLK = 2^15,
                  # so the hi byte plane stays <= 256 — still bf16-exact)
QT = 256          # queries per DMA chunk
OUT_W = 16        # output row: LANES ranks, the symbol at q, zero padding


def _kernel(qs_ref, occ_ref, words_ref, q_hbm, out_hbm, qbuf, obuf, prev_buf,
            sem_in, sem_out, sem_prev):
    t = pl.program_id(0)
    q0 = qs_ref[t]
    q1 = qs_ref[t + 1]

    @pl.when(q1 > q0)   # empty tiles cost only the pipelined table DMA
    def _process():
        # PRE-TRANSPOSED planes (build_probe_planes): queries live on the
        # 128-lane axis so every DMA window is lane-aligned, the one-hot
        # matmuls are [k, TILE] @ [TILE, QT], and — unlike the row-major
        # record table — NO in-kernel transpose/relayout of O(TILE) data is
        # needed (the per-tile relayouts were 3-4x the matmul time).
        occ = occ_ref[:]                           # [LANES, TILE] (pipelined)
        base_col = occ[:, 0:1]                     # occ at tile start [8, 1]
        rel = occ - base_col                       # <= TILE*BLK = 2^16
        lo_t = (rel & 0xFF).astype(jnp.float32)    # byte planes: bf16-exact
        hi_t = (rel >> 8).astype(jnp.float32)
        words = words_ref[:].astype(jnp.uint32)    # [LANES, TILE] packed syms
        # values <= 255; Mosaic lacks uint32->f32, so bounce through int32
        syms_t = jnp.concatenate(
            [((words >> s) & 0xFF).astype(jnp.int32).astype(jnp.float32)
             for s in (0, 8, 16, 24)], axis=0)     # [BLK, TILE] permuted

        tile_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
        # permuted lane -> in-block position map (rank_jax._POS_OF_LANE),
        # built from iota in-kernel (captured constants are rejected)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BLK, 1), 0)
        pos_of_lane = 4 * (lane & 7) + (lane >> 3)  # [BLK, 1]

        # Queries are processed in GLOBAL lane-aligned windows
        # [w*QT, (w+1)*QT), double-buffered: window k+1's input DMA and the
        # boundary-window output readbacks fly while window k computes, and
        # output DMAs drain asynchronously (slot reused after 2 windows).
        # A boundary window (first/last of this tile's range) is visited by
        # both adjacent tiles; each owns exactly the rows whose blocks it
        # holds (valid below) and merges them into the existing output
        # window — sequential grid steps make the read-modify-write
        # race-free.  Interior windows skip the readback entirely.
        w0 = q0 // QT
        n_w = pl.cdiv(q1, QT) - w0
        w_last = w0 + n_w - 1

        def start_of(k):
            return pl.multiple_of((w0 + k) * QT, QT)

        def in_dma(k, slot):
            return pltpu.make_async_copy(
                q_hbm.at[:, pl.ds(start_of(k), QT)], qbuf.at[slot],
                sem_in.at[slot])

        def prev_dma(k, slot):
            return pltpu.make_async_copy(
                out_hbm.at[:, pl.ds(start_of(k), QT)], prev_buf.at[slot],
                sem_prev.at[slot])

        def is_boundary(k):
            return ((w0 + k) == w0) | ((w0 + k) == w_last)

        in_dma(0, 0).start()

        @pl.when(is_boundary(0))
        def _():
            prev_dma(0, 0).start()

        def chunk(k, _):
            slot = k % 2
            nxt = (k + 1) % 2

            @pl.when(k + 1 < n_w)
            def _():
                in_dma(k + 1, nxt).start()

                @pl.when(is_boundary(k + 1))
                def _():
                    prev_dma(k + 1, nxt).start()

            in_dma(k, slot).wait()
            q = qbuf[slot]                                   # [1, QT] int32
            blk = (q >> 5) - t * TILE                        # [1, QT]
            valid = (blk >= 0) & (blk < TILE)                # [1, QT]
            oh = ((blk == tile_iota) & valid).astype(jnp.float32)  # [TILE,QT]

            occ_lo = jnp.dot(lo_t, oh, preferred_element_type=jnp.float32)
            occ_hi = jnp.dot(hi_t, oh, preferred_element_type=jnp.float32)
            occ_q = (base_col + occ_lo.astype(jnp.int32)
                     + (occ_hi.astype(jnp.int32) << 8))      # [LANES, QT]

            syms_q = jnp.dot(syms_t, oh,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.int32)             # [BLK, QT]
            off = q & (BLK - 1)                              # [1, QT]
            before = pos_of_lane < off                       # [BLK, QT]
            rows = [jnp.sum(((syms_q == c) & before).astype(jnp.int32),
                            axis=0, keepdims=True) for c in range(LANES)]
            # row LANES: the symbol AT q (for LF_step / inverse_select);
            # q == size lands in the pad block, whose symbols are SIGMA
            at = jnp.sum(jnp.where(pos_of_lane == off, syms_q, 0),
                         axis=0, keepdims=True)
            mine = jnp.concatenate(
                [occ_q + jnp.concatenate(rows, axis=0), at,
                 jnp.zeros((OUT_W - LANES - 1, QT), jnp.int32)], axis=0)

            @pl.when(k >= 2)   # slot's previous output DMA must have drained
            def _():
                pltpu.make_async_copy(
                    obuf.at[slot], out_hbm.at[:, pl.ds(start_of(k - 2), QT)],
                    sem_out.at[slot]).wait()

            @pl.when(is_boundary(k))
            def _():
                prev_dma(k, slot).wait()
                obuf[slot] = jnp.where(valid, mine, prev_buf[slot])

            @pl.when(jnp.logical_not(is_boundary(k)))
            def _():
                obuf[slot] = mine

            pltpu.make_async_copy(
                obuf.at[slot], out_hbm.at[:, pl.ds(start_of(k), QT)],
                sem_out.at[slot]).start()
            return 0

        jax.lax.fori_loop(0, n_w, chunk, 0)

        def drain(k, _):   # epilogue: wait for the tail output DMAs
            @pl.when(k < n_w)
            def _():
                pltpu.make_async_copy(
                    obuf.at[k % 2], out_hbm.at[:, pl.ds(start_of(k), QT)],
                    sem_out.at[k % 2]).wait()
            return 0

        jax.lax.fori_loop(jnp.maximum(0, n_w - 2), n_w, drain, 0)


@jax.jit
def build_probe_planes(rec: jax.Array):
    """Pre-transposed probe planes from a row-major record table.

    Returns (occ_t int32[LANES, P], words_t int32[LANES, P]) with P padded
    to a TILE multiple (pad columns are zeros; live queries never select
    them).  Same bytes per block as the record table — the transpose just
    moves the relayout from every kernel tile to one table-build pass.
    Callers that probe repeatedly (the search loops) build the planes ONCE
    per program and amortize the transpose over every depth step.
    """
    nblk = rec.shape[0]
    pad = (-nblk) % TILE
    occ_t = jnp.pad(rec[:, :LANES].T, ((0, 0), (0, pad)))
    words_t = jnp.pad(rec[:, LANES:].T, ((0, 0), (0, pad)))
    return occ_t, words_t


@functools.partial(jax.jit, static_argnames=("interpret",))
def _streamed_ranks_padded(planes, q_sorted: jax.Array,
                           interpret: bool = False) -> jax.Array:
    occ_t, words_t = planes
    ntiles = occ_t.shape[1] // TILE
    q = q_sorted.astype(jnp.int32)
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * (TILE * BLK)
    qs = jnp.searchsorted(q, bounds, side="left").astype(jnp.int32)
    q_pad = jnp.pad(q, (0, QT), constant_values=jnp.int32(2**31 - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((LANES, TILE), lambda t, qs: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, TILE), lambda t, qs: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # queries stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),     # output stays in HBM
        scratch_shapes=[
            pltpu.VMEM((2, 1, QT), jnp.int32),         # qbuf, 2 slots
            pltpu.VMEM((2, OUT_W, QT), jnp.int32),     # obuf, 2 slots
            pltpu.VMEM((2, OUT_W, QT), jnp.int32),     # prev_buf, 2 slots
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUT_W, q_sorted.shape[0] + QT),
                                       jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(qs, occ_t, words_t, q_pad.reshape(1, -1))


def streamed_probe_planes(planes, q_sorted: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Raw streamed probe over pre-built planes: int32[OUT_W, Q] — ranks in
    [:LANES], the symbol at q in row LANES.  q_sorted must be
    non-decreasing int32 positions in [0, size] (trailing int32-max
    sentinels allowed; their columns are untouched scratch)."""
    out = _streamed_ranks_padded(planes, q_sorted, interpret=interpret)
    return out[:, : q_sorted.shape[0]]


def streamed_probe(rec: jax.Array, q_sorted: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """streamed_probe_planes over a row-major record table (builds the
    planes on the fly — one-shot callers only; loops should build once)."""
    return streamed_probe_planes(build_probe_planes(rec), q_sorted,
                                 interpret=interpret)


def streamed_ranks_all(index, q_sorted: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """ranks_all for a SORTED query batch by streaming the record table."""
    return streamed_probe(index.rec, q_sorted, interpret)[:LANES].T


def ranks_all_unsorted(index, q: jax.Array, interpret: bool = False):
    """Convenience wrapper: sort -> streamed kernel -> unpermute."""
    order = jnp.argsort(q)
    ans = streamed_ranks_all(index, q[order], interpret=interpret)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ans[inv]


_SENT = 2**31 - 1


def _row_select(p: jax.Array, c: jax.Array) -> jax.Array:
    """p[c[j], j] per column via one-hot sum (no per-lane row gather)."""
    acc = jnp.zeros_like(c)
    for r in range(LANES):
        acc = acc + jnp.where(c == r, p[r], 0)
    return acc


@functools.partial(jax.jit, static_argnames=("max_len", "interpret"))
def backward_search_streamed(index, patterns: jax.Array, lengths: jax.Array,
                             max_len: int, interpret: bool = False):
    """Batched backward search with the streamed-rank kernel.

    Same contract as rank_jax.backward_search, ~4x fewer ns per rank row on
    v5e for large batches: each LF step gathers nothing — the 2Q range
    endpoints are sorted (carrying their lane and character), answered by
    one table-streaming probe, and realigned by a payload sort, the same
    sort/probe/realign trick the search's singles loop uses
    (ops/search_jax._expand_step_streamed).
    """
    q = patterns.shape[0]
    lane2 = jnp.arange(2 * q, dtype=jnp.int32)
    last = patterns[jnp.arange(q), lengths - 1]
    sp = index.C[last]
    ep = index.C[last + 1] - 1
    planes = build_probe_planes(index.rec)  # once, amortized over all steps

    def body(t, carry):
        sp, ep = carry
        idx = lengths - 2 - t
        active = (idx >= 0) & (ep >= sp)
        c = patterns[jnp.arange(q), jnp.clip(idx, 0, max_len - 1)]
        c2 = jnp.concatenate([c, c]).astype(jnp.int32)
        qq = jnp.concatenate([sp, ep + 1]).astype(jnp.int32)
        act2 = jnp.concatenate([active, active])
        key = jnp.where(act2, qq, jnp.int32(_SENT))
        ks, ls, cs = jax.lax.sort((key, lane2, c2), num_keys=1,
                                  is_stable=False)
        pr = streamed_probe_planes(planes, ks, interpret=interpret)[:LANES]
        rk = _row_select(pr, jnp.clip(cs, 0, LANES - 1))
        _, rk = jax.lax.sort((ls, rk), num_keys=1, is_stable=False)
        new_sp = index.C[c] + rk[:q]
        new_ep = index.C[c] + rk[q:] - 1
        sp = jnp.where(active, new_sp, sp)
        ep = jnp.where(active, new_ep, ep)
        return sp, ep

    return jax.lax.fori_loop(0, max_len - 1, body, (sp, ep))
