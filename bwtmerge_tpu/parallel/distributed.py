"""Multi-host execution: jax.distributed bring-up + rank-range rank-array
exchange + sharded merge output.

The reference is explicitly single-node (paper.tex:197; no MPI/NCCL anywhere
— SURVEY.md §5 "distributed communication backend").  The TPU framework
scales out with the same decomposition it uses across chips:

  hosts   -> jax processes (jax.distributed.initialize)
  search  -> B's sequence blocks, partitioned per process, then per local
             device (parallel/mesh.py); the FM-indexes are replicated per
             host (block-sharding an over-HBM index: ops/rank_sharded.py)
  combine -> A-POSITION-RANGE exchange: sample-based splitters partition
             [0, |A|] into one contiguous range per process; each process
             routes its sorted RA pieces to the owning process with ONE
             all_to_all over a one-device-per-process mesh, then k-way
             merges the P received pieces locally.  Per-process peak is
             O(|RA|/P + skew), never the full rank array — the distributed
             analog of the RankArray k-way disk merge (support.h:576-638)
             with processes in place of temp files.
  merge   -> each process interleaves ITS OWN A-range against the shared
             inputs (stateful native kernel initialized at the range
             cursors) and writes a run-chunk shard; shards concatenate in
             rank order through one streaming format writer, coalescing
             the seam runs.

Single-process calls degrade to the local mesh path, so this module is safe
to use unconditionally; true multi-host runs need the driver to start one
process per host with the same coordinator address.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from ..ops.rank_jax import DeviceFMIndex
from .mesh import make_mesh, sequence_shards


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed (no-op when already initialized or when
    running single-process with no coordinator)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_info() -> Tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def _one_device_per_process():
    """One representative device per process, process-rank ordered — the
    exchange mesh for host-resident payloads (they are per-process, so a
    finer mesh would only replicate them across local devices)."""
    import jax

    by_proc = {}
    for d in jax.devices():
        if d.process_index not in by_proc:
            by_proc[d.process_index] = d
    return [by_proc[p] for p in sorted(by_proc)]


def _local_rank_array(a_idx, b_idx, a_sequences, b_sequences,
                      frontier_cap, emit_cap):
    """This process's sorted-unique RA runs for its own B-sequence block
    (searched by the per-device shard_map path over the local mesh)."""
    pid, nproc = process_info()
    my_block = sequence_shards(b_sequences, nproc)[pid]
    sp, ep = int(my_block[0]), int(my_block[1])
    if ep < sp:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), False
    from .mesh import sharded_rank_array

    return sharded_rank_array(
        a_idx, b_idx, a_sequences, ep - sp + 1, mesh=make_mesh(local_only=True),
        frontier_cap=frontier_cap, emit_cap=emit_cap, b_seq_offset=sp)


def _split_words(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """int64 -> (low, high) int32 words (jax x64 is off, so cross-process
    payloads travel as int32 pairs)."""
    return ((x & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
            (x >> 32).astype(np.int32))


def _join_words(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return (lo.view(np.uint32).astype(np.int64)
            | (hi.astype(np.int64) << 32))


def exchange_by_rank_range(values: np.ndarray, counts: np.ndarray,
                           oversample: int = 64, stats: Optional[dict] = None):
    """Route sorted-unique (values, counts) RA runs to their owning process
    by A-position range; return this process's merged range.

    Every process contributes `oversample` regular samples of its values;
    the sorted global sample's quantiles become the P-1 range splitters
    (process p owns [splitter[p-1], splitter[p]), ends open), so skewed
    rank distributions still balance to O(|RA|/P) per process.  One
    all_to_all over a one-device-per-process mesh moves each piece to its
    owner; the P received pieces k-way merge through the native pairwise
    tournament.

    Returns (my_values, my_counts, b_offset) where b_offset = total counts
    owned by lower ranges (the B-rank of this range's first insertion).
    `stats`, when given, receives exchange telemetry (exchange_width,
    recv_runs, sent_runs) for peak-memory assertions.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..models.spill import _merge_sorted_parts

    pid, nproc = process_info()
    if nproc == 1:
        if stats is not None:
            stats.update(exchange_width=0, recv_runs=values.size,
                         sent_runs=values.size)
        return values, counts, 0

    # --- splitters from regular samples (small, replicated) -------------
    r = oversample
    if values.size:
        samp = values[(np.arange(r, dtype=np.int64) * values.size) // r]
    else:
        samp = np.full(r, np.int64(2**62))  # empty: never attracts a range
    all_samp = np.sort(np.asarray(
        multihost_utils.process_allgather(samp)).reshape(-1))
    splitters = all_samp[[(q + 1) * r for q in range(nproc - 1)]]

    # --- bucket the local runs by owner ----------------------------------
    cuts = np.concatenate(([0], np.searchsorted(values, splitters),
                           [values.size]))
    piece_runs = np.diff(cuts).astype(np.int64)             # [P]
    piece_count_sums = np.asarray(
        [counts[cuts[q]:cuts[q + 1]].sum() for q in range(nproc)],
        dtype=np.int64)

    sizes = np.asarray(multihost_utils.process_allgather(piece_runs))  # [P,P]
    count_sums = np.asarray(
        multihost_utils.process_allgather(piece_count_sums))           # [P,P]
    w = max(int(sizes.max()), 1)
    if stats is not None:
        stats.update(exchange_width=w,
                     recv_runs=int(sizes[:, pid].sum()),
                     sent_runs=int(values.size))

    # --- one all_to_all over the process mesh ----------------------------
    # payload rows per piece: value lo/hi words, count lo/hi words
    send = np.zeros((nproc, 4, w), np.int32)
    for q in range(nproc):
        v = values[cuts[q]:cuts[q + 1]]
        c = counts[cuts[q]:cuts[q + 1]]
        send[q, 0, :v.size], send[q, 1, :v.size] = _split_words(v)
        send[q, 2, :v.size], send[q, 3, :v.size] = _split_words(c)

    mesh = Mesh(np.array(_one_device_per_process()), ("proc",))
    sharding = NamedSharding(mesh, P("proc"))
    g = jax.make_array_from_process_local_data(
        sharding, send.reshape(1, nproc, 4, w))

    def body(x):  # x: [1, P, 4, w] local -> [P, 1, 4, w] received
        return jax.lax.all_to_all(x, "proc", split_axis=1, concat_axis=0)

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("proc"), out_specs=P("proc")))(g)
    recv = np.asarray(
        [s.data for s in out.addressable_shards][0]).reshape(nproc, 4, w)

    # --- merge the P received pieces -------------------------------------
    parts = []
    for p in range(nproc):
        n = int(sizes[p, pid])
        if n:
            parts.append((_join_words(recv[p, 0, :n], recv[p, 1, :n]),
                          _join_words(recv[p, 2, :n], recv[p, 3, :n])))
    if parts:
        my_values, my_counts = _merge_sorted_parts(parts)
        my_values = np.ascontiguousarray(my_values)
        my_counts = np.ascontiguousarray(my_counts)
    else:
        my_values = np.zeros(0, np.int64)
        my_counts = np.zeros(0, np.int64)
    b_offset = int(count_sums[:, :pid].sum())
    return my_values, my_counts, b_offset


def multihost_rank_array_ranged(a_idx: DeviceFMIndex, b_idx: DeviceFMIndex,
                                a_sequences: int, b_sequences: int,
                                frontier_cap: int = 1 << 16,
                                emit_cap: int = 1 << 22,
                                stats: Optional[dict] = None):
    """Search + rank-range exchange: returns THIS process's range of the
    global rank array.

    Returns (values, counts, b_offset, lo, hi, drain, overflow):
      values/counts — sorted-unique RA runs owned by this process
      b_offset      — total counts in lower ranges (B-rank of the range
                      start)
      lo, hi        — this process's half-open A-position range; the
                      ranges TILE [0, inf): lo_0 = 0, lo_{p+1} = hi_p, so
                      per-range interleaves concatenate to the full output
      drain         — True on exactly one process (the last NON-EMPTY
                      range): its shard appends A's tail after its runs
      overflow      — any process's device search overflowed (all re-run
                      through the host driver in that case)
    """
    from jax.experimental import multihost_utils

    pid, nproc = process_info()
    values, counts, overflow = _local_rank_array(
        a_idx, b_idx, a_sequences, b_sequences, frontier_cap, emit_cap)
    if nproc == 1:
        if stats is not None:
            stats.update(exchange_width=0, recv_runs=values.size,
                         sent_runs=values.size)
        return values, counts, 0, 0, np.int64(2**62), True, bool(overflow)

    # splitters are recomputed inside the exchange; the tiling range
    # boundaries come from the merged ranges' FIRST values (a tiny
    # allgather): boundary between p and p+1 = p+1's first value, so p's
    # shard advances A exactly to where p+1's begins.  Empty ranges
    # collapse to lo == hi (their A span is covered by the predecessor);
    # the A tail is drained by the LAST NON-EMPTY range (trailing empty
    # ranges own nothing).
    my_v, my_c, b_offset = exchange_by_rank_range(values, counts, stats=stats)
    first = np.int64(my_v[0]) if my_v.size else np.int64(-1)
    firsts = np.asarray(multihost_utils.process_allgather(first))

    def next_first(p):
        for q in range(p + 1, nproc):
            if firsts[q] >= 0:
                return np.int64(firsts[q])
        return np.int64(2**62)

    nonempty = [q for q in range(nproc) if firsts[q] >= 0]
    drain_pid = nonempty[-1] if nonempty else 0
    lo = np.int64(0) if pid == 0 else next_first(pid - 1)
    hi = next_first(pid)
    ovf = np.asarray(multihost_utils.process_allgather(np.bool_(overflow)))
    return (my_v, my_c, b_offset, int(lo), hi, pid == drain_pid,
            bool(ovf.any()))


def multihost_rank_array(a_idx: DeviceFMIndex, b_idx: DeviceFMIndex,
                         a_sequences: int, b_sequences: int,
                         frontier_cap: int = 1 << 16,
                         emit_cap: int = 1 << 22):
    """Full rank array on every process (compat surface for callers that
    need it — e.g. replicated-interleave drivers and tests).

    Built ON TOP of the rank-range exchange: the merge work is distributed
    (each process dedups only its own range), and the final allgather moves
    each merged run exactly once.  Production merges should prefer
    multihost_rank_array_ranged + multihost_merge_to_file, which never
    materialize more than O(|RA|/P) per process.
    """
    from jax.experimental import multihost_utils

    pid, nproc = process_info()
    if nproc == 1:
        v, c, ovf = _local_rank_array(a_idx, b_idx, a_sequences, b_sequences,
                                      frontier_cap, emit_cap)
        return v, c, bool(ovf)

    my_v, my_c, _off, _lo, _hi, _drain, ovf = multihost_rank_array_ranged(
        a_idx, b_idx, a_sequences, b_sequences, frontier_cap, emit_cap)

    local_n = np.int64(my_v.size)
    all_n = np.asarray(multihost_utils.process_allgather(local_n))
    width = max(int(all_n.max()), 1)
    padded = np.zeros((2, width), dtype=np.int64)
    padded[0, :my_v.size] = my_v
    padded[1, :my_v.size] = my_c
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    parts_v = [gathered[p, 0, :int(all_n[p])] for p in range(nproc)]
    parts_c = [gathered[p, 1, :int(all_n[p])] for p in range(nproc)]
    # ranges are disjoint and ascending by construction: concatenate
    return (np.concatenate(parts_v), np.concatenate(parts_c), ovf)


# -- sharded merge output ------------------------------------------------------


def _range_cursor(lens: np.ndarray, pos: int) -> Tuple[int, int]:
    """(run index, remaining-in-run) cursor at absolute position `pos` of an
    RLE stream (prefix-sum binary search, the host analog of
    interleave.cpp cursor_at)."""
    if pos <= 0:
        return 0, int(lens[0]) if lens.size else 0
    cum = np.cumsum(lens)
    run = int(np.searchsorted(cum, pos, side="right"))
    if run >= lens.size:
        return int(lens.size), 0
    return run, int(cum[run] - pos)


def interleave_range_chunks(a_runs, b_runs, ra_chunks, lo: int, hi: int,
                            b_offset: int, last: bool,
                            chunk_runs: int = 1 << 20):
    """Generator of merged (syms, lens) run chunks for ONE A-position range
    [lo, hi) of the interleave, given that range's ascending RA chunks and
    the B-rank offset of its first insertion.

    The stateful native kernel is initialized at the range cursors (A at
    position lo, B at rank b_offset); after the RA runs, A is advanced to
    `hi` with a synthetic zero-count entry (`last` drains A's tail
    instead).  The trailing run is NOT withheld — the shard concatenator
    coalesces seams.  Shards produced for consecutive ranges concatenate
    into exactly the full interleave's run stream (up to seam splits).
    """
    from ..native.api import _as_i64, _as_u8, _configure_stream_interleave, _lib

    lib = _lib()
    _configure_stream_interleave(lib)
    a_syms, a_lens = _as_u8(a_runs.syms), _as_i64(a_runs.lens)
    b_syms, b_lens = _as_u8(b_runs.syms), _as_i64(b_runs.lens)

    state = np.zeros(7, np.int64)
    state[0], state[1] = _range_cursor(a_lens, lo)
    state[2], state[3] = _range_cursor(b_lens, b_offset)
    state[4] = lo

    def run(rv, rc, finish):
        rv, rc = _as_i64(rv), _as_i64(rc)
        # emitted-run bound: A fragments (touched runs + one split per RA
        # run) + B fragments likewise — position spans bound the touched
        # runs but must not drive the allocation (a sparse range's span can
        # be orders of magnitude larger than its run count)
        span = (int(rv[-1]) - int(state[4])) if rv.size else 0
        cap = (min(max(span, 0), a_lens.size + 1)
               + min(int(rc.sum()), b_lens.size + 1) + 2 * rv.size + 16)
        if finish:
            cap += a_lens.size + 2
        out_s = np.empty(cap, np.uint8)
        out_l = np.empty(cap, np.int64)
        n = lib.interleave_chunk(a_syms, a_lens, a_syms.size,
                                 b_syms, b_lens, b_syms.size,
                                 rv, rc, rv.size, 1 if finish else 0,
                                 cap, state, out_s, out_l)
        if n == -1:
            raise ValueError("rank-array range inconsistent with inputs")
        if n < 0:
            raise RuntimeError(f"native interleave_chunk failed (code {n})")
        return out_s[:n], out_l[:n]

    for rv, rc in ra_chunks:
        if len(rv) == 0:
            continue
        s, l = run(rv, rc, finish=False)
        if s.size:
            yield s, l
    if last:
        s, l = run(np.zeros(0, np.int64), np.zeros(0, np.int64), finish=True)
        if s.size:
            yield s, l
    else:
        # advance A to the range end with a zero-count entry, then flush
        # the withheld trailing run (the next shard starts at a_pos = hi).
        # Collapsed (empty, lo == hi) ranges have nothing to advance.
        if hi > int(state[4]):
            s, l = run(np.asarray([hi], np.int64),
                       np.asarray([0], np.int64), finish=False)
            if s.size:
                yield s, l
        if state[6] > 0:
            yield (np.asarray([state[5]], np.uint8),
                   np.asarray([state[6]], np.int64))
            state[6] = 0


def coalesce_run_chunks(chunks):
    """Re-establish maximal runs across a chunk stream whose boundaries may
    split runs (shard seams): withholds each chunk's trailing run and
    merges it with the next chunk's head when the symbols match."""
    pend = None  # (sym, len)
    for syms, lens in chunks:
        if syms.size == 0:
            continue
        syms = np.asarray(syms, np.uint8)
        lens = np.asarray(lens, np.int64)
        if pend is not None:
            if syms[0] == pend[0]:
                lens = lens.copy()
                lens[0] += pend[1]
            else:
                yield (np.asarray([pend[0]], np.uint8),
                       np.asarray([pend[1]], np.int64))
        pend = (int(syms[-1]), int(lens[-1]))
        if syms.size > 1:
            yield syms[:-1], lens[:-1]
    if pend is not None:
        yield (np.asarray([pend[0]], np.uint8),
               np.asarray([pend[1]], np.int64))


def multihost_merge_to_file(a, b, path: str, fmt: str = "native",
                            shard_dir: Optional[str] = None,
                            frontier_cap: int = 1 << 16,
                            emit_cap: int = 1 << 22,
                            stats: Optional[dict] = None) -> None:
    """Fully distributed merge: every process searches its B-block,
    receives its A-range of the rank array (rank-range exchange),
    interleaves that range, and writes a run-chunk shard; process 0 then
    streams the shards in rank order through the format writer.

    Per-process peak: inputs + O(|RA|/P) rank array + O(output/P) shard.
    `shard_dir` must be shared across processes (defaults to the output's
    directory — multi-host deployments point it at the shared filesystem
    the output itself lives on).
    """
    import jax
    from jax.experimental import multihost_utils

    from ..formats.streaming import write_bwt_stream
    from ..utils.alphabet import Alphabet

    pid, nproc = process_info()
    shard_dir = shard_dir or (os.path.dirname(os.path.abspath(path)) or ".")

    my_v, my_c, b_offset, lo, hi, drain, ovf = multihost_rank_array_ranged(
        a.device_index, b.device_index, a.sequences(), b.sequences(),
        frontier_cap=frontier_cap, emit_cap=emit_cap, stats=stats)
    if ovf:
        raise RuntimeError("device search overflowed its static buffers; "
                           "re-run with larger caps")

    shard_path = os.path.join(shard_dir, f".bwtmerge_shard_{pid}.npz")

    def ra_chunks():
        step = 1 << 20
        for s in range(0, my_v.size, step):
            yield my_v[s:s + step], my_c[s:s + step]

    parts = list(interleave_range_chunks(
        a.runs, b.runs, ra_chunks(), lo, int(min(hi, np.int64(2**62))),
        b_offset, last=drain))
    if stats is not None:
        stats["shard_runs"] = int(sum(p[0].size for p in parts))
    np.savez(shard_path,
             syms=(np.concatenate([p[0] for p in parts])
                   if parts else np.zeros(0, np.uint8)),
             lens=(np.concatenate([p[1] for p in parts])
                   if parts else np.zeros(0, np.int64)))

    multihost_utils.sync_global_devices("bwtmerge shards written")
    if pid == 0:
        alpha = type(a.alpha)(
            char2comp=a.alpha.char2comp.copy(),
            comp2char=a.alpha.comp2char.copy(),
            C=(a.alpha.C.astype(np.int64)
               + b.alpha.C.astype(np.int64)).astype(np.uint64),
        )

        def shard_chunks():
            for p in range(nproc):
                sp = os.path.join(shard_dir, f".bwtmerge_shard_{p}.npz")
                with np.load(sp) as z:
                    yield z["syms"], z["lens"]
                os.remove(sp)

        write_bwt_stream(path, fmt, coalesce_run_chunks(shard_chunks()),
                         alpha)
    multihost_utils.sync_global_devices("bwtmerge output written")
