"""Multi-chip execution: sequence-block data parallelism over a device mesh.

TPU-native replacement for the reference's thread-level parallelism
(ParallelLoop, utils.h:254-302; sequence blocks, fmi.cpp:351-357).  The
mapping, per SURVEY.md §5:

  threads             -> devices of a jax.sharding.Mesh (axis "seq")
  sequence blocks     -> contiguous ranges of B's sequence ranks, one shard
                         per device (correctness needs no cross-block
                         communication: each B-suffix has exactly one rank
                         in A)
  run/thread buffers  -> fixed-capacity per-device emission buffers inside
                         one compiled program (wavefront_search_device)
  merge-buffer ladder -> all_gather of per-device RA runs over ICI + host
                         compaction (sorted-unique merge)

The FM-indexes of A and B are replicated across the mesh (block-sharding for
> HBM indexes is the round-2 extension); only the root sequence ranges differ
per device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rank_jax import DeviceFMIndex
from ..ops.search_jax import wavefront_search_device2

SEQ_AXIS = "seq"


def make_mesh(n_devices: Optional[int] = None, axis: str = SEQ_AXIS,
              local_only: bool = False) -> Mesh:
    """1-D device mesh over the first n devices (default: all).

    local_only restricts to this process's devices — the per-host mesh a
    multi-host process uses for its own sequence block (distributed.py).
    """
    devices = jax.local_devices() if local_only else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sequence_shards(n_sequences: int, n_shards: int) -> np.ndarray:
    """Closed [sp, ep] ranges of B's sequence ranks, one row per shard.

    Mirrors getBounds (utils.cpp:169-187): remainder spread over the first
    shards; empty shards get ep < sp.
    """
    bounds = np.zeros((n_shards, 2), dtype=np.int32)
    base, rem = divmod(n_sequences, n_shards)
    start = 0
    for i in range(n_shards):
        count = base + (1 if i < rem else 0)
        bounds[i] = (start, start + count - 1)
        start += count
    return bounds


def sequence_shards_weighted(weights, n_shards: int) -> np.ndarray:
    """Closed [sp, ep] sequence-rank ranges balanced by WEIGHT (e.g. read
    lengths / bases): shard boundaries at equal quantiles of the cumulative
    weight, so a skewed length distribution no longer idles the shards that
    drew the short reads.  The reference gets the same effect dynamically
    (atomic block counter, utils.cpp:204-209); a static mesh needs the
    balance baked into the partition.  Empty shards get ep < sp.
    """
    w = np.asarray(weights, dtype=np.float64)
    n = w.size
    bounds = np.zeros((n_shards, 2), dtype=np.int32)
    if n == 0:
        bounds[:, 1] = -1
        return bounds
    cum = np.cumsum(w)
    total = cum[-1]
    # boundary i = first sequence whose cumulative weight exceeds the i-th
    # quantile; searchsorted keeps the ranges contiguous and monotone
    qs = total * (np.arange(1, n_shards, dtype=np.float64) / n_shards)
    cuts = np.concatenate(([0], np.searchsorted(cum, qs, side="left") + 1,
                           [n]))
    cuts = np.minimum(cuts, n)
    for i in range(n_shards):
        bounds[i] = (cuts[i], cuts[i + 1] - 1)
    return bounds


def dynamic_block_search(a_idx, b_idx, a_sequences: int, b_sequences: int,
                         emit, n_blocks: Optional[int] = None,
                         mesh: Optional[Mesh] = None,
                         frontier_cap: Optional[int] = None,
                         emit_cap: Optional[int] = None,
                         b_size: Optional[int] = None,
                         weights=None,
                         streamed: Optional[bool] = None,
                         stats: Optional[dict] = None) -> None:
    """Host-side dynamic block queue over the mesh's devices — the TPU
    analog of the reference's atomic-counter scheduler (ParallelLoop,
    utils.cpp:204-209), with devices in place of threads.

    B's sequences split into `n_blocks` (default 4 per device, the
    reference's default) equal-count blocks; one worker thread per device
    pulls blocks from a shared queue and runs the fully-jitted search for
    its block on ITS device, so devices that drew cheap blocks immediately
    pull more work — skewed read-length or repetitiveness distributions
    cannot idle a device for longer than one block.  `emit(values, counts)`
    is called under a lock with each block's runs.

    `stats`, when given, receives {"per_device_runs": [..]} for balance
    assertions.
    """
    import queue as queue_mod
    import threading

    import jax

    from ..ops.search_jax import (default_streamed, search_and_pack,
                                  unpack_search)
    from ..utils.ranges import get_bounds

    mesh = mesh or make_mesh()
    devices = list(mesh.devices.reshape(-1))
    n_dev = len(devices)
    if streamed is None:
        streamed = default_streamed()
    if n_blocks is None:
        n_blocks = 4 * n_dev
    n_blocks = max(1, min(n_blocks, max(1, b_sequences)))
    if weights is not None:
        # base-weighted blocks (per-sequence costs known, e.g. the build
        # pipeline's read lengths): equal-weight instead of equal-count
        blocks = [tuple(b) for b in
                  sequence_shards_weighted(weights, n_blocks)
                  if b[1] >= b[0]]
    else:
        blocks = [b for b in get_bounds((0, b_sequences - 1), n_blocks)
                  if b[1] >= b[0]]

    # one program shape for every block (distinct caps would recompile)
    blk_seqs = int(max(e - s + 1 for s, e in blocks))
    if frontier_cap is None:
        frontier_cap = 1 << max(12, (blk_seqs - 1).bit_length() + 1)
    if emit_cap is None:
        # emissions per block <= block bases + block sequences; without the
        # collection size, assume <= 64 bases/sequence (callers with longer
        # reads pass b_size or emit_cap explicitly)
        per_seq = (b_size // max(1, b_sequences) + 1) if b_size else 64
        emit_cap = 1 << (per_seq * blk_seqs + blk_seqs + frontier_cap + 16
                         ).bit_length()

    q: "queue_mod.Queue" = queue_mod.Queue()
    for k, blk in enumerate(blocks):
        q.put((k, blk))
    lock = threading.Lock()
    per_device = [0] * n_dev
    per_block = [0] * len(blocks)
    errors = []

    def worker(d: int) -> None:
        import jax.numpy as jnp

        dev = devices[d]
        a_local = jax.device_put(a_idx, dev)
        b_local = jax.device_put(b_idx, dev)
        while True:
            try:
                k, (sp, ep) = q.get_nowait()
            except queue_mod.Empty:
                return
            try:
                with jax.default_device(dev):
                    packed = search_and_pack(
                        a_local, b_local, jnp.int32(sp), jnp.int32(ep),
                        a_sequences, frontier_cap=frontier_cap,
                        emit_cap=emit_cap, streamed=streamed)
                    v, c, ovf = unpack_search(*packed)
                if ovf:
                    raise RuntimeError(
                        f"dynamic block [{sp},{ep}] overflowed its device "
                        "buffers; raise n_blocks")
                with lock:
                    per_device[d] += v.size
                    per_block[k] = v.size
                    emit(v, c)
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)
                return

    workers = [threading.Thread(target=worker, args=(d,))
               for d in range(n_dev)]
    for t in workers:
        t.start()
    for t in workers:
        t.join()
    if errors:
        raise errors[0]
    if stats is not None:
        stats["per_device_runs"] = per_device
        stats["per_block_runs"] = per_block
        stats["n_blocks"] = len(blocks)


def _sharded_search_packed(a_idx, b_idx, a_sequences, b_sequences, mesh,
                           frontier_cap, emit_cap, b_seq_offset, streamed):
    """Run the whole search + device-side packing as ONE shard_map program:
    each device wavefront-searches its own B-sequence block and sorts +
    packs its RA runs in place (8 B/run -> 1-2 B/run over the host link).
    Returns the still-sharded device outputs (dc8 [D, 3, E], exc, exc4,
    n_emit, n_exc, n_exc4, overflow) plus the mesh size."""
    from ..ops.search_jax import default_streamed

    if streamed is None:
        streamed = default_streamed()
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    bounds = sequence_shards(b_sequences, n_dev) + np.int32(b_seq_offset)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(SEQ_AXIS))

    a_dev = jax.device_put(a_idx, replicated)
    b_dev = jax.device_put(b_idx, replicated)
    sp = jax.device_put(jnp.asarray(bounds[:, 0]), sharded)
    ep = jax.device_put(jnp.asarray(bounds[:, 1]), sharded)

    def per_shard(a, b, sp, ep):
        # shard_map guarantees everything runs device-local; the only
        # cross-device traffic is the final result gather.
        from ..ops.search_jax import pack_ra_device

        def fn(s, e):
            v, c, n, ovf = wavefront_search_device2(
                a, b, s, e, a_sequences,
                frontier_cap=frontier_cap, emit_cap=emit_cap,
                streamed=streamed)
            # compact=False: ship raw sorted runs — every host consumer
            # (unpack+compact_rank_array, the chunk streams) sums duplicates
            # anyway, and the device compaction is gather-bound (~4 s at
            # 67M lanes on a v5e vs 0.4 s for the sort-only pack)
            dc8, exc, exc4, esc, n_u, n_exc, n_exc4, n_esc2 = pack_ra_device(
                v, c, n, compact=False)
            return dc8, exc, exc4, esc, n_u, n_exc, n_exc4, n_esc2, ovf
        return jax.vmap(fn)(sp, ep)

    # check_vma=False: the streamed-probe path calls pallas_call inside this
    # shard_map, and pallas outputs carry no varying-mesh-axes annotation.
    search_all = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(SEQ_AXIS), P(SEQ_AXIS)),
        out_specs=P(SEQ_AXIS), check_vma=False))

    dc8, exc, exc4, esc, n_emit, n_exc, n_exc4, n_esc2, overflow = \
        search_all(a_dev, b_dev, sp, ep)
    return (dc8, exc, exc4, esc, n_emit, n_exc, n_exc4, n_esc2, overflow,
            n_dev)


class ShardedPackedRA:
    """Mesh-sharded search result left packed on its devices.

    Like PackedDeviceRA but one packed buffer per device: stream() k-way
    merges the per-device ascending chunk streams (values overlap across
    devices — different B-blocks insert at arbitrary A-positions) while each
    device's D2H copies run eagerly in the background.  Duck-types the
    RankArraySpill consumption surface."""

    prefer_stream = True
    n_spill_files = 0
    total_spilled_bytes = 0

    def __init__(self, shards):
        # [(dc8 on device d [4, E], meta int32[4, EXC_CAP] host,
        #   exc4 on device d [3, EXC4_CAP], esc on device d [E])]
        self.shards = shards

    @property
    def n_runs(self) -> int:
        return sum(int(m[3, 0]) for _, m, _, _ in self.shards)

    def stream(self, chunk_runs: int = 4 * 1024 * 1024):
        from ..models.spill import merge_ra_chunk_streams
        from ..ops.search_jax import stream_packed_ra
        from ..utils.pipeline import prefetch_chunks

        # one decode thread per device stream (see BlockedPackedRA.stream)
        return merge_ra_chunk_streams(
            [prefetch_chunks(stream_packed_ra(d, m, e4, esc=es), depth=2)
             for d, m, e4, es in self.shards],
            chunk_runs=chunk_runs)

    def finish(self):
        parts = list(self.stream())
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))


def sharded_packed_ra(
    a_idx: DeviceFMIndex,
    b_idx: DeviceFMIndex,
    a_sequences: int,
    b_sequences: int,
    mesh: Optional[Mesh] = None,
    frontier_cap: int = 4096,
    emit_cap: int = 65536,
    b_seq_offset: int = 0,
    streamed: Optional[bool] = None,
) -> Optional[ShardedPackedRA]:
    """Mesh-parallel rank array that STAYS on the devices: returns a
    ShardedPackedRA whose stream() feeds the merge phase directly, or None
    when any shard overflowed its static buffers (caller falls back to the
    host driver)."""
    from ..ops.search_jax import EXC_CAP, META_ROWS

    dc8, exc, exc4, esc, n_emit, n_exc, n_exc4, n_esc2, overflow, n_dev = \
        _sharded_search_packed(
            a_idx, b_idx, a_sequences, b_sequences, mesh, frontier_cap,
            emit_cap, b_seq_offset, streamed)

    from ..ops.search_jax import EXC4_CAP

    n_emit_h = np.asarray(n_emit)
    n_exc_h = np.asarray(n_exc)
    n_exc4_h = np.asarray(n_exc4)
    n_esc2_h = np.asarray(n_esc2)
    # a shard is decodable via the byte plane (n_exc <= EXC_CAP) OR the
    # nib/q4 planes with the exc4/esc side streams (n_exc4 <= EXC4_CAP) —
    # sparse rank spaces exceed EXC_CAP routinely at multi-100-Mbp bases
    if bool(np.asarray(overflow).any()) or bool(
            ((n_exc_h > EXC_CAP) & (n_exc4_h > EXC4_CAP)).any()):
        return None

    exc_h = np.asarray(exc)
    # exc4/esc stay sharded on their devices; stream_packed_ra fetches each
    # shard's table lazily, sliced to its n_exc4/n_esc2 (12 MB/device eager)
    exc4_shards = {(s.index[0].start or 0): s.data[0]
                   for s in exc4.addressable_shards}
    esc_shards = {(s.index[0].start or 0): s.data[0]
                  for s in esc.addressable_shards}
    shards = []
    for shard in dc8.addressable_shards:
        d = shard.index[0].start or 0  # row of this device's packed buffer
        n = int(n_emit_h[d])
        if n == 0:
            continue
        meta = np.zeros((META_ROWS, exc_h.shape[2]), np.int32)
        meta[:3] = exc_h[d]
        meta[3, 0] = n
        meta[3, 1] = n_exc_h[d]
        meta[3, 3] = n_exc4_h[d]
        meta[3, 4] = n_esc2_h[d]
        shards.append((shard.data[0], meta, exc4_shards[d], esc_shards[d]))
    return ShardedPackedRA(shards)


def sharded_rank_array(
    a_idx: DeviceFMIndex,
    b_idx: DeviceFMIndex,
    a_sequences: int,
    b_sequences: int,
    mesh: Optional[Mesh] = None,
    frontier_cap: int = 4096,
    emit_cap: int = 65536,
    b_seq_offset: int = 0,
    streamed: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Rank array of B vs A computed data-parallel over the mesh.

    Each device wavefront-searches its own block of B sequences inside one
    compiled program; per-device (value, count) run buffers are combined on
    the host into the sorted unique rank array.  Returns (values, counts,
    overflowed) — on overflow the caller re-runs the oversized blocks through
    the streaming host driver (ops/search_jax.wavefront_search).

    b_seq_offset shifts the searched sequence ranks: a multi-host process
    passes its own block's start so the mesh shards cover
    [offset, offset + b_sequences - 1] (distributed.py).
    """
    from ..ops.search_np import compact_rank_array

    dc8, exc, exc4, esc, n_emit, n_exc, n_exc4, n_esc2, overflow, n_dev = \
        _sharded_search_packed(
            a_idx, b_idx, a_sequences, b_sequences, mesh, frontier_cap,
            emit_cap, b_seq_offset, streamed)

    from ..ops.search_jax import EXC_CAP, unpack_ra

    n_emit = np.asarray(n_emit)
    n_exc = np.asarray(n_exc)
    overflowed = bool(np.asarray(overflow).any()) or bool((n_exc > EXC_CAP).any())
    if overflowed:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), True

    exc_h = np.asarray(exc)
    parts_v, parts_c = [], []
    for d in range(n_dev):
        n = int(n_emit[d])
        if n == 0:
            continue
        v, c = unpack_ra(np.asarray(dc8[d, :, :n]), exc_h[d], n, int(n_exc[d]))
        parts_v.append(v)
        parts_c.append(c)
    if not parts_v:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), False
    v, c = compact_rank_array(np.concatenate(parts_v), np.concatenate(parts_c))
    return v, c, overflowed


def sharded_backward_search(index: DeviceFMIndex, patterns: jax.Array,
                            lengths: jax.Array, max_len: int,
                            mesh: Optional[Mesh] = None):
    """Pattern verification sharded across the mesh (the reference's parallel
    queryFMI, bwt_merge.cpp:240-260): patterns split over devices, index
    replicated, one all-gather of the per-device count vectors."""
    from ..ops.rank_jax import backward_search

    mesh = mesh or make_mesh()
    q = patterns.shape[0]
    n_dev = mesh.devices.size
    pad = (-q) % n_dev
    if pad:
        patterns = jnp.pad(patterns, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad), constant_values=1)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(SEQ_AXIS))
    idx = jax.device_put(index, replicated)
    patterns = jax.device_put(patterns, sharded)
    lengths = jax.device_put(lengths, sharded)

    sp, ep = jax.jit(backward_search, static_argnames=("max_len",))(
        idx, patterns, lengths, max_len)
    counts = jnp.maximum(0, ep - sp + 1)
    return counts[:q]


def sharded_walk_packed_ra(a_idx: DeviceFMIndex, creads: np.ndarray,
                           mesh: Optional[Mesh] = None,
                           a_sequences: Optional[int] = None
                           ) -> "ShardedPackedRA":
    """Mesh-parallel WALK search: read lanes sharded over devices, cplanes
    replicated — the walk engine's multi-chip story (round-5 verdict #4).

    Walk lanes are whole reads, so the shard is embarrassingly parallel:
    each device walks its lane block through the replicated cplane index,
    sorts + plane-packs its emissions in place (ops/walk_jax.py), and the
    per-device ascending streams k-way merge on the host exactly like the
    trie's sequence blocks (ShardedPackedRA).  Reference counterpart: the
    sequence-block data parallelism the walk replaces, fmi.cpp:351-357.
    """
    from ..ops.search_jax import _bucket
    from ..ops.walk_jax import _pack_walk, _walk_emit, build_cplanes

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    if a_sequences is None:
        a_sequences = int(a_idx.C[1])
    max_len, r_total = creads.shape
    # Char-weighted lane assignment: every lane's walk work is its read
    # length, so equal-LANE shards skew per-device emissions whenever long
    # reads cluster.  Lanes need NOT be contiguous per device (each
    # device's emissions are sorted independently and k-way merged), so a
    # snake deal over the length-sorted lanes balances even adversarial
    # chunky mixes — contiguous quantile cuts cannot (a single long read
    # is an indivisible work unit at a shard boundary).  Falsifiable gate:
    # __graft_entry__ mode 4w asserts the resulting per-device balance.
    weights = (creads > 0).sum(axis=0).astype(np.int64)
    order = np.argsort(-weights, kind="stable")
    slot = np.arange(r_total, dtype=np.int64)
    phase = (slot // n_dev) % 2
    dev_of = np.where(phase == 0, slot % n_dev,
                      n_dev - 1 - (slot % n_dev))
    lanes_of = [order[dev_of == d] for d in range(n_dev)]
    widths = [int(g.size) for g in lanes_of]
    per = _bucket(max(max(widths), 1), minimum=128)
    padded = np.zeros((max_len, per * n_dev), np.int8)
    for d, g in enumerate(lanes_of):
        if g.size:
            padded[:, d * per: d * per + g.size] = creads[:, g]
    roots = np.array(widths, np.int32)

    replicated = NamedSharding(mesh, P())
    lane_sharded = NamedSharding(mesh, P(None, SEQ_AXIS))
    dev_sharded = NamedSharding(mesh, P(SEQ_AXIS))

    cpl = jax.device_put(build_cplanes(a_idx.rec), replicated)
    C = jax.device_put(a_idx.C, replicated)
    creads_dev = jax.device_put(jnp.asarray(padded), lane_sharded)
    roots_dev = jax.device_put(jnp.asarray(roots), dev_sharded)
    a0 = jnp.int32(a_sequences)

    def per_shard(cpl, C, cr, root):
        emits, n_live = _walk_emit(cpl, C, cr, a0)
        dc, meta_exc, exc4, esc = _pack_walk(emits, n_live, a0, root[0])
        return dc[None], meta_exc[None], exc4[None], esc[None]

    search_all = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), P(None, SEQ_AXIS), P(SEQ_AXIS)),
        out_specs=P(SEQ_AXIS), check_vma=False))
    dc8, meta, exc4, esc = search_all(cpl, C, creads_dev, roots_dev)

    meta_h = np.asarray(meta)
    exc4_shards = {(s.index[0].start or 0): s.data[0]
                   for s in exc4.addressable_shards}
    esc_shards = {(s.index[0].start or 0): s.data[0]
                  for s in esc.addressable_shards}
    shards = []
    for shard in dc8.addressable_shards:
        d = shard.index[0].start or 0
        if int(meta_h[d, 3, 0]) == 0:
            continue
        shards.append((shard.data[0], meta_h[d], exc4_shards[d],
                       esc_shards[d]))
    return ShardedPackedRA(shards)
