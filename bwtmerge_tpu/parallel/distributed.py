"""Multi-host execution: jax.distributed bring-up + cross-host rank-array
combine.

The reference is explicitly single-node (paper.tex:197; no MPI/NCCL anywhere
— SURVEY.md §5 "distributed communication backend").  The TPU framework
scales out with the same decomposition it uses across chips:

  hosts   -> jax processes (jax.distributed.initialize)
  work    -> B's sequence blocks, partitioned per process, then per local
             device (parallel/mesh.py); the FM-indexes are replicated per
             host (block-sharding an over-HBM index is future work)
  combine -> per-host sorted-unique RA runs all-gathered across processes
             (ICI within a slice, DCN across slices — XLA picks the route),
             merged on the output process by the same vectorized k-way merge
             the spill path uses

Single-process calls degrade to the local mesh path, so this module is safe
to use unconditionally; true multi-host runs need the driver to start one
process per host with the same coordinator address.
"""

from __future__ import annotations

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


def multihost_rank_array(a_idx: DeviceFMIndex, b_idx: DeviceFMIndex,
                         a_sequences: int, b_sequences: int,
                         frontier_cap: int = 1 << 16,
                         emit_cap: int = 1 << 22):
    """Rank array computed data-parallel across every host and chip.

    Each process searches its own contiguous block of B's sequences on its
    local devices, compacts locally, then the per-process results are
    all-gathered and merged.  Returns (values, counts, overflow) on every
    process (deterministic, so any process can drive the interleave).
    """
    import jax

    pid, nproc = process_info()
    my_block = sequence_shards(b_sequences, nproc)[pid]

    # local search: this process's block of B sequences, executed by the
    # REAL per-device shard_map path over the local mesh (one compiled
    # program, every local chip searching its own sub-block concurrently —
    # not a sequential per-device host loop).
    local_mesh = make_mesh(local_only=True)
    sp, ep = int(my_block[0]), int(my_block[1])
    if ep < sp:
        values = np.zeros(0, np.int64)
        counts = np.zeros(0, np.int64)
        overflow = False
    else:
        from .mesh import sharded_rank_array

        values, counts, overflow = sharded_rank_array(
            a_idx, b_idx, a_sequences, ep - sp + 1, mesh=local_mesh,
            frontier_cap=frontier_cap, emit_cap=emit_cap,
            b_seq_offset=sp)

    if nproc == 1:
        return values, counts, overflow

    # cross-host combine: fixed-width all-gather of (value, count) pairs
    from jax.experimental import multihost_utils

    from ..ops.search_np import merge_rank_arrays

    local_n = np.int64(values.size)
    all_n = np.asarray(multihost_utils.process_allgather(local_n))
    width = int(all_n.max())
    padded = np.zeros((2, width), dtype=np.int64)
    padded[0, : values.size] = values
    padded[1, : values.size] = counts
    gathered = np.asarray(multihost_utils.process_allgather(padded))  # [P, 2, W]

    merged = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    for p in range(nproc):
        n = int(all_n[p])
        merged = merge_rank_arrays(merged, (gathered[p, 0, :n], gathered[p, 1, :n]))

    ovf_all = np.asarray(multihost_utils.process_allgather(np.bool_(overflow)))
    return merged[0], merged[1], bool(ovf_all.any())
