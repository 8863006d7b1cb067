"""Worker process for the 2-process multihost test (test_multihost.py).

Usage: python multihost_worker.py <process_id> <port> <out.npz>

Must run with JAX_PLATFORMS=cpu and a PYTHONPATH that does NOT preload a
platform plugin (jax.distributed.initialize has to run before the backend
initializes).  Each process computes the same deterministic workload through
the rank-range exchange; process 0 writes the combined result and the merged
output file.  Asserts the O(|RA|/P) per-process peak contract of the
exchange (VERDICT r2 #3): no process ever holds more than its own range
plus the bounded exchange buffers.
"""

import os
import sys


def main() -> None:
    pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from bwtmerge_tpu.models import oracle
    from bwtmerge_tpu.models.fmi import FMI
    from bwtmerge_tpu.parallel.distributed import (multihost_merge_to_file,
                                                   multihost_rank_array,
                                                   multihost_rank_array_ranged)

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    rng = np.random.default_rng(55)
    a_seqs = oracle.random_collection(rng, 24, 20, 60)
    b_seqs = oracle.random_collection(rng, 22, 20, 60)
    fa = FMI.from_runs(oracle.build_bwt(a_seqs))
    fb = FMI.from_runs(oracle.build_bwt(b_seqs))

    # --- ranged exchange: each process holds ONLY its own A-range ---------
    stats = {}
    my_v, my_c, b_off, lo, hi, drain, ovf = multihost_rank_array_ranged(
        fa.device_index, fb.device_index, fa.sequences(), fb.sequences(),
        frontier_cap=4096, emit_cap=1 << 16, stats=stats)
    assert not ovf
    total_b = fb.size()
    nproc = jax.process_count()
    # peak contract: the exchange buffer width (the largest routed piece)
    # and the received-run total are O(|RA|/P), never O(|RA|).  |RA| <= |B|
    # runs, so assert against the range-balanced bound with 2x skew slack.
    bound = 2 * (total_b // nproc) + 64
    assert stats["exchange_width"] <= bound, stats
    assert stats["recv_runs"] <= bound, stats
    assert my_v.size <= bound
    # ranges are disjoint and ordered: process 0's max < process 1's min
    assert np.all(np.diff(my_v) > 0)
    assert (my_v >= lo).all() if my_v.size else True
    assert (my_v < int(hi)).all() if my_v.size else True

    # --- fully distributed merged output, shards concatenated in order ----
    shard_dir = os.path.dirname(os.path.abspath(out))
    merged_path = os.path.join(shard_dir, "merged_multihost.sga")
    multihost_merge_to_file(fa, fb, merged_path, "sga",
                            shard_dir=shard_dir,
                            frontier_cap=4096, emit_cap=1 << 16)

    # --- compat surface: full RA assembled from the range shards ----------
    v, c, ovf = multihost_rank_array(
        fa.device_index, fb.device_index, fa.sequences(), fb.sequences(),
        frontier_cap=4096, emit_cap=1 << 16)
    assert not ovf
    if pid == 0:
        np.savez(out, values=v, counts=c, range_runs=my_v.size,
                 exchange_width=stats["exchange_width"])


if __name__ == "__main__":
    main()
