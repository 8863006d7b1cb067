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

    # --- fully distributed merged output, fragments concatenated in order -
    shard_dir = os.path.dirname(os.path.abspath(out))
    merged_path = os.path.join(shard_dir, "merged_multihost.sga")
    mstats = {}
    multihost_merge_to_file(fa, fb, merged_path, "sga",
                            shard_dir=shard_dir,
                            frontier_cap=4096, emit_cap=1 << 16,
                            stats=mstats)
    # fragment contract: THIS process encoded only its own range's bytes —
    # a strict subset of the output — and process 0 never re-encoded
    # (byte-identity of the concatenated file, checked by the test, proves
    # the fragments ARE the final bytes)
    total_out = os.path.getsize(merged_path)
    assert 0 < mstats["frag_bytes"] < total_out, mstats
    assert mstats["shard_runs"] <= bound, mstats

    # --- distributed NATIVE output: fragment encode + sample-table stitch -
    merged_native = os.path.join(shard_dir, "merged_multihost.native")
    nstats = {}
    multihost_merge_to_file(fa, fb, merged_native, "native",
                            shard_dir=shard_dir,
                            frontier_cap=4096, emit_cap=1 << 16,
                            stats=nstats)
    assert 0 < nstats["frag_bytes"], nstats

    # --- count-skew balance: splitters must balance POSITION mass ---------
    # 64 heavy runs (1M positions each, clumped at the bottom of the value
    # space) carry ~99.7% of the interleave work; run-index splitters would
    # hand one process ~half the runs but ~all the positions.  The
    # count-weighted splitters must keep per-process position mass within
    # 2x of balance.
    from bwtmerge_tpu.parallel.distributed import exchange_by_rank_range
    n_light, n_heavy = 20_000, 64
    light_v = np.linspace(1 << 20, 1 << 40, n_light).astype(np.int64)
    heavy_v = np.arange(n_heavy, dtype=np.int64) * 97 + 3
    v_all = np.concatenate([heavy_v, light_v])
    c_all = np.concatenate([np.full(n_heavy, 1_000_000, np.int64),
                            np.ones(n_light, np.int64)])
    o = np.argsort(v_all)
    v_all, c_all = v_all[o], c_all[o]
    my_v2, my_c2, _ = exchange_by_rank_range(
        np.ascontiguousarray(v_all[pid::2]),
        np.ascontiguousarray(c_all[pid::2]))
    my_mass = int(my_c2.sum())
    from jax.experimental import multihost_utils
    masses = np.asarray(multihost_utils.process_allgather(
        np.array([my_mass], np.int32))).reshape(-1)
    total_mass = int(c_all.sum())
    assert int(masses.sum()) == total_mass, (masses, total_mass)
    assert int(masses.max()) <= 2 * total_mass // nproc, \
        f"count-skewed exchange unbalanced: {masses} vs total {total_mass}"

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
