"""Worker process for the 2-process multihost test (test_multihost.py).

Usage: python multihost_worker.py <process_id> <port> <out.npz>

Must run with JAX_PLATFORMS=cpu and a PYTHONPATH that does NOT preload a
platform plugin (jax.distributed.initialize has to run before the backend
initializes).  Each process computes the same deterministic workload through
multihost_rank_array; process 0 writes the combined result.
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
    from bwtmerge_tpu.parallel.distributed import multihost_rank_array

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    rng = np.random.default_rng(55)
    a_seqs = oracle.random_collection(rng, 24, 20, 60)
    b_seqs = oracle.random_collection(rng, 22, 20, 60)
    fa = FMI.from_runs(oracle.build_bwt(a_seqs))
    fb = FMI.from_runs(oracle.build_bwt(b_seqs))

    v, c, ovf = multihost_rank_array(
        fa.device_index, fb.device_index, fa.sequences(), fb.sequences(),
        frontier_cap=4096, emit_cap=1 << 16)
    assert not ovf
    if pid == 0:
        np.savez(out, values=v, counts=c)


if __name__ == "__main__":
    main()
