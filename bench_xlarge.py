"""XLarge bench tier: multi-GB 3-way fold on one chip (VERDICT r3 #4).

Shape mirrors BASELINE configs[1-2]: a large base index plus two further
inserts, left-folded pairwise (the reference's production workload,
bwt_merge.cpp:163-173), ~1 Gbp total.  Fixtures are built once on the
chip by `scripts/build_xlarge_fixtures.py` (7x102 Mbp device-built read sets
folded into a ~714 Mbp base, plus two 102 Mbp insert pieces with
read-text sidecars) and cached under .bench_cache/xl_*.

Measures per-fold wall clock, sustained Mbases/s over both folds, spill
temp-disk bytes, peak RSS — and verifies the pattern-count invariant
(count_merged(p) == sum count_input_i(p), the reference's -v gate,
bwt_merge.cpp:179-194) with read-derived 32-mers.  Prints ONE JSON line;
`python bench.py` embeds the committed record (XLARGE.json) in its
extras so the standard bench stays inside its try timeout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_MBP_S = 9.40


def main() -> None:
    t_setup = time.monotonic()
    from bwtmerge_tpu.native.build import build_library

    build_library()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from bwtmerge_tpu.ops.rank_jax import ensure_d2h_warm

    warm = ensure_d2h_warm()

    from bwtmerge_tpu.formats import read_bwt
    from bwtmerge_tpu.formats.sidecar import sidecar_path
    from bwtmerge_tpu.models.fmi import FMI
    from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi
    from bwtmerge_tpu.models import merge as merge_mod

    base_path = os.path.join(CACHE, "xl_base.native")
    p1_path = os.path.join(CACHE, "xl_piece_208.sga")
    p2_path = os.path.join(CACHE, "xl_piece_209.sga")
    for p in (base_path, p1_path, p2_path):
        if not os.path.exists(p):
            print(json.dumps({"metric": "xlarge 3-way fold throughput",
                              "value": 0.0, "unit": "Mbases/s/chip",
                              "vs_baseline": 0.0,
                              "extra": {"error": f"missing fixture {p} — "
                                        "run scripts/build_xlarge_fixtures.py"}}))
            return

    runs, _, alpha = read_bwt(base_path, "native")
    base = FMI(runs=runs, alpha=alpha)
    r1, _, al1 = read_bwt(p1_path, "sga")
    p1 = FMI(runs=r1, alpha=al1, creads_path=sidecar_path(p1_path))
    r2, _, al2 = read_bwt(p2_path, "sga")
    p2 = FMI(runs=r2, alpha=al2, creads_path=sidecar_path(p2_path))
    print(f"# fixtures: base {base.size()/1e6:.0f} Mbp + "
          f"{p1.size()/1e6:.0f} + {p2.size()/1e6:.0f} Mbp", file=sys.stderr)

    # pattern sample BEFORE merging: 32-mers drawn from p1/p2 reads so the
    # invariant counts are nonzero (random 32-mers over sigma=4 are ~all 0)
    rng = np.random.default_rng(17)
    pats = []
    for fmi in (p1, p2):
        creads = fmi.creads()
        cols = rng.integers(0, creads.shape[1], size=2048)
        for c in cols:
            col = creads[:, c]
            n = int((col > 0).sum())
            if n >= 32:
                pats.append(col[:32][::-1].astype(np.int32))  # text order
    pats = np.stack(pats)
    lens = np.full(pats.shape[0], 32, np.int32)
    print(f"# {pats.shape[0]} read-derived 32-mers", file=sys.stderr)

    from bwtmerge_tpu.ops.rank_jax import DeviceFMIndex, backward_search

    def dev_counts(fmi) -> np.ndarray:
        idx = fmi.device_index
        sp, ep = backward_search(idx, jnp.asarray(pats), jnp.asarray(lens), 32)
        return (np.asarray(ep) - np.asarray(sp) + 1).clip(min=0)

    t0 = time.monotonic()
    want = dev_counts(base) + dev_counts(p1) + dev_counts(p2)
    verify_in_s = time.monotonic() - t0
    print(f"# input pattern counts {verify_in_s:.1f}s", file=sys.stderr)

    # upload the base index (the folds rebuild it after each merge)
    _ = np.asarray(base.device_index.rec[0])
    warm.join()
    setup_s = time.monotonic() - t_setup

    spilled = {"bytes": 0, "files": 0}
    orig = merge_mod._build_ra_spill

    def spying(a_, b_, cfg_):
        ra = orig(a_, b_, cfg_)
        spilled["bytes"] += getattr(ra, "total_spilled_bytes", 0)
        spilled["files"] += getattr(ra, "n_spill_files", 0)
        return ra

    cfg = MergeConfig(backend="jax", temp_dir="/tmp", search="auto")
    merge_mod._build_ra_spill = spying
    try:
        t0 = time.monotonic()
        acc = merge_fmi(base, p1, cfg)
        fold1_s = time.monotonic() - t0
        print(f"# fold 1 (+{p1.size()/1e6:.0f} Mbp): {fold1_s:.1f}s",
              file=sys.stderr)
        t0 = time.monotonic()
        acc = merge_fmi(acc, p2, cfg)
        fold2_s = time.monotonic() - t0
        print(f"# fold 2 (+{p2.size()/1e6:.0f} Mbp): {fold2_s:.1f}s",
              file=sys.stderr)
    finally:
        merge_mod._build_ra_spill = orig

    total_bases = acc.size()
    t0 = time.monotonic()
    got = dev_counts(acc)
    verify_out_s = time.monotonic() - t0
    assert np.array_equal(got, want), \
        f"pattern-count invariant FAILED ({int((got != want).sum())} diffs)"
    print(f"# pattern-count invariant OK ({pats.shape[0]} patterns, "
          f"{verify_out_s:.1f}s)", file=sys.stderr)

    from bwtmerge_tpu.utils.metrics import memory_usage

    inserted = (p1.size() + p2.size()) / 1e6
    rate = inserted / (fold1_s + fold2_s)
    print(json.dumps({
        "metric": "xlarge 3-way fold throughput",
        "value": round(rate, 3),
        "unit": "Mbases/s/chip",
        "vs_baseline": round(rate / BASELINE_MBP_S, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "total_bases": int(total_bases),
            "base_bases": base.size(),
            "insert_bases": p1.size() + p2.size(),
            "fold1_s": round(fold1_s, 1),
            "fold2_s": round(fold2_s, 1),
            "sustained_Mbases_s": round(rate, 3),
            "ra_spill_files": spilled["files"],
            "ra_spilled_MB": round(spilled["bytes"] / 1e6, 1),
            "peak_rss_GB": round(memory_usage() / 1e9, 2),
            "patterns": int(pats.shape[0]),
            "invariant_ok": True,
            "setup_s": round(setup_s, 1),
        },
    }))


if __name__ == "__main__":
    main()
