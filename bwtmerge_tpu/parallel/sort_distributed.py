"""Mesh-distributed sort + sharded suffix-array construction.

The scaling primitive SURVEY.md §5 maps the reference's buffer ladder to:
"segmented prefix-sums + distributed sort-by-rank".  `sharded_sort` globally
sorts equal-sharded arrays over a 1-D device mesh using **Batcher's odd-even
merge network over sorted blocks**: every comparator becomes a merge-split of
two device-resident shards (one `ppermute` shard exchange + one local 2S-lane
`lax.sort`, keep the low/high half).  By the 0-1 principle a sorting network
with blockwise merge-split sorts the block sequence exactly, and every
exchange is a fixed-partner permutation riding ICI — no host round trips, no
ragged all-to-all capacities to overflow.  O(log^2 P) exchange rounds of one
shard each; for pod-scale P a splitter-based sample sort would cut traffic to
O(1) exchanges at the cost of imbalance handling (ROADMAP).

On top of it, `suffix_array_sharded` / `build_bwt_sharded` run the same
prefix-doubling rounds as ops/sa_jax.py with every step sharded: the doubling
sort, the cross-shard segment-rank scan (local cumsum + all_gather'd shard
totals), the permutation inversion (a sort by the unique position key), and
the static-k neighbor shift (two ppermutes).  A collection whose suffix
array exceeds one chip's HBM builds across the mesh; per-device memory is
O(n / P).  Tested against the host oracle on the 8-virtual-device CPU mesh
(tests/test_sort_distributed.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SEQ_AXIS, make_mesh


def _oddeven_rounds(p: int):
    """Batcher odd-even mergesort comparator rounds for p blocks.

    Returns a list of rounds; each round is a list of disjoint (low, high)
    comparator pairs that can exchange in parallel.  All comparators are
    ascending (min to the lower index), so blocks stay ascending-sorted
    throughout — no descending phases to track (unlike plain bitonic).
    """
    rounds = []
    length = 1
    while length < p:
        k = length
        while k >= 1:
            pairs = []
            for j in range(k % length, p - k, 2 * k):
                for i in range(min(k, p - j - k)):
                    if (i + j) // (2 * length) == (i + j + k) // (2 * length):
                        pairs.append((i + j, i + j + k))
            if pairs:
                rounds.append(pairs)
            k //= 2
        length *= 2
    return rounds


def _merge_split_round(ops, num_keys, pairs, p, axis):
    """One comparator round: exchange shards with the partner, merge-split."""
    partner = np.arange(p, dtype=np.int32)
    is_low = np.ones(p, dtype=bool)
    paired = np.zeros(p, dtype=bool)
    perm = []
    for lo, hi in pairs:
        partner[lo], partner[hi] = hi, lo
        is_low[hi] = False
        paired[lo] = paired[hi] = True
        perm += [(lo, hi), (hi, lo)]
    for d in range(p):
        if partner[d] == d:
            perm.append((d, d))

    me = jax.lax.axis_index(axis)
    low = jnp.asarray(is_low)[me]
    keep = jnp.asarray(paired)[me]
    theirs = [jax.lax.ppermute(x, axis, perm) for x in ops]
    s = ops[0].shape[0]
    # CANONICAL concat order (low block first on BOTH partners): the two
    # devices must sort the identical sequence, or tied keys straddling the
    # keep boundary land payloads in different halves and the kept halves
    # no longer partition the union (elements lost/duplicated)
    merged = jax.lax.sort(
        tuple(jnp.concatenate([jnp.where(low, mine, other),
                               jnp.where(low, other, mine)])
              for mine, other in zip(ops, theirs)),
        num_keys=num_keys, is_stable=False)
    # unpaired devices pass through untouched (a self-merge would keep a
    # DUPLICATED lower half, not a no-op)
    return tuple(jnp.where(keep, jnp.where(low, m[:s], m[s:]), mine)
                 for m, mine in zip(merged, ops))


def _sharded_sort_body(ops, num_keys, p, axis):
    """shard_map body: local sort + odd-even merge network over blocks."""
    ops = jax.lax.sort(ops, num_keys=num_keys, is_stable=False)
    for pairs in _oddeven_rounds(p):
        ops = _merge_split_round(ops, num_keys, pairs, p, axis)
    return ops


def sharded_sort(operands: Sequence[jax.Array], num_keys: int,
                 mesh: Optional[Mesh] = None, axis: str = SEQ_AXIS):
    """Globally sort equal-sharded [n] arrays lexicographically by the first
    `num_keys` operands.  n must be divisible by the mesh size.  Returns the
    sorted operands, sharded the same way.  Ties are broken arbitrarily —
    include a unique key (e.g. the position) for a deterministic total order.
    """
    mesh = mesh or make_mesh()
    p = int(mesh.devices.size)
    n = operands[0].shape[0]
    if n % p:
        raise ValueError(f"size {n} not divisible by mesh size {p}")
    sharded = NamedSharding(mesh, P(axis))
    ops = tuple(jax.device_put(jnp.asarray(x), sharded) for x in operands)
    fn = jax.jit(jax.shard_map(
        functools.partial(_sharded_sort_body, num_keys=num_keys, p=p,
                          axis=axis),
        mesh=mesh, in_specs=P(axis), out_specs=P(axis)))
    return fn(ops)


# -- splitter-based sample sort ------------------------------------------------
#
# The pod-scale alternative to the odd-even network: O(1) bulk exchanges
# (one all_to_all + a constant-window rebalance) instead of O(log^2 P)
# merge-split rounds.  Regular oversampling bounds bucket skew w.h.p.; all
# capacity assumptions are CHECKED on device and surfaced as one overflow
# flag, and the public wrapper falls back to the always-correct odd-even
# path when the flag trips — adversarial key distributions cost one retry,
# never a wrong answer.


def _lex_lt(splitter_keys, elem_keys):
    """splitter < elem, lexicographic over key tuples (broadcasted)."""
    res = None
    for sk, ek in zip(reversed(splitter_keys), reversed(elem_keys)):
        lt = sk < ek
        eq = sk == ek
        res = lt if res is None else lt | (eq & res)
    return res


def _sample_sort_body(ops, num_keys, p, axis, oversample, pair_cap, window):
    """shard_map body: local sort -> splitter buckets -> one all_to_all ->
    local sort -> constant-window rebalance.  Returns (ops, overflowed)."""
    s = ops[0].shape[0]
    me = jax.lax.axis_index(axis)
    ops = jax.lax.sort(ops, num_keys=num_keys, is_stable=False)
    keys = ops[:num_keys]

    # regular samples -> replicated splitters at sample quantiles.  r and s
    # are static Python ints, so the indices are computed host-side in
    # int64: the traced int32 expression (arange(r) * s) // r overflows at
    # s > ~2^31/r (~33.5M elements at r=64), silently skewing the splitters
    # at exactly the pod scale this path targets.
    r = min(oversample, s)
    samp_idx = jnp.asarray((np.arange(r, dtype=np.int64) * s) // r,
                           dtype=jnp.int32)
    gathered = [jax.lax.all_gather(k[samp_idx], axis).reshape(-1)
                for k in keys]
    samples = jax.lax.sort(tuple(gathered), num_keys=num_keys,
                           is_stable=False)
    spl_idx = (jnp.arange(p - 1, dtype=jnp.int32) + 1) * r
    splitters = [sk[spl_idx] for sk in samples]

    # bucket id = number of splitters strictly below the element (monotone
    # nondecreasing over the locally sorted data, so each bucket is one
    # contiguous slice; ties with a splitter fall to the lower bucket)
    lt = _lex_lt(tuple(sk[:, None] for sk in splitters),
                 tuple(k[None, :] for k in keys))          # [P-1, s]
    bucket = jnp.sum(lt.astype(jnp.int32), axis=0)         # [s]
    starts = jnp.searchsorted(bucket, jnp.arange(p, dtype=jnp.int32))
    slot = jnp.arange(s, dtype=jnp.int32) - starts[bucket]
    over_pair = jnp.any(slot >= pair_cap)

    # scatter into per-destination send planes; all_to_all swaps rows
    def to_planes(x):
        plane = jnp.zeros((p, pair_cap), x.dtype)
        plane = plane.at[bucket, slot].set(x, mode="drop")
        return jax.lax.all_to_all(plane, axis, split_axis=0, concat_axis=0)

    valid = to_planes(jnp.ones((s,), jnp.int32)).reshape(-1)
    recv = [to_planes(x).reshape(-1) for x in ops]

    # valid entries first, then key order (invalid flag is the primary key)
    sorted_recv = jax.lax.sort((1 - valid,) + tuple(recv),
                               num_keys=1 + num_keys, is_stable=False)
    c_local = jnp.sum(valid)
    recv = sorted_recv[1:]

    # global offset of my bucket's first element
    totals = jax.lax.all_gather(c_local, axis)             # [P]
    off = jnp.sum(jnp.where(jnp.arange(p) < me, totals, 0))

    # rebalance: my elements occupy global [off, off + c_local); ship each
    # contiguous piece to its output shard via one ppermute per window step
    out = tuple(jnp.zeros((s,), x.dtype) for x in ops)
    covered = jnp.int32(0)
    m = recv[0].shape[0]
    j = jnp.arange(s, dtype=jnp.int32)
    for d in range(-window, window + 1):
        dest_start = (me + d) * s
        lo = jnp.clip(dest_start - off, 0, c_local)
        hi = jnp.clip(dest_start + s - off, 0, c_local)
        in_dest = (me + d >= 0) & (me + d < p)
        cnt = jnp.where(in_dest, hi - lo, 0)
        covered += cnt
        slot0 = off + lo - dest_start                      # first slot used
        take = (j >= slot0) & (j < slot0 + cnt)
        src = jnp.clip(j - slot0 + lo, 0, m - 1)
        perm = [(q, q + d) for q in range(p) if 0 <= q + d < p]
        mask = jax.lax.ppermute(take.astype(jnp.int32), axis, perm)
        out = tuple(
            jnp.where(mask > 0,
                      jax.lax.ppermute(jnp.where(take, x[src], 0), axis,
                                       perm),
                      o)
            for x, o in zip(recv, out))
    overflow = jax.lax.pmax(
        (over_pair | (covered < c_local)).astype(jnp.int32), axis)
    return out + (overflow,)


def sharded_sample_sort(operands: Sequence[jax.Array], num_keys: int,
                        mesh: Optional[Mesh] = None, axis: str = SEQ_AXIS,
                        oversample: int = 64, slack: float = 2.0,
                        window: int = 4):
    """sharded_sort via splitter-based sample sort: one bulk all_to_all plus
    a constant-window rebalance — O(1) exchange rounds vs the odd-even
    network's O(log^2 P), the right trade at pod scale where each round's
    latency dominates.  Identical contract to `sharded_sort` (equal-sharded
    in/out, ties arbitrary).  Capacity assumptions (per-pair bucket size
    `slack`*s/P, rebalance drift `window` shards) are checked on device;
    on overflow the call transparently falls back to `sharded_sort`.
    """
    mesh = mesh or make_mesh()
    p = int(mesh.devices.size)
    n = operands[0].shape[0]
    if n % p:
        raise ValueError(f"size {n} not divisible by mesh size {p}")
    s = n // p
    if p == 1 or s < 2 * p:
        return sharded_sort(operands, num_keys, mesh=mesh, axis=axis)
    pair_cap = max(1, int(-(-slack * s // p)))
    sharded = NamedSharding(mesh, P(axis))
    ops = tuple(jax.device_put(jnp.asarray(x), sharded) for x in operands)
    fn = jax.jit(jax.shard_map(
        functools.partial(_sample_sort_body, num_keys=num_keys, p=p,
                          axis=axis, oversample=oversample,
                          pair_cap=pair_cap, window=min(window, p - 1)),
        mesh=mesh, in_specs=P(axis),
        out_specs=tuple(P(axis) for _ in ops) + (P(),)))
    *out, overflow = fn(ops)
    if int(np.asarray(overflow)):
        return sharded_sort(operands, num_keys, mesh=mesh, axis=axis)
    return tuple(out)


# -- sharded prefix doubling ---------------------------------------------------


def _left_edge(x, p, axis):
    """Last element of the LEFT neighbor shard (first shard gets -1)."""
    me = jax.lax.axis_index(axis)
    perm = [(d, d + 1) for d in range(p - 1)]
    prev_last = (jax.lax.ppermute(x[-1:], axis, perm) if perm
                 else x[-1:] * 0 - 1)
    return jnp.where(me == 0, jnp.int32(-1), prev_last[0])


def _global_seg_ranks(k1, k2, p, axis):
    """Global 0-based segment ranks of a SORTED sharded (k1, k2) pair:
    rank of an element = number of distinct (k1, k2) values strictly before
    it.  Local cumsum of change flags + exclusive prefix of all_gather'd
    per-shard totals — the sharded analog of the rank scan in
    ops/sa_jax._sa_ranks."""
    prev1 = _left_edge(k1, p, axis)
    prev2 = _left_edge(k2, p, axis)
    me = jax.lax.axis_index(axis)
    first = jnp.where(me == 0, jnp.int32(0),
                      ((k1[0] != prev1) | (k2[0] != prev2)).astype(jnp.int32))
    changed = jnp.concatenate(
        [first[None],
         ((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])).astype(jnp.int32)])
    local = jnp.cumsum(changed)
    totals = jax.lax.all_gather(local[-1], axis)            # [P]
    before = jnp.sum(jnp.where(jnp.arange(p) < me, totals, 0))
    return (before + local).astype(jnp.int32)


def _shift_left_body(rank, k, s, p, axis):
    """rank[i + k] per global position i (-1 past the end), k static."""
    hop, off = divmod(k, s)
    # element i of my shard needs global position (me*s + i + k) =
    # shard (me + hop [+1]) at offset (i + off [- s])
    def from_hop(h):
        if h == 0:
            return rank
        perm = [(d, d - h) for d in range(h, p)]
        return jax.lax.ppermute(rank, axis, perm)

    a = from_hop(hop) if hop < p else rank * 0 - 1           # shard me+hop
    b = from_hop(hop + 1) if hop + 1 < p else rank * 0 - 1
    me = jax.lax.axis_index(axis)
    idx = jnp.arange(s, dtype=jnp.int32)
    take_a = idx + off < s
    av = jnp.where(take_a, a[jnp.minimum(idx + off, s - 1)],
                   b[jnp.maximum(idx + off - s, 0)])
    # lanes whose source shard does not exist read past the end
    src_shard = me + hop + (~take_a).astype(jnp.int32)
    return jnp.where(src_shard < p, av, jnp.int32(-1))


def _pad_to(arr: np.ndarray, n_pad: int, descending_below: int) -> np.ndarray:
    pad = np.arange(descending_below - 1,
                    descending_below - 1 - (n_pad - arr.size), -1,
                    dtype=np.int32)
    return np.concatenate([arr.astype(np.int32), pad])


def suffix_array_sharded(text: np.ndarray, mesh: Optional[Mesh] = None,
                         axis: str = SEQ_AXIS,
                         sort_method: str = "oddeven") -> np.ndarray:
    """Suffix array by prefix doubling with every step sharded over the mesh.

    Matches models/oracle.suffix_array (pinned by tests).  Padding uses
    distinct descending values below min(text) (end-of-string convention,
    ops/sa_jax._end_padding), so pad suffixes occupy the first rows and the
    real suffix array is the tail.

    sort_method: "oddeven" (default — O(log^2 P) merge-split rounds, always
    correct) or "sample" (splitter-based sample sort per doubling round —
    O(1) bulk exchanges, the pod-scale trade; every round's capacity flag
    is checked on the host and an overflowed round re-runs via the odd-even
    path, so the result is identical either way).
    """
    if sort_method not in ("oddeven", "sample"):
        raise ValueError(f"unknown sort_method {sort_method!r}")
    mesh = mesh or make_mesh()
    p = int(mesh.devices.size)
    text = np.asarray(text)
    n = text.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    n_pad = 1 << max(6, (n - 1).bit_length())
    if n_pad // 4 * 3 >= n and (n_pad // 4 * 3) % p == 0:
        n_pad = n_pad // 4 * 3
    text_pad = _pad_to(text, n_pad, int(text.min()))
    s = n_pad // p
    sharded = NamedSharding(mesh, P(axis))

    idx = np.arange(n_pad, dtype=np.int32)
    pair_cap = max(1, -(-2 * s // p))

    def sort_in_body(ops, nk, sample):
        """One global sort inside a shard_map body -> (ops, overflow)."""
        if not sample:
            return _sharded_sort_body(ops, nk, p, axis), jnp.int32(0)
        *out, flag = _sample_sort_body(ops, nk, p, axis, oversample=64,
                                       pair_cap=pair_cap,
                                       window=min(4, p - 1))
        return tuple(out), flag

    @functools.partial(jax.jit, static_argnames=("sample",))
    def round0(t, i, sample):
        def body(t, i):
            (t_s, i_s), f1 = sort_in_body((t, i), 2, sample)
            rank_sorted = _global_seg_ranks(t_s, t_s, p, axis)
            # invert: route rank to position order (i_s is unique)
            (_, rank_by_pos), f2 = sort_in_body((i_s, rank_sorted), 1, sample)
            return rank_by_pos, i_s, jnp.maximum(f1, f2)
        return jax.shard_map(body, mesh=mesh, in_specs=P(axis),
                             out_specs=(P(axis), P(axis), P()))(t, i)

    @functools.partial(jax.jit, static_argnames=("k", "sample"))
    def round_k(rank, i, k, sample):
        def body(rank, i):
            second = _shift_left_body(rank, k, s, p, axis)
            (r_s, s_s, i_s), f1 = sort_in_body((rank, second, i), 3, sample)
            rank_sorted = _global_seg_ranks(r_s, s_s, p, axis)
            (_, rank_by_pos), f2 = sort_in_body((i_s, rank_sorted), 1, sample)
            return rank_by_pos, i_s, rank_sorted[-1:], jnp.maximum(f1, f2)
        return jax.shard_map(
            body, mesh=mesh, in_specs=P(axis),
            out_specs=(P(axis), P(axis), P(axis), P()))(rank, i)

    use_sample = sort_method == "sample" and p > 1 and s >= 2 * p
    # Tie-heavy rounds (repetitive inputs) blow the sample sort's constant
    # per-pair capacity and force the odd-even re-run — and early tie-heavy
    # rounds predict late ones, so after MAX_SAMPLE_FALLBACKS consecutive
    # overflows the sample attempt is dropped for the rest of the
    # construction instead of paying attempt + re-run every round.
    MAX_SAMPLE_FALLBACKS = 2
    fallbacks = 0
    t_dev = jax.device_put(jnp.asarray(text_pad), sharded)
    i_dev = jax.device_put(jnp.asarray(idx), sharded)
    rank, order, flag = round0(t_dev, i_dev, use_sample)
    if use_sample and int(np.asarray(flag)):
        rank, order, _ = round0(t_dev, i_dev, False)
        fallbacks += 1
    k = 1
    while True:
        if fallbacks >= MAX_SAMPLE_FALLBACKS:
            use_sample = False
        rank2, order2, last, flag = round_k(rank, i_dev, k, use_sample)
        if use_sample:
            if int(np.asarray(flag)):
                rank2, order2, last, _ = round_k(rank, i_dev, k, False)
                fallbacks += 1
            else:
                fallbacks = 0
        rank, order = rank2, order2
        # the last shard's final sorted rank is the global max rank
        if int(np.asarray(last)[-1]) == n_pad - 1:
            break
        k *= 2
        if k > 2 * n_pad:  # safety: must have converged by then
            raise RuntimeError("sharded prefix doubling failed to converge")
    sa = np.asarray(order)
    return sa[n_pad - n:].astype(np.int64)


def rlo_order_sharded(sequences, mesh: Optional[Mesh] = None,
                      axis: str = SEQ_AXIS,
                      sort_method: str = "oddeven") -> np.ndarray:
    """Mesh-sharded analog of ops/sa_jax.rlo_order_device: RLO read ordering
    for collections whose key matrix exceeds one chip's sort memory.

    The reversed reads pack into fixed-width int32 keys (rlo_pack_keys, 3
    bits/char — sign bit spare, so INT32_MAX is a safe above-everything
    sentinel); the key columns then globally sort over the mesh with the
    odd-even merge network (`sharded_sort`), each device holding m/P reads
    — or, with sort_method="sample", through `sharded_sample_sort` (one
    bulk exchange; the pod-scale trade).  Reads pad to a mesh multiple with
    sentinel keys that sort last and are sliced off.  Identical to
    rlo_order_device / models/build.rlo_order (pinned by
    tests/test_sort_distributed.py)."""
    from ..ops.sa_jax import pack_collection, rlo_pack_keys

    mesh = mesh or make_mesh()
    p = int(mesh.devices.size)
    flat, lengths = pack_collection(sequences)
    m = lengths.size
    if m == 0:
        return np.zeros(0, dtype=np.int64)
    if int(lengths.max()) == 0:
        return np.arange(m, dtype=np.int64)
    keys = rlo_pack_keys(flat, lengths)
    m_pad = -(-m // p) * p
    if m_pad > m:
        keys = np.pad(keys, ((0, 0), (0, m_pad - m)),
                      constant_values=np.int32(2**31 - 1))
    idx = np.arange(m_pad, dtype=np.int32)
    # idx participates as the FINAL key: the sharded sorts are unstable, and
    # RLO parity needs equal reads kept in original order (lexsort is stable)
    sort = (sharded_sample_sort if sort_method == "sample" else sharded_sort)
    out = sort(tuple(keys) + (idx,), num_keys=keys.shape[0] + 1,
               mesh=mesh, axis=axis)
    return np.asarray(out[-1])[:m].astype(np.int64)


def build_bwt_sharded(sequences, mesh: Optional[Mesh] = None,
                      axis: str = SEQ_AXIS, sort_method: str = "oddeven"):
    """Mesh-sharded analog of ops/sa_jax.build_bwt_device: BWT of a
    collection whose suffix sort exceeds one chip's memory.  Output is
    identical to oracle.build_bwt (pinned by tests).  sort_method as in
    suffix_array_sharded."""
    from ..models.runs import RunArrays
    from ..ops.sa_jax import pack_collection

    flat, lengths = pack_collection(sequences)
    m = lengths.size
    if flat.size and flat.min() <= 0:
        raise ValueError(
            "sequences must contain comp values >= 1 (no endmarkers)")
    n = int(lengths.sum()) + m
    if n == 0:
        return RunArrays.empty()
    text = np.empty(n, dtype=np.int32)
    ends = np.cumsum(lengths + 1) - 1
    mask = np.ones(n, dtype=bool)
    mask[ends] = False
    text[ends] = np.arange(m, dtype=np.int32)
    text[mask] = flat + np.int32(m)

    sa = suffix_array_sharded(text, mesh=mesh, axis=axis,
                              sort_method=sort_method)
    prev = np.concatenate([[0], text[:-1]])[sa]
    bwt = np.where(prev < m, 0, prev - m).astype(np.uint8)
    return RunArrays.from_values(bwt)
