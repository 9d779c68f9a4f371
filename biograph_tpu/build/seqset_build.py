"""Seqset construction as device-wide sorting.

TPU-native replacement for the reference's out-of-core construction chain
(modules/build_seqset/: part_repo prefix partitions, expander sort/expand
passes expand.h:22-40, builder prev-bit chunks builder.h:18-31, and
seqset::finalize rank builds).  The reference's alternating
sort_and_dedup/expand passes exist to materialize the pop-front closure
without holding all suffixes; on TPU we generate the closure directly as a
padded suffix array and run one multi-operand device sort, falling back to
prefix-partitioned passes (`partition_bases`) when the suffix set exceeds
device memory — the same 4^d bucketing as part_repo.h:9, but over device
shards instead of files.

Pipeline:
  1. reads + reverse complements -> all suffixes, 2-bit packed [N, W] words
  2. one lax.sort (words…, length) — prefix-first lexicographic order
  3. dedup + prefix-maximality filter  -> entries
  4. sizes, shared (vectorized LCP), fixed (first-base offsets)
  5. prev[b] bitvectors + select tables by batched lower-bound of every
     entry's pop against the entry list (one more merge sort)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from functools import partial as _partial

import jax
import jax.numpy as jnp
from jax import lax

from biograph_tpu.core import dna
from biograph_tpu.core.bitvector import RankBits, popcount_np
from biograph_tpu.index.seqset import Seqset
from biograph_tpu.ops import sortutil


def build_seqset(
    codes: np.ndarray,
    lengths: np.ndarray,
    include_rc: bool = True,
    budget: "MemoryBudget | int | None" = None,
) -> Seqset:
    """Build a seqset from a padded read matrix.

    codes: uint8 [R, L] zero-padded; lengths: [R].

    `budget` (a runtime.resources.MemoryBudget or raw byte count) bounds the
    device-resident suffix sort: when the full suffix set would exceed it,
    construction switches to the prefix-partitioned multi-pass path
    (_entries_partitioned — part_repo.h:9's 4^d bucketing over device passes
    instead of files), which produces the identical entry list.
    """
    codes = np.asarray(codes, np.uint8)
    lengths = np.asarray(lengths, np.int32)
    if codes.shape[0] == 0 or int(lengths.max(initial=0)) == 0:
        raise ValueError(
            "build_seqset: no nonempty reads (all reads dropped by "
            "correction/filters?)"
        )
    R, L = codes.shape
    W = dna.words_for_bases(L)

    budget_bytes = getattr(budget, "bytes", budget)
    total_suffixes = int(lengths.sum()) * (2 if include_rc else 1)
    # sort working set: operand columns + sorted copies (~4x)
    sort_bytes = total_suffixes * (W * 4 + 8) * 4
    if budget_bytes is not None and sort_bytes > budget_bytes:
        # reads stay HOST-resident (np/memmap) and stream to device in
        # chunks: neither the read matrix nor the suffix set ever has to
        # fit HBM — the full part_repo story, not just partitioned sorting
        e_words, e_lens = _entries_partitioned(
            codes, lengths, W, budget_bytes, include_rc
        )
        return seqset_from_entries(jnp.asarray(e_words), jnp.asarray(e_lens))

    # device-resident from here: the revcomp + concat stay on device (the
    # old np.asarray bounce shipped the read matrix down and back up — a
    # full megabyte of relay traffic on the golden sample)
    codes_dev = jnp.asarray(codes)
    lens_dev = jnp.asarray(lengths)
    if include_rc:
        seqs = jnp.concatenate(
            [codes_dev, dna.revcomp_codes(codes_dev, lens_dev)], axis=0
        )
        seq_lens = jnp.concatenate([lens_dev, lens_dev])
    else:
        seqs, seq_lens = codes_dev, lens_dev

    words, wlens = _suffix_words(seqs, seq_lens, W)
    # --- sort + dedup + maximality (device) ---
    ew, el, n_entries = _entries_from_suffixes(words, wlens)
    # device slices straight into assembly — no host bounce of the entries
    return seqset_from_entries(ew[:n_entries], el[:n_entries])


def _suffix_prefix_values(seqs: jnp.ndarray, seq_lens: jnp.ndarray, d: int):
    """Partition value (first d bases, zero-padded) of every suffix, yielded
    per suffix-offset j as ([S] values, [S] lens) — the same bucketing as the
    reference's part_repo partitions (part_repo.h:9: 4^d prefix buckets).
    A suffix shorter than d bases pads with code 0, which places it exactly
    before every longer string it prefixes (prefix-first order preserved)."""
    S, L = seqs.shape
    for j in range(L):
        ln = seq_lens - j
        if int(jnp.max(ln)) <= 0:
            return
        window = lax.dynamic_slice_in_dim(
            jnp.concatenate([seqs, jnp.zeros((S, d), jnp.uint8)], axis=1), j, d, 1
        )
        val = jnp.zeros((S,), jnp.int64)
        for i in range(d):
            val = (val << 2) | window[:, i].astype(jnp.int64)
        yield j, val, ln


def _iter_read_chunks(codes: np.ndarray, lengths: np.ndarray, include_rc: bool,
                      chunk_rows: int):
    """Stream host-resident reads (np array or memmap) to device in bounded
    row chunks; reverse complements are computed ON DEVICE per chunk, so the
    host never materializes them and the device never holds more than one
    chunk."""
    R = codes.shape[0]
    for r0 in range(0, R, chunk_rows):
        r1 = min(R, r0 + chunk_rows)
        c = jnp.asarray(np.ascontiguousarray(codes[r0:r1]))
        ln = jnp.asarray(np.ascontiguousarray(lengths[r0:r1]))
        yield c, ln
        if include_rc:
            yield dna.revcomp_codes(c, ln), ln


def _entries_partitioned(
    codes: np.ndarray, lengths: np.ndarray, W: int, budget_bytes: int,
    include_rc: bool = True,
):
    """Prefix-partitioned entry construction under a device-memory budget.

    Reads stay on the host (np array or memmap) and stream to the device in
    row chunks sized to the budget (part_repo.h:9's disk-backed partitions
    with the mesh transfer in place of file IO).  Multi-pass: partitions
    (4^d buckets by leading bases) are grouped into passes whose suffix rows
    fit the budget; each pass gathers its rows from every chunk, then
    sorts/dedups them; prefix-maximality across a pass boundary is stitched
    by appending the FIRST sorted suffix of the following pass (the global
    successor of the pass's last row) as a sentinel.  Passes run in reverse
    order so the successor is always known.  Output is bit-identical to the
    one-shot sort.
    """
    total = int(lengths.sum()) * (2 if include_rc else 1)
    row_bytes = (W * 4 + 8) * 4
    per_pass_rows = max(budget_bytes // row_bytes, 1 << 12)
    d = 1
    while total / (4**d) > per_pass_rows / 4 and d < 12:
        d += 1
    P = 4**d
    L = codes.shape[1]
    chunk_rows = int(max(budget_bytes // max(L * 16, 1), 128))

    # histogram of suffixes per partition (streamed, nothing materialized)
    counts = np.zeros(P + 1, np.int64)
    for seqs, seq_lens in _iter_read_chunks(codes, lengths, include_rc, chunk_rows):
        for j, val, ln in _suffix_prefix_values(seqs, seq_lens, d):
            v = np.asarray(val)
            keep = np.asarray(ln) > 0
            counts[:P] += np.bincount(v[keep], minlength=P)

    # group contiguous partitions into passes under the row budget
    ranges = []
    lo = 0
    acc = 0
    for p in range(P):
        if acc and acc + counts[p] > per_pass_rows:
            ranges.append((lo, p))
            lo = p
            acc = 0
        acc += counts[p]
    ranges.append((lo, P))

    out_words: list = []
    out_lens: list = []
    next_head = None  # (words [W] u32, len) — first sorted suffix of the following pass
    for plo, phi in reversed(ranges):
        pw, pl = [], []
        for seqs, seq_lens in _iter_read_chunks(
            codes, lengths, include_rc, chunk_rows
        ):
            cw, cl = _suffix_words_range(seqs, seq_lens, W, d, plo, phi)
            if cw.shape[0]:
                pw.append(np.asarray(cw))
                pl.append(np.asarray(cl))
        if not pw:
            continue
        sw = jnp.asarray(np.concatenate(pw, axis=0))
        sl = jnp.asarray(np.concatenate(pl, axis=0))
        sw, sl, _ = sortutil.sort_sequences_device(sw, sl)
        head = (np.asarray(sw[0]), int(sl[0]))
        if next_head is not None:
            sw = jnp.concatenate([sw, jnp.asarray(next_head[0])[None]], axis=0)
            sl = jnp.concatenate(
                [sl, jnp.asarray([next_head[1]], sl.dtype)], axis=0
            )
        keep = ~sortutil.is_prefix_of_next(sw, sl)
        keep_np = np.asarray(keep)
        if next_head is not None:
            keep_np = keep_np[:-1]
            sw = sw[:-1]
            sl = sl[:-1]
        idx = np.nonzero(keep_np)[0]
        out_words.append(np.asarray(sw)[idx])
        out_lens.append(np.asarray(sl)[idx])
        next_head = head
    out_words.reverse()
    out_lens.reverse()
    return np.concatenate(out_words, axis=0), np.concatenate(out_lens, axis=0)


def _suffix_words_range(
    seqs: jnp.ndarray, seq_lens: jnp.ndarray, W: int, d: int, plo: int, phi: int
):
    """Packed suffixes whose partition value falls in [plo, phi)."""
    S, L = seqs.shape
    parts_w = []
    parts_l = []
    for j, val, ln in _suffix_prefix_values(seqs, seq_lens, d):
        keep = (ln > 0) & (val >= plo) & (val < phi)
        n_keep = int(jnp.sum(keep))
        if n_keep == 0:
            continue
        shifted = jnp.concatenate(
            [seqs[:, j:], jnp.zeros((S, j), jnp.uint8)], axis=1
        )
        w = dna.pack_codes(shifted, jnp.maximum(ln, 0))
        kn = np.nonzero(np.asarray(keep))[0]
        parts_w.append(np.asarray(w)[kn])
        parts_l.append(np.asarray(jnp.maximum(ln, 0).astype(jnp.int32))[kn])
    if not parts_w:
        return jnp.zeros((0, W), jnp.uint32), jnp.zeros((0,), jnp.int32)
    return (
        jnp.asarray(np.concatenate(parts_w, axis=0)),
        jnp.asarray(np.concatenate(parts_l, axis=0)),
    )


@_partial(jax.jit, static_argnums=(2, 3))
def _suffix_words_jit(seqs, seq_lens, W: int, Lcap: int):
    """All suffixes j < Lcap of all rows, packed + keep-sorted, ONE device
    program (the old per-j dispatch loop paid a launch per base position)."""
    S, L = seqs.shape
    out_words = []
    out_lens = []
    for j in range(Lcap):
        ln = seq_lens - j
        shifted = jnp.concatenate(
            [seqs[:, j:], jnp.zeros((S, j), jnp.uint8)], axis=1
        )
        out_words.append(dna.pack_codes(shifted, jnp.maximum(ln, 0)))
        out_lens.append(jnp.maximum(ln, 0).astype(jnp.int32))
    words = jnp.concatenate(out_words, axis=0)
    lens = jnp.concatenate(out_lens, axis=0)
    keep = lens > 0
    ops = (jnp.where(keep, 0, 1).astype(jnp.int32),) + tuple(
        words[:, i] for i in range(words.shape[1])
    ) + (lens,)
    out = lax.sort(ops, num_keys=1, is_stable=True)
    return (
        jnp.stack(out[1:-1], axis=1),
        out[-1],
        jnp.sum(keep.astype(jnp.int64)),
    )


def _suffix_words(seqs: jnp.ndarray, seq_lens: jnp.ndarray, W: int):
    """All nonempty suffixes of all rows, packed.  Returns ([N, W] u32, [N])."""
    S, L = seqs.shape
    # ONE host read bounds the unroll; ONE more slices the keep prefix
    Lmax = int(jnp.max(seq_lens)) if seq_lens.size else 0
    words, lens, n_keep = _suffix_words_jit(seqs, seq_lens, W, min(L, Lmax))
    n_keep = int(n_keep)
    return words[:n_keep], lens[:n_keep]


def _entries_from_suffixes(words: jnp.ndarray, lens: jnp.ndarray):
    """Sort suffixes, drop duplicates and non-prefix-maximal rows."""
    sw, sl, _ = sortutil.sort_sequences_device(words, lens)
    # Drop every row that is a (non-strict) prefix of its successor: this
    # removes duplicates (keeping the last copy) AND non-prefix-maximal rows
    # in one mask.
    keep = ~sortutil.is_prefix_of_next(sw, sl)
    n_entries = int(jnp.sum(keep))
    # compact keepers to the front preserving order
    key = jnp.where(keep, 0, 1).astype(jnp.int32)
    ops = (key,) + tuple(sw[:, i] for i in range(sw.shape[1])) + (sl,)
    out = lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(out[1:-1], axis=1), out[-1], n_entries




@_partial(jax.jit, static_argnums=(2, 3))
def _rank_structure_dev(first_base, lb, n: int, nw: int):
    """prev[b] rank bitvectors ON DEVICE: scatter-add each entry's pop
    lower-bound bit into its first-base row, then exclusive per-word
    popcount prefix sums (RankBits layout).  Also returns the packed
    validation/stat vector [counts(4), select_monotone_ok, max_len-slot]
    so the host needs ONE tiny fetch for the whole assembly."""
    w = (lb >> 5).astype(jnp.int64)
    bit = (lb & 31).astype(jnp.uint32)
    flat = first_base * nw + w
    words = (
        jnp.zeros((4 * nw,), jnp.uint32)
        .at[flat]
        .add(jnp.uint32(1) << bit)
        .reshape(4, nw)
    )
    pc = lax.population_count(words).astype(jnp.int64)
    cum = jnp.cumsum(pc, axis=1) - pc  # exclusive
    counts = jnp.bincount(first_base, length=4).astype(jnp.int64)
    same_base = first_base[1:] == first_base[:-1]
    mono = jnp.all(~same_base | (lb[1:] > lb[:-1])) if n > 1 else jnp.asarray(True)
    stats = jnp.concatenate(
        [counts, mono.astype(jnp.int64)[None]]
    )
    return words, cum, stats


def seqset_from_entries(e_words: jnp.ndarray, e_lens: jnp.ndarray) -> Seqset:
    """Assemble seqset arrays from the sorted prefix-maximal entry list.

    Everything stays DEVICE-resident (one tiny stat fetch): the Seqset's
    fields are jnp arrays that `.d` reuses without a host round trip, and
    save() pulls them down only when persisting.  Over a slow device link
    the old host bounce (entries down, structures rebuilt in numpy, then
    everything up again) dominated build time."""
    e_words = jnp.asarray(e_words)
    e_lens = jnp.asarray(e_lens)
    n = int(e_words.shape[0])

    shared = sortutil.lcp_with_prev(e_words, e_lens).astype(jnp.int32)
    sizes = jnp.asarray(e_lens, jnp.int32)
    first_base = ((e_words[:, 0] >> jnp.uint32(30)) & jnp.uint32(3)).astype(
        jnp.int64
    )
    # pop of each entry: shift one base off the front of the packed words
    popped_words = _shift_one_base(e_words)
    popped_lens = (e_lens - 1).astype(jnp.int32)
    lb = sortutil.merge_lower_bound(
        e_words, e_lens, popped_words, popped_lens
    ).astype(jnp.int64)
    nw = n // 32 + 1
    prev_words, prev_cum, dstats = _rank_structure_dev(first_base, lb, n, nw)
    max_len_dev = jnp.max(sizes, initial=0)
    host = np.asarray(
        jnp.concatenate([dstats, max_len_dev[None].astype(jnp.int64)])
    )
    counts, mono, max_len = host[:4], host[4], int(host[5])
    fixed = np.zeros(5, np.int64)
    np.cumsum(counts, out=fixed[1:])
    if fixed[4] != n:
        raise AssertionError("fixed counts disagree with entry count")
    if not mono:
        raise AssertionError("select table not increasing within a base")
    ss = Seqset(
        n_entries=n,
        max_entry_len=max_len,
        fixed=fixed,
        prev_words=prev_words,
        prev_cum=prev_cum,
        entry_sizes=sizes,
        shared=shared,
        pop_sel=lb,
    )
    # keep the packed entry matrix for the readmap build (it would otherwise
    # reconstruct it entry-by-entry via pop chains)
    ss.__dict__["_entry_cache"] = (e_words, e_lens)
    return ss


def _shift_one_base(words: jnp.ndarray) -> jnp.ndarray:
    """Drop the first base: each word takes its tail plus the head of the next."""
    W = words.shape[1]
    nxt = jnp.concatenate(
        [words[:, 1:], jnp.zeros((words.shape[0], 1), jnp.uint32)], axis=1
    )
    return ((words << jnp.uint32(2)) | (nxt >> jnp.uint32(30))).astype(jnp.uint32)
