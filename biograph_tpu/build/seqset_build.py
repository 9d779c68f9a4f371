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
) -> Seqset:
    """Build a seqset from a padded read matrix.

    codes: uint8 [R, L] zero-padded; lengths: [R].
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

    seqs = codes
    seq_lens = lengths
    if include_rc:
        rc = np.asarray(dna.revcomp_codes(jnp.asarray(codes), jnp.asarray(lengths)))
        seqs = np.concatenate([codes, rc], axis=0)
        seq_lens = np.concatenate([lengths, lengths])

    words, wlens = _suffix_words(jnp.asarray(seqs), jnp.asarray(seq_lens), W)

    # --- sort + dedup + maximality (device) ---
    e_words, e_lens, n_entries = _entries_from_suffixes(words, wlens)
    e_words = np.asarray(e_words[:n_entries])
    e_lens = np.asarray(e_lens[:n_entries])

    return seqset_from_entries(jnp.asarray(e_words), jnp.asarray(e_lens))


def _suffix_words(seqs: jnp.ndarray, seq_lens: jnp.ndarray, W: int):
    """All nonempty suffixes of all rows, packed.  Returns ([N, W] u32, [N])."""
    S, L = seqs.shape
    # suffix j of row r: codes shifted left j; generate via gather
    # [S, L(j), L(pos)] would be L^2 memory per read; chunk over j instead.
    out_words = []
    out_lens = []
    chunk = max(1, (1 << 22) // max(S, 1))  # rows of j per pass
    for j0 in range(0, L, chunk):
        j1 = min(L, j0 + chunk)
        for j in range(j0, j1):
            ln = seq_lens - j
            keep_any = int(jnp.max(ln)) if ln.size else 0
            if keep_any <= 0:
                break
            shifted = jnp.concatenate(
                [seqs[:, j:], jnp.zeros((S, j), jnp.uint8)], axis=1
            )
            w = dna.pack_codes(shifted, jnp.maximum(ln, 0))
            out_words.append(w)
            out_lens.append(jnp.maximum(ln, 0).astype(jnp.int32))
    words = jnp.concatenate(out_words, axis=0)
    lens = jnp.concatenate(out_lens, axis=0)
    keep = lens > 0
    # compact: sort by ~keep then slice (device-friendly)
    n_keep = int(jnp.sum(keep))
    ops = (jnp.where(keep, 0, 1).astype(jnp.int32),) + tuple(
        words[:, i] for i in range(words.shape[1])
    ) + (lens,)
    out = lax.sort(ops, num_keys=1, is_stable=True)
    words = jnp.stack(out[1:-1], axis=1)[:n_keep]
    lens = out[-1][:n_keep]
    return words, lens


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


def seqset_from_entries(e_words: jnp.ndarray, e_lens: jnp.ndarray) -> Seqset:
    """Assemble seqset arrays from the sorted prefix-maximal entry list."""
    n = int(e_words.shape[0])
    W = e_words.shape[1]

    shared = np.asarray(sortutil.lcp_with_prev(e_words, e_lens), np.int32)
    sizes = np.asarray(e_lens, np.int32)

    first_base = np.asarray((e_words[:, 0] >> jnp.uint32(30)) & jnp.uint32(3), np.int64)
    counts = np.bincount(first_base, minlength=4)
    fixed = np.zeros(5, np.int64)
    np.cumsum(counts, out=fixed[1:])
    if fixed[4] != n:
        raise AssertionError("fixed counts disagree with entry count")

    # pop of each entry: shift one base off the front of the packed words
    popped_words = _shift_one_base(e_words)
    popped_lens = (e_lens - 1).astype(jnp.int32)
    lb = sortutil.merge_lower_bound(e_words, e_lens, popped_words, popped_lens)
    lb = np.asarray(lb, np.int64)

    # entries with first base b, in order, set bits of prev[b] at positions lb
    # (strictly increasing within each base group); pop_sel is lb itself.
    nw = n // 32 + 1
    prev_words = np.zeros((4, nw), np.uint32)
    prev_cum = np.zeros((4, nw), np.int64)
    for b in range(4):
        pos = lb[fixed[b] : fixed[b + 1]]
        if len(pos):
            if not (np.diff(pos) > 0).all():
                raise AssertionError(f"select table for base {b} not increasing")
        rb = RankBits.from_positions(pos, n)
        prev_words[b] = rb.words
        prev_cum[b] = rb.cum

    max_len = int(sizes.max(initial=0))
    return Seqset(
        n_entries=n,
        max_entry_len=max_len,
        fixed=fixed,
        prev_words=prev_words,
        prev_cum=prev_cum,
        entry_sizes=sizes,
        shared=shared,
        pop_sel=lb,
    )


def _shift_one_base(words: jnp.ndarray) -> jnp.ndarray:
    """Drop the first base: each word takes its tail plus the head of the next."""
    W = words.shape[1]
    nxt = jnp.concatenate(
        [words[:, 1:], jnp.zeros((words.shape[0], 1), jnp.uint32)], axis=1
    )
    return ((words << jnp.uint32(2)) | (nxt >> jnp.uint32(30))).astype(jnp.uint32)
