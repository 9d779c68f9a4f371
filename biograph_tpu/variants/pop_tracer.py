"""Pair/split-evidence structural-variant discovery (pop_tracer analog).

The reference discovers events larger than the push tracer's path cap with
the pop tracer (modules/variants/pop_tracer.h:8, algorithm steps at
pop_tracer.h:34-60): it collects reference + mate-candidate seqset entries in
a window, chains pops whose prefixes match, and scores chains with mate-pair
support (modules/variants/pair_cov.cpp place_pair_cov / pair_edge_cov).

The TPU-native reformulation turns the pointer-chasing chain walk into two
batched passes over *reads that failed whole-read placement*:

  1. **split placement** — every k-mer of every unplaced read is looked up in
     the reference k-mer table at once; per read the dominant *prefix
     diagonal* and *suffix diagonal* are voted out of the hit matrix (one
     sort, no per-read walk).  A read whose prefix lands at diagonal d_pre
     and suffix at d_suf != d_pre spans a breakpoint:
       d_suf > d_pre  ->  deletion of (d_suf - d_pre) bases
       d_suf < d_pre  ->  insertion of (d_pre - d_suf) bases (novel sequence
                          taken from the read between the two runs)
     Exact breakpoints come from vectorized prefix/suffix match runs against
     the reference; micro-homology resolves to the leftmost breakpoint.
  2. **clustering + pair evidence** — candidates agreeing on (left, right,
     inserted) merge; events need min_sv_reads split reads, and mate pairs
     straddling the junction in proper orientation with a plausible implied
     fragment add pair support (pair_cov analog).

Event size is bounded only by the reference length — this is the engine that
lifts the wavefront's max_path cap (the reference's flagship 49 kb deletion,
modules/variants/hg002_test.cpp:23, is a split+pair call of exactly this
shape).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from biograph_tpu.core import dna
from biograph_tpu.variants.align import RefKmerIndex, Placements, place_reads


@dataclass
class SvOptions:
    """Knobs for the pair/split SV engine (assemble_options pair/pop subset,
    modules/variants/assemble.h:475 pop_trace_* fields)."""

    k: int = 16  # seed k-mer size for split placement
    min_run: int = 20  # min exact prefix/suffix anchor run (bases)
    min_sv_reads: int = 3  # split reads required per event
    min_event: int = 50  # smaller events belong to the wavefront engine
    max_frag: int = 1000  # max mate-pair fragment for pair support
    max_hits: int = 4  # reference hits considered per seed k-mer
    cluster_pad: int = 8  # breakpoint jitter merged into one event
    max_reads_batch: int = 1 << 14


@dataclass
class SvEvent:
    """A clustered breakpoint event."""

    left: int  # flat ref position after the last prefix-matched base
    right: int  # flat ref position of the first suffix-matched base
    ins: np.ndarray  # inserted bases between the anchors (uint8 codes)
    support: int  # split reads
    pair_support: int = 0  # straddling proper pairs

    @property
    def del_len(self) -> int:
        return self.right - self.left

    @property
    def ins_len(self) -> int:
        return len(self.ins)


def reads_from_readmap(rm, batch: int = 1 << 14, read_slice: tuple | None = None):
    """Reconstruct forward-oriented reads (+ mate links) from a readmap.

    Returns (codes [R, L], lengths [R], mate_of [R] | None) where mate_of[i]
    is the index of read i's mate in the same arrays (self if unpaired) —
    the data the reference pop tracer pulls through readmap mate loops
    (modules/bio_base/readmap.h:216-236).

    `read_slice=(lo, hi)` densifies codes only for forward reads [lo, hi)
    (codes has hi-lo rows) while lengths/mate_of stay GLOBAL over all R
    forward reads — the shard contract for distributed SV discovery, where
    each process materializes only its slice but pair evidence needs global
    placements."""
    loop = np.asarray(rm.mate_pair_ptr)
    fwd_ids = np.nonzero(np.asarray(rm.is_forward))[0]
    lens = np.asarray(rm.read_lengths)[fwd_ids]
    L = int(lens.max(initial=1))
    lo0, hi0 = read_slice if read_slice is not None else (0, len(fwd_ids))
    sel = fwd_ids[lo0:hi0]
    entries = rm.entry_of_rm[sel]
    codes = np.zeros((len(sel), L), np.uint8)
    ss = rm.seqset
    for lo in range(0, len(sel), batch):
        hi = min(len(sel), lo + batch)
        codes[lo:hi] = np.asarray(ss.d.sequences(jnp.asarray(entries[lo:hi]), L))
    codes = np.where(
        np.arange(L)[None, :] < lens[lo0:hi0, None], codes, 0
    ).astype(np.uint8)
    mate2 = loop[loop]  # fwd -> rc -> mate-fwd
    pos_of_fwd = np.full(rm.num_entries, -1, np.int64)
    pos_of_fwd[fwd_ids] = np.arange(len(fwd_ids))
    mate_of = pos_of_fwd[mate2[fwd_ids]]
    mate_of = np.where(mate_of >= 0, mate_of, np.arange(len(fwd_ids)))
    if (mate_of == np.arange(len(fwd_ids))).all():
        mate_of = None
    return codes, lens, mate_of


def _match_run_fwd(reads: np.ndarray, lens: np.ndarray, ref: np.ndarray, starts: np.ndarray):
    """Per read: length of the exact match run read[0:p] == ref[start:start+p]."""
    R, L = reads.shape
    G = len(ref)
    idx = starts[:, None] + np.arange(L)[None, :]
    ok = (idx >= 0) & (idx < G)
    refw = ref[np.clip(idx, 0, G - 1)]
    eq = ok & (refw == reads) & (np.arange(L)[None, :] < lens[:, None])
    # first mismatch position = run length
    return np.where(eq.all(axis=1), lens, eq.argmin(axis=1)).astype(np.int64)


def _match_run_bwd(reads: np.ndarray, lens: np.ndarray, ref: np.ndarray, diag: np.ndarray):
    """Per read: smallest s with read[s:len] == ref[diag+s : diag+len]."""
    R, L = reads.shape
    G = len(ref)
    j = np.arange(L)[None, :]
    idx = diag[:, None] + j
    ok = (idx >= 0) & (idx < G)
    refw = ref[np.clip(idx, 0, G - 1)]
    eq = ok & (refw == reads) & (j < lens[:, None])
    # positions beyond the read length count as matched (don't break the run)
    eqp = eq | (j >= lens[:, None])
    # run of matches ending at len-1: s = 1 + last mismatch index, or 0
    mism = ~eqp
    any_m = mism.any(axis=1)
    last_m = (L - 1) - mism[:, ::-1].argmax(axis=1)
    return np.where(any_m, last_m + 1, 0).astype(np.int64)


def split_place(
    index: RefKmerIndex,
    reads: np.ndarray,
    lens: np.ndarray,
    opt: SvOptions,
):
    """Split placement of reads: per read the best (prefix diag, suffix diag).

    Returns dict of arrays over reads: d_pre, d_suf, p (prefix run), s
    (suffix run start), valid."""
    R, L = reads.shape
    k = index.k
    if R == 0 or L < k:
        z = np.zeros(0, np.int64)
        return dict(d_pre=z, d_suf=z, p=z, s=z, valid=np.zeros(0, bool))
    km, kvalid = dna.kmers_from_codes(
        jnp.asarray(reads), jnp.asarray(lens, jnp.int32), k
    )
    if index.kmers.dtype == jnp.uint32:
        km = km.astype(jnp.uint32)
    pos, hit = index.lookup(km, opt.max_hits)  # [R, nwin, H]
    pos = np.asarray(pos, np.int64)
    hit = np.asarray(hit) & np.asarray(kvalid)[:, :, None]
    nwin = pos.shape[1]
    offs = np.arange(nwin)[None, :, None]
    diag = np.where(hit, pos - offs, np.int64(-(1 << 62)))

    # vote the dominant diagonal among early-offset hits (prefix) and
    # late-offset hits (suffix): mode via sorting each read's candidates
    third = np.maximum(lens // 3, k)[:, None, None]
    pre_hit = hit & (offs < third)
    suf_hit = hit & (offs >= np.maximum(lens[:, None, None] - k + 1 - third, 0))

    def mode_diag(mask):
        d = np.where(mask, diag, np.int64(1 << 62))
        ds = np.sort(d.reshape(R, -1), axis=1)
        # longest run of equal values (excluding sentinel)
        runs = np.zeros(R, np.int64)
        best = np.full(R, np.int64(1 << 62))
        cur = np.ones(R, np.int64)
        for j in range(1, ds.shape[1]):
            same = (ds[:, j] == ds[:, j - 1]) & (ds[:, j] != (1 << 62))
            cur = np.where(same, cur + 1, 1)
            better = (cur > runs) & (ds[:, j] != (1 << 62))
            best = np.where(better, ds[:, j], best)
            runs = np.where(better, cur, runs)
        first_ok = (ds[:, 0] != (1 << 62)) & (runs == 0)
        best = np.where(first_ok, ds[:, 0], best)
        runs = np.maximum(runs, (ds[:, 0] != (1 << 62)).astype(np.int64))
        return best, runs

    d_pre, n_pre = mode_diag(pre_hit)
    d_suf, n_suf = mode_diag(suf_hit)
    have_pre = d_pre != (1 << 62)
    have_suf = d_suf != (1 << 62)
    d_pre = np.where(have_pre, d_pre, 0)
    d_suf = np.where(have_suf, d_suf, 0)
    p = _match_run_fwd(reads, lens, np.asarray(index.ref_codes), d_pre)
    s = _match_run_bwd(reads, lens, np.asarray(index.ref_codes), d_suf)
    valid = (
        have_pre
        & have_suf
        & (p >= opt.min_run)
        & (lens - s >= opt.min_run)
        & (d_pre != d_suf)
        & (d_pre >= 0)
        & (d_suf >= 0)
    )
    return dict(
        d_pre=d_pre, d_suf=d_suf, p=p, s=s, valid=valid,
        have_pre=have_pre & (d_pre >= 0), have_suf=have_suf & (d_suf >= 0),
    )


def _events_from_split(sp, reads, lens, opt: SvOptions) -> List[Tuple[int, int, bytes, int]]:
    """(left, right, ins_codes) per supporting read, micro-homology resolved
    to the leftmost breakpoint."""
    out = []
    idx = np.nonzero(sp["valid"])[0]
    for i in idx:
        d_pre, d_suf = int(sp["d_pre"][i]), int(sp["d_suf"][i])
        p, s = int(sp["p"][i]), int(sp["s"][i])
        # homology at the junction can pull the suffix run left past the
        # prefix run (s < p) or pull right below left; resolve by pinning the
        # junction at the end of the prefix run and shifting the suffix run
        # right by the overlap (the shifted bases match ref by construction)
        s = max(s, p)
        left = d_pre + p
        right = d_suf + s
        if right < left:
            delta = left - right
            s += delta
            right += delta
            if s > int(lens[i]):
                continue
        ins = reads[i, p:s].tobytes()
        if right - left == len(ins) == 0:
            continue
        if (right - left) < opt.min_event and len(ins) < opt.min_event:
            continue
        out.append((left, right, ins, int(i)))
    return out


def _kmer_edge_table(reads: np.ndarray, lens: np.ndarray, k: int):
    """Sorted (kmer<<2 | next_base) edge keys + counts over all reads — the
    chaining structure the reference builds by popping seqset entry fronts
    (pop_tracer.h:34-60 'join prefix-matching entries'), here as one
    vectorized unique over every read k-mer edge."""
    km, valid = dna.kmers_from_codes(reads, lens, k)
    R, W = km.shape
    if W <= 1:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    nb = reads[:, k:].astype(np.uint64)  # next base after each window
    has_next = valid[:, :-1] & (np.arange(W - 1)[None, :] + k < lens[:, None])
    keys = (km[:, :-1] << np.uint64(2)) | nb
    flat = keys[has_next]
    uk, counts = np.unique(flat, return_counts=True)
    return uk, counts.astype(np.int64)


def _assemble_breakend(
    seed_tails: List[np.ndarray],
    edge_keys: np.ndarray,
    edge_counts: np.ndarray,
    index: RefKmerIndex,
    left: int,
    opt: SvOptions,
    max_assembly: int = 20000,
    confirm: int = 16,
):
    """Extend the novel sequence hanging off a left breakend through the
    read k-mer graph until it re-anchors on the reference.

    Returns (ins_codes, right) or None.  The walk picks the heaviest
    outgoing edge each step (greedy unitig walk = the batched analog of
    chaining pops); an anchor candidate (current k-mer present in the
    reference) is accepted once `confirm` subsequent walked bases match the
    reference right flank."""
    k = index.k
    mask = np.uint64((1 << (2 * k)) - 1)
    # consensus of the first k novel bases across the cluster's tails
    L0 = max(len(t) for t in seed_tails)
    if L0 < k:
        return None
    mat = np.full((len(seed_tails), L0), -1, np.int8)
    for i, t in enumerate(seed_tails):
        mat[i, : len(t)] = t
    seed = []
    for j in range(k):
        col = mat[:, j]
        col = col[col >= 0]
        if len(col) == 0:
            return None
        seed.append(np.bincount(col, minlength=4).argmax())
    cur = np.uint64(0)
    for b in seed:
        cur = ((cur << np.uint64(2)) | np.uint64(b)) & mask
    assembled = list(seed)
    ref = np.asarray(index.ref_codes)
    G = len(ref)
    pending = None  # (t_idx, q) anchor awaiting confirmation

    def ref_hit(kmer):
        pos, hit = index.lookup(jnp.asarray([kmer], jnp.uint64 if index.kmers.dtype != jnp.uint32 else jnp.uint32), 2)
        pos = np.asarray(pos)[0]
        hit = np.asarray(hit)[0]
        for h in range(len(pos)):
            if hit[h]:
                return int(pos[h])
        return -1

    q0 = ref_hit(cur)
    if q0 >= 0:
        pending = (k - 1, q0)
    for step in range(max_assembly):
        # confirmation check for a pending anchor
        if pending is not None:
            t0, q = pending
            walked = len(assembled) - 1 - t0
            if walked >= confirm:
                seg = np.array(assembled[t0 + 1 : t0 + 1 + confirm], np.uint8)
                rseg = ref[q + k : q + k + confirm]
                if len(rseg) == confirm and (seg == rseg).all():
                    ins = np.array(assembled[: t0 - k + 1], np.uint8)
                    return ins, q
                pending = None
        cand = (cur << np.uint64(2)) & (mask << np.uint64(2))
        keys = cand | np.arange(4).astype(np.uint64)
        li = np.searchsorted(edge_keys, keys)
        lic = np.clip(li, 0, max(len(edge_keys) - 1, 0))
        ok = (li < len(edge_keys)) & (len(edge_keys) > 0)
        ok = ok & (edge_keys[lic] == keys)
        counts = np.where(ok, edge_counts[lic], 0)
        if counts.max(initial=0) < 2:
            break
        nb = int(counts.argmax())
        cur = ((cur << np.uint64(2)) | np.uint64(nb)) & mask
        assembled.append(nb)
        if pending is None:
            q = ref_hit(cur)
            # plausible right side only: at/after the breakend neighborhood
            if q >= 0 and q >= left - opt.cluster_pad and len(assembled) - k >= 0:
                pending = (len(assembled) - 1, q)
    # end-of-walk: a pending anchor with full remaining match also counts
    if pending is not None:
        t0, q = pending
        seg = np.array(assembled[t0 + 1 :], np.uint8)
        rseg = ref[q + k : q + k + len(seg)]
        if len(seg) >= 4 and len(rseg) == len(seg) and (seg == rseg).all():
            return np.array(assembled[: t0 - k + 1], np.uint8), q
    return None


def _left_normalize_event(ref: np.ndarray, left: int, right: int, ins: np.ndarray):
    """Shift a (del span [left,right) + inserted seq) leftwards while the base
    entering on the right equals the base leaving on the left (VCF left
    alignment over the event as a whole)."""
    ins = list(ins)
    while left > 0:
        prev = ref[left - 1]
        tail = ins[-1] if ins else (ref[right - 1] if right > left else None)
        if tail is None or tail != prev:
            break
        if ins:
            ins = [prev] + ins[:-1]
        left -= 1
        right -= 1
    return left, right, np.array(ins, np.uint8)


def _sv_scan_reads(
    index: RefKmerIndex,
    codes: np.ndarray,
    lengths: np.ndarray,
    opt: SvOptions,
    placements: Placements | None = None,
    owner_base: int = 0,
):
    """Per-read SV scan — the shardable O(reads) phase.

    Places reads (unless given), split-places the unplaced candidates in both
    orientations, and returns
      (placements, raw_events, clip_cands, edge_keys, edge_counts)
    where events/clips carry GLOBAL read ids (local index + owner_base) and
    the k-mer edge table covers this slice's unplaced reads (merge tables
    across slices with merge_edge_tables).  Disjoint read slices scanned
    separately and merged finalize to exactly the single-pass result —
    the distributed-SV contract (tests/test_pop_tracer.py)."""
    if placements is None:
        placements = place_reads(index, codes, lengths, max_mismatches=3)
    unplaced = np.nonzero(placements.pos < 0)[0]
    raw_events: List[Tuple[int, int, bytes, int]] = []
    clip_cands: List[Tuple[int, np.ndarray, int]] = []  # (left, tail, owner)
    if len(unplaced) == 0:
        return (
            placements, raw_events, clip_cands,
            np.zeros(0, np.uint64), np.zeros(0, np.int64),
        )

    # try both orientations of each unplaced read
    sub = codes[unplaced]
    sublen = lengths[unplaced]
    rc = np.asarray(dna.revcomp_codes(sub, sublen))
    reads2 = np.concatenate([sub, rc])
    lens2 = np.concatenate([sublen, sublen])
    owner = np.concatenate([unplaced, unplaced]) + owner_base

    for lo in range(0, len(reads2), opt.max_reads_batch):
        hi = min(len(reads2), lo + opt.max_reads_batch)
        sp = split_place(index, reads2[lo:hi], lens2[lo:hi], opt)
        for left, right, ins, i in _events_from_split(
            sp, reads2[lo:hi], lens2[lo:hi], opt
        ):
            raw_events.append((left, right, ins, int(owner[lo + i])))
        # one-sided left-clips: prefix anchors, tail is novel — the raw
        # material for breakend assembly of insertions longer than a read
        oneside = (
            sp["have_pre"]
            & ~sp["valid"]
            & (sp["p"] >= opt.min_run)
            & (lens2[lo:hi] - sp["p"] >= index.k + 4)
        )
        for i in np.nonzero(oneside)[0]:
            p = int(sp["p"][i])
            clip_cands.append(
                (
                    int(sp["d_pre"][i]) + p,
                    reads2[lo + i, p : lens2[lo + i]].copy(),
                    int(owner[lo + i]),
                )
            )
    edge_keys, edge_counts = _kmer_edge_table(reads2, lens2, index.k)
    return placements, raw_events, clip_cands, edge_keys, edge_counts


def merge_edge_tables(parts):
    """Merge per-slice sorted (edge_keys, edge_counts) tables by summing
    counts of equal keys."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    keys = np.concatenate([k for k, _ in parts])
    counts = np.concatenate([c for _, c in parts])
    uk, inv = np.unique(keys, return_inverse=True)
    out = np.zeros(len(uk), np.int64)
    np.add.at(out, inv, counts)
    return uk, out


def _sv_finalize(
    reference,
    index: RefKmerIndex,
    raw_events,
    clip_cands,
    edge_keys,
    edge_counts,
    pos_all: np.ndarray,
    rc_all: np.ndarray,
    lengths: np.ndarray,
    mate_of: np.ndarray | None,
    opt: SvOptions,
) -> List[Dict]:
    """Deterministic event clustering / breakend assembly / pair evidence /
    record emission over the (merged) scan results.  pos_all/rc_all/lengths
    are GLOBAL per-read arrays."""
    ref = np.asarray(index.ref_codes)
    # cluster: exact key after left-normalization, then merge within pad
    norm: Dict[Tuple[int, int, bytes], set] = {}
    for left, right, ins, rid in raw_events:
        ln, rn, insn = _left_normalize_event(
            ref, left, right, np.frombuffer(ins, np.uint8)
        )
        key = (int(ln), int(rn), insn.tobytes())
        norm.setdefault(key, set()).add(rid)

    # breakend assembly: cluster left-clips, walk the read k-mer graph
    if clip_cands:
        # (left, owner) key: fully deterministic grouping regardless of the
        # order slices contributed candidates (single-pass vs distributed)
        clip_cands = sorted(clip_cands, key=lambda t: (t[0], t[2]))
        gi = 0
        while gi < len(clip_cands):
            gj = gi + 1
            while (
                gj < len(clip_cands)
                and clip_cands[gj][0] - clip_cands[gi][0] <= opt.cluster_pad
            ):
                gj += 1
            group = clip_cands[gi:gj]
            owners = {o for _, _, o in group}
            if len(owners) >= opt.min_sv_reads:
                lefts = np.array([l for l, _, _ in group])
                left_c = int(np.bincount(lefts - lefts.min()).argmax() + lefts.min())
                res = _assemble_breakend(
                    [t for l, t, _ in group if l == left_c] or [t for _, t, _ in group],
                    edge_keys,
                    edge_counts,
                    index,
                    left_c,
                    opt,
                )
                if res is not None:
                    ins_codes, right_c = res
                    if (
                        len(ins_codes) >= opt.min_event
                        or right_c - left_c >= opt.min_event
                    ) and right_c >= left_c:
                        ln, rn, insn = _left_normalize_event(
                            ref, left_c, right_c, ins_codes
                        )
                        key = (int(ln), int(rn), insn.tobytes())
                        norm.setdefault(key, set()).update(owners)
            gi = gj
    # merge keys whose breakpoints differ by <= cluster_pad and same ins len
    keys = sorted(norm.keys())
    merged: List[SvEvent] = []
    used = [False] * len(keys)
    for a in range(len(keys)):
        if used[a]:
            continue
        la, ra, ia = keys[a]
        readset = set(norm[keys[a]])
        for b in range(a + 1, len(keys)):
            if used[b]:
                continue
            lb, rb, ib = keys[b]
            if lb - la > opt.cluster_pad:
                break
            if abs((rb - lb) - (ra - la)) <= 0 and len(ib) == len(ia) and abs(lb - la) <= opt.cluster_pad:
                readset |= norm[keys[b]]
                used[b] = True
        used[a] = True
        merged.append(
            SvEvent(
                left=la,
                right=ra,
                ins=np.frombuffer(ia, np.uint8),
                support=len(readset),
            )
        )
    merged = [e for e in merged if e.support >= opt.min_sv_reads]

    # pair evidence: placed mates straddling the junction in proper
    # orientation with implied fragment <= max_frag after removing the event
    if mate_of is not None and len(merged):
        pos = pos_all
        rcb = rc_all
        mate = np.asarray(mate_of)
        both = (pos >= 0) & (pos[mate] >= 0) & (mate != np.arange(len(pos)))
        proper = both & (rcb != rcb[mate])
        lo_p = np.minimum(pos, pos[mate])
        hi_p = np.maximum(pos + lengths, pos[mate] + lengths[mate])
        sel = np.nonzero(proper)[0]
        lo_p, hi_p = lo_p[sel], hi_p[sel]
        for e in merged:
            straddle = (lo_p + 1 <= e.left) & (hi_p - 1 >= e.right)
            implied = (hi_p - lo_p) - e.del_len + e.ins_len
            okfrag = straddle & (implied <= opt.max_frag) & (implied > 0)
            e.pair_support = int(okfrag.sum()) // 2
    elif len(merged):
        # unpaired library: spanning placed reads stand in for pairs
        pos = pos_all
        sel = np.nonzero(pos >= 0)[0]
        for e in merged:
            span = (pos[sel] + 1 <= e.left) & (pos[sel] + lengths[sel] - 1 >= e.right)
            e.pair_support = 0 if e.del_len > int(lengths.max(initial=0)) else int(span.sum())

    # emit discovery-compatible records
    out = []
    for e in merged:
        left, right, ins = e.left, e.right, e.ins
        contig = None
        for c in reference.contigs:
            if c.start <= left < c.start + c.length:
                contig = c
                break
        if contig is None or right > contig.start + contig.length:
            continue
        anchor = ref[left - 1] if left > 0 else ref[left]
        pos0 = left - 1 if left > 0 else left
        ref_str = dna.codes_to_seq(
            np.concatenate([[anchor], ref[left:right]]).astype(np.uint8)
        )
        alt_str = dna.codes_to_seq(
            np.concatenate([[anchor], ins]).astype(np.uint8)
        )
        out.append(
            {
                "chrom": contig.name,
                "pos": int(pos0 - contig.start + 1),
                "ref": ref_str,
                "alt": alt_str,
                "support": int(e.support),
                "ref_support": 0,
                "pair_support": int(e.pair_support),
                "svlen": int(e.ins_len - e.del_len),
            }
        )
    out.sort(key=lambda r: (r["chrom"], r["pos"]))
    return out


def discover_structural(
    reference,
    codes: np.ndarray,
    lengths: np.ndarray,
    mate_of: np.ndarray | None = None,
    opt: SvOptions | None = None,
    placements: Placements | None = None,
    index: RefKmerIndex | None = None,
) -> List[Dict]:
    """Find >min_event structural variants from split reads + pair support.

    Returns discovery-record dicts (chrom/pos/ref/alt/support/pair_support)
    merge-compatible with the wavefront engine's output.  Composes the
    shardable scan (_sv_scan_reads) with the deterministic finalize
    (_sv_finalize) — the distributed pipeline runs the same two phases with
    the scan sliced per process (parallel/discovery.py)."""
    opt = opt or SvOptions()
    ref = np.asarray(reference.flat)
    if index is None:
        index = RefKmerIndex.build(
            ref, opt.k, is_n=getattr(reference, "is_n", None)
        )
    placements, raw_events, clip_cands, edge_keys, edge_counts = _sv_scan_reads(
        index, codes, lengths, opt, placements=placements
    )
    if not raw_events and not clip_cands:
        return []
    return _sv_finalize(
        reference, index, raw_events, clip_cands, edge_keys, edge_counts,
        placements.pos, placements.is_rc, lengths, mate_of, opt,
    )
