"""Entry-sharded seqset: the model-parallel axis of the rebuild.

At human scale the seqset's rank structures (4 bitvectors + select tables
over billions of entries) exceed one chip's HBM.  This module shards them by
entry range across a mesh axis and serves *global* rank queries with one
psum: every shard computes its local contribution (full local rank for
positions past its range, partial for positions inside, zero before) and the
collective sums them — the reference's single-node mmap'd bitcount
(modules/io/bitcount.h:13) becomes a distributed structure with ICI-resident
queries.  This is the "sharded seqset index" called for in SURVEY.md §2.7/§7.

Layout per shard s over axis 'model' (S shards, entry space padded to S
equal ranges of R words each):
  words_s : uint32 [4, R]      — shard's slice of prev[b] bit words
  cum_s   : int64  [4, R]      — exclusive prefix popcounts *within shard*
  base_s  : int64  [4]         — total ones in shards before s
  lo_s    : int64              — first bit position owned by the shard
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@dataclass
class ShardedRankArrays:
    """Host-side container of the sharded rank structure (stacked [S, ...])."""

    words: np.ndarray  # uint32 [S, 4, R]
    cum: np.ndarray  # int64 [S, 4, R] — exclusive prefix popcounts per shard
    lo: np.ndarray  # int64 [S] — first bit position owned by each shard
    fixed: np.ndarray  # int64 [5] (replicated)
    n_entries: int

    @staticmethod
    def build(seqset, n_shards: int) -> "ShardedRankArrays":
        words = np.asarray(seqset.prev_words)  # [4, nw]
        nw = words.shape[1]
        R = -(-nw // n_shards)
        wpad = np.zeros((4, R * n_shards), np.uint32)
        wpad[:, :nw] = words
        from biograph_tpu.core.bitvector import popcount_np

        pc = popcount_np(wpad)  # [4, R*S]
        shard_words = wpad.reshape(4, n_shards, R).transpose(1, 0, 2)
        pcs = pc.reshape(4, n_shards, R).transpose(1, 0, 2)
        cum = np.zeros((n_shards, 4, R), np.int64)
        cum[:, :, 1:] = np.cumsum(pcs[:, :, :-1], axis=2)
        lo = (np.arange(n_shards, dtype=np.int64) * R) * 32
        return ShardedRankArrays(
            words=shard_words.astype(np.uint32),
            cum=cum,
            lo=lo,
            fixed=np.asarray(seqset.fixed, np.int64),
            n_entries=seqset.n_entries,
        )


def make_sharded_rank(mesh: Mesh, axis: str = "model"):
    """Build the collective rank function: (shard arrays..., b, pos) -> rank.

    Query arrays are replicated; each shard contributes via psum.
    """

    def rank_local(words, cum, lo, b, pos):
        # local shapes under shard_map: words [1, 4, R], cum [1, 4, R], lo [1]
        words = words[0]
        cum = cum[0]
        R = words.shape[1]
        rel = pos - lo[0]  # bit offset into this shard
        w = (rel >> 5).astype(jnp.int64)
        inside = (w >= 0) & (w < R)
        after = w >= R
        wc = jnp.clip(w, 0, R - 1)
        bidx = b.astype(jnp.int64)
        flat = bidx * R + wc
        word = jnp.take(words.reshape(-1), flat)
        rem = (rel & 31).astype(jnp.uint32)
        mask = jnp.where(
            rem > 0, (jnp.uint32(1) << rem) - jnp.uint32(1), jnp.uint32(0)
        )
        part = lax.population_count(word & mask).astype(jnp.int64)
        local_cum = jnp.take(cum.reshape(-1), flat)
        shard_total = jnp.take(cum[:, -1], bidx) + jnp.take(
            lax.population_count(words[:, -1]).astype(jnp.int64), bidx
        )
        contrib = jnp.where(
            inside,
            local_cum + part,
            jnp.where(after, shard_total, 0),
        )
        # shards before pos contribute their total, the owner its local
        # rank, later shards zero: the psum is the global rank.
        return lax.psum(contrib, axis)

    fn = shard_map(
        rank_local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_entry_push_front(rank_fn, arrays: ShardedRankArrays, entries, b):
    """Global entry_push_front via the collective rank."""
    fixed = jnp.asarray(arrays.fixed)
    r = rank_fn(
        jnp.asarray(arrays.words),
        jnp.asarray(arrays.cum),
        jnp.asarray(arrays.lo),
        jnp.asarray(b),
        jnp.asarray(entries),
    )
    return jnp.take(fixed, jnp.asarray(b).astype(jnp.int64)) + r
