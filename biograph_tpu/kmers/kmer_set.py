"""Trusted k-mer set with batched membership lookup.

Counterpart of the reference kmer_set (modules/bio_mapred/kmer_set.h:14):
a sorted table of canonical k-mers supporting flip-aware lookups.  On TPU,
membership tests are batched binary searches (jnp.searchsorted) over the
sorted uint64 table — thousands of probes per dispatch.

The overrepresentation / error-threshold filtering mirrors kmerize_bf's
count-based filtering (modules/bio_mapred/kmerize_bf.cpp:505): k-mers below
``min_count`` are untrusted (sequencing errors).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from biograph_tpu.core import dna
from biograph_tpu.kmers.count import KmerCounts


@dataclass(frozen=True)
class KmerSet:
    k: int
    kmers: jnp.ndarray  # uint64 [n] sorted canonical k-mers

    @staticmethod
    def from_counts(counts: KmerCounts, min_count: int = 2, max_count: int | None = None) -> "KmerSet":
        tot = counts.total
        keep = tot >= min_count
        if max_count is not None:
            keep &= tot <= max_count
        return KmerSet(k=counts.k, kmers=jnp.asarray(counts.kmers[keep]))

    @property
    def size(self) -> int:
        return int(self.kmers.shape[0])

    def contains(self, query_kmers) -> jnp.ndarray:
        """Batched membership of *raw* k-mers (canonicalized internally)."""
        q = jnp.asarray(query_kmers, jnp.uint64)
        canon, _ = dna.canonicalize_kmers(q, self.k)
        return self.contains_canonical(canon)

    def contains_canonical(self, canon) -> jnp.ndarray:
        canon = jnp.asarray(canon, jnp.uint64)
        n = self.kmers.shape[0]
        if n == 0:
            return jnp.zeros(canon.shape, bool)
        lo = jnp.searchsorted(self.kmers, canon)
        loc = jnp.clip(lo, 0, n - 1)
        return (lo < n) & (jnp.take(self.kmers, loc) == canon)

    def save_arrays(self):
        return {"kmers": np.asarray(self.kmers), "k": self.k}
