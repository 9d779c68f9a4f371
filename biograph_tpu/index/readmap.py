"""Readmap: seqset entries <-> reads, lengths, pairing, coverage queries.

Counterpart of the reference readmap (modules/bio_base/readmap.h:75):
  * sparse_multi mapping seqset entry -> readmap entries (CSR offsets)
  * per readmap-entry: read length, is_forward bit, mate-loop links
    (fwd -> RC -> mate -> mate-RC cycle, readmap.h:216-236)

A "readmap entry" exists for each stored orientation of each read (a read and
its reverse complement are separate readmap entries pointing at different
seqset entries, linked by the mate loop).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from biograph_tpu.core import container


@dataclass
class Readmap:
    seqset: object
    # CSR over seqset entries -> readmap entry ids
    offsets: np.ndarray  # int64 [n_seqset_entries + 1]
    read_lengths: np.ndarray  # int32 [n_rm]
    is_forward: np.ndarray  # bool [n_rm]
    mate_pair_ptr: np.ndarray  # int64 [n_rm] — next link in the mate loop
    read_ids: np.ndarray  # int64 [n_rm] — original read index
    uuid: str = ""

    @property
    def num_entries(self) -> int:
        return len(self.read_lengths)

    @cached_property
    def entry_of_rm(self) -> np.ndarray:
        """seqset entry id owning each readmap entry (reverse CSR)."""
        n = len(self.offsets) - 1
        out = np.zeros(self.num_entries, np.int64)
        counts = np.diff(self.offsets)
        out = np.repeat(np.arange(n, dtype=np.int64), counts)
        return out

    # --- queries (batched; jnp in, jnp out) ---

    def entry_read_range(self, entries):
        """[start, end) into readmap-entry ids for each seqset entry."""
        off = jnp.asarray(self.offsets)
        e = jnp.asarray(entries)
        return jnp.take(off, e), jnp.take(off, e + 1)

    def entry_read_count(self, entries):
        s, e = self.entry_read_range(entries)
        return e - s

    def save(self, path: str):
        with container.ArtifactWriter(path, "readmap") as w:
            w.add_array("offsets", self.offsets)
            w.add_array("read_lengths", np.asarray(self.read_lengths, np.int32))
            w.add_array("is_forward", np.asarray(self.is_forward, bool))
            w.add_array("mate_pair_ptr", np.asarray(self.mate_pair_ptr, np.int64))
            w.add_array("read_ids", np.asarray(self.read_ids, np.int64))
            self.uuid = w.meta["uuid"]

    @staticmethod
    def load(path: str, seqset) -> "Readmap":
        r = container.ArtifactReader(path, "readmap")
        return Readmap(
            seqset=seqset,
            offsets=r.array("offsets"),
            read_lengths=r.array("read_lengths"),
            is_forward=r.array("is_forward"),
            mate_pair_ptr=r.array("mate_pair_ptr"),
            read_ids=r.array("read_ids"),
            uuid=r.uuid,
        )
