"""User-facing SDK objects.

Counterpart of the reference Python SDK (python/biograph/__init__.py:33-47:
BioGraph, Seqset, Readmap, Reference, Sequence).  A ``.bgt`` directory holds
the artifact set for one sample: seqset/, readmap/, metadata.json — the
analog of the reference's ``.bg`` biograph_dir layout.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from biograph_tpu.core import dna


class Sequence:
    """An immutable DNA sequence (reference: python/biograph Sequence)."""

    def __init__(self, seq):
        if isinstance(seq, str):
            self._codes = dna.seq_to_codes(seq)
        else:
            self._codes = np.asarray(seq, np.uint8)

    @property
    def codes(self) -> np.ndarray:
        return self._codes

    def __len__(self):
        return len(self._codes)

    def __str__(self):
        return dna.codes_to_seq(self._codes)

    def __repr__(self):
        return f"Sequence({str(self)!r})"

    def __eq__(self, other):
        if isinstance(other, str):
            return str(self) == other
        return isinstance(other, Sequence) and np.array_equal(
            self._codes, other._codes
        )

    def rev_comp(self) -> "Sequence":
        return Sequence(np.asarray(dna.revcomp_codes(self._codes)))

    def __getitem__(self, sl):
        return Sequence(self._codes[sl])


class BioGraph:
    """Open a .bgt sample directory: seqset + readmap + metadata."""

    def __init__(self, path: str):
        from biograph_tpu.index.seqset import Seqset
        from biograph_tpu.index.readmap import Readmap

        self.path = path
        meta_path = os.path.join(path, "metadata.json")
        self.metadata = {}
        if os.path.isfile(meta_path):
            with open(meta_path) as f:
                self.metadata = json.load(f)
        self.seqset = Seqset.load(os.path.join(path, "seqset"))
        rm_path = os.path.join(path, "readmap")
        self.readmap: Optional[Readmap] = None
        if os.path.isdir(rm_path):
            self.readmap = Readmap.load(rm_path, self.seqset)

    def find(self, seq) -> tuple:
        if isinstance(seq, Sequence):
            seq = str(seq)
        return self.seqset.find_str(seq)
