"""Memory budgeting for device-resident stages (resource_manager analog).

The reference sizes every construction stage to a memory budget
(modules/mapred/resource_manager.h:7 scratch quotas;
modules/build_seqset/kmer_counter.h:29 multi-pass sizing;
modules/biograph/biograph_create.cpp:475 32 GiB warning).  The TPU build's
equivalent constraint is HBM: stages that materialize data proportional to
input size (the suffix sort above all) consult this budget and switch to
prefix-partitioned multi-pass execution when they would not fit.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class MemoryBudget:
    """Device-memory budget in bytes for a single resident working set."""

    bytes: int

    @staticmethod
    def detect(fraction: float = 0.5) -> "MemoryBudget":
        """Budget from the active device's memory (HBM on TPU), overridable
        with BGT_HBM_BUDGET_BYTES.  `fraction` leaves headroom for XLA
        temporaries and double-buffering."""
        env = os.environ.get("BGT_HBM_BUDGET_BYTES")
        if env:
            return MemoryBudget(bytes=int(env))
        total = None
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            if stats:
                total = stats.get("bytes_limit")
        except Exception:
            total = None
        if not total:
            total = 8 << 30  # conservative default (v5e lite = 16 GiB HBM)
        return MemoryBudget(bytes=int(total * fraction))

    def fits(self, nbytes: int) -> bool:
        return nbytes <= self.bytes

    def passes_needed(self, nbytes: int) -> int:
        return max(1, -(-nbytes // self.bytes))
