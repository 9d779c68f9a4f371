"""Decompose the scaled-leg frontend on-chip: n_hits/Pc lane counts and
per-substage timings of probe_filter / probe_exact / anchor_scan, plus the
transfer sizes the anchors stage fetches.  One client; run alone."""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from biograph_tpu.build.seqset_build import build_seqset
    from biograph_tpu.build.readmap_build import build_readmap
    from biograph_tpu.index.reference import Contig
    from biograph_tpu.variants.discover import (
        DiscoverOptions,
        discover_variants,
    )

    rng = np.random.default_rng(12345)
    G, L, R = 2_000_000, 100, 120_000
    genome = rng.integers(0, 4, G, dtype=np.uint8)
    donor = genome.copy()
    snp = rng.choice(np.arange(200, G - 200), 4000, replace=False)
    donor[snp] = (donor[snp] + 1 + rng.integers(0, 3, 4000)) % 4
    starts = rng.integers(0, G - L, R)
    codes = donor[starts[:, None] + np.arange(L)]
    half = R // 2
    codes[:half] = (3 - codes[:half])[:, ::-1]
    lengths = np.full(R, L, np.int32)

    class Ref:
        flat = genome
        is_n = np.zeros(G, bool)
        contigs = [Contig(name="chr", start=0, length=G)]

    t0 = time.time()
    ss = build_seqset(codes, lengths)
    rm = build_readmap(ss, codes, lengths)
    print("build_s", round(time.time() - t0, 1), "entries", ss.n_entries,
          flush=True)
    print("rank4_table", ss.d.rank4_table is not None,
          "rank4_hbm", ss.d.rank4_hbm is not None, flush=True)

    opt = DiscoverOptions(min_alt_support=5)
    for rep in range(2):
        stats = {}
        t0 = time.time()
        recs = discover_variants(ss, Ref(), opt=opt, readmap=rm, stats=stats)
        print(
            json.dumps(
                {
                    "rep": rep,
                    "call_s": round(time.time() - t0, 2),
                    "records": len(recs),
                    "prescreen_probed": stats.get("prescreen_probed"),
                    "anchors_found": stats.get("anchors_found"),
                    "stage_s": {
                        k: round(v, 2)
                        for k, v in stats.get("stage_s", {}).items()
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
