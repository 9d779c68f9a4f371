"""Isolate the scaled-leg score stage: window_hash build time, coverage
call time, row-building host time.  Run on TPU (default platform)."""

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
        score_assemblies,
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

    t0 = time.time()
    ss = build_seqset(codes, lengths)
    rm = build_readmap(ss, codes, lengths)
    print("build_s", round(time.time() - t0, 1), "entries", ss.n_entries,
          flush=True)

    t0 = time.time()
    wh = rm.window_hash
    print("window_hash_build_s", round(time.time() - t0, 1),
          "keys", None if wh is None else int(wh[0].shape[0]), flush=True)

    # coverage call at score-stage shapes
    Bq, Lq = 4096, 320
    q = rng.integers(0, 4, (Bq, Lq)).astype(np.uint8)
    # half the rows contain real read content so hashes hit
    for i in range(0, Bq, 2):
        r = rng.integers(0, R)
        off = rng.integers(0, Lq - L)
        q[i, off : off + L] = codes[r]
    ql = np.full(Bq, Lq, np.int32)
    for rep in range(3):
        t0 = time.time()
        f, r_ = rm.coverage(jnp.asarray(q), jnp.asarray(ql))
        jax.block_until_ready((f, r_))
        print(f"coverage_rep{rep}_s", round(time.time() - t0, 2), flush=True)


if __name__ == "__main__":
    main()
