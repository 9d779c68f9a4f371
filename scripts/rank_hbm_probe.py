"""On-chip A/B isolation of the HBM rank kernel's per-block cost.

Legs: (A) VMEM kernel control at the same tile width; (B) HBM kernel on a
1-tile table (scalar-prefetch machinery, no tile switching); (C) HBM kernel
on a many-tile table with random queries (tile switching + DMA); (D) like B
but plain grid without PrefetchScalarGridSpec.  Appends JSONL to
/tmp/rank_hbm_probe.jsonl.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = "/tmp/rank_hbm_probe.jsonl"


def log(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def structure(rng, nw):
    import numpy as np

    words = rng.integers(0, 1 << 32, (4, nw), dtype=np.uint64).astype(np.uint32)
    pc = np.unpackbits(
        words.view(np.uint8).reshape(4, nw, 4), axis=-1, bitorder="little"
    ).reshape(4, nw, 32).sum(-1)
    cum = np.cumsum(pc, axis=1) - pc
    return words, cum.astype(np.int64)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import biograph_tpu  # noqa: F401  (x64 on, cache on — production config)
    from biograph_tpu.ops.rank4 import (
        Q_BLOCK,
        build_rank4_hbm_table,
        build_rank4_table,
        rank4_hbm_pallas,
        rank4_pallas,
        rank4_xla,
    )

    rng = np.random.default_rng(0)
    B = 1 << 18

    def timeit(f, reps=20):
        f().block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            r = f()
        r.block_until_ready()
        return B * 4 * reps / (time.time() - t0)

    # A: VMEM control, nwp=2048
    words, cum = structure(rng, 2000)
    table = build_rank4_table(words, cum)
    pos = jnp.asarray(rng.integers(0, 2000 * 32, B))
    log({"leg": "A_vmem_2048", "qps": round(timeit(lambda: rank4_pallas(table, pos)))})

    # B: HBM 1-tile (nw < tile_w)
    tiles1, base1 = build_rank4_hbm_table(words, cum)
    log(
        {
            "leg": "B_hbm_1tile",
            "n_tiles": int(tiles1.shape[0]),
            "qps": round(timeit(lambda: rank4_hbm_pallas(tiles1, base1, pos))),
        }
    )

    # C: HBM many-tile, random queries
    nw = 250_000  # 8M entries, 123 tiles
    words2, cum2 = structure(rng, nw)
    tiles2, base2 = build_rank4_hbm_table(words2, cum2)
    pos2 = jnp.asarray(rng.integers(0, nw * 32, B))
    pw2, pc2 = jnp.asarray(words2), jnp.asarray(cum2)
    xla_j = jax.jit(lambda p: rank4_xla(pw2, pc2, p))
    log({"leg": "C_xla_8M", "qps": round(timeit(lambda: xla_j(pos2)))})
    log(
        {
            "leg": "C_hbm_8M",
            "n_tiles": int(tiles2.shape[0]),
            "qps": round(timeit(lambda: rank4_hbm_pallas(tiles2, base2, pos2))),
        }
    )

    # C2: clustered queries (the pipeline's actual shape: sorted wavefront)
    pos3 = jnp.asarray(
        np.sort(
            np.clip(rng.normal(4_000_000, 20_000, B), 0, nw * 32).astype(
                np.int64
            )
        )
    )
    log(
        {
            "leg": "C_hbm_8M_clustered",
            "qps": round(timeit(lambda: rank4_hbm_pallas(tiles2, base2, pos3))),
        }
    )
    log({"leg": "C_xla_8M_clustered", "qps": round(timeit(lambda: xla_j(pos3)))})


if __name__ == "__main__":
    main()
