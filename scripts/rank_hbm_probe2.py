"""Decompose the HBM rank kernel's 39ms/call at 123 tiles: prologue vs
pallas_call vs epilogue, rep-scaling linearity, and tile-switch isolation
(bt forced to 0 — wrong results, timing only).  JSONL to
/tmp/rank_hbm_probe2.jsonl."""

import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = "/tmp/rank_hbm_probe2.jsonl"


def log(rec):
    rec["ts"] = time.strftime("%H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    import biograph_tpu  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from biograph_tpu.ops.rank4 import (
        Q_BLOCK,
        _rank4_hbm_kernel,
        build_rank4_hbm_table,
        rank4_hbm_pallas,
    )

    rng = np.random.default_rng(0)
    B = 1 << 18
    nw = 250_000
    words = rng.integers(0, 1 << 32, (4, nw), dtype=np.uint64).astype(np.uint32)
    pc = np.unpackbits(
        words.view(np.uint8).reshape(4, nw, 4), axis=-1, bitorder="little"
    ).reshape(4, nw, 32).sum(-1)
    cum = (np.cumsum(pc, axis=1) - pc).astype(np.int64)
    tiles, base = build_rank4_hbm_table(words, cum)
    n_tiles, _, tile_w = tiles.shape
    pos = jnp.asarray(rng.integers(0, nw * 32, B))

    def timeit(f, reps=20):
        f().block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            r = f()
        r.block_until_ready()
        dt = (time.time() - t0) / reps
        return dt

    # rep-scaling linearity of the full call
    for reps in (4, 16, 64):
        dt = timeit(lambda: rank4_hbm_pallas(tiles, base, pos), reps)
        log({"leg": f"full_reps{reps}", "ms_per_call": round(dt * 1000, 3)})

    # prologue only
    Q = Q_BLOCK

    @jax.jit
    def prologue(pos):
        w = pos.astype(jnp.int64) >> 5
        rem = (pos.astype(jnp.int64) & 31).astype(jnp.int32)
        w = jnp.minimum(w, n_tiles * tile_w - 1)
        tile = (w // tile_w).astype(jnp.int32)
        local_w = (w % tile_w).astype(jnp.int32)
        perm = jnp.argsort(tile)
        tile_s = tile[perm]
        counts = jnp.bincount(tile_s, length=n_tiles)
        padded = -(-counts // Q) * Q
        bucket_off = jnp.cumsum(padded) - padded
        csum = jnp.cumsum(counts) - counts
        within = jnp.arange(B, dtype=counts.dtype) - csum[tile_s]
        dest = (bucket_off[tile_s] + within).astype(jnp.int32)
        PB = -(-B // Q) * Q + n_tiles * Q
        lw_p = jnp.zeros((1, PB), jnp.int32).at[0, dest].set(local_w[perm])
        rem_p = jnp.zeros((1, PB), jnp.int32).at[0, dest].set(rem[perm])
        n_blocks = PB // Q
        total = jnp.sum(padded)
        bstart = jnp.arange(n_blocks, dtype=total.dtype) * Q
        bt = jnp.searchsorted(jnp.cumsum(padded), bstart, side="right").astype(
            jnp.int32
        )
        n_used = jnp.maximum(total // Q, 1)
        last_bt = bt[jnp.minimum(n_used - 1, n_blocks - 1)]
        bt = jnp.where(bstart < total, jnp.minimum(bt, n_tiles - 1), last_bt)
        return lw_p, rem_p, bt, dest, perm, tile

    lw_p, rem_p, bt, dest, perm, tile = jax.block_until_ready(prologue(pos))
    dt = timeit(lambda: prologue(pos)[0])
    log({"leg": "prologue", "ms_per_call": round(dt * 1000, 3)})

    PB = lw_p.shape[1]
    n_blocks = PB // Q

    def kernel_call(bt_arr):
        return pl.pallas_call(
            _rank4_hbm_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((1, Q), lambda i, b: (jnp.int32(0), i)),
                    pl.BlockSpec((1, Q), lambda i, b: (jnp.int32(0), i)),
                    pl.BlockSpec(
                        (None, 32, tile_w),
                        lambda i, b: (b[i], jnp.int32(0), jnp.int32(0)),
                    ),
                ],
                out_specs=pl.BlockSpec((4, Q), lambda i, b: (jnp.int32(0), i)),
            ),
            out_shape=jax.ShapeDtypeStruct((4, PB), jnp.int32),
        )(bt_arr, lw_p, rem_p, tiles)

    kc = jax.jit(kernel_call)
    dt = timeit(lambda: kc(bt))
    log({"leg": "kernel_only", "ms_per_call": round(dt * 1000, 3)})

    bt0 = jnp.zeros_like(bt)
    dt = timeit(lambda: kc(bt0))
    log({"leg": "kernel_bt0", "ms_per_call": round(dt * 1000, 3)})

    out = jax.block_until_ready(kc(bt))

    @jax.jit
    def epilogue(out, dest, perm, tile):
        local = out[:, dest].astype(jnp.int64) + base[:, tile[perm]]
        inv = jnp.argsort(perm)
        return local[:, inv].T.astype(jnp.int32)

    dt = timeit(lambda: epilogue(out, dest, perm, tile))
    log({"leg": "epilogue", "ms_per_call": round(dt * 1000, 3)})


if __name__ == "__main__":
    main()
