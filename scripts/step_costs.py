"""Measure per-step / per-launch costs of the discovery hot loops on the
live chip: wavefront blocks at several lane widths and block sizes, walk
blocks at several lane counts, and the bare rank4 kernel launch.  Prints one
JSON line per measurement.

Usage: python scripts/step_costs.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, reps=20):
    f()[0].block_until_ready() if isinstance(f(), tuple) else None
    r = f()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.time()
    for _ in range(reps):
        r = f()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    return (time.time() - t0) / reps


def main():
    from biograph_tpu.io.fastq import read_fastq
    from biograph_tpu.build.seqset_build import build_seqset
    from biograph_tpu.index.seqset import SeqsetRanges

    batch = read_fastq("/root/reference/golden/e_coli_10000snp.fq")
    ss = build_seqset(batch.codes, batch.lengths)
    d = ss.d
    rng = np.random.default_rng(0)

    # bare rank4 kernel at several widths
    for B in (1 << 12, 1 << 15, 1 << 17, 1 << 20):
        pos = jnp.asarray(rng.integers(0, ss.n_entries + 1, B))
        f = jax.jit(lambda p: d.rank4(p, use_kernel=True))
        dt = timeit(lambda: f(pos))
        print(json.dumps({"op": "rank4", "B": B, "ms": round(dt * 1e3, 3),
                          "mq_s": round(B * 4 / dt / 1e6, 1)}), flush=True)

    # push4 (one stacked rank4 + sizes kernel)
    for B in (1 << 12, 1 << 14, 1 << 17):
        b = jnp.asarray(rng.integers(0, ss.n_entries - 1, B))
        r = SeqsetRanges(b, b + 2, jnp.full((B,), 5, jnp.int32))
        f = jax.jit(lambda rr: d.push4(rr, use_kernel=True))
        dt = timeit(lambda: f(r))
        print(json.dumps({"op": "push4", "B": B, "ms": round(dt * 1e3, 3)}),
              flush=True)

    # wavefront block: per-step cost at Ap lanes
    from biograph_tpu.variants import discover as D

    ref = np.asarray(
        rng.integers(0, 4, 1 << 20).astype(np.uint8)
    )
    ref_dev = jnp.asarray(ref)
    k = 23
    npk = 1 << 20
    packed = D._span_kmers_dev(
        ref_dev, jnp.asarray(0, jnp.int64),
        jnp.asarray(len(ref), jnp.int64), npk, k,
    )
    tt = D._trunc_tables(ss, 25)
    n_packed = jnp.asarray(len(ref) - k + 1, jnp.int64)
    for Ap in (1 << 12, 1 << 14):
        for nsteps in (8, 16, 32):
            seed = dict(
                begin=jnp.asarray(rng.integers(0, ss.n_entries - 2, Ap)),
                end=None, size=None, ab=None, policy=None, min_local=None,
            )
            seed["end"] = seed["begin"] + 2
            seed["size"] = jnp.full((Ap,), 5, jnp.int32)
            seed["ab"] = jnp.asarray(rng.integers(0, 4, Ap).astype(np.int32))
            seed["policy"] = jnp.zeros((Ap,), jnp.int32)
            seed["min_local"] = jnp.ones((Ap,), jnp.int64)
            st = D._wavefront_seed_jit(d, seed, 420)
            st = jax.tree_util.tree_map(lambda x: x.block_until_ready(), st)

            def blk():
                return D._wavefront_block_jit(
                    d, packed, tt[0], tt[1], n_packed, st, jnp.int32(1),
                    nsteps, 420, k, 1, 25,
                )

            dt = timeit(blk, reps=10)
            print(json.dumps({
                "op": "wave_block", "Ap": Ap, "nsteps": nsteps,
                "ms": round(dt * 1e3, 2),
                "ms_per_step": round(dt * 1e3 / nsteps, 3),
            }), flush=True)

    # walk block at several lane counts
    from biograph_tpu.index import probes as PR

    text = jnp.asarray(rng.integers(0, 4, 1 << 22).astype(np.uint8))
    for S in (1 << 15, 1 << 17, 1 << 18):
        carry = PR._walk_carry(d, 0, 0, 1 << 22, 25, S, (1 << 22) // S)
        carry = PR._walk_block(d, text, carry, 25, True, PR.CHAIN_BLOCK)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), carry)

        def blk():
            return PR._walk_block(d, text, carry, 25, True, PR.CHAIN_BLOCK)

        dt = timeit(blk, reps=10)
        print(json.dumps({
            "op": "walk_block", "S": S, "nsteps": PR.CHAIN_BLOCK,
            "ms": round(dt * 1e3, 2),
            "ms_per_step": round(dt * 1e3 / PR.CHAIN_BLOCK, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
