"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process owns 2 virtual CPU devices; the 4-way 'model' mesh spans both
processes, so every collective seqset op really crosses a process boundary
(gloo CPU collectives — the DCN stand-in).  This is the multi-host analog of
the reference testing its distributed runtime through task_mgr_local
(modules/mapred/task_mgr.h:60): same production code path, local processes.

Usage: python mp_worker.py <process_id> <num_processes> <coordinator>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
os.environ.setdefault("BGT_NO_COMPILE_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.index.seqset import SeqsetRanges
from biograph_tpu.parallel.distributed import global_mesh, initialize
from biograph_tpu.parallel.sharded_seqset import (
    ShardedRankArrays,
    make_sharded_seqset_ops,
)


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ctx = initialize(coordinator=coord, num_processes=nproc, process_id=pid)
    assert ctx.initialized and ctx.num_processes == nproc, ctx
    mesh = global_mesh({"model": -1})
    S = mesh.shape["model"]
    assert S == nproc * 2, (S, jax.device_count())

    # identical deterministic inputs on every process (each host reading the
    # same immutable artifact, as in a real run)
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, 1200).astype(np.uint8)
    rows = [ref[s : s + 40] for s in range(0, len(ref) - 40, 5)]
    codes = np.stack(rows).astype(np.uint8)
    lens = np.full(len(rows), 40, np.int32)
    ss = build_seqset(codes, lens)

    arrays = ShardedRankArrays.build(ss, S)
    args = arrays.device_args_global(mesh) + (np.asarray(arrays.fixed),)
    ops = make_sharded_seqset_ops(mesh, ss.n_entries)

    # local single-device truth (full structure on this process's device 0)
    ids = rng.integers(0, ss.n_entries, 16)
    plen = 12
    seqs = np.asarray(ss.d.sequences(jnp.asarray(ids), plen))
    r = ss.d.find(jnp.asarray(seqs), jnp.asarray(np.full(16, plen, np.int32)))

    def fetch(x):
        return np.asarray(jax.device_get(x.addressable_shards[0].data))

    for b in range(4):
        bb = np.full(r.begin.shape, b, np.int32)
        want = ss.d.push_front(r, jnp.asarray(bb))
        nb, ne, nsz = ops["push_front"](
            *args, np.asarray(r.begin), np.asarray(r.end), np.asarray(r.size), bb
        )
        assert (fetch(nb) == np.asarray(want.begin)).all(), ("push b", b)
        assert (fetch(ne) == np.asarray(want.end)).all(), ("push e", b)
        assert (fetch(nsz) == np.asarray(want.size)).all(), ("push s", b)

    # drop-walk along the reference: exercises the collective while_loop
    B = 8
    lb = jnp.zeros((B,), jnp.int64)
    le = jnp.full((B,), ss.n_entries, jnp.int64)
    ls = jnp.zeros((B,), jnp.int32)
    starts = rng.integers(0, len(ref) - 40, B)
    for i in range(20):
        bases = (3 - ref[starts + i]).astype(np.int32)
        want = ss.d.push_front_drop(SeqsetRanges(lb, le, ls), jnp.asarray(bases))
        gb, ge, gs = ops["push_front_drop"](
            *args, np.asarray(lb), np.asarray(le), np.asarray(ls), bases
        )
        assert (fetch(gb) == np.asarray(want.begin)).all(), ("drop b", i)
        assert (fetch(ge) == np.asarray(want.end)).all(), ("drop e", i)
        assert (fetch(gs) == np.asarray(want.size)).all(), ("drop s", i)
        lb, le, ls = want.begin, want.end, want.size

    print(f"MP_OK pid={pid} procs={jax.process_count()} devs={jax.device_count()}")


if __name__ == "__main__":
    main()
