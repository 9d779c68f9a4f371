"""The whole-chain pallas kernel (ops/rank4.chain_fixed_pallas) must equal
probes.find_window at constant m == depth over contiguous positions —
checked in interpret mode on CPU (the real-chip path is exercised by the
TPU campaign's pipeline legs, where the coverage scorer uses it)."""

import numpy as np
import jax.numpy as jnp
import pytest

from biograph_tpu.build.seqset_build import build_seqset
from biograph_tpu.index.probes import find_window_jit
from biograph_tpu.ops.rank4 import (
    build_bytes_table,
    build_rank4_table,
    chain_fixed_pallas,
)


@pytest.mark.slow
@pytest.mark.parametrize("seed,depth", [(3, 30), (9, 17)])
def test_chain_fixed_kernel_matches_find_window(seed, depth):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 400).astype(np.uint8)
    reads = [genome[rng.integers(0, 400 - depth):][:depth].copy() for _ in range(140)]
    reads = [((3 - r)[::-1].copy() if rng.random() < 0.5 else r) for r in reads]
    codes = np.stack(reads)
    lengths = np.full(len(reads), depth, np.int32)
    ss = build_seqset(jnp.asarray(codes), jnp.asarray(lengths))
    table = build_rank4_table(ss.prev_words, ss.prev_cum)
    sizes_t = build_bytes_table(np.asarray(ss.entry_sizes))
    assert table is not None and sizes_t is not None
    text = np.concatenate(
        [
            genome[:400],
            rng.integers(0, 4, 112).astype(np.uint8),
            genome[:300],
            rng.integers(0, 4, 212).astype(np.uint8),
        ]
    ).astype(np.uint8)
    P = len(text)
    pos = jnp.arange(P, dtype=jnp.int64)
    wb, we, ws = (
        np.asarray(x)
        for x in find_window_jit(
            ss.d, jnp.asarray(text), pos,
            jnp.full((P,), depth, jnp.int32), depth,
        )
    )
    kb, ke, ks = (
        np.asarray(x)
        for x in chain_fixed_pallas(
            table, sizes_t, ss.fixed, jnp.asarray(text), depth, True
        )
    )
    m = np.arange(P) >= depth - 1  # halo positions are caller-masked
    np.testing.assert_array_equal(kb[m], wb[m])
    np.testing.assert_array_equal(ke[m], we[m])
    np.testing.assert_array_equal(ks[m], ws[m])
