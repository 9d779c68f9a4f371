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


@pytest.mark.slow
def test_chain_window_kernel_matches_find_window():
    """The window-matrix chain kernel must equal find_window at PER-LANE m
    over arbitrary (non-contiguous) positions."""
    from biograph_tpu.index.probes import _window_bases
    from biograph_tpu.ops.rank4 import chain_window_pallas

    rng = np.random.default_rng(5)
    depth = 25
    genome = rng.integers(0, 4, 500).astype(np.uint8)
    reads = [genome[rng.integers(0, 500 - 30):][:30].copy() for _ in range(150)]
    reads = [((3 - r)[::-1].copy() if rng.random() < 0.5 else r) for r in reads]
    codes = np.stack(reads)
    ss = build_seqset(
        jnp.asarray(codes), jnp.asarray(np.full(len(reads), 30, np.int32))
    )
    table = build_rank4_table(ss.prev_words, ss.prev_cum)
    sizes_t = build_bytes_table(np.asarray(ss.entry_sizes))
    text = np.concatenate(
        [genome, rng.integers(0, 4, 200).astype(np.uint8)]
    ).astype(np.uint8)
    pos = jnp.asarray(rng.integers(depth, len(text), 700))
    m = jnp.asarray(rng.integers(1, depth + 1, 700).astype(np.int32))
    wb, we, ws = (
        np.asarray(x)
        for x in find_window_jit(ss.d, jnp.asarray(text), pos, m, depth)
    )
    win_t = _window_bases(jnp.asarray(text), pos, depth).T
    kb, ke, ks = (
        np.asarray(x)
        for x in chain_window_pallas(table, sizes_t, ss.fixed, win_t, m, depth, True)
    )
    np.testing.assert_array_equal(kb, wb)
    np.testing.assert_array_equal(ke, we)
    np.testing.assert_array_equal(ks, ws)
