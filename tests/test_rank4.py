"""MXU rank4 kernel vs the gather path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from biograph_tpu.ops.rank4 import (
    MAX_NW,
    build_rank4_table,
    rank4_pallas,
    rank4_xla,
)


def _structure(rng, nw):
    words = rng.integers(0, 1 << 32, (4, nw), dtype=np.uint64).astype(np.uint32)
    pc = np.zeros((4, nw), np.int64)
    for b in range(4):
        pc[b] = [bin(int(w)).count("1") for w in words[b]]
    cum = np.cumsum(pc, axis=1) - pc
    return words, cum


@pytest.mark.parametrize("nw", [7, 300, 1000])
def test_rank4_matches_xla(rng, nw):
    words, cum = _structure(rng, nw)
    table = build_rank4_table(words, cum)
    assert table is not None
    n = nw * 32
    pos = np.concatenate(
        [rng.integers(0, n, 500), [0, 1, 31, 32, 33, n - 1, n]]
    ).astype(np.int64)
    got = np.asarray(
        rank4_pallas(table, jnp.asarray(pos), True)  # interpret mode
    )
    want = np.asarray(rank4_xla(jnp.asarray(words), jnp.asarray(cum), pos))
    assert (got == want).all(), np.argwhere(got != want)[:5]


def test_rank4_on_real_seqset(rng):
    """Table built from a real (small) seqset answers push_front-equivalent
    rank queries identically to the production rank()."""
    from biograph_tpu.build.seqset_build import build_seqset

    codes = rng.integers(0, 4, (300, 40)).astype(np.uint8)
    lens = np.full(300, 40, np.int32)
    ss = build_seqset(codes, lens)
    table = build_rank4_table(ss.prev_words, ss.prev_cum)
    assert table is not None
    pos = rng.integers(0, ss.n_entries + 1, 600)
    got = np.asarray(rank4_pallas(table, jnp.asarray(pos), True))
    d = ss.d
    for b in range(4):
        want = np.asarray(
            d.rank(jnp.full(len(pos), b, jnp.int32), jnp.asarray(pos))
        )
        assert (got[:, b] == want).all()


def test_too_big_returns_none(rng):
    words = np.zeros((4, MAX_NW + 1), np.uint32)
    cum = np.zeros((4, MAX_NW + 1), np.int64)
    assert build_rank4_table(words, cum) is None


def test_push4_matches_push_front(rng):
    from biograph_tpu.build.seqset_build import build_seqset
    from biograph_tpu.index.seqset import SeqsetRanges

    codes = rng.integers(0, 4, (200, 30)).astype(np.uint8)
    lens = np.full(200, 30, np.int32)
    ss = build_seqset(codes, lens)
    d = ss.d
    # random valid ranges from a find over read prefixes
    q = codes[:64, :12]
    r = d.find(jnp.asarray(q), jnp.asarray(np.full(64, 12, np.int32)))
    nb4, ne4 = d.push4(r)
    for b in range(4):
        c = d.push_front(r, jnp.full((64,), b, jnp.int32))
        assert (np.asarray(nb4[:, b]) == np.asarray(c.begin)).all()
        assert (np.asarray(ne4[:, b]) == np.asarray(c.end)).all()


def test_rank4_hbm_matches_xla(rng):
    """HBM-tier tiled kernel (past the VMEM cap) vs the gather path,
    random AND clustered (tile-locality) query shapes, boundary positions."""
    from biograph_tpu.ops.rank4 import build_rank4_hbm_table, rank4_hbm_pallas

    nw = MAX_NW + 1000  # just past the VMEM cap -> multiple tiles
    words, cum = _structure(rng, nw)
    res = build_rank4_hbm_table(words, cum)
    assert res is not None
    tiles, base = res
    assert tiles.shape[0] >= 3
    n = nw * 32
    pos = np.concatenate(
        [
            rng.integers(0, n, 800),
            np.clip(rng.normal(n // 2, 300, 800), 0, n).astype(np.int64),
            [0, 1, 31, 32, n - 1, n],
        ]
    ).astype(np.int64)
    got = np.asarray(rank4_hbm_pallas(tiles, base, jnp.asarray(pos), True))
    want = np.asarray(rank4_xla(jnp.asarray(words), jnp.asarray(cum), pos))
    assert (got == want).all(), np.argwhere(got != want)[:5]


def test_rank4_hbm_single_tile_bucket(rng):
    """All queries landing in ONE tile exercise the dead-tail block path."""
    from biograph_tpu.ops.rank4 import build_rank4_hbm_table, rank4_hbm_pallas

    nw = 3 * 2048  # 3 tiles exactly
    words, cum = _structure(rng, nw)
    tiles, base = build_rank4_hbm_table(words, cum)
    pos = rng.integers(2048 * 32, 2 * 2048 * 32, 300).astype(np.int64)
    got = np.asarray(rank4_hbm_pallas(tiles, base, jnp.asarray(pos), True))
    want = np.asarray(rank4_xla(jnp.asarray(words), jnp.asarray(cum), pos))
    assert (got == want).all()


def test_gather_bytes_interpret(rng):
    from biograph_tpu.ops.rank4 import build_bytes_table, gather_bytes_pallas

    vals = rng.integers(0, 255, 5000).astype(np.int32)
    vals[17] = 300  # clips to 255
    table = build_bytes_table(vals)
    assert table is not None
    idx = rng.integers(0, 5000, 4096)
    got = np.asarray(gather_bytes_pallas(table, jnp.asarray(idx), True))
    want = np.minimum(vals, 255)[idx]
    assert (got == want).all()
    # out-of-range indices (padding region) read 0
    got2 = np.asarray(
        gather_bytes_pallas(table, jnp.asarray(np.array([5000, 5321])), True)
    )
    assert (got2 == 0).all()
