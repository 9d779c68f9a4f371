"""Fused 4-way rank queries on the MXU (the seqset's hot kernel).

The reference answers one rank query at a time by pointer-chasing its
bitcount accel tables (modules/io/bitcount.h:13 count(), used by
seqset_range::push_front at modules/bio_base/seqset.cpp:319-338).  On TPU,
random gathers are the enemy; this kernel reformulates a *batch* of rank
queries as one-hot matmuls so the MXU does the "gather":

    rank_b(pos) = cum[b, pos>>5] + popcount(words[b, pos>>5] & mask(pos&31))

The per-word cum table and the two 16-bit halves of each word are packed into
one f32 matrix T [12, nw] (f32 is exact below 2^24, so n_entries < 16.7M
keeps cum exact).  A query block builds EQ[nw, Q] = onehot(pos>>5) on the
VPU, and ONE matmul T @ EQ -> [12, Q] selects cum/lo/hi for all four bases of
every query simultaneously; the masked-word popcount finishes on the VPU.
All four base ranks per position come out of a single MXU pass — the
wavefront's 4-base probe costs 2 kernel calls (begin + end) instead of 8
gather-chain rank evaluations.

Scope: the structure matrix must live in VMEM, bounding nw <= MAX_NW words
(n_entries <= 32*MAX_NW).  Bigger seqsets fall back to the XLA gather path
(biograph_tpu.index.seqset.rank) — the DMA-per-superblock variant is the
planned extension.

Mosaic gotchas honored (see ops/pallas_rank.py): i32 index_map literals,
bitcast instead of uint<->int astype, no 64-bit types in-kernel.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

Q_BLOCK = 1024  # queries per grid step (lanes; best measured on v5e)
MAX_NW = 4096  # structure words held in VMEM (=> n_entries <= 131072)


def build_rank4_table(prev_words: np.ndarray, prev_cum: np.ndarray):
    """Pack the rank structure for the kernel as byte limbs.

    prev_words: uint32 [4, nw]; prev_cum: int64 [4, nw] (exclusive prefix
    popcounts).  Returns bf16 [28, nwp] or None when the structure exceeds
    the kernel's VMEM budget or 24-bit cum range.

    Every limb is a byte (<= 255), exact in bf16, so the MXU's native
    single-pass bf16 matmul reconstructs cum (3 limbs) and the word (4
    limbs) exactly after f32 accumulation — no multi-pass f32 emulation.
    Row layout: cum byte j rows 4j..4j+3 (j=0..2), word byte j rows
    12+4j..12+4j+3 (j = LSB first)."""
    words = np.asarray(prev_words, np.uint32)
    cum = np.asarray(prev_cum)
    nw = words.shape[1]
    if nw == 0 or nw > MAX_NW or cum.max(initial=0) >= (1 << 24):
        return None
    nwp = 512
    while nwp < nw + 1:
        nwp *= 2
    if nwp > MAX_NW:
        return None
    out = np.zeros((28, nwp), np.float32)
    # positions past the real structure select total counts with a zero word
    # (an end position == n_entries on a word boundary lands here)
    totals = cum[:, -1] + np.array(
        [int(bin(int(w)).count("1")) for w in words[:, -1]], np.int64
    )
    cum_pad = np.concatenate(
        [cum, np.repeat(totals[:, None], nwp - nw, axis=1)], axis=1
    ).astype(np.int64)
    words_pad = np.zeros((4, nwp), np.uint32)
    words_pad[:, :nw] = words
    for j in range(3):
        out[4 * j : 4 * j + 4] = ((cum_pad >> (8 * j)) & 0xFF).astype(np.float32)
    for j in range(4):
        out[12 + 4 * j : 16 + 4 * j] = (
            (words_pad >> np.uint32(8 * j)) & np.uint32(0xFF)
        ).astype(np.float32)
    return jnp.asarray(out, jnp.bfloat16)


def _rank4_kernel(pos_ref, table_ref, out_ref):
    """One grid step: Q_BLOCK query positions -> [4, Q_BLOCK] ranks."""
    pos = pos_ref[...]  # i32 [1, Q]
    nwp = table_ref.shape[1]
    W = lax.shift_right_logical(pos, jnp.int32(5))  # word index [1, Q]
    rem = lax.bitwise_and(pos, jnp.int32(31))
    iota = lax.broadcasted_iota(jnp.int32, (nwp, Q_BLOCK), 0)
    eq = (iota == W).astype(jnp.bfloat16)  # [nwp, Q] one-hot
    sel = jnp.dot(
        table_ref[...], eq, preferred_element_type=jnp.float32
    )  # [28, Q]: native bf16 MXU pass, f32 accumulate — exact byte limbs
    limbs = sel.astype(jnp.int32)
    cum = (
        limbs[0:4, :]
        + lax.shift_left(limbs[4:8, :], jnp.int32(8))
        + lax.shift_left(limbs[8:12, :], jnp.int32(16))
    )
    word = limbs[12:16, :]
    for j in range(1, 4):
        word = lax.bitwise_or(
            word, lax.shift_left(limbs[12 + 4 * j : 16 + 4 * j, :], jnp.int32(8 * j))
        )
    mask = lax.shift_left(jnp.int32(1), rem) - jnp.int32(1)
    mask = jnp.where(rem > jnp.int32(0), mask, jnp.int32(0))
    wu = lax.bitcast_convert_type(word, jnp.uint32)
    mu = lax.bitcast_convert_type(jnp.broadcast_to(mask, word.shape), jnp.uint32)
    part = lax.population_count(lax.bitwise_and(wu, mu))
    part = lax.bitcast_convert_type(part, jnp.int32)
    out_ref[...] = cum + part


@partial(jax.jit, static_argnums=(2,))
def rank4_pallas(table: jnp.ndarray, pos: jnp.ndarray, interpret: bool = False):
    """All-4-bases rank at each position.

    table: f32 [12, nwp] from build_rank4_table; pos: int [B] (any int dtype).
    Returns int32 [B, 4] = rank_b(pos) for b in 0..3."""
    B = pos.shape[0]
    Bp = -(-B // Q_BLOCK) * Q_BLOCK
    p32 = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(pos.astype(jnp.int32))
    grid = Bp // Q_BLOCK
    out = pl.pallas_call(
        _rank4_kernel,
        grid=(grid,),
        in_specs=[
            # leading dims of size 1 must equal the full array dim; the grid
            # walks column blocks of Q_BLOCK lanes
            pl.BlockSpec((1, Q_BLOCK), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec(
                (table.shape[0], table.shape[1]),
                lambda i: (jnp.int32(0), jnp.int32(0)),
            ),
        ],
        out_specs=pl.BlockSpec((4, Q_BLOCK), lambda i: (jnp.int32(0), i)),
        out_shape=jax.ShapeDtypeStruct((4, Bp), jnp.int32),
        interpret=interpret,
    )(p32, table)
    return out.T[:B]


def build_bytes_table(values: np.ndarray):
    """Pack a small byte-valued array for the one-hot-matmul gather kernel.

    values: int array [n], each in [0, 255] after clipping.  Returns bf16
    [32, nwp] (column w holds values[32w..32w+31]) or None when the array
    exceeds the kernel's VMEM budget.  Out-of-range query indices read 0."""
    vals = np.minimum(np.asarray(values, np.int64), 255)
    n = len(vals)
    nw = -(-n // 32) if n else 0
    if nw == 0 or nw > MAX_NW:
        return None
    nwp = 512
    while nwp < nw + 1:
        nwp *= 2
    if nwp > MAX_NW:
        return None
    pad = np.zeros(nwp * 32, np.float32)
    pad[:n] = vals
    return jnp.asarray(pad.reshape(nwp, 32).T, jnp.bfloat16)


def _gather_bytes_kernel(idx_ref, table_ref, out_ref):
    """One grid step: Q_BLOCK indices -> their byte values via MXU one-hot."""
    idx = idx_ref[...]  # i32 [1, Q]
    nwp = table_ref.shape[1]
    W = lax.shift_right_logical(idx, jnp.int32(5))
    rem = lax.bitwise_and(idx, jnp.int32(31))
    iota = lax.broadcasted_iota(jnp.int32, (nwp, Q_BLOCK), 0)
    eq = (iota == W).astype(jnp.bfloat16)
    sel = jnp.dot(
        table_ref[...], eq, preferred_element_type=jnp.float32
    )  # [32, Q]: bytes are exact in bf16, f32 accumulate
    riota = lax.broadcasted_iota(jnp.int32, (32, Q_BLOCK), 0)
    pick = (riota == jnp.broadcast_to(rem, (32, Q_BLOCK))).astype(jnp.float32)
    out_ref[...] = jnp.sum(sel * pick, axis=0, keepdims=True).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def gather_bytes_pallas(table: jnp.ndarray, idx: jnp.ndarray,
                        interpret: bool = False):
    """values[idx] for a byte table packed by build_bytes_table.

    idx: int [B] (any int dtype, must be in [0, 32*nwp)).  Returns int32 [B].
    Replaces an XLA gather that costs ~9ms per million lanes on TPU with one
    MXU pass (~2ms at 1M)."""
    B = idx.shape[0]
    Bp = -(-B // Q_BLOCK) * Q_BLOCK
    i32 = jnp.zeros((1, Bp), jnp.int32).at[0, :B].set(idx.astype(jnp.int32))
    grid = Bp // Q_BLOCK
    out = pl.pallas_call(
        _gather_bytes_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec(
                (table.shape[0], table.shape[1]),
                lambda i: (jnp.int32(0), jnp.int32(0)),
            ),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK), lambda i: (jnp.int32(0), i)),
        out_shape=jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        interpret=interpret,
    )(i32, table)
    return out[0, :B]


def _chain_rank4(table_ref, pos2, Q: int):
    """In-kernel rank4 of 2Q stacked positions via one MXU pass.

    pos2: i32 [1, 2Q] (begin block ++ end block).  Returns i32 [4, 2Q]."""
    nwp = table_ref.shape[1]
    W = lax.shift_right_logical(pos2, jnp.int32(5))
    rem = lax.bitwise_and(pos2, jnp.int32(31))
    iota = lax.broadcasted_iota(jnp.int32, (nwp, 2 * Q), 0)
    eq = (iota == W).astype(jnp.bfloat16)
    sel = jnp.dot(table_ref[...], eq, preferred_element_type=jnp.float32)
    limbs = sel.astype(jnp.int32)
    cum = (
        limbs[0:4, :]
        + lax.shift_left(limbs[4:8, :], jnp.int32(8))
        + lax.shift_left(limbs[8:12, :], jnp.int32(16))
    )
    word = limbs[12:16, :]
    for j in range(1, 4):
        word = lax.bitwise_or(
            word,
            lax.shift_left(limbs[12 + 4 * j : 16 + 4 * j, :], jnp.int32(8 * j)),
        )
    mask = lax.shift_left(jnp.int32(1), rem) - jnp.int32(1)
    mask = jnp.where(rem > jnp.int32(0), mask, jnp.int32(0))
    wu = lax.bitcast_convert_type(word, jnp.uint32)
    mu = lax.bitcast_convert_type(
        jnp.broadcast_to(mask, word.shape), jnp.uint32
    )
    part = lax.bitcast_convert_type(
        lax.population_count(lax.bitwise_and(wu, mu)), jnp.int32
    )
    return cum + part


def _sel_row4(mat4, b):
    """mat4 [4, Q] -> per-column row pick by base vector b [1, Q].

    Four explicit adds, NOT jnp.sum: with x64 enabled (this package's
    global default) an integer sum accumulates in int64, and any 64-bit
    value inside a Mosaic kernel sends the lowering's convert helper into
    infinite recursion."""
    riota = lax.broadcasted_iota(jnp.int32, mat4.shape, 0)
    w = jnp.where(riota == jnp.broadcast_to(b, mat4.shape), mat4, jnp.int32(0))
    return (w[0:1, :] + w[1:2, :]) + (w[2:3, :] + w[3:4, :])


def _chain_window_kernel(fixed_ref, win_ref, m_ref, table_ref, sizes_ref,
                         out_ref, *, depth: int, Q: int):
    """The WHOLE find-window chain for Q lanes in ONE kernel: `depth`
    sequential push_front steps, each one stacked rank4 MXU pass (both
    range ends) plus one byte-gather MXU pass (the short-entry kick), all
    state in registers/VMEM.  Serves the anchor filter, every binary-search
    round of the exact probe, and (with per-slab shift-built windows) the
    uniform-read coverage walk — probes.find_window semantics at MXU rank
    rate with one launch per chain.

    win_ref: f32 [depth, Q] — win[s, q] is the (already complemented) base
    lane q pushes at step s, stored as float so the per-step row pick is a
    one-hot sum (f32 accumulates without x64 promotion; Mosaic has no
    dynamic-slice lowering and requires 128-aligned lane slices, so NO
    in-kernel slicing happens at all).  m_ref: i32 [1, Q] per-lane window
    length (start-step gate).  Every in-kernel value stays 32-bit: int64
    anywhere sends the Mosaic convert helper into infinite recursion."""
    m = m_ref[...]
    n_total = fixed_ref[...][:, 4:5]
    fixed4 = fixed_ref[...][:, 0:4]
    win = win_ref[...]
    riota = lax.broadcasted_iota(jnp.int32, (depth, Q), 0)

    def step(s, st):
        begin, end, size, si = st
        # carried i32 counter: the fori index is i64 under x64 (recursing
        # convert); one-hot row pick instead of any dynamic slice
        onehot = (riota == si).astype(jnp.float32)
        b = jnp.sum(win * onehot, axis=0, keepdims=True).astype(jnp.int32)
        started = si >= jnp.int32(depth) - m
        pos2 = jnp.concatenate([begin, end], axis=1)
        r4 = _chain_rank4(table_ref, pos2, Q)
        b2 = jnp.concatenate([b, b], axis=1)
        rsel = _sel_row4(r4, b2)
        fb = jnp.zeros((1, Q), jnp.int32)
        for j in range(4):
            fb = jnp.where(
                b == jnp.int32(j),
                jnp.broadcast_to(fixed4[:, j : j + 1], (1, Q)),
                fb,
            )
        nb = fb + rsel[:, :Q]
        ne = fb + rsel[:, Q:]
        new_size = size + jnp.int32(1)
        nmax = jnp.broadcast_to(n_total, nb.shape) - jnp.int32(1)
        first = jnp.minimum(jnp.maximum(nb, jnp.int32(0)), nmax)
        W = lax.shift_right_logical(first, jnp.int32(5))
        rem = lax.bitwise_and(first, jnp.int32(31))
        nwp = sizes_ref.shape[1]
        iota = lax.broadcasted_iota(jnp.int32, (nwp, Q), 0)
        eq = (iota == W).astype(jnp.bfloat16)
        sel = jnp.dot(sizes_ref[...], eq, preferred_element_type=jnp.float32)
        riota32 = lax.broadcasted_iota(jnp.int32, (32, Q), 0)
        pick = (riota32 == jnp.broadcast_to(rem, (32, Q))).astype(jnp.float32)
        sizes_first = jnp.sum(sel * pick, axis=0, keepdims=True).astype(
            jnp.int32
        )
        kick = jnp.logical_and(nb < ne, sizes_first < new_size)
        # bool->int astype recurses in the Mosaic lowering; where() is clean
        nb = nb + jnp.where(kick, jnp.int32(1), jnp.int32(0))
        valid = begin < end
        upd = started & valid
        return (
            jnp.where(upd, nb, begin),
            jnp.where(upd, ne, jnp.where(started, begin, end)),
            jnp.where(upd, new_size, size),
            si + jnp.int32(1),
        )

    begin = jnp.zeros((1, Q), jnp.int32)
    end = jnp.broadcast_to(n_total, (1, Q))
    size = jnp.zeros((1, Q), jnp.int32)
    begin, end, size, _ = lax.fori_loop(
        0, depth, step, (begin, end, size, jnp.zeros((), jnp.int32))
    )
    out_ref[...] = jnp.concatenate([begin, end, size], axis=0)


@partial(jax.jit, static_argnums=(5, 6))
def chain_window_pallas(table, sizes_table, fixed, win_t, m, depth: int,
                        interpret: bool = False):
    """find_window over pre-built complemented window rows win_t [depth, P]
    with per-lane length m, whole chain in one launch.  Same contract as
    probes.find_window(d, text, pos, m, depth) given
    win_t = _window_bases(text, pos, depth).T (float32)."""
    P = win_t.shape[1]
    Q = Q_BLOCK
    Bp = -(-P // Q) * Q
    winp = jnp.zeros((depth, Bp), jnp.float32)
    winp = winp.at[:, :P].set(win_t.astype(jnp.float32))
    mp = jnp.zeros((1, Bp), jnp.int32).at[0, :P].set(m.astype(jnp.int32))
    f32 = jnp.asarray(fixed, jnp.int32).reshape(1, 5)
    f32 = jnp.concatenate([f32, jnp.zeros((1, 3), jnp.int32)], axis=1)
    grid = Bp // Q
    out = pl.pallas_call(
        partial(_chain_window_kernel, depth=depth, Q=Q),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((depth, Q), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec((1, Q), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec(
                (table.shape[0], table.shape[1]),
                lambda i: (jnp.int32(0), jnp.int32(0)),
            ),
            pl.BlockSpec(
                (sizes_table.shape[0], sizes_table.shape[1]),
                lambda i: (jnp.int32(0), jnp.int32(0)),
            ),
        ],
        out_specs=pl.BlockSpec((3, Q), lambda i: (jnp.int32(0), i)),
        out_shape=jax.ShapeDtypeStruct((3, Bp), jnp.int32),
        interpret=interpret,
    )(f32, winp, mp, table, sizes_table)
    return (
        out[0, :P].astype(jnp.int64),
        out[1, :P].astype(jnp.int64),
        out[2, :P],
    )


@partial(jax.jit, static_argnums=(2, 3))
def _contig_windows(text, p0, P: int, depth: int):
    """Shift-built complemented window rows for CONTIGUOUS positions
    [p0, p0+P): win_t[s, j] = 3 - text[p0 + j - depth + 1 + s], i.e. depth
    cheap slices instead of a [P, depth] gather."""
    tf = jnp.concatenate(
        [
            jnp.zeros((depth,), text.dtype),
            text,
            jnp.zeros((P + depth,), text.dtype),
        ]
    )
    rows = [
        jnp.int32(3)
        - lax.dynamic_slice_in_dim(tf, p0 + s + 1, P).astype(jnp.int32)
        for s in range(depth)
    ]
    return jnp.stack(rows, axis=0).astype(jnp.float32)


@partial(jax.jit, static_argnums=(4, 5))
def chain_fixed_pallas(table, sizes_table, fixed, text, depth: int,
                       interpret: bool = False):
    """(begin, end, size) of the depth-length window ending at every text
    position, via the window kernel over shift-built rows.  Positions
    p < depth-1 read a zero halo — callers mask them (they cross a row
    boundary by construction)."""
    P = text.shape[0]
    win_t = _contig_windows(text, jnp.asarray(0, jnp.int64), P, depth)
    m = jnp.full((P,), depth, jnp.int32)
    return chain_window_pallas(
        table, sizes_table, fixed, win_t, m, depth, interpret
    )


# ---------------------------------------------------------------------------
# HBM-tier rank kernel: lifts the VMEM MAX_NW cap (SURVEY §7 hard-part 3's
# "blocked layouts + software prefetch batching").  The structure lives in
# HBM as [n_tiles, 32, TILE_W] byte-limb tiles with per-tile REBASED cum
# (within-tile cum < 32*TILE_W, always limb-exact); queries are sorted and
# bucketed by tile on-device, each padded bucket is a whole number of
# Q_BLOCK lane blocks, and a scalar-prefetched per-block tile id lets
# Mosaic DMA each tile once per bucket (consecutive blocks with the same
# index re-use the resident block).  Reference yardstick: the mmap'd
# bitcount accel tables (modules/io/bitcount.h:13-56) serving multi-GB
# bitvectors — this is their TPU shape.
# ---------------------------------------------------------------------------

TILE_W = int(os.environ.get("BGT_RANK_TILE_W", "2048"))  # words per HBM tile
HBM_MAX_NW = int(
    os.environ.get("BGT_RANK_HBM_MAX_NW", str(1 << 24))
)  # 16.7M words = 536M entries; table = 64 B/word of HBM


def build_rank4_hbm_table(prev_words: np.ndarray, prev_cum: np.ndarray,
                          tile_w: int = 0):
    """Tiled HBM packing of the rank structure.

    Returns (tiles bf16 [n_tiles, 32, tile_w], base int64 [4, n_tiles]) or
    None when the structure exceeds HBM_MAX_NW.  Row layout inside a tile
    matches the VMEM table (cum limb j at rows 4j..4j+3, word limb j at
    rows 12+4j..15+4j) with rows 28..31 zero padding (bf16 sublane tiling);
    cum rows hold cum - base[tile], exact in 2 byte limbs by construction.
    Padded columns past the real structure select total counts with a zero
    word (end positions on the last word boundary land there)."""
    tile_w = tile_w or TILE_W
    words = np.asarray(prev_words, np.uint32)
    cum = np.asarray(prev_cum, np.int64)
    nw = words.shape[1]
    if nw == 0 or nw > HBM_MAX_NW:
        return None
    n_tiles = -(-(nw + 1) // tile_w)
    ncol = n_tiles * tile_w
    totals = cum[:, -1] + np.array(
        [int(bin(int(w)).count("1")) for w in words[:, -1]], np.int64
    )
    cum_pad = np.concatenate(
        [cum, np.repeat(totals[:, None], ncol - nw, axis=1)], axis=1
    )
    words_pad = np.zeros((4, ncol), np.uint32)
    words_pad[:, :nw] = words
    base = cum_pad[:, ::tile_w].copy()  # [4, n_tiles]
    rel = (
        cum_pad.reshape(4, n_tiles, tile_w)
        - base[:, :, None]
    )  # < 32*tile_w, fits 2 byte limbs
    out = np.zeros((n_tiles, 32, tile_w), np.float32)
    for j in range(3):
        out[:, 4 * j : 4 * j + 4] = np.moveaxis(
            (rel >> (8 * j)) & 0xFF, 0, 1
        ).astype(np.float32)
    wtile = np.moveaxis(words_pad.reshape(4, n_tiles, tile_w), 0, 1)
    for j in range(4):
        out[:, 12 + 4 * j : 16 + 4 * j] = (
            (wtile >> np.uint32(8 * j)) & np.uint32(0xFF)
        ).astype(np.float32)
    return jnp.asarray(out, jnp.bfloat16), jnp.asarray(base)


def _rank4_hbm_kernel(bt_ref, lw_ref, rem_ref, tile_ref, out_ref):
    """One grid step: Q_BLOCK tile-local queries against ONE resident tile."""
    lw = lw_ref[...]  # i32 [1, Q] word index WITHIN the tile
    rem = rem_ref[...]  # i32 [1, Q]
    tw = tile_ref.shape[1]
    iota = lax.broadcasted_iota(jnp.int32, (tw, Q_BLOCK), 0)
    eq = (iota == lw).astype(jnp.bfloat16)
    sel = jnp.dot(
        tile_ref[...], eq, preferred_element_type=jnp.float32
    )  # [32, Q] exact byte limbs
    limbs = sel.astype(jnp.int32)
    cum = (
        limbs[0:4, :]
        + lax.shift_left(limbs[4:8, :], jnp.int32(8))
        + lax.shift_left(limbs[8:12, :], jnp.int32(16))
    )
    word = limbs[12:16, :]
    for j in range(1, 4):
        word = lax.bitwise_or(
            word,
            lax.shift_left(limbs[12 + 4 * j : 16 + 4 * j, :], jnp.int32(8 * j)),
        )
    mask = lax.shift_left(jnp.int32(1), rem) - jnp.int32(1)
    mask = jnp.where(rem > jnp.int32(0), mask, jnp.int32(0))
    wu = lax.bitcast_convert_type(word, jnp.uint32)
    mu = lax.bitcast_convert_type(jnp.broadcast_to(mask, word.shape), jnp.uint32)
    part = lax.bitcast_convert_type(
        lax.population_count(lax.bitwise_and(wu, mu)), jnp.int32
    )
    out_ref[...] = cum + part


@partial(jax.jit, static_argnums=(3,))
def rank4_hbm_pallas(tiles: jnp.ndarray, base: jnp.ndarray, pos: jnp.ndarray,
                     interpret: bool = False):
    """All-4-bases rank at each position against the TILED HBM structure.

    tiles/base from build_rank4_hbm_table; pos int [B].  Returns int32
    [B, 4].  Fully jittable: the sort/bucket/scatter prologue and the
    un-permute epilogue are XLA; only the rank itself is the kernel."""
    n_tiles, _, tile_w = tiles.shape
    B = pos.shape[0]
    Q = Q_BLOCK
    w = (pos.astype(jnp.int64) >> 5)
    rem = (pos.astype(jnp.int64) & 31).astype(jnp.int32)
    w = jnp.minimum(w, n_tiles * tile_w - 1)
    tile = (w // tile_w).astype(jnp.int32)
    local_w = (w % tile_w).astype(jnp.int32)

    perm = jnp.argsort(tile)
    tile_s = tile[perm]
    # bucket offsets: counts per tile, each padded bucket a multiple of Q,
    # so USED blocks form a contiguous prefix of the padded layout
    counts = jnp.bincount(tile_s, length=n_tiles)
    padded = -(-counts // Q) * Q
    bucket_off = jnp.cumsum(padded) - padded  # exclusive
    csum = jnp.cumsum(counts) - counts
    within = jnp.arange(B, dtype=counts.dtype) - csum[tile_s]
    dest = (bucket_off[tile_s] + within).astype(jnp.int32)

    PB = -(-B // Q) * Q + n_tiles * Q  # static worst case
    lw_p = jnp.zeros((1, PB), jnp.int32).at[0, dest].set(local_w[perm])
    rem_p = jnp.zeros((1, PB), jnp.int32).at[0, dest].set(rem[perm])
    n_blocks = PB // Q
    total = jnp.sum(padded)
    bstart = jnp.arange(n_blocks, dtype=total.dtype) * Q
    bt = jnp.searchsorted(jnp.cumsum(padded), bstart, side="right").astype(
        jnp.int32
    )
    # dead-tail blocks re-read the last used tile (no DMA, no effect)
    n_used = jnp.maximum(total // Q, 1)
    last_bt = bt[jnp.minimum(n_used - 1, n_blocks - 1)]
    bt = jnp.where(bstart < total, jnp.minimum(bt, n_tiles - 1), last_bt)

    out = pl.pallas_call(
        _rank4_hbm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, Q), lambda i, bt: (jnp.int32(0), i)),
                pl.BlockSpec((1, Q), lambda i, bt: (jnp.int32(0), i)),
                pl.BlockSpec(
                    (None, 32, tile_w),
                    lambda i, bt: (bt[i], jnp.int32(0), jnp.int32(0)),
                ),
            ],
            out_specs=pl.BlockSpec((4, Q), lambda i, bt: (jnp.int32(0), i)),
        ),
        out_shape=jax.ShapeDtypeStruct((4, PB), jnp.int32),
        interpret=interpret,
    )(bt, lw_p, rem_p, tiles)
    local = out[:, dest].astype(jnp.int64) + base[:, tile[perm]]  # [4, B]
    inv = jnp.argsort(perm)
    return local[:, inv].T.astype(jnp.int32)


def rank4_xla(prev_words, prev_cum, pos):
    """XLA gather fallback with the same [B, 4] contract."""
    pos = jnp.asarray(pos)
    nw = prev_words.shape[1]
    w = (pos >> 5).astype(jnp.int64)
    rem = (pos & 31).astype(jnp.uint32)
    # pos == 32*nw (an end position when n_entries % 32 == 0) reads the last
    # word fully instead of indexing past the structure
    over = w >= nw
    wc = jnp.minimum(w, nw - 1)
    mask = jnp.where(
        rem > 0, (jnp.uint32(1) << rem) - jnp.uint32(1), jnp.uint32(0)
    )
    mask = jnp.where(over, jnp.uint32(0xFFFFFFFF), mask)
    outs = []
    flat_w = prev_words.reshape(-1)
    flat_c = prev_cum.reshape(-1)
    for b in range(4):
        word = jnp.take(flat_w, b * nw + wc)
        part = lax.population_count(word & mask).astype(jnp.int64)
        outs.append(jnp.take(flat_c, b * nw + wc) + part)
    return jnp.stack(outs, axis=1).astype(jnp.int32)
