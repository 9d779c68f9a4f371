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
    """mat4 [4, Q] -> per-column row pick by base vector b [1, Q]."""
    riota = lax.broadcasted_iota(jnp.int32, mat4.shape, 0)
    return jnp.sum(
        jnp.where(riota == jnp.broadcast_to(b, mat4.shape), mat4, 0),
        axis=0,
        keepdims=True,
        dtype=jnp.int32,  # x64 mode would promote an i32 sum to i64
    )


def _chain_fixed_kernel(fixed_ref, textp_ref, textc_ref, table_ref,
                        sizes_ref, out_ref, *, depth: int, Q: int):
    """The WHOLE fixed-depth find chain for Q contiguous positions in ONE
    kernel: `depth` sequential push_front steps, each one MXU rank pass
    (both range ends stacked) + one MXU byte-gather (the short-entry kick),
    all state in registers/VMEM.  This is the launch-free, MXU-rate version
    of probes.find_window at constant m == depth over contiguous lanes —
    the uniform-read-length coverage walk's exact shape
    (readmap._coverage_probe; reference semantics
    modules/bio_base/readmap.cpp:368-399).

    textp/textc: the previous and current Q-wide text blocks (halo for the
    depth-long window tails; positions whose window would cross the row
    boundary are invalidated by the caller's _row_mask).  Output [3, Q] =
    (begin, end, size) i32."""
    cat = jnp.concatenate([textp_ref[...], textc_ref[...]], axis=1)  # [1, 2Q]
    n_total = fixed_ref[...][:, 4:5]  # [1, 1] == n_entries
    fixed4 = fixed_ref[...][:, 0:4]  # [1, 4]

    def step(s, st):
        begin, end, size = st
        si = jnp.asarray(s, jnp.int32)  # fori index may be i64 under x64
        # window base for every lane at step s: one dynamic slice (lane j's
        # index is j - depth + 1 + s within the 2Q concat, offset by Q)
        seg = lax.dynamic_slice(
            cat, (jnp.int32(0), jnp.int32(Q - depth + 1) + si), (1, Q)
        )
        b = jnp.int32(3) - seg  # chains push the complement
        pos2 = jnp.concatenate([begin, end], axis=1)
        r4 = _chain_rank4(table_ref, pos2, Q)
        b2 = jnp.concatenate([b, b], axis=1)
        rsel = _sel_row4(r4, b2)  # [1, 2Q]
        fb = jnp.zeros((1, Q), jnp.int32)
        for j in range(4):  # fixed[b] as four 2D selects (no in-kernel gather)
            fb = jnp.where(
                b == jnp.int32(j),
                jnp.broadcast_to(fixed4[:, j : j + 1], (1, Q)),
                fb,
            )
        nb = fb + rsel[:, :Q]
        ne = fb + rsel[:, Q:]
        new_size = size + 1
        nmax = jnp.broadcast_to(n_total, nb.shape) - jnp.int32(1)
        first = jnp.minimum(jnp.maximum(nb, jnp.int32(0)), nmax).astype(
            jnp.int32
        )
        W = lax.shift_right_logical(first, jnp.int32(5))
        rem = lax.bitwise_and(first, jnp.int32(31))
        nwp = sizes_ref.shape[1]
        iota = lax.broadcasted_iota(jnp.int32, (nwp, Q), 0)
        eq = (iota == W).astype(jnp.bfloat16)
        sel = jnp.dot(sizes_ref[...], eq, preferred_element_type=jnp.float32)
        riota = lax.broadcasted_iota(jnp.int32, (32, Q), 0)
        pick = (riota == jnp.broadcast_to(rem, (32, Q))).astype(jnp.float32)
        sizes_first = jnp.sum(sel * pick, axis=0, keepdims=True).astype(
            jnp.int32
        )
        kick = jnp.logical_and(nb < ne, sizes_first < new_size)
        nb = nb + kick.astype(jnp.int32)
        valid = begin < end
        return (
            jnp.where(valid, nb, begin),
            jnp.where(valid, ne, begin),
            jnp.where(valid, new_size, size),
        )

    begin = jnp.zeros((1, Q), jnp.int32)
    end = jnp.broadcast_to(n_total, (1, Q))
    size = jnp.zeros((1, Q), jnp.int32)
    begin, end, size = lax.fori_loop(
        0, depth, step, (begin, end, size)
    )
    out_ref[...] = jnp.concatenate([begin, end, size], axis=0)


@partial(jax.jit, static_argnums=(4, 5))
def chain_fixed_pallas(table, sizes_table, fixed, text, depth: int,
                       interpret: bool = False):
    """(begin, end, size) of the depth-length window ending at every text
    position, whole chain in one kernel launch (see _chain_fixed_kernel).

    table/sizes_table from build_rank4_table/build_bytes_table; fixed: the
    seqset's int64 [5] base-offset array; text: uint8 [P].  Positions
    p < depth-1 read a wrapped/garbage halo — callers mask them (they cross
    a row boundary by construction).  Sizes are byte-clipped at 255, exact
    for any chain comparison at depth < 255."""
    P = text.shape[0]
    Q = Q_BLOCK
    Bp = -(-P // Q) * Q
    tpad = jnp.zeros((1, Bp), jnp.int32).at[0, :P].set(text.astype(jnp.int32))
    f32 = jnp.asarray(fixed, jnp.int32).reshape(1, 5)
    f32 = jnp.concatenate([f32, jnp.zeros((1, 3), jnp.int32)], axis=1)
    grid = Bp // Q
    out = pl.pallas_call(
        partial(_chain_fixed_kernel, depth=depth, Q=Q),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (jnp.int32(0), jnp.int32(0))),
            # halo: previous text block (clamped at the first block; its
            # wrong halo lanes are the caller-masked row-start positions)
            pl.BlockSpec(
                (1, Q), lambda i: (jnp.int32(0), jnp.maximum(i - 1, 0))
            ),
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
    )(f32, tpad, tpad, table, sizes_table)
    return (
        out[0, :P].astype(jnp.int64),
        out[1, :P].astype(jnp.int64),
        out[2, :P],
    )


def _chain_window_kernel(fixed_ref, win_ref, m_ref, table_ref, sizes_ref,
                         out_ref, *, depth: int, Q: int):
    """Whole find-window chain over PRE-GATHERED per-lane base windows in
    one kernel (the non-contiguous-lane sibling of _chain_fixed_kernel):
    win[q, s] is the (already complemented) base pushed at step s, and the
    per-lane window length m gates the start step (probes.find_window
    semantics, masked chain) — so one launch serves the anchor filter AND
    every binary-search round of the exact probe, reusing one gather."""
    m = m_ref[...]  # i32 [1, Q]
    n_total = fixed_ref[...][:, 4:5]
    fixed4 = fixed_ref[...][:, 0:4]

    def step(s, st):
        begin, end, size = st
        si = jnp.asarray(s, jnp.int32)  # fori index may be i64 under x64
        b = lax.dynamic_slice(win_ref[...], (jnp.int32(0), si), (Q, 1))[:, 0][
            None, :
        ]
        started = jnp.broadcast_to(
            si >= jnp.int32(depth) - m, (1, Q)
        )
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
        new_size = size + 1
        nmax = jnp.broadcast_to(n_total, nb.shape) - jnp.int32(1)
        first = jnp.minimum(jnp.maximum(nb, jnp.int32(0)), nmax).astype(
            jnp.int32
        )
        W = lax.shift_right_logical(first, jnp.int32(5))
        rem = lax.bitwise_and(first, jnp.int32(31))
        nwp = sizes_ref.shape[1]
        iota = lax.broadcasted_iota(jnp.int32, (nwp, Q), 0)
        eq = (iota == W).astype(jnp.bfloat16)
        sel = jnp.dot(sizes_ref[...], eq, preferred_element_type=jnp.float32)
        riota = lax.broadcasted_iota(jnp.int32, (32, Q), 0)
        pick = (riota == jnp.broadcast_to(rem, (32, Q))).astype(jnp.float32)
        sizes_first = jnp.sum(sel * pick, axis=0, keepdims=True).astype(
            jnp.int32
        )
        kick = jnp.logical_and(nb < ne, sizes_first < new_size)
        nb = nb + kick.astype(jnp.int32)
        valid = begin < end
        upd = started & valid
        return (
            jnp.where(upd, nb, begin),
            jnp.where(upd, ne, jnp.where(started, begin, end)),
            jnp.where(upd, new_size, size),
        )

    begin = jnp.zeros((1, Q), jnp.int32)
    end = jnp.broadcast_to(n_total, (1, Q))
    size = jnp.zeros((1, Q), jnp.int32)
    begin, end, size = lax.fori_loop(0, depth, step, (begin, end, size))
    out_ref[...] = jnp.concatenate([begin, end, size], axis=0)


@partial(jax.jit, static_argnums=(5, 6))
def chain_window_pallas(table, sizes_table, fixed, win, m, depth: int,
                        interpret: bool = False):
    """find_window over pre-gathered complemented windows `win` [P, depth]
    with per-lane length m, whole chain in one launch.  Same contract as
    probes.find_window(d, text, pos, m, depth) given
    win = _window_bases(text, pos, depth)."""
    P = win.shape[0]
    Q = Q_BLOCK
    Bp = -(-P // Q) * Q
    winp = jnp.zeros((Bp, depth), jnp.int32)
    winp = winp.at[:P].set(win.astype(jnp.int32))
    mp = jnp.zeros((1, Bp), jnp.int32).at[0, :P].set(m.astype(jnp.int32))
    f32 = jnp.asarray(fixed, jnp.int32).reshape(1, 5)
    f32 = jnp.concatenate([f32, jnp.zeros((1, 3), jnp.int32)], axis=1)
    grid = Bp // Q
    out = pl.pallas_call(
        partial(_chain_window_kernel, depth=depth, Q=Q),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (jnp.int32(0), jnp.int32(0))),
            pl.BlockSpec((Q, depth), lambda i: (i, jnp.int32(0))),
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
