"""Pallas TPU kernel for the rank bitvector (bitcount) finalize.

The reference finalizes its bitcount accel structures with a sequential CPU
pass (modules/io/bitcount.cpp finalize: per-word popcount accumulation).
rank_cum_pallas computes the same exclusive prefix popcount as a Pallas
kernel: per-block Hillis-Steele scans on the VPU (Mosaic has no cumsum
lowering) with the cross-block offset fixed by one outer XLA cumsum.

Measured on a v5e chip this kernel is CORRECT but slower than XLA's fused
population_count+cumsum (XLA pipelines the whole reduction tree in one
fusion), so rank_cum() defaults to the XLA path; the kernel remains as the
verified Pallas formulation and as the scaffold for fusing rank *queries*
into the same pass later.

Hard-won Mosaic notes (this toolchain, v5e remote compile):
  * index_map literals MUST be i32 — under jax_enable_x64 a plain `0`
    becomes i64 and Mosaic dies with "failed to legalize func.return".
  * uint32<->int32 `astype` inside kernels recurses; use
    lax.bitcast_convert_type.
  * jnp.sum/cumsum inside kernels either hit i64 promotion or have no
    lowering; reduce via roll+mask scans.
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

ROWS = 16  # sublane tiles per grid step
COLS = 128  # lane width
BLOCK = ROWS * COLS  # words per grid step (8 KB of bits)


def _inclusive_scan(x, axis, size):
    """Hillis-Steele inclusive prefix sum via roll+mask (Mosaic has no
    cumsum lowering; log2(size) shifted adds on the VPU instead)."""
    idx = lax.broadcasted_iota(jnp.int32, x.shape, axis)
    zero = jnp.zeros_like(x)
    d = 1
    while d < size:
        shifted = pltpu.roll(x, jnp.int32(d), axis)  # i32 shift: Mosaic rejects i64
        x = x + jnp.where(idx >= d, shifted, zero)
        d *= 2
    return x


def _popcount_cum_kernel(words_ref, cum_ref):
    """One grid step: exclusive in-block prefix popcounts.

    No cross-block state: block totals + the offset fix happen outside the
    kernel (one cheap XLA popcount-sum/cumsum over blocks), keeping every
    grid step independent and the lowering simple.
    """
    w = words_ref[...]  # [ROWS, COLS], row-major word order
    # NOTE: Mosaic's uint32<->int32 converts recurse; stay in uint32
    pc = lax.population_count(w)
    row_inc = _inclusive_scan(pc, 1, COLS)  # inclusive along lanes
    row_tot = row_inc[:, COLS - 1 :]  # [ROWS, 1]
    rows_inc = _inclusive_scan(row_tot, 0, ROWS)
    row_offset = rows_inc - row_tot  # exclusive prefix of row totals
    inc = row_inc + row_offset
    cum_ref[...] = inc - pc


def rank_cum_pallas(words: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Exclusive prefix popcount per word: the rank acceleration table.

    words: uint32 [nw] (padded to BLOCK multiple internally).
    Returns int32 [nw].
    """
    if not HAVE_PALLAS:
        return rank_cum_reference(words)
    nw = words.shape[0]
    nwp = -(-nw // BLOCK) * BLOCK
    wp = jnp.zeros((nwp,), jnp.uint32).at[:nw].set(words).reshape(-1, COLS)
    grid = nwp // BLOCK
    exc = pl.pallas_call(
        _popcount_cum_kernel,
        grid=(grid,),
        # index maps must return i32: under jax_enable_x64 a literal 0
        # becomes i64 and Mosaic fails with "failed to legalize func.return"
        in_specs=[
            pl.BlockSpec((ROWS, COLS), lambda i: (i, jnp.int32(0))),
        ],
        out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((nwp // COLS, COLS), jnp.uint32),
        interpret=interpret,
    )(wp)
    tot = jnp.sum(
        lax.population_count(wp).reshape(grid, BLOCK), axis=1, dtype=jnp.uint32
    )
    offsets = jnp.cumsum(tot, dtype=jnp.uint32) - tot
    cum = exc.reshape(grid, BLOCK) + offsets[:, None]
    return lax.bitcast_convert_type(cum.reshape(-1)[:nw], jnp.int32)


def rank_cum_reference(words: jnp.ndarray) -> jnp.ndarray:
    pc = lax.population_count(words).astype(jnp.int32)
    return jnp.cumsum(pc) - pc


def rank_cum(words, use_pallas: bool = False):
    """Rank acceleration table; XLA fusion by default (faster on v5e)."""
    return rank_cum_pallas(words) if use_pallas else rank_cum_reference(words)
