"""Binned segmented reduce: sorted (K, C) rows -> dense (M, C) table.

The scatter engine's reduction+placement pipeline (ops/scatter.py)
builds the dense per-cell table from cell-sorted particle rows in 4-9
full passes over the (K, 128)-lane data — cumsum + cummax backpointers +
row gather + unique-index scatter for sums, 6 windowed masked-doubling
passes + scatter for mins — and the placement's fill+scatter over the
dense (M, 128-lane) buffer dominates big grids (596 ms/step at
coiling_504's 8.8M-cell table).  This kernel does the whole thing in
ONE streaming pass.

Design (output-tiled, scalar-prefetched ranges):
  * XLA precomputes, per output tile t (a (TM, C) row block of the dense
    table), the EXACT sorted-row range [lo, hi) feeding it
    (searchsorted; contiguous because ids are sorted, and a segment
    never spans tiles since a segment is one id) plus the enclosing
    DMA-aligned chunk range.
  * Each grid step initialises its VMEM tile to the fill value and
    streams its chunks from HBM (manual async DMA — the ranges are
    data-dependent, so BlockSpec pipelining cannot express them).
  * A serial scalar sweep accumulates the CURRENT segment's reduce in a
    vreg-resident (1, C) carry (one vector load + op per row — no VMEM
    read-modify-write) and stores it once per segment when the id
    changes.  Chunk-crossing segments store chunk-local partials; the
    op-accumulating store keeps any split exact.

Out-of-range ids (the engine's padding "dump" rows, ids >= M) sort to
the end and fall outside every tile's row range — dropped for free.

Availability: TPU backend (or interpret=True for CPU tests), f32,
C <= 512, K >= 2 * CH, and num_segments >= 4e5: at small grids the
kernel call LOSES to XLA's tightly-fused small-op pipeline (flagship
48x80x48, M = 205k: 81 vs 40 ms/step — the pallas_call boundary breaks
producer/consumer fusion around the transfer), while from 128^3-class
tables up it wins large (811k: 244 -> 204 ms/step; 8.8M: the old
placement fill+scatter alone was 596 ms/step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TM = 2048  # output rows per tile
_CH = 2048  # input rows per DMA chunk


def _min_segs() -> int:
    import os

    return int(os.environ.get("PFS_BINNED_MIN_SEGS", "400000"))


def binned_reduce_available(
    vals, num_segments: int, interpret: bool = False
) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    return (
        vals.ndim == 2
        and vals.dtype == jnp.float32
        and vals.shape[-1] <= 512
        and vals.shape[0] >= 2 * _CH
        and num_segments >= _min_segs()
    )


def binned_broadcast_available(
    table, sorted_ids, interpret: bool = False
) -> bool:
    if not interpret and jax.default_backend() != "tpu":
        return False
    return (
        table.ndim == 2
        and table.dtype == jnp.float32
        and table.shape[-1] <= 512
        and sorted_ids.shape[0] >= 2 * _CH
        and table.shape[0] >= _min_segs()
    )


_BTM = 8192  # table rows per broadcast tile
_UNROLL = 4  # rows per serial-loop iteration


def _bcast_kernel(n_tiles, rows_ref, ids_ref, table_ref, out_hbm,
                  ochunk, ichunk, sems):
    """Mirror image of `_kernel`: tile t holds table rows
    [t*_BTM, (t+1)*_BTM) in VMEM and fills the contiguous sorted-row
    range [lo, hi) of the output with `table[id - base]`, streaming the
    output in chunks.  Boundary chunks (shared with the neighbouring
    tile) are read-modify-written — the sequential grid makes the RMW
    exact — while interior chunks skip the read DMA.  The row loop is
    unrolled ``_UNROLL``-wide (rows are independent: pure load+store, so
    unrolled iterations pipeline); overshoot lanes park in dummy rows
    past the chunk.  The extra grid step `t == n_tiles` zero-fills the
    tail rows whose ids fall outside the table (padding dump rows)."""
    t = pl.program_id(0)
    c_lo = rows_ref[4 * t]
    c_hi = rows_ref[4 * t + 1]
    lo = rows_ref[4 * t + 2]
    hi = rows_ref[4 * t + 3]
    base = t * _BTM
    is_tail = t == n_tiles

    def chunk_body(c, _):
        start = pl.multiple_of(c * _CH, _CH)
        r_lo = jnp.maximum(lo - start, 0)
        r_hi = jnp.minimum(hi - start, _CH)
        boundary = (r_lo > 0) | (r_hi < _CH)

        odma = pltpu.make_async_copy(
            out_hbm.at[pl.ds(start, _CH), :],
            ochunk.at[pl.ds(0, _CH), :],
            sems.at[0],
        )
        idma = pltpu.make_async_copy(
            ids_ref.at[pl.ds(start, _CH)], ichunk, sems.at[1]
        )

        # boundary chunks preserve the neighbour tile's rows (the tail's
        # first chunk preserves the last tile's); interior chunks are
        # fully overwritten, so the read DMA is skipped
        @pl.when(boundary)
        def _():
            odma.start()

        idma.start()
        idma.wait()

        @pl.when(boundary)
        def _():
            odma.wait()

        @pl.when(jnp.logical_not(is_tail))
        def _():
            n_it = (r_hi - r_lo + _UNROLL - 1) // _UNROLL

            def row_body(i, _):
                r0 = r_lo + i * _UNROLL
                for u in range(_UNROLL):
                    r = r0 + u
                    rid = ichunk[jnp.minimum(r, _CH - 1)]
                    src = jnp.clip(rid - base, 0, _BTM - 1)
                    dst = jnp.where(r < r_hi, r, _CH + u)
                    ochunk[pl.ds(dst, 1), :] = table_ref[
                        pl.ds(src, 1), :
                    ]
                return 0

            jax.lax.fori_loop(0, n_it, row_body, 0)

        @pl.when(is_tail)
        def _():
            rows_idx = jax.lax.broadcasted_iota(
                jnp.int32, (_CH, ochunk.shape[1]), 0
            )
            mask = (rows_idx >= r_lo) & (rows_idx < r_hi)
            cur = ochunk[pl.ds(0, _CH), :]
            ochunk[pl.ds(0, _CH), :] = jnp.where(mask, 0.0, cur)

        wdma = pltpu.make_async_copy(
            ochunk.at[pl.ds(0, _CH), :],
            out_hbm.at[pl.ds(start, _CH), :],
            sems.at[2],
        )
        wdma.start()
        wdma.wait()
        return 0

    jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def binned_segment_broadcast(
    table: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-pass ``out[i] = table[sorted_ids[i]]`` for non-decreasing ids.

    table: (M, C) f32; sorted_ids: (K,) non-decreasing; rows whose id
    falls outside [0, M) (the engine's padding dump rows, sorted last)
    read zeros.  Returns (K, C).  The XLA formulation needs two
    unique-index scatters plus a 6-7 pass masked-doubling segmented scan
    (ops/scatter.segment_broadcast_sorted); this is the same streaming
    single pass as `binned_segment_reduce`, mirrored.
    """
    k, = sorted_ids.shape
    c_in = table.shape[-1]
    ids32 = sorted_ids.astype(jnp.int32)
    c = ((c_in + 127) // 128) * 128
    if c != c_in:
        table = jnp.pad(table, ((0, 0), (0, c - c_in)))
    m = table.shape[0]
    m_pad = ((m + _BTM - 1) // _BTM) * _BTM
    n_tiles = m_pad // _BTM
    table_p = jnp.pad(table, ((0, m_pad - m), (0, 0)))
    kpad = ((k + _CH - 1) // _CH) * _CH
    ids_p = jnp.pad(
        ids32, (0, kpad - k), constant_values=jnp.int32(2**31 - 1)
    )
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * _BTM
    row_bounds = jnp.searchsorted(ids_p, bounds, side="left")
    lo = row_bounds[:-1].astype(jnp.int32)
    hi = row_bounds[1:].astype(jnp.int32)
    # tail step: rows with ids >= m (live padding rows + kpad padding)
    k_live = jnp.searchsorted(
        ids_p, jnp.asarray(m, jnp.int32), side="left"
    ).astype(jnp.int32)
    lo = jnp.concatenate([lo, k_live[None]])
    hi = jnp.concatenate([hi, jnp.asarray([kpad], jnp.int32)])
    c_lo = lo // _CH
    c_hi = (hi + _CH - 1) // _CH
    c_hi = jnp.where(hi == lo, c_lo, c_hi)
    rows = jnp.stack([c_lo, c_hi, lo, hi], axis=-1).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # ids in HBM
            pl.BlockSpec(  # table tile in VMEM (clamped for the tail)
                (_BTM, c),
                lambda t, rows_ref: (jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            # _UNROLL dummy rows past the chunk park overshoot stores
            pltpu.VMEM((_CH + _UNROLL, c), jnp.float32),
            pltpu.SMEM((_CH,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_bcast_kernel, n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kpad, c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(rows, ids_p, table_p)
    return out[:k, :c_in]


def _kernel(op, fill, cf, rows_ref, ids_ref, vals_hbm, out_ref, vchunk,
            ichunk, sems, acc_ref=None):
    """``cf``: channels-first output.  The row-major (TM, C) tile
    accumulates in the ``acc_ref`` VMEM scratch and its TRANSPOSE is
    written to the (C, TM) output block once at the end of the tile —
    the downstream ``channels_first`` moveaxis (a full (M, C) -> (C, M)
    HBM transpose, 20.8 ms/step at 128^3, round-4 profile) disappears;
    consumers (the corner folds) read contiguous (C, grid) rows."""
    t = pl.program_id(0)
    c_lo = rows_ref[4 * t]
    c_hi = rows_ref[4 * t + 1]
    lo = rows_ref[4 * t + 2]
    hi = rows_ref[4 * t + 3]
    base = t * _TM
    tile = acc_ref if cf else out_ref
    tile[:] = jnp.full_like(tile, fill)
    n_ch = tile.shape[1]

    def combine(a, b):
        return a + b if op == "add" else jnp.minimum(a, b)

    def store(row, acc):
        cur = tile[pl.ds(row, 1), :]
        tile[pl.ds(row, 1), :] = combine(cur, acc)

    def chunk_body(c, _):
        start = pl.multiple_of(c * _CH, _CH)
        vdma = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start, _CH), :], vchunk, sems.at[0]
        )
        idma = pltpu.make_async_copy(
            ids_ref.at[pl.ds(start, _CH)], ichunk, sems.at[1]
        )
        vdma.start()
        idma.start()
        vdma.wait()
        idma.wait()
        r_lo = jnp.maximum(lo - start, 0)
        r_hi = jnp.minimum(hi - start, _CH)

        def row_body(r, carry):
            prev_id, acc = carry
            rid = ichunk[r]
            vrow = vchunk[pl.ds(r, 1), :]
            is_new = (rid != prev_id) & (prev_id >= 0)

            @pl.when(is_new)
            def _():
                store(prev_id - base, acc)

            acc = jnp.where(
                (rid == prev_id)[None],
                combine(acc, vrow),
                vrow,
            )
            return (rid, acc)

        prev_id, acc = jax.lax.fori_loop(
            r_lo, r_hi, row_body,
            (jnp.int32(-1), jnp.zeros((1, n_ch), jnp.float32)),
        )
        # flush the carried segment (chunk-local partial if it continues
        # into the next chunk — op-accumulation keeps the split exact)
        @pl.when(prev_id >= 0)
        def _():
            store(prev_id - base, acc)

        return 0

    jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)
    if cf:
        out_ref[:] = jnp.swapaxes(acc_ref[:], 0, 1)


def _scan_kernel(op, fill, cf, rows_ref, ids_ref, lasts_ref,
                 vals_hbm, out_ref, vchunk, ichunk, lchunk, sems,
                 acc_ref=None):
    """Two-phase chunk processing (round-5: the serial row loop was
    ~19 cy/row = 27.8 ms/step at 128^3 across the step's 4 reduces):

      A. VECTOR phase — an 11-pass masked-doubling segmented scan over
         the whole (CH, C) chunk in VMEM; after it, each segment's LAST
         in-chunk row holds the op-reduce of that segment's rows so far.
         The segment key rides the vals stream as a trailing 128-lane
         block (the f32 segment RANK replicated across lanes — a (CH, 1)
         ids DMA violates Mosaic's 128-lane slice alignment).
      B. SCALAR phase — the serial loop touches only SMEM per row (a
         precomputed last-row flag) and issues one accumulate-store per
         SEGMENT, not per row.

    Identical output contract to `_kernel` (chunk-split segments still
    store op-accumulated partials)."""
    t = pl.program_id(0)
    c_lo = rows_ref[4 * t]
    c_hi = rows_ref[4 * t + 1]
    lo = rows_ref[4 * t + 2]
    hi = rows_ref[4 * t + 3]
    base = t * _TM
    tile = acc_ref if cf else out_ref
    tile[:] = jnp.full_like(tile, fill)
    c = tile.shape[1]
    ident = jnp.float32(0.0 if op == "add" else jnp.inf)

    def combine(a, b):
        return a + b if op == "add" else jnp.minimum(a, b)

    def chunk_body(ci, _):
        start = pl.multiple_of(ci * _CH, _CH)
        vdma = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(start, _CH), :], vchunk, sems.at[0]
        )
        idma = pltpu.make_async_copy(
            ids_ref.at[pl.ds(start, _CH)], ichunk, sems.at[1]
        )
        ldma = pltpu.make_async_copy(
            lasts_ref.at[pl.ds(start, _CH)], lchunk, sems.at[2]
        )
        vdma.start()
        idma.start()
        ldma.start()
        vdma.wait()
        idma.wait()
        ldma.wait()
        r_lo = jnp.maximum(lo - start, 0)
        r_hi = jnp.minimum(hi - start, _CH)

        # phase A: chunk-local segmented inclusive scan (doubling).
        # Rows of DIFFERENT segments never combine (mask on the rank
        # block), so scanning the whole chunk — including rows of
        # neighbouring tiles and padding rows — is harmless.
        x = vchunk[:, :c]
        rk = vchunk[:, c : c + 128]
        for p in range(_CH.bit_length() - 1):
            s = 1 << p
            top_v = jnp.full((s, c), ident, jnp.float32)
            shifted = jnp.concatenate([top_v, x[: _CH - s]], axis=0)
            top_r = jnp.full((s, 128), -1.0, jnp.float32)
            srk = jnp.concatenate([top_r, rk[: _CH - s]], axis=0)
            m128 = srk == rk  # rank lanes identical -> uniform mask
            same = jnp.concatenate([m128] * (c // 128), axis=1)
            x = jnp.where(same, combine(x, shifted), x)
        vchunk[:, :c] = x

        # phase B: scalar sweep; one store per segment-last row.
        # (full-width dynamic-row load, then a value slice — Mosaic
        # rejects partial-lane loads at dynamic sublane indices)
        def row_body(r, _):
            @pl.when(lchunk[r] != 0)
            def _():
                rid = ichunk[r]
                row = vchunk[pl.ds(r, 1), :][:, :c]
                cur = tile[pl.ds(rid - base, 1), :]
                tile[pl.ds(rid - base, 1), :] = combine(cur, row)

            return 0

        jax.lax.fori_loop(r_lo, r_hi, row_body, 0)
        return 0

    jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)
    if cf:
        out_ref[:] = jnp.swapaxes(acc_ref[:], 0, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_segments", "op", "fill", "interpret", "channels_first"
    ),
)
def binned_segment_reduce(
    vals: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    num_segments: int,
    op: str = "add",
    fill: float = 0.0,
    interpret: bool = False,
    channels_first: bool = False,
) -> jnp.ndarray:
    """One-pass segmented reduce of sorted rows to a dense table.

    vals: (K, C) f32, sorted by ``sorted_ids``; ids outside
    [0, num_segments) are dropped.  Returns (num_segments, C) where row
    m is op-reduced over the rows with id m (``fill`` where empty); with
    ``channels_first`` the (C, num_segments) transpose instead (emitted
    directly by the kernel via per-tile VMEM transposes — see _kernel).
    """
    k, c_in = vals.shape
    ids32 = sorted_ids.astype(jnp.int32)
    # DMA slice shapes must be 128-lane aligned (Mosaic)
    c = ((c_in + 127) // 128) * 128
    if c != c_in:
        vals = jnp.pad(vals, ((0, 0), (0, c - c_in)))
    m_pad = ((num_segments + _TM - 1) // _TM) * _TM
    n_tiles = m_pad // _TM
    # pad rows so chunk DMAs of fixed _CH never run off the end
    kpad = ((k + _CH - 1) // _CH) * _CH + _CH
    vals_p = jnp.pad(vals, ((0, kpad - k), (0, 0)))
    ids_p = jnp.pad(
        ids32, (0, kpad - k), constant_values=jnp.int32(2**31 - 1)
    )
    # per-tile ranges, interleaved [c_lo, c_hi, lo, hi]: the enclosing
    # DMA-aligned chunk range + the exact row range.  ids >=
    # num_segments (padding dump rows) fall beyond the last tile, and
    # the flush guard (prev_id >= 0) never fires for empty ranges.
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * _TM
    row_bounds = jnp.searchsorted(ids_p, bounds, side="left")
    lo = row_bounds[:-1].astype(jnp.int32)
    hi = row_bounds[1:].astype(jnp.int32)
    c_lo = lo // _CH
    c_hi = (hi + _CH - 1) // _CH
    # empty tiles: no chunks at all
    c_hi = jnp.where(hi == lo, c_lo, c_hi)
    rows = jnp.stack([c_lo, c_hi, lo, hi], axis=-1).reshape(-1)

    if channels_first:
        # [A ragged (c, num_segments) output was tried to make the
        # caller's reshape free: Mosaic requires the minor block dim to
        # stay 128-aligned, and num_segments isn't — the [:, :M] slice
        # copy stays (~3 x 6.7 ms at 128^3) until the id space itself is
        # lane-aligned.]
        out_spec = pl.BlockSpec(
            (c, _TM), lambda t, rows_ref: (0, t),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((c, m_pad), jnp.float32)
        extra = [pltpu.VMEM((_TM, c), jnp.float32)]  # row-major acc
    else:
        out_spec = pl.BlockSpec(
            (_TM, c), lambda t, rows_ref: (t, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((m_pad, c), jnp.float32)
        extra = []

    import os as _os

    # Opt-in (recorded LOSS): the two-phase scan kernel measured 181.3
    # vs 171.9 ms/step at 128^3 — the rank block adds a 128-lane stream
    # to every vals DMA and the doubling passes cost more than the
    # serial row loop saves at ~4-8 rows/segment.  PFS_SCAN_REDUCE=1.
    scan_mode = _os.environ.get("PFS_SCAN_REDUCE", "0") != "0"
    if scan_mode:
        # two-phase kernel inputs: per-row segment-LAST flags (with a
        # chunk-boundary OR so chunk-split segments flush partials) and
        # the f32 segment RANK replicated into a trailing 128-lane block
        # of the vals stream (rank < K <= 2^24 so f32 is exact)
        neq = ids_p[1:] != ids_p[:-1]
        lasts = jnp.concatenate([neq, jnp.asarray([True])])
        cb = (jnp.arange(kpad, dtype=jnp.int32) % _CH) == (_CH - 1)
        lasts = (lasts | cb).astype(jnp.int32)
        first = jnp.concatenate([jnp.asarray([True]), neq])
        rank = jnp.cumsum(first.astype(jnp.float32)) - 1.0
        vals_aug = jnp.concatenate(
            [vals_p, jnp.broadcast_to(rank[:, None], (kpad, 128))],
            axis=1,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # ids
                pl.BlockSpec(memory_space=pltpu.ANY),  # lasts
                pl.BlockSpec(memory_space=pltpu.ANY),  # vals+rank
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((_CH, c + 128), jnp.float32),
                pltpu.SMEM((_CH,), jnp.int32),
                pltpu.SMEM((_CH,), jnp.int32),
                pltpu.SemaphoreType.DMA((3,)),
            ] + extra,
        )
        out = pl.pallas_call(
            functools.partial(_scan_kernel, op, fill, channels_first),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(rows, ids_p, lasts, vals_aug)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # ids in HBM
                pl.BlockSpec(memory_space=pltpu.ANY),  # vals in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((_CH, c), jnp.float32),
                pltpu.SMEM((_CH,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ] + extra,
        )
        out = pl.pallas_call(
            functools.partial(_kernel, op, fill, channels_first),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(rows, ids_p, vals_p)
    if channels_first:
        return out[:c_in, :num_segments]
    return out[:num_segments, :c_in]
