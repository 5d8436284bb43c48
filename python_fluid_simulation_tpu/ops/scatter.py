"""TPU-native particle→grid scatter machinery.

XLA lowers ``.at[].add/min`` with duplicate indices to a *sequential*
scatter loop on TPU — the moral equivalent of running the reference's
CUDA atomics one thread at a time.  This module replaces every scatter
in the engine with an all-parallel pipeline:

  1. ONE argsort of the per-particle home-cell ids (shared by all corner
     offsets, all channels of one transfer),
  2. segmented reduction over the sorted order —
     * sum: parallel cumsum + segment-boundary gather (searchsorted),
     * min: segmented associative_scan (value, id) with reset-combiner,
  3. per-corner-offset *folded shifts* of the resulting grid arrays:
     the reference clamps each corner index into [0, gres-1] per axis
     (cell 2 :128), so home ids are binned on an extended (n+2)^d grid
     covering gi ∈ [-1, n] and border planes fold into the edge cells.

Everything is O(K log K) parallel work; sorts are the only super-linear
part and one sort serves an entire transfer (16 channels for P2G, 125
for the level set).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.indexing import sample, shift

# Windowed segmented passes cover segments up to 2^_SEG_LOG2 rows.
# Segments are particles-per-cell: seeding is 2^d per cell (PDX = GDX/2)
# and the density projection clamps compression at 1.5x, so live cells
# hold ~8-12 particles in steady state — but the repo's own notes record
# funnel pile-up TRANSIENTS, and the windowed paths only run where the
# binned Pallas kernel does NOT apply (small grids, i.e. exactly the
# flagship funnel).  A cell transiently holding more than the window
# silently corrupts the windowed min/broadcast, so the default stays at
# 2^7 = 128/cell (r4 advisor low: the r4 drop to 2^6 traded silent
# corruption risk for one pass).  Padding rows never share segments with
# live particles (transfers.padding_dump_ids), so they don't inflate
# segment lengths.
import os as _os

_SEG_LOG2 = int(_os.environ.get("PFS_SEG_LOG2", "7"))
_BCAST_GATHER = _os.environ.get("PFS_BCAST_GATHER", "0") != "0"
# Binned one-pass Pallas reduce+placement (ops/pallas_binned.py); the
# kill switch keeps the pure-XLA pipeline for A/B and debugging.
_NO_BINNED = _os.environ.get("PFS_NO_BINNED", "0") != "0"


def _binned_broadcast_or_none(table, sorted_ids):
    if _NO_BINNED or _os.environ.get("PFS_NO_BINNED_BCAST", "0") != "0":
        return None
    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_broadcast_available,
        binned_segment_broadcast,
    )

    if not binned_broadcast_available(table, sorted_ids):
        return None
    return binned_segment_broadcast(table, sorted_ids)


def _binned_reduce_or_none(vals, sorted_ids, num_segments, op, fill):
    if _NO_BINNED or vals.ndim != 2:
        return None
    if _os.environ.get(f"PFS_NO_BINNED_{op.upper()}", "0") != "0":
        return None
    if _os.environ.get("PFS_NO_BINNED_C") == str(vals.shape[-1]):
        return None
    try:
        fill_c = float(fill)  # constants only (static kernel arg)
    except Exception:
        return None
    from python_fluid_simulation_tpu.ops.pallas_binned import (
        binned_reduce_available,
        binned_segment_reduce,
    )

    if not binned_reduce_available(vals, num_segments):
        return None
    return binned_segment_reduce(
        vals, sorted_ids, num_segments, op=op, fill=fill_c
    )


def sort_by_segment(ids: jnp.ndarray, *vals: jnp.ndarray):
    """Sort (ids, vals...) by ids. vals may be (K,) or (K, C)."""
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    return (sorted_ids,) + tuple(v[order] for v in vals)


def _segment_marks(sorted_ids):
    neq = sorted_ids[1:] != sorted_ids[:-1]
    first = jnp.concatenate([jnp.array([True]), neq])
    last = jnp.concatenate([neq, jnp.array([True])])
    return first, last


def _seg_scan_fwd(vals, first, op):
    """Inclusive forward segmented scan via the single-pass Pallas kernel
    (ops/pallas_segscan.py) when opted in (PFS_PALLAS_SEGSCAN=1), else
    None (callers keep the XLA masked-doubling paths).  Measured
    (segscan_micro.py): the kernel is VPU-bound and LOSES to the fused
    XLA doubling except at ~125 channels — see the module docstring —
    so the XLA formulation is the default."""
    from python_fluid_simulation_tpu.ops.pallas_segscan import (
        seg_scan_available,
        seg_scan_sorted,
    )

    if not seg_scan_available(vals):
        return None
    return seg_scan_sorted(vals, ~first, op)


def _place_at_last(values, sorted_ids, last, num_segments, fill):
    """Write each segment's value (valid at its LAST element) into a dense
    (num_segments, ...) array via a UNIQUE-index scatter: non-last
    elements get DISTINCT out-of-bounds slots and ``mode='drop'``
    discards them, so every surviving index is distinct and XLA emits a
    parallel scatter (duplicate-index scatter is sequential on TPU).
    [A previous version parked non-last rows in a (num_segments + K)
    scratch tail and sliced it off — the tail made the placement buffer
    the hottest line of the 128^3 step (68 ms across 7 placements,
    round-3 profile): +44% rows on a ~1 GB buffer plus a slice-out
    copy.]"""
    k = sorted_ids.shape[0]
    slots = jnp.where(
        last, sorted_ids, num_segments + jnp.arange(k, dtype=sorted_ids.dtype)
    )
    buf = jnp.full((num_segments,) + values.shape[1:], fill, values.dtype)
    return buf.at[slots].set(values, mode="drop", unique_indices=True)


def segment_sum_sorted(
    vals: jnp.ndarray, sorted_ids: jnp.ndarray, num_segments: int,
    widen: bool = False,
) -> jnp.ndarray:
    """Per-segment sums of already-sorted values.

    vals: (K,) or (K, C); returns (num_segments,) or (num_segments, C).
    All-parallel: cumsum + segment-start backpointers (cummax) + one
    unique-index scatter — no per-segment binary search (a dense
    searchsorted over millions of segments dominated the profile).

    ``widen=True`` pads the channel dim with zero columns to 81 when
    C <= 64 (sliced back off the result): XLA assigns the placement
    scatter a TRANSPOSED ({0,1}) layout for narrow channel counts
    (channels ride the sublane dim to make a downstream moveaxis free),
    which turns the K-row scatter into a strided-write disaster —
    measured 61 ms/step at 128^3 for the 54-column density placement vs
    ~6 ms for the >=81-column row-major form.  The lane dim pads 54 and
    81 to 128 alike, so the spare columns are free everywhere en route.

    On TPU the whole reduce+placement runs as ONE streaming pass via the
    binned Pallas kernel (ops/pallas_binned.py) — measured 104x the XLA
    multi-pass pipeline at 128^3 shapes (0.36 vs 37 ms for the level-set
    min) — with the XLA formulation as the CPU/fallback path.
    """
    out = _binned_reduce_or_none(vals, sorted_ids, num_segments, "add", 0.0)
    if out is not None:
        return out
    k = sorted_ids.shape[0]
    n_real = None
    if widen and vals.ndim == 2 and vals.shape[-1] <= 64:
        n_real = vals.shape[-1]
        vals = jnp.concatenate(
            [vals, jnp.zeros((k, 81 - n_real), vals.dtype)], axis=-1
        )
    first, last = _segment_marks(sorted_ids)
    totals = _seg_scan_fwd(vals, first, "add") if vals.ndim == 2 else None
    if totals is None:
        c = jnp.cumsum(vals, axis=0)
        start_idx = jax.lax.cummax(
            jnp.where(first, jnp.arange(k, dtype=jnp.int32), 0)
        )
        base = jnp.take(c, jnp.maximum(start_idx - 1, 0), axis=0)
        base = jnp.where(_bcast(start_idx > 0, base), base, 0.0)
        totals = c - base
    out = _place_at_last(totals, sorted_ids, last, num_segments, 0.0)
    if n_real is not None:
        out = out[:, :n_real]
    return out


def segment_min_sorted(
    vals: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    num_segments: int,
    fill,
    max_segment_log2: int | None = None,
) -> jnp.ndarray:
    """Per-segment minima of already-sorted values, CLAMPED at ``fill``:
    row m of the result is ``min(fill, min over segment m)``.

    The clamp is the contract on every route (r4 advisor low: the binned
    kernel init-at-fill clamps non-empty segments at fill while the old
    XLA path returned true minima above it, so TPU and CPU could return
    different far-field values).  It matches the reference's
    background-initialised ``atomic.min`` scatter exactly (cell 4 :288:
    phi starts at 3*gdx and only ever goes DOWN), which is the one
    consumer whose semantics matter — the level set.

    Windowed masked suffix-min: pass k folds vals[i+2^k] into vals[i]
    when both belong to the same segment; after K passes the FIRST
    element of each segment holds the min of its first 2^K elements.
    Segments here are particles-per-cell — bounded by ~tens (the density
    projection clamps compression at 1.5x, seeding is 2^d per cell), so
    the default _SEG_LOG2 window (exact for <= 2^_SEG_LOG2 per cell)
    costs that many memory passes instead of the log2(N)≈19 a global
    associative_scan needs.
    """
    if max_segment_log2 is None:
        max_segment_log2 = _SEG_LOG2
    out = _binned_reduce_or_none(
        vals, sorted_ids, num_segments, "min", fill
    )
    if out is not None:
        # binned kernel: exact for ANY segment length (no window cap);
        # clamp-at-fill is inherent (tiles init at fill, min-accumulate)
        return out
    # clamp first so every route agrees with the binned kernel
    vals = jnp.minimum(vals, jnp.asarray(fill, vals.dtype))
    first, last = _segment_marks(sorted_ids)
    if vals.ndim == 2:
        scanned = _seg_scan_fwd(vals, first, "min")
        if scanned is not None:
            # forward min-scan: the LAST row of each segment holds the
            # min of the WHOLE segment (no 2^K window cap)
            return _place_at_last(
                scanned, sorted_ids, last, num_segments, fill
            )
    K = max_segment_log2
    ids = sorted_ids
    for k in range(K):
        s = 1 << k
        nvals = shift(vals, (s,) + (0,) * (vals.ndim - 1), fill)
        nids = shift(ids, (s,), -1)
        same = _bcast(nids == ids, vals)
        vals = jnp.where(same, jnp.minimum(vals, nvals), vals)
    return _place_at_first(vals, sorted_ids, first, num_segments, fill)


def segment_broadcast_sorted(
    table: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    max_segment_log2: int | None = None,
) -> jnp.ndarray:
    """Gather-free ``out[i] = table[sorted_ids[i]]`` for sorted ids.

    The inverse of `segment_sum_sorted`: broadcast one dense row per
    segment to every element of that segment.  Per-corner ``lax.gather``
    of grid values onto particles is row-bound on TPU (~tens of useful
    bytes per gathered row; measured 40% of the 128^3 step, round-2
    profile) — this replaces it with all-parallel primitives:

      1. one unique-index scatter records each segment's FIRST element
         position (empty segments get out-of-bounds slots),
      2. one unique-index scatter places each non-empty segment's table
         row at that position (``mode='drop'`` discards empty segments),
      3. a segmented Hillis-Steele prefix sum (masked doubling shifts)
         propagates the row down the segment — exact because only the
         first row of each segment is non-zero.

    table: (num_segments, C); sorted_ids: (K,) non-decreasing in
    [0, num_segments).  Returns (K, C).  Segments longer than
    2**max_segment_log2 are NOT fully filled — particles-per-cell is
    bounded by seeding (2^d/cell) and the density projection's 1.5x
    compression clamp, so the default _SEG_LOG2=6 (64/cell) is generous
    (same bound as `segment_min_sorted`).

    Route choice: the scatter+scan path reads the FULL table once (the
    placement scatter streams all M rows), the row-gather path reads K
    random 512 B rows.  Measured at the step level: broadcast wins at
    128^3 (M ~= 2.3 K: 220 vs 230 ms/step), gather wins when the table
    dwarfs the particle set (coiling_504: M ~= 19 K — the two table
    scans were 157 ms/step).  Auto-switch at M > 4 K;
    PFS_BCAST_GATHER=1 forces the gather everywhere.
    """
    if max_segment_log2 is None:
        max_segment_log2 = _SEG_LOG2
    k = sorted_ids.shape[0]
    if _BCAST_GATHER or table.shape[0] > 4 * k:
        # out-of-range ids (padding dump rows) read as zeros
        return jnp.take(
            table, sorted_ids, axis=0, mode="fill", fill_value=0.0
        )
    # big tables: ONE streaming Pallas pass (the reduce's mirror image)
    # instead of 2 unique-index scatters + a 6-7 pass masked-doubling
    # scan — measured 30 -> 5.6 ms/step of broadcast machinery at 128^3
    out = _binned_broadcast_or_none(table, sorted_ids)
    if out is not None:
        return out
    num_segments = table.shape[0]
    first, _ = _segment_marks(sorted_ids)
    # segment-first positions, per segment id.  Non-first elements park
    # in a scratch tail so indices stay unique (parallel scatter); empty
    # segments keep the out-of-bounds init `k` and drop in step 2.
    slots = jnp.where(
        first, sorted_ids, num_segments + jnp.arange(k, dtype=sorted_ids.dtype)
    )
    pos = (k + jnp.arange(num_segments, dtype=jnp.int32)).at[slots].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    vals = jnp.zeros((k,) + table.shape[1:], table.dtype)
    vals = vals.at[pos].set(table, mode="drop", unique_indices=True)
    # segmented inclusive prefix sum: within a segment only the first
    # row is non-zero, so the scan result IS the broadcast (bit-exact
    # in any order).  Single-pass Pallas scan when available.
    if vals.ndim == 2:
        scanned = _seg_scan_fwd(vals, first, "add")
        if scanned is not None:
            return scanned
    for p in range(max_segment_log2):
        s = 1 << p
        nvals = shift(vals, (-s,) + (0,) * (vals.ndim - 1), 0.0)
        nids = shift(sorted_ids, (-s,), -1)
        vals = vals + jnp.where(_bcast(nids == sorted_ids, vals), nvals, 0.0)
    return vals


def segment_reduce_cf(
    vals: jnp.ndarray,
    sorted_ids: jnp.ndarray,
    num_segments: int,
    grid_shape: Sequence[int],
    op: str = "add",
    fill=0.0,
) -> jnp.ndarray:
    """Segmented reduce emitted CHANNELS-FIRST: (C, *grid_shape).

    On the binned TPU route the kernel writes the transposed table
    directly (per-tile VMEM transposes — ops/pallas_binned._kernel cf
    mode), so the separate ``channels_first`` moveaxis (a full HBM
    (M, C) -> (C, M) transpose, 20.8 ms/step at 128^3, round-4 profile)
    never runs.  Falls back to reduce + moveaxis elsewhere.
    """
    if not (_NO_BINNED
            or _os.environ.get(f"PFS_NO_BINNED_{op.upper()}", "0") != "0"
            or _os.environ.get("PFS_NO_BINNED_CF", "0") != "0"
            or vals.ndim != 2):
        try:
            fill_c = float(fill)
        except Exception:
            fill_c = None
        if fill_c is not None:
            from python_fluid_simulation_tpu.ops.pallas_binned import (
                binned_reduce_available,
                binned_segment_reduce,
            )

            if binned_reduce_available(vals, num_segments):
                out = binned_segment_reduce(
                    vals, sorted_ids, num_segments, op=op, fill=fill_c,
                    channels_first=True,
                )
                return out.reshape(
                    (vals.shape[-1],) + tuple(grid_shape)
                )
    if op == "add":
        seg = segment_sum_sorted(
            vals, sorted_ids, num_segments, widen=True
        )
    else:
        seg = segment_min_sorted(vals, sorted_ids, num_segments, fill)
    return channels_first(seg, grid_shape)


def unsort_rows(values: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """Invert a sort permutation: out[order[i]] = values[i].

    values: (K, C).  Same narrow-channel layout trap as
    `segment_sum_sorted`: XLA gives the (K, C<=64) permutation scatter a
    transposed {0,1} layout (measured 16 ms/step for the C=12 G2P unsort
    at 128^3); zero-padding the channels to 81 forces the row-major form
    (~free: the lane dim pads to 128 either way).
    """
    k, c = values.shape
    n_real = None
    if c <= 64:
        n_real = c
        values = jnp.concatenate(
            [values, jnp.zeros((k, 81 - c), values.dtype)], axis=-1
        )
    out = jnp.zeros_like(values).at[order].set(
        values, unique_indices=True
    )
    if n_real is not None:
        out = out[:, :n_real]
    return out


def _place_at_first(values, sorted_ids, first, num_segments, fill):
    # tail-free placement: see _place_at_last
    k = sorted_ids.shape[0]
    slots = jnp.where(
        first, sorted_ids, num_segments + jnp.arange(k, dtype=sorted_ids.dtype)
    )
    buf = jnp.full((num_segments,) + values.shape[1:], fill, values.dtype)
    return buf.at[slots].set(values, mode="drop", unique_indices=True)


def _bcast(cond, like):
    if like.ndim > cond.ndim:
        # broadcast FULLY: an (K,1) intermediate tiles to (K,128) on TPU
        # (128x padding waste — observed as HBM OOM at 128^3); (K,C)
        # pads to the next lane multiple only
        cond = jnp.broadcast_to(
            cond.reshape(cond.shape + (1,) * (like.ndim - cond.ndim)),
            like.shape,
        )
    return cond


def home_ids_extended(gi: jnp.ndarray, gres: Sequence[int]) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Linear ids of (possibly out-of-range) home cells on the extended
    (n+2)^d grid covering gi ∈ [-1, n] per axis."""
    d = gi.shape[-1]
    ext = tuple(int(n) + 2 for n in gres)
    hi = jnp.asarray([n + 1 for n in gres], dtype=gi.dtype)
    g = jnp.clip(gi + 1, 0, hi)
    idx = g[:, 0]
    for k in range(1, d):
        idx = idx * ext[k] + g[:, k]
    return idx, ext


def fold_scattered(
    seg: jnp.ndarray,
    shifts,
    out_shape: Sequence[int],
    combine: str = "add",
    fill=0.0,
) -> jnp.ndarray:
    """Combine per-corner segment grids onto clipped targets in ONE fold.

    seg: (K, G...) — K corner channels LEADING (slicing a minor/lane
    channel dim costs a relayout per channel on TPU — measured 16x
    blowup of this op); channel k contributes to target
    u = grid_index + shifts[k] (un-clipped), and the final cell is
    t = clip(u, 0, out_n-1).  All channels accumulate on a
    target-extended grid first (pure pad+slice), then a single
    `fold_clip` resolves the border clamping — keeping the HLO graph
    ~K× smaller than folding each corner separately.
    """
    d = len(out_shape)
    min_s = [min(s[a] for s in shifts) for a in range(d)]
    max_s = [max(s[a] for s in shifts) for a in range(d)]
    T = tuple(
        seg.shape[1 + a] + max_s[a] - min_s[a] for a in range(d)
    )
    from python_fluid_simulation_tpu.ops.indexing import sample

    acc = None
    for k, s in enumerate(shifts):
        off = tuple(min_s[a] - s[a] for a in range(d))
        piece = sample(seg[k], off, T, fill)
        if acc is None:
            acc = piece
        elif combine == "add":
            acc = acc + piece
        else:
            acc = jnp.minimum(acc, piece)
    return fold_clip(acc, tuple(min_s), out_shape, combine, fill)


import os

# Opt-in: the Pallas fold is bit-exact but measured perf-neutral in
# isolation and slightly slower end-to-end (pallas_fold.py docstring).
_FOLD_PALLAS = os.environ.get("PFS_PALLAS_FOLD", "0") != "0"


def fold_scattered_sep(
    seg: jnp.ndarray,
    axis_shifts,
    out_shape: Sequence[int],
    combine: str = "add",
    fill=0.0,
    noclip_axes: Sequence[int] = (),
) -> jnp.ndarray:
    """`fold_scattered` for a CARTESIAN-PRODUCT shift set, folded
    separably: channel k = lexicographic product(axis_shifts) index.

    Folding axis-by-axis on whole channel BLOCKS emits sum(len(s_a))
    pad/slice pieces instead of prod(len(s_a)) — e.g. the 5^3 level-set
    fold drops from 125 whole-grid pieces to 15.  [Each materialised
    pad/slice costs ~0.15 ms of async DMA at 128^3 regardless of size;
    ~1000 of them per step made the fused step DMA-bound — measured.]
    """
    d = len(out_shape)
    sizes = [len(s) for s in axis_shifts]
    n_ch = 1
    for s in sizes:
        n_ch *= s
    assert seg.shape[0] == n_ch, (seg.shape, sizes)
    if _FOLD_PALLAS:
        from python_fluid_simulation_tpu.ops.pallas_fold import (
            fold_pallas_available,
            fold_scattered_sep_pallas,
        )

        if fold_pallas_available(
            seg.shape, out_shape, axis_shifts, noclip_axes
        ):
            return fold_scattered_sep_pallas(
                seg, axis_shifts, out_shape, combine, fill
            )
    min_s = [min(s) for s in axis_shifts]
    max_s = [max(s) for s in axis_shifts]
    cur = seg.reshape(tuple(sizes) + seg.shape[1:])
    for a in range(d):
        # cur dims: (s_a, s_{a+1}, .., s_{d-1}, T_0..T_{a-1}, X_a, .., X_{d-1})
        # -> the spatial axis to shift is ALWAYS at index d
        t_a = cur.shape[d] + max_s[a] - min_s[a]
        acc = None
        for i, s in enumerate(axis_shifts[a]):
            tgt = list(cur.shape[1:])
            tgt[d - 1] = t_a
            off = [0] * len(tgt)
            off[d - 1] = min_s[a] - s
            piece = sample(cur[i], tuple(off), tuple(tgt), fill)
            if acc is None:
                acc = piece
            elif combine == "add":
                acc = acc + piece
            else:
                acc = jnp.minimum(acc, piece)
        cur = acc
    return fold_clip(
        cur, tuple(min_s), out_shape, combine, fill, noclip_axes
    )


def channels_first(seg_mc: jnp.ndarray, grid_shape: Sequence[int]) -> jnp.ndarray:
    """(M, C) segment table -> (C, *grid_shape) channel-major grids.

    Fallback hop only: the TPU path gets the channel-major table
    straight from the binned reduce kernel (`segment_reduce_cf`), which
    transposes tiles in VMEM.  [The round-4 standalone Pallas transpose
    kernel was DELETED in round 5: it lost 444 vs 220 ms/step at 128^3
    — the pallas_call boundary broke XLA's producer/consumer fusion
    around the hop — and the cf reduce obsoletes it.]"""
    return jnp.moveaxis(seg_mc, -1, 0).reshape(
        (seg_mc.shape[-1],) + tuple(grid_shape)
    )


def fold_clip(
    field: jnp.ndarray,
    shifts: Sequence[int],
    out_shape: Sequence[int],
    combine: str = "add",
    fill=0.0,
    noclip_axes: Sequence[int] = (),
) -> jnp.ndarray:
    """Redistribute `field` onto targets t = clip(c + shift, 0, out_n-1)
    per axis, reducing all clipped planes into the edge rows.

    This reproduces the reference's per-corner border clamping
    (``max(0, min(gres-1, gi + offs))``, cell 2 :128) as a dense slicing
    operation.  Separable (the clip is per-axis independent), so axes
    fold sequentially.  Targets no source plane reaches get `fill`.
    Trailing dims of `field` beyond len(shifts) are channels.

    Axes in ``noclip_axes`` are returned EXTENDED (the accumulated
    field's full extent, no border clamping; out_shape's entry for such
    an axis must equal the extended size) — the spatially-sharded
    transfers clamp only at true domain boundaries and hand interior
    border planes to the neighbouring shard instead (parallel/
    particles.py halo folds).
    """
    out = field
    for axis, (s, out_n) in enumerate(zip(shifts, out_shape)):
        if axis in noclip_axes:
            assert out.shape[axis] == out_n, (out.shape, axis, out_n)
            continue
        s = int(s)
        n = out.shape[axis]

        def take(a, b):
            return jax.lax.slice_in_dim(out, a, b, axis=axis)

        def reduce_planes(planes):
            if combine == "add":
                return jnp.sum(planes, axis=axis, keepdims=True)
            return jnp.min(planes, axis=axis, keepdims=True)

        def fill_plane(k, ref):
            shape = list(ref.shape)
            shape[axis] = k
            return jnp.full(shape, fill, dtype=ref.dtype)

        # source groups: [0, L) -> t=0;  [L, R) -> t=c+s;  [R, n) -> t=out_n-1
        L = min(max(1 - s, 0), n)
        R = min(max(out_n - 1 - s, 0), n)
        R = max(R, L)
        pieces = []
        pieces.append(reduce_planes(take(0, L)) if L > 0 else fill_plane(1, out))
        pre_gap = (L + s - 1) if L > 0 else (0 + s - 1)
        pre_gap = max(0, min(out_n - 2, pre_gap))
        if pre_gap:
            pieces.append(fill_plane(pre_gap, out))
        if R > L:
            pieces.append(take(L, R))
        post_gap = (out_n - 1) - ((R + s) if R > L else (1 + pre_gap))
        post_gap = max(0, post_gap)
        if post_gap:
            pieces.append(fill_plane(post_gap, out))
        pieces.append(
            reduce_planes(take(R, n)) if R < n else fill_plane(1, out)
        )
        out = jnp.concatenate(pieces, axis=axis)
        assert out.shape[axis] == out_n, (out.shape, axis, out_n, s)
    return out
