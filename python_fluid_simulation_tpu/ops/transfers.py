"""APIC particle↔grid transfers (P2G / G2P), dimension-generic.

TPU-native replacement for the reference's notebook cells 2-3
(`3D_viscous_fluid_sim.ipynb` :94-223): per-axis trilinear scatter of
particle momentum with the APIC affine term, and the gather that rebuilds
particle velocity + affine-gradient rows.

Reference uses CUDA atomics (cell 2 :161-162); here scatters are XLA
``.at[].add`` — a single sorted segmented reduction per target array,
deterministic by construction (SURVEY §5 race-detection note).  The 2^d
corner contributions are concatenated into ONE scatter per output so XLA
sees a single op instead of 8.

Faithful reference quirks preserved:
  * corner indices are clamped to ``gres - 1`` per axis — the *base* grid
    resolution — even on the face-extended axis whose array has gres+1
    entries, so the trailing face plane never receives mass (cell 2 :128).
  * weights use the |gx - x| formula with the lower-corner bias
    (cell 2 :117-123).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class SortInfo(NamedTuple):
    """A cell-sort of the particle set, reusable across transfers.

    One argsort serves P2G *and* G2P (same positions: the step moves
    particles only in advection and the density apply, both before P2G),
    and likewise the density mass scatter and its displacement gather.
    ``px_sorted`` rides the payload take of the producing scatter so the
    consumer never re-gathers positions.
    """

    sorted_ids: jnp.ndarray  # (K,) non-decreasing extended-grid cell ids
    order: jnp.ndarray  # (K,) permutation: sorted[i] = orig[order[i]]
    ext: Tuple[int, ...]  # extended grid shape the ids index
    px_sorted: jnp.ndarray  # (K, d) positions in sorted order


def _corner_setup(px, bound_min, cell_size, bias):
    """gi (lower corner index), disp = gx - x, w = |disp| / h."""
    bmin = jnp.asarray(bound_min, dtype=px.dtype)
    h = jnp.asarray(cell_size, dtype=px.dtype)
    b = jnp.asarray(bias, dtype=px.dtype)
    gi = jnp.floor((px - bmin) / h - b).astype(jnp.int32)
    gx = (gi.astype(px.dtype) + b) * h + bmin
    disp = gx - px
    w = jnp.abs(disp) / h
    return gi, disp, w


def _corner_weight(w, offs):
    """weight_d = offs_d + (-1)^offs_d (1 - w_d), multiplied over d."""
    out = None
    for d, o in enumerate(offs):
        wd = (1.0 - w[:, d]) if o == 0 else w[:, d]
        out = wd if out is None else out * wd
    return out


def _flat_index(gi_corner, shape):
    idx = gi_corner[:, 0]
    for d in range(1, len(shape)):
        idx = idx * shape[d] + gi_corner[:, d]
    return idx


def padding_dump_ids(ids, pm, grid_shape):
    """Redirect zero-mass padding rows to DISTINCT out-of-range segment
    ids (scatters drop them; argsort puts them last).

    Padding particles (the engine-wide m=0 convention for sharded /
    bucketed particle arrays) all share one position, so they would form
    one giant segment at that home cell.  Segment SUMS are exact at any
    length (their channel values are zero anyway), but the windowed
    level-set min (`segment_min_sorted`) and the grid→particle segment
    broadcast (`segment_broadcast_sorted`) only fill the first
    2^max_segment_log2 rows of a segment — a LIVE particle sorted behind
    hundreds of padding rows in the same cell was silently starved.
    """
    if pm is None:
        return ids
    size = 1
    for s in grid_shape:
        size *= int(s)
    k = ids.shape[0]
    dump = size + k + jnp.arange(k, dtype=ids.dtype)
    return jnp.where(pm > 0, ids, dump)


def p2g_axis(
    px: jnp.ndarray,
    pm: jnp.ndarray,
    pv: jnp.ndarray,
    pc_a: jnp.ndarray,
    axis: int,
    gres: Sequence[int],
    face_shape: Sequence[int],
    bias: Sequence[float],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter mass & momentum of one velocity component to its face grid.

    Reference: p2g_particle + p2g_grid (cell 2 :96-177).
    Returns (gm, gv) of `face_shape`; gv already divided by mass.
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        home_ids_extended,
        segment_sum_sorted,
        sort_by_segment,
    )

    d = px.shape[-1]
    gi, disp, w = _corner_setup(px, bound_min, cell_size, bias)

    # per-corner channels (weight*m, weight*m*(v+cv)) — 2^d corners x 2
    corners = list(itertools.product((0, 1), repeat=d))
    chans = []
    for offs in corners:
        weight = _corner_weight(w, offs)
        # APIC affine term: cv = Σ_d (disp_d + offs_d h_d) c_a[:, d]
        off_h = jnp.asarray(
            [o * h for o, h in zip(offs, cell_size)], dtype=px.dtype
        )
        cv = jnp.sum((disp + off_h) * pc_a, axis=-1)
        chans.append(weight * pm)
        chans.append(weight * pm * (pv[:, axis] + cv))
    vals = jnp.stack(chans, axis=-1)  # (N, 2^d * 2)

    # ONE sort by home cell (extended grid covers gi in [-1, gres]) and
    # one segmented sum for all channels; per-corner grids then fold onto
    # the face array with the reference's border clamping to gres-1
    ids, ext = home_ids_extended(gi, gres)
    sorted_ids, sorted_vals = sort_by_segment(ids, vals)
    size = 1
    for s in ext:
        size *= s
    seg = segment_sum_sorted(sorted_vals, sorted_ids, size, widen=True)
    seg_cf = channels_first(seg, ext)

    base_shape = tuple(gres)
    gm = fold_scattered_sep(
        seg_cf[0::2], [(-1, 0)] * d, base_shape, "add", 0.0
    )
    gv_m = fold_scattered_sep(
        seg_cf[1::2], [(-1, 0)] * d, base_shape, "add", 0.0
    )
    # place onto the face array: the trailing face plane never receives
    # mass (reference clamps corner indices to gres-1, cell 2 :128)
    pad = [(0, face_shape[i] - base_shape[i]) for i in range(d)]
    gm = jnp.pad(gm, pad)
    gv_m = jnp.pad(gv_m, pad)
    gv = jnp.where(gm > 0, gv_m / jnp.where(gm > 0, gm, 1.0), 0.0)
    return gm, gv


def _p2g_channels(px, pm, pv, pc, biases, bound_min, cell_size, volume):
    """Per-particle channel blocks shared by `p2g_all` and the sharded
    bucketed path (parallel/particles.py): all axes' (mass, momentum)
    corner channels rebased onto the bias-0 home + optional dual-lattice
    volume channels.  Returns (blocks, specs, vol_rs, gi0).

    Channel construction is VECTORIZED over the channel dim: (K, n_ch)
    blocks, never (K,) columns — a python-per-channel loop left ~135
    separately-materialised f32[K,1] buffers in a standalone jit, each
    lane-padded 128x (23 GB of HBM at 356k particles; inside the fused
    step XLA fuses them away, but the program must stand alone too).
    """
    d = px.shape[-1]
    h = jnp.asarray(cell_size, dtype=px.dtype)
    gi0, _, w0 = _corner_setup(px, bound_min, cell_size, (0.0,) * d)

    # Every intermediate is 2D (K, C): (K, C, d) arrays tile the minor
    # d=3 dim to 128 lanes on TPU (42x padding waste — round-4 profile,
    # see _g2p_reduce)
    blocks = []
    specs = []  # (axis, channel_offset_tuple) per PAIR of channels
    for a in range(d):
        gi_a, disp_a, w_a = _corner_setup(
            px, bound_min, cell_size, biases[a]
        )
        delta = gi_a - gi0  # in {-1, 0} per axis, exact
        offs_range = [
            (-1, 0, 1) if biases[a][dd] != 0.0 else (0, 1)
            for dd in range(d)
        ]
        coffs_list = list(itertools.product(*offs_range))
        specs += [(a, coffs) for coffs in coffs_list]
        weight = None
        cv = None  # APIC affine term Σ_dd (disp_dd + o_dd h_dd) c[a, dd]
        for dd in range(d):
            off_col = jnp.asarray(
                [o[dd] for o in coffs_list], jnp.int32
            )[None, :]
            o = off_col - delta[:, dd][:, None]  # (K, C)
            w_col = w_a[:, dd][:, None]
            wd = jnp.where(
                o == 0, 1.0 - w_col, jnp.where(o == 1, w_col, 0.0)
            )
            weight = wd if weight is None else weight * wd
            term = (
                disp_a[:, dd][:, None] + o.astype(px.dtype) * h[dd]
            ) * pc[:, a, dd][:, None]
            cv = term if cv is None else cv + term
        m_blk = weight * pm[:, None]
        v_blk = m_blk * (pv[:, a][:, None] + cv)
        # interleave [m0, v0, m1, v1, ...] to match `specs` pairing
        blocks.append(
            jnp.stack([m_blk, v_blk], axis=-1).reshape(
                px.shape[0], 2 * len(coffs_list)
            )
        )
    vol_rs = []
    if volume is not None:
        pvol, fine_cell_size = volume
        two_w = 2.0 * w0
        s_fine = jnp.floor(two_w).astype(jnp.int32)  # in {0, 1}
        frac_f = two_w - s_fine
        pv_vol = pvol * (pm > 0)  # zero-mass particles are padding
        vol_rs = list(itertools.product((0, 1, 2), repeat=d))
        ua_prod = None
        for dd in range(d):
            r_col = jnp.asarray(
                [r[dd] for r in vol_rs], jnp.int32
            )[None, :]
            s_col = s_fine[:, dd][:, None]
            f_col = frac_f[:, dd][:, None]
            ua = jnp.where(
                s_col == r_col, 1.0 - f_col,
                jnp.where(s_col + 1 == r_col, f_col, 0.0),
            )
            ua_prod = ua if ua_prod is None else ua_prod * ua
        blocks.append(ua_prod * pv_vol[:, None])
    return blocks, specs, vol_rs, gi0


def _group_threshold() -> int:
    import os

    return int(os.environ.get("PFS_GROUP_CELLS", 4_000_000))


def make_sort_info(px, pm, gres, bound_min, cell_size) -> "SortInfo":
    """One bias-0 home-cell sort over `px`, shareable by every consumer
    of the same positions: `p2g_all` (pass as ``sort_info``), G2P, and
    `ops.levelset.compute_fluid_levelset` — the level set's clipped
    home-cell key is a monotone map of the extended-grid key, so the
    same permutation leaves its ids non-decreasing.  The step uses this
    to run the post-displacement level-set rebuild and P2G off a single
    argsort (four per-step particle sorts -> two)."""
    from python_fluid_simulation_tpu.ops.scatter import (
        home_ids_extended,
    )

    d = px.shape[-1]
    gi0, _, _ = _corner_setup(px, bound_min, cell_size, (0.0,) * d)
    ids, ext = home_ids_extended(gi0, gres)
    ids = padding_dump_ids(ids, pm, ext)
    order = jnp.argsort(ids)
    return SortInfo(
        sorted_ids=ids[order], order=order, ext=ext, px_sorted=px[order]
    )


def p2g_all(
    px: jnp.ndarray,
    pm: jnp.ndarray,
    pv: jnp.ndarray,
    pc: jnp.ndarray,
    gres: Sequence[int],
    face_shapes: Sequence[Sequence[int]],
    biases: Sequence[Sequence[float]],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
    volume=None,
    with_sort_info: bool = False,
    sort_info: "SortInfo | None" = None,
    mass_floor: float = 0.0,
):
    """All axes' P2G in ONE sort + segmented sum + dense placement.

    ``mass_floor`` (engine passes 1e-7x one particle mass) floors the
    momentum/mass division denominator: a face carrying less than that
    is numerically empty, and dividing by the EXACT tiny mass amplifies
    fp32 summation noise (~eps*pm*v absolute) by up to ~1e5*vmax —
    measured as Inf/NaN blow-ups at the funnel pile-up once the binned
    reduce kernel removed the XLA cumsum's accidental noise floor.
    With the floor, |gv| <= max|particle v| always (|gv_m| <= gm*vmax).
    Default 0.0 keeps the reference's exact `m > 0` semantics for
    oracle tests (docs/PARITY.md divergence #9).

    Numerically equivalent to three `p2g_axis` calls (same kernels,
    cell 2 :96-177) up to summation order: every axis' staggered home
    cell is rebased onto the bias-0 home b0 = floor(t) — exact, since
    floor(t - 0.5) in {b0 - 1, b0} — so one sort over b0-ids serves all
    axes, with the corner offsets widened to {-1,0,1} on biased axes
    (weights vanish on the inapplicable offset).  Why: the TPU scatter
    underlying the dense placement costs ~18 ms per call at 128^3
    (row-bound, not byte-bound, measured); one 108-channel scatter
    replaces three 16-channel ones.

    ``pc`` is the full (K, d, d) affine matrix (rows = components).
    Returns (gm_list, gv_list) on the face shapes.

    ``volume=(pvol, fine_cell_size)`` additionally emits the dual-lattice
    fluid-volume field as parity-class grids (see
    `ops/levelset.compute_fluid_volume_classes`) from the SAME sort and
    the SAME dense placement — the fine home is derived from the bias-0
    fractional position (s = floor(2*w0)), so the volume channels ride
    the p2g scatter for free; returns (gm_list, gv_list, vol_classes).
    [A standalone 27-channel placement was assigned a transposed layout
    by XLA and cost 47 ms/step at 128^3; appended to the 108-channel
    p2g placement the whole thing is ~5 ms.]
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered_sep,
        home_ids_extended,
        segment_reduce_cf,
        sort_by_segment,
    )

    d = px.shape[-1]

    # sort the RAW particle payload (17 columns: x, m, v, c) and build
    # the ~135 scatter channels from the sorted arrays — the take moves
    # 8x fewer bytes than reordering a prebuilt channel matrix, and the
    # (K, 135) matrix is never materialised twice
    if sort_info is None:
        gi0, _, _ = _corner_setup(px, bound_min, cell_size, (0.0,) * d)
        ids, ext = home_ids_extended(gi0, gres)
        ids = padding_dump_ids(ids, pm, ext)
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        px_s = px[order]
    else:
        sorted_ids, order, ext, px_s = sort_info
    # ONE payload take: each permutation gather is row-bound (~4-36
    # useful bytes/row), so (m, v, c) ride a single (K, 13) gather
    # instead of three
    n_p = px.shape[0]
    payload = jnp.concatenate(
        [pm[:, None], pv, pc.reshape(n_p, -1)], axis=-1
    )
    pay_s = payload[order]
    pm_s = pay_s[:, 0]
    pv_s = pay_s[:, 1 : 1 + d]
    pc_s = pay_s[:, 1 + d :].reshape(n_p, d, d)
    blocks, specs, vol_rs, _ = _p2g_channels(
        px_s, pm_s, pv_s, pc_s, biases, bound_min, cell_size, volume
    )
    sorted_vals = jnp.concatenate(blocks, axis=-1)
    if with_sort_info and sort_info is None:
        sort_info = SortInfo(
            sorted_ids=sorted_ids,
            order=order,
            ext=ext,
            px_sorted=px_s,
        )
    size = 1
    for s in ext:
        size *= s
    # Big grids: the merged placement's (cells, channels) scatter buffer
    # is the peak allocation of the whole step — at 8.4M cells the full
    # 135-channel table is 4.4 GB logical and lane-padding rounds the
    # channel dim to 256 (8.8 GB).  Above ~4M segments, run the
    # segmented sum per CONSUMER GROUP (one axis / the volume classes)
    # over the SAME sort: the per-group buffers are sequential in
    # liveness, so XLA reuses one ~(cells, 128-lane) allocation
    # (coiling-512 went from 22 GB/OOM to fitting a 16 GB chip).
    grouped = size >= _group_threshold()
    if grouped:

        def group_cf(cols):
            sub = sorted_vals[:, jnp.asarray(cols)]
            return segment_reduce_cf(sub, sorted_ids, size, ext)

    else:
        # one merged placement for all 135 channels.  [Splitting on the
        # 128-lane tile boundary (108 p2g + 27 volume) was tried and
        # LOST (366 vs 351 ms/step at 128^3): the scatter is row-bound,
        # so two K-row scatters cost more than one wider one.]
        seg_cf = segment_reduce_cf(sorted_vals, sorted_ids, size, ext)

        def group_cf(cols):
            return seg_cf[jnp.asarray(cols)]

    base_shape = tuple(gres)
    gms, gvs = [], []
    for a in range(d):
        idxs = [j for j, (aa, _) in enumerate(specs) if aa == a]
        # channel order is product(*offs_range) -> separable fold
        axis_shifts = [
            tuple(c - 1 for c in ((-1, 0, 1) if biases[a][dd] != 0.0
                                  else (0, 1)))
            for dd in range(d)
        ]
        n_a = len(idxs)
        cf_a = group_cf(
            [2 * j for j in idxs] + [2 * j + 1 for j in idxs]
        )
        m_ch, v_ch = cf_a[:n_a], cf_a[n_a:]
        gm = fold_scattered_sep(m_ch, axis_shifts, base_shape, "add", 0.0)
        gv_m = fold_scattered_sep(
            v_ch, axis_shifts, base_shape, "add", 0.0
        )
        pad = [
            (0, face_shapes[a][i] - base_shape[i]) for i in range(d)
        ]
        gm = jnp.pad(gm, pad)
        gv_m = jnp.pad(gv_m, pad)
        den = (
            jnp.maximum(gm, mass_floor) if mass_floor
            else jnp.where(gm > 0, gm, 1.0)
        )
        gv = jnp.where(gm > 0, gv_m / den, 0.0)
        gms.append(gm)
        gvs.append(gv)
    if volume is None:
        if with_sort_info:
            return gms, gvs, sort_info
        return gms, gvs

    n_p2g = 2 * len(specs)
    fine_vol = 1.0
    for c in volume[1]:
        fine_vol *= c
    vol_cf = group_cf(list(range(n_p2g, n_p2g + len(vol_rs))))
    classes = {}
    for p in itertools.product((0, 1), repeat=d):
        class_res = tuple(
            int(n) + 1 if pp == 0 else int(n) for n, pp in zip(gres, p)
        )
        sel = [
            i for i, r in enumerate(vol_rs)
            if all(ra % 2 == pa for ra, pa in zip(r, p))
        ]
        axis_shifts = [(-1, 0) if pp == 0 else (-1,) for pp in p]
        sub = vol_cf[jnp.asarray(sel)]
        vol = fold_scattered_sep(sub, axis_shifts, class_res, "add", 0.0)
        classes[p] = jnp.minimum(vol, fine_vol)
    if with_sort_info:
        return gms, gvs, classes, sort_info
    return gms, gvs, classes


def _g2p_offsets(biases, d):
    """Corner-offset channel lists per axis, rebased onto the bias-0
    home (biased dims widen to {-1,0,1})."""
    out = []
    for a in range(d):
        offs_range = [
            (-1, 0, 1) if biases[a][k] != 0.0 else (0, 1) for k in range(d)
        ]
        out.append(list(itertools.product(*offs_range)))
    return out


def _g2p_reduce(vals, px_s, offs_lists, biases, bound_min, cell_size):
    """Weights & affine-gradient factors applied to broadcast corner
    values, in sorted space.  Shared by `g2p_all` and the sharded
    bucketed path.  Returns (K, d*(1+d)): per axis [pv_a, pc_a0..d].

    Every intermediate is a 2D (K, C) array: a (K, C, d) formulation
    tiles its minor d=3 dim to 128 lanes on TPU — 42x padding waste that
    showed up as ~45 ms/step of weight-chain traffic in the round-4
    128^3 profile (transfers.py:458-481 attribution)."""
    d = px_s.shape[-1]
    h = jnp.asarray(cell_size, dtype=px_s.dtype)
    gi0, _, _ = _corner_setup(px_s, bound_min, cell_size, (0.0,) * d)
    outs = []
    col = 0
    for a in range(d):
        gi_a, _, w_a = _corner_setup(px_s, bound_min, cell_size, biases[a])
        delta = gi_a - gi0  # in {-1, 0} per axis, exact
        C = len(offs_lists[a])
        v_a = vals[:, col : col + C]
        col += C
        # per-dim factor (K, C) and sign (K, C), built from (C,) static
        # offset columns against the (K, 1) delta column
        wd = []
        sg = []
        for dd in range(d):
            off_col = jnp.asarray(
                [o[dd] for o in offs_lists[a]], jnp.int32
            )[None, :]
            o = off_col - delta[:, dd][:, None]  # (K, C)
            w_col = w_a[:, dd][:, None]
            wd.append(
                jnp.where(o == 0, 1.0 - w_col, jnp.where(o == 1, w_col, 0.0))
            )
            sg.append(jnp.where(o == 1, 1.0, jnp.where(o == 0, -1.0, 0.0)))
        weight = wd[0]
        for dd in range(1, d):
            weight = weight * wd[dd]
        outs.append(jnp.sum(weight * v_a, axis=-1))  # pv_a
        # affine-gradient row: dim k swaps wd_k for the signed unit
        # derivative (cell 3 :196-205); invalid offsets contribute 0
        for k in range(d):
            g = sg[k]
            for j in range(d):
                if j != k:
                    g = g * wd[j]
            outs.append(jnp.sum(g * v_a, axis=-1) / h[k])
    return jnp.stack(outs, axis=-1)  # (K, d*(1+d))


def g2p_all(
    gvs: Sequence[jnp.ndarray],
    gres: Sequence[int],
    biases: Sequence[Sequence[float]],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
    sort_info: "SortInfo",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-axes G2P without a single ``lax.gather``.

    Numerically equivalent to d× `g2p_axis` (reference g2p_particle,
    cell 3 :174-209) up to fp summation order.  Per-corner gathers are
    row-bound on TPU (~4 useful bytes per gathered row; 72 ms/step of
    the 351 ms 128^3 step, round-2 profile).  Instead: every corner
    value a particle can need is a *clamped static shift* of the face
    grid evaluated at the particle's bias-0 home cell — so build one
    dense per-cell table of all (axis, offset) corner values and
    broadcast rows to the cell-sorted particles with
    `segment_broadcast_sorted` (scatter + segmented scan, all parallel).
    Staggered homes are rebased onto the bias-0 home exactly as in
    `p2g_all`: offsets widen to {-1,0,1} on biased dims and the weight
    formula zeroes the inapplicable one per particle.

    ``sort_info`` is the cell-sort produced by `p2g_all` over the SAME
    positions (the step doesn't move particles between P2G and G2P —
    cell 13 :4597/:4660).
    """
    d = len(gres)
    sorted_ids, order, ext, px_s = (
        sort_info.sorted_ids,
        sort_info.order,
        sort_info.ext,
        sort_info.px_sorted,
    )

    # -- dense corner-value tables on the extended (n+2)^d home grid.
    # channel (a, o): gv_a[clip(c + o, 0, gres-1)] at home cell c — the
    # clamp applies to the SUM, so a clamped shift is exact (and the
    # trailing face plane is never read: reference clamps to gres-1,
    # cell 3 :190-193).
    chans = []
    offs_lists = _g2p_offsets(biases, d)
    for a in range(d):
        base = gvs[a][tuple(slice(0, int(n)) for n in gres)]
        padded = jnp.pad(base, 2, mode="edge")
        for o in offs_lists[a]:
            # padded[j] = base[clip(j-2, 0, n-1)]; channel[e] =
            # base[clip((e-1) + o, 0, n-1)] = padded[e + 1 + o]
            win = jax.lax.slice(
                padded,
                [1 + oo for oo in o],
                [1 + oo + int(e) for oo, e in zip(o, ext)],
            )
            chans.append(win.reshape(-1))
    table = jnp.stack(chans, axis=-1)  # (M, C_total)

    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted,
    )

    vals = segment_broadcast_sorted(table, sorted_ids)  # (K, C_total)
    res_sorted = _g2p_reduce(
        vals, px_s, offs_lists, biases, bound_min, cell_size
    )
    from python_fluid_simulation_tpu.ops.scatter import unsort_rows

    res = unsort_rows(res_sorted, order)
    pv = res[:, 0 :: (1 + d)]
    pc = jnp.stack(
        [res[:, a * (1 + d) + 1 : (a + 1) * (1 + d)] for a in range(d)],
        axis=1,
    )
    return pv, pc


def g2p_axis(
    px: jnp.ndarray,
    gv: jnp.ndarray,
    axis: int,
    gres: Sequence[int],
    bias: Sequence[float],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather one velocity component and its APIC affine-gradient row.

    Reference: g2p_particle (cell 3 :174-209).
    Returns (pv_a (N,), pc_a (N,d)).
    """
    d = px.shape[-1]
    gi, _, w = _corner_setup(px, bound_min, cell_size, bias)
    clamp_hi = jnp.asarray(gres, dtype=jnp.int32) - 1
    h = jnp.asarray(cell_size, dtype=px.dtype)

    flat = gv.reshape(-1)
    pv_a = jnp.zeros(px.shape[0], dtype=px.dtype)
    cols = [jnp.zeros(px.shape[0], dtype=px.dtype) for _ in range(d)]
    shape = gv.shape
    for offs in itertools.product((0, 1), repeat=d):
        oi = jnp.asarray(offs, dtype=jnp.int32)
        corner = jnp.clip(gi + oi, 0, clamp_hi)
        v = flat[_flat_index(corner, shape)]
        # per-axis weights and their signed derivatives (cell 3 :196-205)
        wd = [
            (w[:, k] if o == 1 else 1.0 - w[:, k]) for k, o in enumerate(offs)
        ]
        weight = wd[0]
        for k in range(1, d):
            weight = weight * wd[k]
        pv_a = pv_a + weight * v
        for k in range(d):
            grad_k = jnp.asarray(2 * offs[k] - 1, dtype=px.dtype)
            for j in range(d):
                if j != k:
                    grad_k = grad_k * wd[j]
            cols[k] = cols[k] + grad_k * v / h[k]
    return pv_a, jnp.stack(cols, axis=-1)
