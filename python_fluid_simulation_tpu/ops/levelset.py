"""Fluid level set (union-of-balls) and fluid-volume field.

TPU-native replacement for notebook cells 4 and 6
(`3D_viscous_fluid_sim.ipynb` :224-278, :442-500).

The reference builds the level set by per-particle 5^d-stencil CUDA
``atomic.min`` (cell 4 :288) and the dual-lattice volume field by trilinear
``atomic.add`` (cell 6 :468).  Here both are single XLA scatter ops
(``.at[].min`` / ``.at[].add``) over the concatenated
(particles × stencil-offsets) index set — deterministic, device-resident.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.transfers import (
    _corner_setup,
    _corner_weight,
    _flat_index,
)


def compute_fluid_levelset(
    px: jnp.ndarray,
    res: Sequence[int],
    bound_min: Sequence[float],
    cell_size: Sequence[float],
    gdx: float,
    pm: jnp.ndarray | None = None,
    sort_info=None,
) -> jnp.ndarray:
    """Union-of-balls SDF at cell centers.

    Reference (cell 4): background phi = 3*gdx; particle radius
    r = gdx * 0.5 * sqrt(d) * 1.02; scatter-min of |center - x_p| - r over
    the particle's 5^d-cell neighbourhood with border clamping (:270-288).

    ``pm`` (optional particle masses) marks padding: zero-mass particles
    contribute nothing (their distances are replaced by the background) —
    the convention that makes DP-sharded particle arrays padddable
    (parallel/mesh.shard_state).  The reference has no such notion (fixed
    particle count, single GPU).
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        segment_min_sorted,
        sort_by_segment,
    )

    d = px.shape[-1]
    r = gdx * 0.5 * math.sqrt(float(d)) * 1.02
    bmin = jnp.asarray(bound_min, dtype=px.dtype)
    h = jnp.asarray(cell_size, dtype=px.dtype)
    hi = jnp.asarray(res, dtype=jnp.int32) - 1

    background_f = 3.0 * float(gdx)  # python float: the binned-kernel
    # fill is a static kernel parameter (scatter._binned_reduce_or_none)
    background = jnp.asarray(background_f, px.dtype)
    offsets = list(itertools.product(range(-2, 3), repeat=d))

    size_ = 1
    for s_ in res:
        size_ *= int(s_)
    if sort_info is not None:
        # ride an existing bias-0 home-cell sort (transfers.
        # make_sort_info / p2g_all): the clipped home-cell key below is
        # a monotone map of the extended-grid key, so the borrowed
        # permutation leaves these ids non-decreasing; padding rows are
        # already last and get fresh distinct out-of-range ids
        px_s = sort_info.px_sorted
        gi_s = jnp.clip(
            jnp.floor((px_s - bmin) / h).astype(jnp.int32), 0, hi
        )
        pm_s = None if pm is None else pm[sort_info.order]
        sorted_ids = _flat_index(gi_s, res)
        if pm_s is not None:
            k = sorted_ids.shape[0]
            sorted_ids = jnp.where(
                pm_s > 0,
                sorted_ids,
                size_ + jnp.arange(k, dtype=sorted_ids.dtype),
            )
    else:
        # sort particles by home cell FIRST (gathering only the (N,d)
        # positions/ids), then build the 5^d distance channels from the
        # sorted data — reordering a prebuilt (N,125) channel matrix was
        # the dominant cost at 128^3-class particle counts
        from python_fluid_simulation_tpu.ops.transfers import (
            padding_dump_ids,
        )

        gi = jnp.floor((px - bmin) / h).astype(jnp.int32)
        # home cells of in-domain particles are already in range; the
        # CORNER clamp happens in fold_clip below (cell 4 :281-284)
        gi = jnp.clip(gi, 0, hi)
        idx = _flat_index(gi, res)
        # padding must not share segments with live particles: the
        # windowed segment-min only folds the first 2^8 rows of a segment
        idx = padding_dump_ids(idx, pm, res)
        if pm is None:
            sorted_ids, px_s, gi_s = sort_by_segment(idx, px, gi)
            pm_s = None
        else:
            sorted_ids, px_s, gi_s, pm_s = sort_by_segment(idx, px, gi, pm)

    # distance channels computed axis-by-axis in (N, 5^d) layout — pure
    # 2D arrays whose lane dim pads 125 -> 128 (a per-offset norm loop
    # creates (N,1) temporaries that tile 128x on TPU and OOM'd HBM);
    # the reference clamps the target cell before measuring the distance
    # (cell 4 :281-284)
    n = px.shape[0]
    n_off = len(offsets)
    offs_arr = jnp.asarray(offsets, jnp.int32)  # (5^d, d)
    dist2 = None
    for ax in range(d):
        gii_ax = jnp.clip(
            jnp.broadcast_to(gi_s[:, ax][:, None], (n, n_off))
            + offs_arr[None, :, ax],
            0,
            int(res[ax]) - 1,
        )
        pxb = jnp.broadcast_to(px_s[:, ax][:, None], (n, n_off))
        cd = (
            (gii_ax.astype(px.dtype) + 0.5) * cell_size[ax]
            + bound_min[ax]
            - pxb
        )
        dist2 = cd * cd if dist2 is None else dist2 + cd * cd
    vals = jnp.sqrt(dist2) - r  # (N, 5^d)
    if pm_s is not None:
        vals = jnp.where(pm_s[:, None] > 0, vals, background)

    # materialization fences: without them XLA fuses the (N,125) channel
    # computation into every consumer of the windowed-min passes and
    # recomputes it repeatedly (measured 3.4x blowup of the whole op)
    import jax

    vals, sorted_ids = jax.lax.optimization_barrier((vals, sorted_ids))

    size = 1
    for s in res:
        size *= s

    # [The round-4 5^3 fold kernel experiment (pallas_fold5: binned min
    # into a group-padded (K, 160) table consumed in native layout) was
    # DELETED in round 5: it lost 265 vs 204 ms/step at 128^3 (per-piece
    # masked lane extract = 32x the vector work of a slice), and the
    # channels-first binned reduce (pallas_binned cf mode) now removes
    # the transpose it was built to avoid.]
    from python_fluid_simulation_tpu.ops.transfers import (
        _group_threshold,
    )

    from python_fluid_simulation_tpu.ops.scatter import (
        segment_reduce_cf,
    )

    if size < _group_threshold():
        seg_cf = segment_reduce_cf(
            vals, sorted_ids, size, tuple(res), "min", background_f
        )
        return fold_scattered_sep(
            seg_cf, [tuple(range(-2, 3))] * d, tuple(res), "min",
            background,
        )
    # big grids: the (cells, 125) min table is the peak allocation
    # (lane-padded 125->256 ~= 8 GB at 8M cells); process per leading-
    # axis offset group — 5 sequential (cells, 25)-table passes whose
    # buffers XLA reuses — and min-combine the folded grids
    out = None
    per = 5 ** (d - 1)
    for gi_x, ox in enumerate(range(-2, 3)):
        sub = vals[:, gi_x * per : (gi_x + 1) * per]
        seg_cf = segment_reduce_cf(
            sub, sorted_ids, size, tuple(res), "min", background_f
        )
        folded = fold_scattered_sep(
            seg_cf,
            [(ox,)] + [tuple(range(-2, 3))] * (d - 1),
            tuple(res),
            "min",
            background,
        )
        out = folded if out is None else jnp.minimum(out, folded)
    return out


def compute_fluid_volume(
    px: jnp.ndarray,
    pvol: float,
    dual_res: Sequence[int],
    bound_min: Sequence[float],
    fine_cell_size: Sequence[float],
    pm: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Particle volume scattered onto the (2N+1)^d dual lattice, clamped.

    Reference (cell 6): node-biased trilinear scatter (bias 0, gx = gi*h)
    with border clamping, then per-node clamp to the fine cell volume
    (constrain_fluid_volume_kernel :528-533).
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        home_ids_extended,
        segment_sum_sorted,
        sort_by_segment,
    )

    d = px.shape[-1]
    gi, _, w = _corner_setup(
        px, bound_min, fine_cell_size, (0.0,) * d
    )

    corners = list(itertools.product((0, 1), repeat=d))
    # zero-mass particles are padding (see compute_fluid_levelset)
    pv = pvol if pm is None else pvol * (pm > 0)
    vals = jnp.stack(
        [_corner_weight(w, offs) * pv for offs in corners], axis=-1
    )
    ids, ext = home_ids_extended(gi, dual_res)
    from python_fluid_simulation_tpu.ops.transfers import (
        padding_dump_ids,
    )

    ids = padding_dump_ids(ids, pm, ext)
    sorted_ids, sorted_vals = sort_by_segment(ids, vals)
    size = 1
    for s in ext:
        size *= s
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_reduce_cf,
    )

    seg_cf = segment_reduce_cf(sorted_vals, sorted_ids, size, ext)

    vol = fold_scattered_sep(
        seg_cf, [(-1, 0)] * d, tuple(dual_res), "add", 0.0
    )
    fine_vol = 1.0
    for c in fine_cell_size:
        fine_vol *= c
    return jnp.minimum(vol, fine_vol)


def compute_fluid_volume_classes(
    px: jnp.ndarray,
    pvol: float,
    gres: Sequence[int],
    bound_min: Sequence[float],
    fine_cell_size: Sequence[float],
    pm: jnp.ndarray | None = None,
) -> dict:
    """`compute_fluid_volume` emitted directly as the dual lattice's 2^d
    parity-class grids (never materialising the (2N+1)^d array).

    The fine home node g = floor((px-bmin)/fine_h) decomposes as
    g = 2b + s with b the coarse home cell (exact: b = g//2) and
    s in {0,1}; the trilinear corner targets g + {0,1} become per-cell
    channels r = s + {0,1} subset {0,1,2}^d, and channel r lands in
    parity class (r mod 2) at class index b + (r - r mod 2)/2.  One sort
    over coarse-cell ids (4^d fewer bins than fine binning) serves all
    3^d channels; each class folds its own channels under the same
    border-clamping rule.

    Numerically identical to split_parity(compute_fluid_volume(...)) for
    every particle inside the domain (corner weights vanish exactly at
    the boundary); for a particle OUTSIDE the domain the reference's
    fine-node clamp can cross parity (fine -1 -> 0) which a per-class
    clamp cannot express — out-of-domain particles do not exist after
    SDF projection, and zero-mass padding particles contribute 0.

    Why: the (2N+1)^3 array's ::2 parity views compile to gather ops
    costing ~9 ms each at 128^3 on TPU (7 of them per step, measured);
    the class grids sidestep that entirely and shrink the scatter's
    segment space 4^d-fold.
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        home_ids_extended,
        segment_sum_sorted,
        sort_by_segment,
    )

    d = px.shape[-1]
    gi, _, w = _corner_setup(px, bound_min, fine_cell_size, (0.0,) * d)
    b = jnp.floor_divide(gi, 2)
    s = gi - 2 * b  # in {0,1} per axis, exactly

    pv = pvol if pm is None else pvol * (pm > 0)
    rs = list(itertools.product((0, 1, 2), repeat=d))
    chans = []
    for r in rs:
        weight = None
        for a, ra in enumerate(r):
            ua = jnp.where(
                s[:, a] == ra, 1.0 - w[:, a],
                jnp.where(s[:, a] + 1 == ra, w[:, a], 0.0),
            )
            weight = ua if weight is None else weight * ua
        chans.append(weight * pv)
    vals = jnp.stack(chans, axis=-1)  # (K, 3^d)

    ids, ext = home_ids_extended(b, gres)
    from python_fluid_simulation_tpu.ops.transfers import (
        padding_dump_ids,
    )

    ids = padding_dump_ids(ids, pm, ext)
    sorted_ids, sorted_vals = sort_by_segment(ids, vals)
    size = 1
    for e in ext:
        size *= e
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_reduce_cf,
    )

    seg_cf = segment_reduce_cf(
        sorted_vals, sorted_ids, size, ext
    )  # (3^d, ext...)

    fine_vol = 1.0
    for c in fine_cell_size:
        fine_vol *= c

    out = {}
    for p in itertools.product((0, 1), repeat=d):
        class_res = tuple(
            int(n) + 1 if pp == 0 else int(n) for n, pp in zip(gres, p)
        )
        sel = [
            i for i, r in enumerate(rs)
            if all(ra % 2 == pa for ra, pa in zip(r, p))
        ]
        axis_shifts = [(-1, 0) if pp == 0 else (-1,) for pp in p]
        sub = jnp.stack([seg_cf[i] for i in sel])
        vol = fold_scattered_sep(sub, axis_shifts, class_res, "add", 0.0)
        out[p] = jnp.minimum(vol, fine_vol)
    return out
