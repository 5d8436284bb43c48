"""Spatially-bucketed particle sharding + shard-local transfers.

SURVEY §2.4(b): "particle sharding by spatial bucket with ragged/padded
per-shard particle arrays and shard-local scatter" and a bounded
per-step exchange buffer.  The index-sharded (data-parallel) layout in
`mesh.py` is correct but reshards the FULL particle set across devices
inside every P2G/levelset/G2P under GSPMD; here particles RESIDE on the
device that owns their x-slab of the grid, and each transfer is a
``shard_map`` region over local particles + the local grid slab, with
1-2 plane ``ppermute`` halo folds along x — the same ICI-neighbour
communication structure as the distributed solves (halo.py).

Layout: particle arrays are (n_dev * cap, ...), slab-major — rows
[d*cap, (d+1)*cap) live on device d and hold the particles whose bias-0
home cell x-index falls in slab d, padded with inert zero-mass rows
(the engine-wide m=0 padding convention).  ``cap`` is static.

Residency maintenance: `rebucket` runs after each particle move
(advection+projection, density displacement).  Under the engine's CFL
limit a particle moves < 1 cell per step, so crossers only ever target
the adjacent slab: each device sends ≤ ``exchange_cap`` particles left
and right (two fixed-size ppermutes — the bounded exchange buffer) and
compacts survivors + arrivals back into its cap rows.  Overflow of
either bound drops the excess particles' mass to 0 (inert) and is
reported in the returned stats rather than corrupting neighbours.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_fluid_simulation_tpu.state import Particles

try:  # jax >= 0.4.32
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class BucketSpec(NamedTuple):
    """Static description of the bucketed layout."""

    n_dev: int
    cap: int  # particle rows per device
    exchange_cap: int  # max crossers sent per direction per rebucket
    slab_w: int  # grid x-planes per device (nx // n_dev)


def make_bucket_spec(
    n_dev: int, nx: int, n_particles: int, slack: float = 1.6,
    exchange_frac: float = 0.25, positions=None, bound_min=None,
    cell_size=None,
) -> BucketSpec:
    """Static bucket capacities.  With ``positions`` (host array +
    bound_min/cell_size) the per-device cap is sized from the ACTUAL
    max slab occupancy — fluid rarely fills the domain uniformly (a
    corner dam break puts a third of all particles in one slab) — else
    from the uniform average."""
    if nx % n_dev:
        raise ValueError(
            f"bucketed mode needs nx % n_dev == 0 (got {nx} % {n_dev})"
        )
    if nx // n_dev < 2:
        raise ValueError(
            "bucketed mode needs slab_w >= 2 (width-2 level-set halos)"
        )
    slab_w = nx // n_dev
    if positions is not None:
        import numpy as np

        gi = np.clip(
            np.floor(
                (np.asarray(positions)[:, 0] - bound_min[0])
                / cell_size[0]
            ).astype(np.int64),
            0,
            nx - 1,
        )
        per = int(np.bincount(gi // slab_w, minlength=n_dev).max())
    else:
        per = -(-n_particles // n_dev)
    cap = -(-int(per * slack) // 8) * 8
    ex = max(64, -(-int(cap * exchange_frac) // 8) * 8)
    return BucketSpec(n_dev, cap, ex, slab_w)


def _home_x(px_x, bound_min_x, h_x, nx):
    gi = jnp.floor((px_x - bound_min_x) / h_x).astype(jnp.int32)
    return jnp.clip(gi, 0, nx - 1)


def bucket_particles(
    particles: Particles,
    mesh: Mesh,
    spec: BucketSpec,
    bound_min,
    cell_size,
) -> Particles:
    """Initial (host-side/global) bucketing into the slab-major layout."""
    n_dev, cap = spec.n_dev, spec.cap
    nx = spec.slab_w * n_dev
    slab = _home_x(
        particles.x[:, 0], bound_min[0], cell_size[0], nx
    ) // spec.slab_w
    # inert rows sort after every real particle of any slab
    slab = jnp.where(particles.m > 0, slab, n_dev)
    order = jnp.argsort(slab)

    def take(a):
        return a[order]

    xs, vs, cs, ms = (
        take(particles.x), take(particles.v), take(particles.c),
        take(particles.m),
    )
    slab_s = slab[order]
    # row index within the device bucket
    k = slab_s.shape[0]
    first = jnp.concatenate(
        [jnp.array([True]), slab_s[1:] != slab_s[:-1]]
    )
    seg_start = jax.lax.cummax(
        jnp.where(first, jnp.arange(k, dtype=jnp.int32), 0)
    )
    within = jnp.arange(k, dtype=jnp.int32) - seg_start
    dest = slab_s * cap + within
    valid = (ms > 0) & (within < cap) & (slab_s < n_dev)
    # unique scatter into the (n_dev*cap) layout; invalid rows dropped
    dest = jnp.where(valid, dest, n_dev * cap)

    def place(a, width):
        buf = jnp.zeros((n_dev * cap,) + a.shape[1:], a.dtype)
        return buf.at[dest].set(
            jnp.where(
                valid.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0.0
            ),
            mode="drop",
            unique_indices=True,
        )

    out = Particles(
        x=place(xs, 3), v=place(vs, 3), c=place(cs, 9), m=place(ms, 1)
    )
    ps = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree.map(lambda a: jax.device_put(a, ps), out)


def _compact_local(key, arrs, cap):
    """Sort local rows by integer key (ascending) and keep first cap."""
    order = jnp.argsort(key)
    return [a[order[:cap]] for a in arrs]


def rebucket(
    particles: Particles,
    mesh: Mesh,
    spec: BucketSpec,
    bound_min,
    cell_size,
):
    """Bounded ±1-slab exchange restoring residency after a move.

    Returns (particles, lost) where lost is the number of particles
    dropped to inert because an exchange buffer or a bucket overflowed
    (0 in any healthy run — caps carry 1.6x/0.25x slack).
    """
    axis = mesh.axis_names[0]
    n_dev, cap, ex = spec.n_dev, spec.cap, spec.exchange_cap
    nx = spec.slab_w * n_dev

    def local(x, v, c, m):
        idx = jax.lax.axis_index(axis)
        slab = _home_x(x[:, 0], bound_min[0], cell_size[0], nx) // spec.slab_w
        live = m > 0
        # CFL ⇒ |slab - idx| ≤ 1; clamp anything wilder into the
        # neighbour and let the next rebucket carry it onward
        dest = jnp.clip(slab, idx - 1, idx + 1)
        go_l = live & (dest < idx)
        go_r = live & (dest > idx)
        stay = live & (dest == idx)

        def gather_group(mask, cap_g):
            """Stable-compact rows where mask, padded to cap_g (m=0)."""
            key = jnp.where(mask, 0, 1).astype(jnp.int32)
            order = jnp.argsort(key)[:cap_g]
            ok = mask[order]

            def g(a):
                picked = a[order]
                return jnp.where(
                    ok.reshape((-1,) + (1,) * (a.ndim - 1)), picked, 0.0
                )

            return g(x), g(v), g(c), jnp.where(ok, m[order], 0.0), ok

        lx, lv, lc, lm, _ = gather_group(go_l, ex)
        rx, rv, rc, rm, _ = gather_group(go_r, ex)
        overflow = (
            jnp.maximum(jnp.sum(go_l) - ex, 0)
            + jnp.maximum(jnp.sum(go_r) - ex, 0)
        )

        n = jax.lax.axis_size(axis)
        send_r = [(i, i + 1) for i in range(n - 1)]
        send_l = [(i + 1, i) for i in range(n - 1)]

        def xchg(bufs, perm):
            return tuple(
                jax.lax.ppermute(b, axis, perm) for b in bufs
            )

        in_l = xchg((rx, rv, rc, rm), send_r)  # from left neighbour
        in_r = xchg((lx, lv, lc, lm), send_l)  # from right neighbour
        zero_l = (idx == 0)
        zero_r = (idx == n - 1)

        def gate(t, z):
            return tuple(
                jnp.where(z, jnp.zeros_like(a), a) for a in t
            )

        in_l = gate(in_l, zero_l)
        in_r = gate(in_r, zero_r)

        # merge: local stays + arrivals, compact back to cap rows
        mx = jnp.concatenate([x, in_l[0], in_r[0]])
        mv = jnp.concatenate([v, in_l[1], in_r[1]])
        mc = jnp.concatenate([c, in_l[2], in_r[2]])
        mm = jnp.concatenate(
            [jnp.where(stay, m, 0.0), in_l[3], in_r[3]]
        )
        key = jnp.where(mm > 0, 0, 1).astype(jnp.int32)
        live_total = jnp.sum(mm > 0)
        overflow = overflow + jnp.maximum(live_total - cap, 0)
        ox, ov, oc, om = _compact_local(key, [mx, mv, mc, mm], cap)
        return ox, ov, oc, om, jax.lax.psum(overflow, axis)

    spec_p = P(axis)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_p, spec_p, spec_p, spec_p),
        out_specs=(spec_p, spec_p, spec_p, spec_p, P()),
    )
    x, v, c, m, lost = mapped(
        particles.x, particles.v, particles.c, particles.m
    )
    return Particles(x=x, v=v, c=c, m=m), lost


# ---------------------------------------------------------------------------
# shard-local scatter/gather transfers
# ---------------------------------------------------------------------------

def _x_halo_fold(ext, width, axis, combine="add", fill=0.0,
                 keep_high_tail=False):
    """Fold an x-extended local field back onto owned planes.

    ``ext`` has W + 2*width planes covering global rows
    [lo-width, hi+width); interior spill planes ppermute to the owning
    neighbour and combine there; at TRUE domain edges the spill planes
    fold into the boundary row (the reference's per-corner border clamp,
    cell 2 :128, applied globally instead of per shard).

    With ``keep_high_tail`` (width must be 1) the high spill plane is
    NOT edge-folded on the last device but returned separately
    (psum-replicated) — the global trailing entry of (nx+1)-extent
    parity-class arrays.  Returns (owned (W,...), tail or None).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    low = ext[:width]
    mid = ext[width:-width]
    high = ext[-width:]

    from_left = jax.lax.ppermute(
        high, axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        low, axis, [(i + 1, i) for i in range(n - 1)]
    )

    def comb(a, b):
        return a + b if combine == "add" else jnp.minimum(a, b)

    def reduce_planes(block):
        return (
            jnp.sum(block, axis=0) if combine == "add"
            else jnp.min(block, axis=0)
        )

    ident = jnp.full_like(low, fill)
    # low end: interior shards combine the left neighbour's high spill
    # plane-by-plane (from_left[j] ≡ global row lo+j); shard 0 clamps
    # ALL its low spill planes into row 0 (the global border clamp)
    edge_low = ident.at[0].set(reduce_planes(low))
    add_low = jnp.where(idx == 0, edge_low, from_left)
    mid = mid.at[:width].set(comb(mid[:width], add_low))

    tail = None
    if keep_high_tail:
        assert width == 1
        tail = jax.lax.psum(
            jnp.where(idx == n - 1, high[0], jnp.zeros_like(high[0])),
            axis,
        )
        add_high = jnp.where(
            idx == n - 1, jnp.full_like(high, fill), from_right
        )
    else:
        edge_high = ident.at[-1].set(reduce_planes(high))
        add_high = jnp.where(idx == n - 1, edge_high, from_right)
    mid = mid.at[-width:].set(comb(mid[-width:], add_high))
    return mid, tail


def _x_halo_exchange_clamped(loc, width, axis):
    """Extend a local slab with neighbour planes; at TRUE domain edges
    replicate the boundary plane (gather-side clamp semantics: reads of
    clip(i, 0, n-1) hit the edge value, not zero)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    from_left = jax.lax.ppermute(
        loc[-width:], axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        loc[:width], axis, [(i + 1, i) for i in range(n - 1)]
    )
    rep_low = jnp.broadcast_to(loc[:1], (width,) + loc.shape[1:])
    rep_high = jnp.broadcast_to(loc[-1:], (width,) + loc.shape[1:])
    lo_blk = jnp.where(idx == 0, rep_low, from_left)
    hi_blk = jnp.where(idx == n - 1, rep_high, from_right)
    return jnp.concatenate([lo_blk, loc, hi_blk], axis=0)


def _local_ext_ids(gi, lo, slab_w, dims_yz):
    """Linear ids on the local extended grid: x rows [lo-1, lo+W], y/z
    rows [-1, n].  Mirrors scatter.home_ids_extended locally."""
    ext = (slab_w + 2,) + tuple(int(n) + 2 for n in dims_yz)
    gx = jnp.clip(gi[:, 0] - lo + 1, 0, slab_w + 1)
    idx = gx
    for k, n in enumerate(dims_yz):
        g = jnp.clip(gi[:, k + 1] + 1, 0, int(n) + 1)
        idx = idx * ext[k + 1] + g
    return idx, ext


def sharded_p2g_all(
    particles,
    mesh: Mesh,
    spec: BucketSpec,
    gres,
    face_shapes,
    biases,
    bound_min,
    cell_size,
    volume=None,
    mass_floor: float = 0.0,
):
    """Shard-local `p2g_all`: bucketed particles scatter into their own
    grid slab; only the two x-spill planes of each output cross shards
    (width-1 ppermute folds).  Numerically equal to the global path up
    to fp summation order.

    Returns (gm_list, gv_list[, vol_classes], sort_info) with grid
    outputs slab-sharded along x (global views) and sort_info's particle
    arrays bucket-sharded — reusable by `sharded_g2p_all`.
    """
    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        segment_sum_sorted,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        SortInfo,
        _corner_setup,
        _p2g_channels,
    )

    axis = mesh.axis_names[0]
    d = len(gres)
    W = spec.slab_w
    ny_nz = tuple(int(n) for n in gres[1:])

    def local(px, pm, pv, pc):
        idx_dev = jax.lax.axis_index(axis)
        lo = idx_dev * W
        gi0, _, _ = _corner_setup(
            px, bound_min, cell_size, (0.0,) * d
        )
        ids, ext = _local_ext_ids(gi0, lo, W, ny_nz)
        from python_fluid_simulation_tpu.ops.transfers import (
            padding_dump_ids,
        )

        ids = padding_dump_ids(ids, pm, ext)
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        # sort the raw payload, build channels from sorted arrays (the
        # take moves 8x fewer bytes than a prebuilt channel matrix)
        px_sorted = px[order]
        blocks, specs_meta, vol_rs, _ = _p2g_channels(
            px_sorted, pm[order], pv[order], pc[order],
            biases, bound_min, cell_size, volume,
        )
        sorted_vals = jnp.concatenate(blocks, axis=-1)
        size = 1
        for s in ext:
            size *= s
        seg = segment_sum_sorted(sorted_vals, sorted_ids, size, widen=True)
        seg_cf = channels_first(seg, ext)

        outs = []
        tails = []
        for a in range(d):
            idxs = [
                j for j, (aa, _) in enumerate(specs_meta) if aa == a
            ]
            axis_shifts = [
                tuple(
                    c - 1
                    for c in ((-1, 0, 1) if biases[a][dd] != 0.0
                              else (0, 1))
                )
                for dd in range(d)
            ]
            x_lo, x_hi = min(axis_shifts[0]), max(axis_shifts[0])
            acc_x = (W + 2) + (x_hi - x_lo)
            for chsel in (
                jnp.asarray([2 * j for j in idxs]),
                jnp.asarray([2 * j + 1 for j in idxs]),
            ):
                ch = seg_cf[chsel]
                folded = fold_scattered_sep(
                    ch, axis_shifts, (acc_x,) + ny_nz, "add", 0.0,
                    noclip_axes=(0,),
                )
                # acc plane j covers global row lo + j + x_lo; real
                # targets live in [lo-1, hi] — slice the empty margins
                s0 = -1 - x_lo  # planes to drop at the low end
                ext_arr = jax.lax.slice_in_dim(
                    folded, s0, s0 + W + 2, axis=0
                )
                owned, _ = _x_halo_fold(ext_arr, 1, axis, "add", 0.0)
                outs.append(owned)
        gms, gvs = [], []
        for a in range(d):
            gm, gv_m = outs[2 * a], outs[2 * a + 1]
            # see transfers.p2g_all mass_floor (fp32 noise amplification)
            den = (
                jnp.maximum(gm, mass_floor) if mass_floor
                else jnp.where(gm > 0, gm, 1.0)
            )
            gv = jnp.where(gm > 0, gv_m / den, 0.0)
            gms.append(gm)
            gvs.append(gv)

        classes = {}
        class_tails = {}
        if volume is not None:
            n_p2g = 2 * len(specs_meta)
            fine_vol = 1.0
            for c in volume[1]:
                fine_vol *= c
            import itertools as _it

            for p in _it.product((0, 1), repeat=d):
                sel = [
                    i for i, r in enumerate(vol_rs)
                    if all(ra % 2 == pa for ra, pa in zip(r, p))
                ]
                axis_shifts = [
                    (-1, 0) if pp == 0 else (-1,) for pp in p
                ]
                yz_res = tuple(
                    int(n) + 1 if pp == 0 else int(n)
                    for n, pp in zip(gres[1:], p[1:])
                )
                x_lo, x_hi = min(axis_shifts[0]), max(axis_shifts[0])
                acc_x = (W + 2) + (x_hi - x_lo)
                sub = seg_cf[jnp.asarray([n_p2g + i for i in sel])]
                folded = fold_scattered_sep(
                    sub, axis_shifts, (acc_x,) + yz_res, "add", 0.0,
                    noclip_axes=(0,),
                )
                if p[0] == 0:
                    # class entries [lo, hi] on W+1 planes: entry hi is
                    # the right neighbour's entry lo (exchange), or the
                    # global (nx+1)-array tail on the last shard
                    ext_arr = jax.lax.slice_in_dim(
                        folded, 1, 1 + W + 1, axis=0
                    )
                    # prepend nothing: planes cover [lo, hi]; reuse the
                    # fold helper by treating [lo, hi] as mid+high
                    zero = jnp.zeros_like(ext_arr[:1])
                    ext2 = jnp.concatenate([zero, ext_arr], axis=0)
                    owned, tail = _x_halo_fold(
                        ext2, 1, axis, "add", 0.0, keep_high_tail=True
                    )
                    vol_arr = jnp.minimum(owned, fine_vol)
                    classes[p] = vol_arr
                    class_tails[p] = jnp.minimum(tail, fine_vol)
                else:
                    # shifts (-1,) only: targets [lo, hi) — no spill
                    owned = jax.lax.slice_in_dim(folded, 1, 1 + W, axis=0)
                    classes[p] = jnp.minimum(owned, fine_vol)
        return (
            tuple(gms) + tuple(gvs),
            sorted_ids,
            order,
            px_sorted,
            classes,
            class_tails,
        )

    sp = P(axis)
    n_cls = 2 ** d if volume is not None else 0
    cls_keys = (
        list(__import__("itertools").product((0, 1), repeat=d))
        if volume is not None else []
    )

    def wrapper(px, pm, pv, pc):
        grids, sids, order, px_s, classes, class_tails = local(
            px, pm, pv, pc
        )
        flat_cls = tuple(classes[k] for k in cls_keys)
        flat_tails = tuple(
            class_tails.get(k, jnp.zeros(())) for k in cls_keys
        )
        return grids + flat_cls + flat_tails + (sids, order, px_s)

    grid_specs = (P(axis, None, None),) * (2 * d + 2 * n_cls)
    # tails of x-parity-1 classes are dummies (scalar zeros, replicated)
    tail_specs = []
    for k in cls_keys:
        tail_specs.append(P(None, None) if k[0] == 0 else P())
    out_specs = (
        (P(axis, None, None),) * (2 * d)
        + (P(axis, None, None),) * n_cls
        + tuple(tail_specs)
        + (sp, sp, sp)
    )
    mapped = shard_map(
        wrapper,
        mesh=mesh,
        in_specs=(sp, sp, sp, sp),
        out_specs=out_specs,
    )
    out = mapped(
        particles.x, particles.m, particles.v, particles.c
    )
    gms = list(out[:d])
    gvs = list(out[d : 2 * d])
    pos = 2 * d
    classes = {}
    if volume is not None:
        for i, k in enumerate(cls_keys):
            classes[k] = out[pos + i]
        pos += n_cls
        for i, k in enumerate(cls_keys):
            if k[0] == 0:
                tail = out[pos + i]
                classes[k] = jnp.concatenate(
                    [classes[k], tail[None]], axis=0
                )
        pos += n_cls
    sids, order, px_s = out[pos], out[pos + 1], out[pos + 2]
    # place onto face arrays: trailing face plane never receives mass
    # (reference clamps to gres-1, cell 2 :128)
    base_shape = tuple(int(n) for n in gres)
    for a in range(d):
        pad = [
            (0, face_shapes[a][i] - base_shape[i]) for i in range(d)
        ]
        gms[a] = jnp.pad(gms[a], pad)
        gvs[a] = jnp.pad(gvs[a], pad)
    from python_fluid_simulation_tpu.ops.transfers import SortInfo

    si = SortInfo(
        sorted_ids=sids, order=order,
        ext=(W + 2,) + tuple(int(n) + 2 for n in gres[1:]),
        px_sorted=px_s,
    )
    if volume is not None:
        return gms, gvs, classes, si
    return gms, gvs, si


def sharded_fluid_levelset(
    p_x,
    p_m,
    mesh: Mesh,
    spec: BucketSpec,
    gres,
    bound_min,
    cell_size,
    gdx: float,
):
    """Shard-local union-of-balls level set (notebook cell 4 semantics,
    ops/levelset.compute_fluid_levelset): local 5^3 scatter-min over the
    slab + width-2 ppermute min-folds for the spill planes."""
    import math as _math

    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        segment_min_sorted,
    )

    axis = mesh.axis_names[0]
    d = len(gres)
    W = spec.slab_w
    ny_nz = tuple(int(n) for n in gres[1:])
    background = 3.0 * gdx
    r = gdx * 0.5 * _math.sqrt(float(d)) * 1.02
    import itertools as _it

    offsets = list(_it.product(range(-2, 3), repeat=d))
    offs_arr_np = offsets

    def local(px, pm):
        lo = jax.lax.axis_index(axis) * W
        bmin = jnp.asarray(bound_min, dtype=px.dtype)
        h = jnp.asarray(cell_size, dtype=px.dtype)
        hi_clip = jnp.asarray(gres, dtype=jnp.int32) - 1
        gi = jnp.clip(
            jnp.floor((px - bmin) / h).astype(jnp.int32), 0, hi_clip
        )
        # local base-grid ids (homes are resident: x in [lo, lo+W))
        ids = jnp.clip(gi[:, 0] - lo, 0, W - 1)
        for k, n in enumerate(ny_nz):
            ids = ids * n + gi[:, k + 1]
        from python_fluid_simulation_tpu.ops.transfers import (
            padding_dump_ids,
        )

        ids = padding_dump_ids(ids, pm, (W,) + ny_nz)
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        px_s = px[order]
        gi_s = gi[order]
        pm_s = pm[order]

        n_loc = px.shape[0]
        n_off = len(offsets)
        offs_arr = jnp.asarray(offs_arr_np, jnp.int32)
        dist2 = None
        for ax in range(d):
            gii = jnp.clip(
                jnp.broadcast_to(gi_s[:, ax][:, None], (n_loc, n_off))
                + offs_arr[None, :, ax],
                0,
                int(gres[ax]) - 1,
            )
            pxb = jnp.broadcast_to(px_s[:, ax][:, None], (n_loc, n_off))
            cd = (
                (gii.astype(px.dtype) + 0.5) * cell_size[ax]
                + bound_min[ax]
                - pxb
            )
            dist2 = cd * cd if dist2 is None else dist2 + cd * cd
        vals = jnp.sqrt(dist2) - r
        vals = jnp.where(pm_s[:, None] > 0, vals, background)
        vals, sorted_ids = jax.lax.optimization_barrier(
            (vals, sorted_ids)
        )
        size = W
        for n in ny_nz:
            size *= n
        seg = segment_min_sorted(vals, sorted_ids, size, background)
        seg_cf = channels_first(seg, (W,) + ny_nz)
        acc = fold_scattered_sep(
            seg_cf,
            [tuple(range(-2, 3))] * d,
            (W + 4,) + ny_nz,
            "min",
            background,
            noclip_axes=(0,),
        )
        owned, _ = _x_halo_fold(acc, 2, axis, "min", background)
        return owned

    sp = P(axis)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(sp, sp),
        out_specs=P(axis, None, None),
    )
    return mapped(p_x, p_m)


def sharded_g2p_all(
    gvs,
    mesh: Mesh,
    spec: BucketSpec,
    gres,
    biases,
    bound_min,
    cell_size,
    sort_info,
):
    """Shard-local gather-free G2P: width-1 clamped halo exchange of the
    face-velocity slabs, then the same table/broadcast/weights pipeline
    as `transfers.g2p_all` on local data (reusing `sharded_p2g_all`'s
    per-device sort)."""
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        _g2p_offsets,
        _g2p_reduce,
    )

    axis = mesh.axis_names[0]
    d = len(gres)
    W = spec.slab_w
    offs_lists = _g2p_offsets(biases, d)
    base_shape = tuple(int(n) for n in gres)

    # trailing face planes are never read (clamp to gres-1)
    gv_base = [g[tuple(slice(0, n) for n in base_shape)] for g in gvs]

    def local(sids, order, px_s, *gv_locs):
        lo = jax.lax.axis_index(axis) * W
        chans = []
        for a in range(d):
            gh = _x_halo_exchange_clamped(gv_locs[a], 1, axis)
            # pad 1 more on x (margin rows of the ext ids grid only) and
            # 2 on y/z (the global clamp), then window per offset
            padded = jnp.pad(
                gh,
                ((1, 1), (2, 2), (2, 2))[:d],
                mode="edge",
            )
            for o in offs_lists[a]:
                # x: padded_x[j'] ≡ global row lo-2+j', channel row e ≡
                # home lo-1+e wants home+o → j' = e + o + 1;  y/z: the
                # global construction (pad 2 edge, start 1+o)
                start = (o[0] + 1,) + tuple(1 + oo for oo in o[1:])
                sizes = (W + 2,) + tuple(int(n) + 2 for n in gres[1:])
                win = jax.lax.slice(
                    padded,
                    start,
                    tuple(s + z for s, z in zip(start, sizes)),
                )
                chans.append(win.reshape(-1))
        table = jnp.stack(chans, axis=-1)
        vals = segment_broadcast_sorted(table, sids)
        # rebase sorted positions: weights need the GLOBAL homes; px_s
        # are global positions so _g2p_reduce works unchanged
        res_sorted = _g2p_reduce(
            vals, px_s, offs_lists, biases, bound_min, cell_size
        )
        from python_fluid_simulation_tpu.ops.scatter import unsort_rows

        return unsort_rows(res_sorted, order)

    sp = P(axis)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(sp, sp, sp)
        + tuple(P(axis, *([None] * (d - 1))) for _ in range(d)),
        out_specs=sp,
    )
    res = mapped(
        sort_info.sorted_ids, sort_info.order, sort_info.px_sorted,
        *gv_base,
    )
    pv = res[:, 0 :: (1 + d)]
    pc = jnp.stack(
        [res[:, a * (1 + d) + 1 : (a + 1) * (1 + d)] for a in range(d)],
        axis=1,
    )
    return pv, pc


def spec_from_state(n_rows: int, n_dev: int, nx: int) -> BucketSpec:
    """Recover the BucketSpec of an already-bucketed particle array."""
    assert n_rows % n_dev == 0 and nx % n_dev == 0
    assert nx // n_dev >= 2, "bucketed mode needs slab_w >= 2"
    cap = n_rows // n_dev
    ex = max(64, -(-cap // 4 // 8) * 8)
    return BucketSpec(n_dev, cap, ex, nx // n_dev)


def sharded_scatter_mass_volume(
    p_x,
    p_m,
    mesh: Mesh,
    spec: BucketSpec,
    gres,
    pvol,
    bound_min,
    cell_size,
):
    """Shard-local `density.scatter_mass_volume` (cell-centred trilinear
    mass/volume scatter, DensityCGSolver3D.py:8-36) + the cell sort for
    `sharded_apply_displacement`."""
    import itertools as _it

    from python_fluid_simulation_tpu.ops.scatter import (
        channels_first,
        fold_scattered_sep,
        segment_sum_sorted,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        SortInfo,
        _corner_setup,
        _corner_weight,
        padding_dump_ids,
    )

    axis = mesh.axis_names[0]
    d = len(gres)
    W = spec.slab_w
    ny_nz = tuple(int(n) for n in gres[1:])
    corners = list(_it.product((0, 1), repeat=d))

    def local(px, pm):
        lo = jax.lax.axis_index(axis) * W
        gi, _, _ = _corner_setup(
            px, bound_min, cell_size, (0.5,) * d
        )
        ids, ext = _local_ext_ids(gi, lo, W, ny_nz)
        ids = padding_dump_ids(ids, pm, ext)
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        px_sorted = px[order]
        pm_s = pm[order]
        _, _, w = _corner_setup(
            px_sorted, bound_min, cell_size, (0.5,) * d
        )
        pv = pvol * (pm_s > 0)
        chans = []
        for offs in corners:
            weight = _corner_weight(w, offs)
            chans.append(weight * pm_s)
            chans.append(weight * pv)
        sorted_vals = jnp.stack(chans, axis=-1)
        size = 1
        for s in ext:
            size *= s
        seg = segment_sum_sorted(sorted_vals, sorted_ids, size, widen=True)
        seg_cf = channels_first(seg, ext)

        outs = []
        for chsel in (
            jnp.asarray(list(range(0, 2 * len(corners), 2))),
            jnp.asarray(list(range(1, 2 * len(corners), 2))),
        ):
            ch = seg_cf[chsel]
            # corner shifts {-1, 0} per axis (ids are +1-extended)
            acc = fold_scattered_sep(
                ch, [(-1, 0)] * d, (W + 3,) + ny_nz, "add", 0.0,
                noclip_axes=(0,),
            )
            # acc plane j covers global row lo + j - 1; targets [lo-1, hi]
            ext_arr = jax.lax.slice_in_dim(acc, 0, W + 2, axis=0)
            owned, _ = _x_halo_fold(ext_arr, 1, axis, "add", 0.0)
            outs.append(owned)
        return outs[0], outs[1], sorted_ids, order, px_sorted

    sp = P(axis)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(sp, sp),
        out_specs=(P(axis, None, None), P(axis, None, None), sp, sp, sp),
    )
    gm, gvol, sids, order, px_s = mapped(p_x, p_m)
    si = SortInfo(
        sorted_ids=sids, order=order,
        ext=(W + 2,) + tuple(int(n) + 2 for n in gres[1:]),
        px_sorted=px_s,
    )
    return gm, gvol, si


def sharded_apply_displacement(
    disp_faces,
    mesh: Mesh,
    spec: BucketSpec,
    gres,
    bound_min,
    cell_size,
    sort_info,
):
    """Shard-local `density.apply_displacement_all`: clamped halo
    exchange of the displacement face slabs (width 1 low / 2 high — the
    own-axis offsets rel the CENTER home are {0,1,2}), table + segment
    broadcast + weights over the density scatter's per-device sort.
    Returns the (K, d) displacement in bucketed row order."""
    import itertools as _it

    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted,
    )
    from python_fluid_simulation_tpu.ops.transfers import _corner_setup

    axis = mesh.axis_names[0]
    d = len(gres)
    W = spec.slab_w
    offs_lists = [
        list(_it.product(*[(0, 1, 2) if k == a else (0, 1)
                           for k in range(d)]))
        for a in range(d)
    ]
    # The x-face array has nx+1 x-planes: slab-shard the base nx planes
    # and hand the real trailing plane (a legitimate gather target —
    # the displacement clamp is to the FACE dims,
    # DensityCGSolver3D.py:232) to the last shard's high halo.  The
    # other axes' face extension is on an UNSHARDED dim and stays whole.
    base = [
        jax.lax.slice_in_dim(f, 0, int(gres[0]), axis=0)
        for f in disp_faces
    ]
    tail_x = disp_faces[0][int(gres[0])]  # (ny, nz): face plane nx

    def local(sids, order, px_s, tail, *locs):
        chans = []
        for a in range(d):
            gh = _x_halo_exchange_clamped(locs[a], 2, axis)
            # gh[j] covers global x-row lo-2+j (edge-replicated at the
            # domain boundary = the gather's clamp)
            if a == 0:
                # rows nx and nx+1 on the last shard are the real tail
                # plane (clamp hi is nx for the x-face's own axis)
                n = jax.lax.axis_size(axis)
                is_last = jax.lax.axis_index(axis) == n - 1
                gh = gh.at[-2].set(jnp.where(is_last, tail, gh[-2]))
                gh = gh.at[-1].set(jnp.where(is_last, tail, gh[-1]))
            # per-dim pads: x gets (1,1) [start o+2 covers o in {0..2}];
            # the own axis a>0 keeps its full n_a+1 extent with pad
            # (1,2) [start o]; transverse dims pad (2,2) [start 1+o]
            pads = [(1, 1)]
            for k in range(1, d):
                pads.append((1, 2) if k == a else (2, 2))
            padded = jnp.pad(gh, pads, mode="edge")
            sizes = (W + 2,) + tuple(int(nn) + 2 for nn in gres[1:])
            for o in offs_lists[a]:
                start = [o[0] + 2]
                for k in range(1, d):
                    start.append(o[k] if k == a else 1 + o[k])
                win = jax.lax.slice(
                    padded,
                    start,
                    tuple(s + z for s, z in zip(start, sizes)),
                )
                chans.append(win.reshape(-1))
        table = jnp.stack(chans, axis=-1)
        vals = segment_broadcast_sorted(table, sids)

        gi_c, _, _ = _corner_setup(
            px_s, bound_min, cell_size, (0.5,) * d
        )
        outs = []
        col = 0
        for a in range(d):
            bias = tuple(0.0 if k == a else 0.5 for k in range(d))
            gi_a, _, w_a = _corner_setup(
                px_s, bound_min, cell_size, bias
            )
            delta = gi_a - gi_c
            offs_arr = jnp.asarray(offs_lists[a], jnp.int32)
            o = offs_arr[None, :, :] - delta[:, None, :]
            wd = jnp.where(
                o == 0, (1.0 - w_a)[:, None, :],
                jnp.where(o == 1, w_a[:, None, :], 0.0),
            )
            v_a = vals[:, col : col + len(offs_lists[a])]
            col += len(offs_lists[a])
            outs.append(
                jnp.sum(jnp.prod(wd, axis=-1) * v_a, axis=-1)
            )
        disp_sorted = jnp.stack(outs, axis=-1)
        from python_fluid_simulation_tpu.ops.scatter import unsort_rows

        return unsort_rows(disp_sorted, order)

    sp = P(axis)
    mapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(sp, sp, sp, P(None, None))
        + tuple(P(axis, *([None] * (d - 1))) for _ in range(d)),
        out_specs=sp,
    )
    return mapped(
        sort_info.sorted_ids, sort_info.order, sort_info.px_sorted,
        tail_x, *base,
    )
