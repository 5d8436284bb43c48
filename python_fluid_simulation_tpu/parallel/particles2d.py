"""2D (x,z)-mesh spatially-bucketed particle residency (VERDICT r4 #6).

The 1D slab-major layout (parallel/particles.py) caps scaling at
nx/slab-width devices and gives tall-thin shards a large halo surface;
the 2D (x,z) mesh fixes both for the GRID (mesh.make_mesh2d) but round 4
left particles index-sharded on it — every transfer reshuffled the full
particle set under GSPMD.  This module is the bucketed layout on the 2D
mesh: device (ix, iz) owns the particles whose bias-0 home cell falls in
x-planes [ix*Wx, (ix+1)*Wx) x z-planes [iz*Wz, (iz+1)*Wz), rows
[dev*cap, (dev+1)*cap) of the flat particle arrays (dev = ix*n_z + iz,
the P(('x','z')) shard order), padded with inert m=0 rows.

Residency maintenance is the same bounded +-1-slab exchange as 1D, run
once PER MESH AXIS (CFL bounds a particle to < 1 cell/step, so a corner
crosser reaches its diagonal neighbour via x-then-z in one `rebucket_2d`
call).  Transfers are the 1D shard-local pipelines with the halo
folds/exchanges applied separably along both sharded array axes
(x = array axis 0, z = array axis 2); the (n+1)-extent parity-class
volumes additionally return x-tail planes, z-tail planes and the corner
line, assembled globally outside the shard_map.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from python_fluid_simulation_tpu.state import Particles
from python_fluid_simulation_tpu.parallel.particles import (
    _compact_local,
    _x_halo_exchange_clamped,
    _x_halo_fold,
)

try:  # jax >= 0.4.32
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


class BucketSpec2D(NamedTuple):
    n_x: int
    n_z: int
    cap: int  # particle rows per device
    exchange_cap: int  # max crossers sent per direction per axis
    slab_wx: int
    slab_wz: int


def make_bucket_spec_2d(
    mesh_shape, nx, nz, n_particles, slack: float = 1.6,
    exchange_frac: float = 0.25, positions=None, bound_min=None,
    cell_size=None,
) -> BucketSpec2D:
    n_x, n_z = mesh_shape
    if nx % n_x or nz % n_z:
        raise ValueError(
            f"bucketed-2d needs nx%n_x==0 and nz%n_z==0 "
            f"(got {nx}%{n_x}, {nz}%{n_z})"
        )
    wx, wz = nx // n_x, nz // n_z
    if wx < 2 or wz < 2:
        raise ValueError("bucketed-2d needs slab widths >= 2")
    if positions is not None:
        import numpy as np

        p = np.asarray(positions)
        gx = np.clip(
            np.floor((p[:, 0] - bound_min[0]) / cell_size[0]), 0, nx - 1
        ).astype(np.int64)
        gz = np.clip(
            np.floor((p[:, 2] - bound_min[2]) / cell_size[2]), 0, nz - 1
        ).astype(np.int64)
        dev = (gx // wx) * n_z + (gz // wz)
        per = int(np.bincount(dev, minlength=n_x * n_z).max())
    else:
        per = -(-n_particles // (n_x * n_z))
    cap = -(-int(per * slack) // 8) * 8
    ex = max(64, -(-int(cap * exchange_frac) // 8) * 8)
    return BucketSpec2D(n_x, n_z, cap, ex, wx, wz)


def spec_from_state_2d(
    n_rows: int, mesh: Mesh, nx: int, nz: int
) -> BucketSpec2D:
    n_x, n_z = mesh.devices.shape
    n_dev = n_x * n_z
    assert n_rows % n_dev == 0 and nx % n_x == 0 and nz % n_z == 0
    cap = n_rows // n_dev
    ex = max(64, -(-cap // 4 // 8) * 8)
    return BucketSpec2D(n_x, n_z, cap, ex, nx // n_x, nz // n_z)


def _home(px_c, bmin_c, h_c, n):
    gi = jnp.floor((px_c - bmin_c) / h_c).astype(jnp.int32)
    return jnp.clip(gi, 0, n - 1)


def bucket_particles_2d(
    particles: Particles, mesh: Mesh, spec: BucketSpec2D, bound_min,
    cell_size,
) -> Particles:
    """Initial global bucketing into the (x,z)-slab-major layout."""
    n_x, n_z, cap = spec.n_x, spec.n_z, spec.cap
    nx = spec.slab_wx * n_x
    nz = spec.slab_wz * n_z
    sx = _home(particles.x[:, 0], bound_min[0], cell_size[0], nx) // spec.slab_wx
    sz = _home(particles.x[:, 2], bound_min[2], cell_size[2], nz) // spec.slab_wz
    dev = sx * n_z + sz
    n_dev = n_x * n_z
    dev = jnp.where(particles.m > 0, dev, n_dev)
    order = jnp.argsort(dev)

    def take(a):
        return a[order]

    xs, vs, cs, ms = (
        take(particles.x), take(particles.v), take(particles.c),
        take(particles.m),
    )
    dev_s = dev[order]
    k = dev_s.shape[0]
    first = jnp.concatenate(
        [jnp.array([True]), dev_s[1:] != dev_s[:-1]]
    )
    seg_start = jax.lax.cummax(
        jnp.where(first, jnp.arange(k, dtype=jnp.int32), 0)
    )
    within = jnp.arange(k, dtype=jnp.int32) - seg_start
    dest = dev_s * cap + within
    valid = (ms > 0) & (within < cap) & (dev_s < n_dev)
    dest = jnp.where(valid, dest, n_dev * cap)

    def place(a):
        buf = jnp.zeros((n_dev * cap,) + a.shape[1:], a.dtype)
        return buf.at[dest].set(
            jnp.where(
                valid.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0.0
            ),
            mode="drop",
            unique_indices=True,
        )

    out = Particles(x=place(xs), v=place(vs), c=place(cs), m=place(ms))
    ps = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.tree.map(lambda a: jax.device_put(a, ps), out)


def _exchange_one_axis(
    x, v, c, m, axis_name, my_slab_of, cap, ex
):
    """One bounded +-1 exchange along one mesh axis (the 1D rebucket
    body, parameterised by the slab-of-position map)."""
    idx = jax.lax.axis_index(axis_name)
    slab = my_slab_of(x)
    live = m > 0
    dest = jnp.clip(slab, idx - 1, idx + 1)
    go_l = live & (dest < idx)
    go_r = live & (dest > idx)
    stay = live & (dest == idx)

    def gather_group(mask, cap_g):
        key = jnp.where(mask, 0, 1).astype(jnp.int32)
        order = jnp.argsort(key)[:cap_g]
        ok = mask[order]

        def g(a):
            picked = a[order]
            return jnp.where(
                ok.reshape((-1,) + (1,) * (a.ndim - 1)), picked, 0.0
            )

        return g(x), g(v), g(c), jnp.where(ok, m[order], 0.0)

    lx, lv, lc, lm = gather_group(go_l, ex)
    rx, rv, rc, rm = gather_group(go_r, ex)
    overflow = (
        jnp.maximum(jnp.sum(go_l) - ex, 0)
        + jnp.maximum(jnp.sum(go_r) - ex, 0)
    )
    n = jax.lax.axis_size(axis_name)
    send_r = [(i, i + 1) for i in range(n - 1)]
    send_l = [(i + 1, i) for i in range(n - 1)]

    def xchg(bufs, perm):
        return tuple(
            jax.lax.ppermute(b, axis_name, perm) for b in bufs
        )

    in_l = xchg((rx, rv, rc, rm), send_r)
    in_r = xchg((lx, lv, lc, lm), send_l)

    def gate(t, z):
        return tuple(jnp.where(z, jnp.zeros_like(a), a) for a in t)

    in_l = gate(in_l, idx == 0)
    in_r = gate(in_r, idx == n - 1)
    mx = jnp.concatenate([x, in_l[0], in_r[0]])
    mv = jnp.concatenate([v, in_l[1], in_r[1]])
    mc = jnp.concatenate([c, in_l[2], in_r[2]])
    mm = jnp.concatenate([jnp.where(stay, m, 0.0), in_l[3], in_r[3]])
    key = jnp.where(mm > 0, 0, 1).astype(jnp.int32)
    overflow = overflow + jnp.maximum(jnp.sum(mm > 0) - cap, 0)
    ox, ov, oc, om = _compact_local(key, [mx, mv, mc, mm], cap)
    return ox, ov, oc, om, overflow


def rebucket_2d(
    particles: Particles, mesh: Mesh, spec: BucketSpec2D, bound_min,
    cell_size,
):
    """Bounded +-1-slab exchange along x then z; a diagonal crosser
    reaches its corner neighbour through the two phases.  Returns
    (particles, lost) with ``lost`` the psum of overflow drops."""
    ax_x, ax_z = mesh.axis_names
    nx = spec.slab_wx * spec.n_x
    nz = spec.slab_wz * spec.n_z

    def local(x, v, c, m):
        def slab_x(p):
            return _home(
                p[:, 0], bound_min[0], cell_size[0], nx
            ) // spec.slab_wx

        def slab_z(p):
            return _home(
                p[:, 2], bound_min[2], cell_size[2], nz
            ) // spec.slab_wz

        x, v, c, m, of1 = _exchange_one_axis(
            x, v, c, m, ax_x, slab_x, spec.cap, spec.exchange_cap
        )
        x, v, c, m, of2 = _exchange_one_axis(
            x, v, c, m, ax_z, slab_z, spec.cap, spec.exchange_cap
        )
        lost = jax.lax.psum(
            jax.lax.psum(of1 + of2, ax_x), ax_z
        )
        return x, v, c, m, lost

    sp = P((ax_x, ax_z))
    mapped = shard_map(
        local, mesh=mesh, in_specs=(sp, sp, sp, sp),
        out_specs=(sp, sp, sp, sp, P()),
    )
    x, v, c, m, lost = mapped(
        particles.x, particles.v, particles.c, particles.m
    )
    return Particles(x=x, v=v, c=c, m=m), lost


# ---------------------------------------------------------------------------
# separable halo helpers (array axis 2 via moveaxis over the axis-0 ops)
# ---------------------------------------------------------------------------

def _halo_fold_ax(ext, width, mesh_axis, array_axis, combine="add",
                  fill=0.0, keep_high_tail=False):
    if array_axis == 0:
        return _x_halo_fold(
            ext, width, mesh_axis, combine, fill, keep_high_tail
        )
    moved = jnp.moveaxis(ext, array_axis, 0)
    owned, tail = _x_halo_fold(
        moved, width, mesh_axis, combine, fill, keep_high_tail
    )
    return jnp.moveaxis(owned, 0, array_axis), tail


def _halo_exchange_clamped_ax(loc, width, mesh_axis, array_axis):
    if array_axis == 0:
        return _x_halo_exchange_clamped(loc, width, mesh_axis)
    moved = jnp.moveaxis(loc, array_axis, 0)
    out = _x_halo_exchange_clamped(moved, width, mesh_axis)
    return jnp.moveaxis(out, 0, array_axis)


def _local_ext_ids_2d(gi, lo_x, wx, ny, lo_z, wz):
    """Linear ids on the local (wx+2, ny+2, wz+2) extended block."""
    ext = (wx + 2, int(ny) + 2, wz + 2)
    gx = jnp.clip(gi[:, 0] - lo_x + 1, 0, wx + 1)
    gy = jnp.clip(gi[:, 1] + 1, 0, int(ny) + 1)
    gz = jnp.clip(gi[:, 2] - lo_z + 1, 0, wz + 1)
    return (gx * ext[1] + gy) * ext[2] + gz, ext


def _sort_local(px, pm, gi, wx, ny, wz, ax_x, ax_z):
    from python_fluid_simulation_tpu.ops.transfers import (
        padding_dump_ids,
    )

    lo_x = jax.lax.axis_index(ax_x) * wx
    lo_z = jax.lax.axis_index(ax_z) * wz
    ids, ext = _local_ext_ids_2d(gi, lo_x, wx, ny, lo_z, wz)
    ids = padding_dump_ids(ids, pm, ext)
    order = jnp.argsort(ids)
    return ids[order], order, ext


def sharded_p2g_all_2d(
    particles, mesh: Mesh, spec: BucketSpec2D, gres, face_shapes,
    biases, bound_min, cell_size, volume=None, mass_floor: float = 0.0,
):
    """2D-mesh shard-local `p2g_all`: the 1D pipeline with width-1
    halo folds along BOTH x (array axis 0) and z (array axis 2);
    parity-class volumes return x/z tails + the corner line, assembled
    globally below."""
    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered_sep,
        segment_reduce_cf,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        SortInfo,
        _corner_setup,
        _p2g_channels,
    )

    ax_x, ax_z = mesh.axis_names
    d = len(gres)
    assert d == 3
    wx, wz = spec.slab_wx, spec.slab_wz
    ny = int(gres[1])

    def local(px, pm, pv, pc):
        gi0, _, _ = _corner_setup(px, bound_min, cell_size, (0.0,) * d)
        sorted_ids, order, ext = _sort_local(
            px, pm, gi0, wx, ny, wz, ax_x, ax_z
        )
        px_sorted = px[order]
        blocks, specs_meta, vol_rs, _ = _p2g_channels(
            px_sorted, pm[order], pv[order], pc[order],
            biases, bound_min, cell_size, volume,
        )
        sorted_vals = jnp.concatenate(blocks, axis=-1)
        size = ext[0] * ext[1] * ext[2]
        seg_cf = segment_reduce_cf(sorted_vals, sorted_ids, size, ext)

        outs = []
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
            acc_x = (wx + 2) + (max(axis_shifts[0]) - min(axis_shifts[0]))
            acc_z = (wz + 2) + (max(axis_shifts[2]) - min(axis_shifts[2]))
            for chsel in (
                jnp.asarray([2 * j for j in idxs]),
                jnp.asarray([2 * j + 1 for j in idxs]),
            ):
                folded = fold_scattered_sep(
                    seg_cf[chsel], axis_shifts, (acc_x, ny, acc_z),
                    "add", 0.0, noclip_axes=(0, 2),
                )
                s0x = -1 - min(axis_shifts[0])
                s0z = -1 - min(axis_shifts[2])
                ext_arr = jax.lax.slice_in_dim(
                    folded, s0x, s0x + wx + 2, axis=0
                )
                ext_arr = jax.lax.slice_in_dim(
                    ext_arr, s0z, s0z + wz + 2, axis=2
                )
                owned, _ = _halo_fold_ax(ext_arr, 1, ax_x, 0)
                owned, _ = _halo_fold_ax(owned, 1, ax_z, 2)
                outs.append(owned)
        gms, gvs = [], []
        for a in range(d):
            gm, gv_m = outs[2 * a], outs[2 * a + 1]
            den = (
                jnp.maximum(gm, mass_floor) if mass_floor
                else jnp.where(gm > 0, gm, 1.0)
            )
            gvs.append(jnp.where(gm > 0, gv_m / den, 0.0))
            gms.append(gm)

        classes = {}
        xtails = {}
        ztails = {}
        corners = {}
        if volume is not None:
            n_p2g = 2 * len(specs_meta)
            fine_vol = 1.0
            for c_ in volume[1]:
                fine_vol *= c_

            def clamp(v):
                return jnp.minimum(v, fine_vol)

            for p in itertools.product((0, 1), repeat=d):
                sel = [
                    i for i, r in enumerate(vol_rs)
                    if all(ra % 2 == pa for ra, pa in zip(r, p))
                ]
                axis_shifts = [
                    (-1, 0) if pp == 0 else (-1,) for pp in p
                ]
                ny_c = ny + 1 if p[1] == 0 else ny
                acc_x = (wx + 2) + (0 if p[0] else 1)
                acc_z = (wz + 2) + (0 if p[2] else 1)
                folded = fold_scattered_sep(
                    seg_cf[jnp.asarray([n_p2g + i for i in sel])],
                    axis_shifts, (acc_x, ny_c, acc_z), "add", 0.0,
                    noclip_axes=(0, 2),
                )
                # plane t of a noclip axis covers global class row
                # lo + t - 1; parity-0 owns [lo, hi] (w+1 rows, high
                # spill plane -> neighbour / tail), parity-1 owns
                # [lo, hi) (residency makes the margin planes empty,
                # so no spill — same argument as the 1D path)
                if p[0] == 0:
                    e = jax.lax.slice_in_dim(folded, 1, 2 + wx, axis=0)
                else:
                    e = jax.lax.slice_in_dim(folded, 1, 1 + wx, axis=0)
                if p[2] == 0:
                    e = jax.lax.slice_in_dim(e, 1, 2 + wz, axis=2)
                else:
                    e = jax.lax.slice_in_dim(e, 1, 1 + wz, axis=2)
                xtail = None
                if p[0] == 0:
                    e = jnp.concatenate(
                        [jnp.zeros_like(e[:1]), e], axis=0
                    )
                    e, xtail = _halo_fold_ax(
                        e, 1, ax_x, 0, keep_high_tail=True
                    )
                ztail = None
                if p[2] == 0:
                    e = jnp.concatenate(
                        [jnp.zeros_like(e[:, :, :1]), e], axis=2
                    )
                    e, ztail = _halo_fold_ax(
                        e, 1, ax_z, 2, keep_high_tail=True
                    )
                classes[p] = clamp(e)
                if xtail is not None:
                    # xtail (ny_c, z_ext): fold its z planes the same
                    # way (replicated over x, still z-sharded)
                    if p[2] == 0:
                        xt2 = jnp.concatenate(
                            [jnp.zeros_like(xtail[:, :1]), xtail],
                            axis=1,
                        )
                        xt, xz_corner = _halo_fold_ax(
                            xt2, 1, ax_z, 1, keep_high_tail=True
                        )
                        corners[p] = clamp(xz_corner)
                    else:
                        xt = xtail
                    xtails[p] = clamp(xt)
                if ztail is not None:
                    ztails[p] = clamp(ztail)
        return (
            tuple(gms) + tuple(gvs), sorted_ids, order, px_sorted,
            classes, xtails, ztails, corners,
        )

    sp = P((ax_x, ax_z))
    cls_keys = (
        list(itertools.product((0, 1), repeat=d))
        if volume is not None else []
    )
    xt_keys = [k for k in cls_keys if k[0] == 0]
    zt_keys = [k for k in cls_keys if k[2] == 0]
    co_keys = [k for k in cls_keys if k[0] == 0 and k[2] == 0]

    def wrapper(px, pm, pv, pc):
        grids, sids, order, px_s, classes, xtails, ztails, corners = (
            local(px, pm, pv, pc)
        )
        return (
            grids
            + tuple(classes[k] for k in cls_keys)
            + tuple(xtails[k] for k in xt_keys)
            + tuple(ztails[k] for k in zt_keys)
            + tuple(corners[k] for k in co_keys)
            + (sids, order, px_s)
        )

    gspec = P(ax_x, None, ax_z)
    out_specs = (
        (gspec,) * (2 * d)
        + (gspec,) * len(cls_keys)
        + (P(None, ax_z),) * len(xt_keys)  # x tails: replicated on x
        + (P(ax_x, None),) * len(zt_keys)  # z tails: replicated on z
        + (P(None),) * len(co_keys)  # corner lines: fully replicated
        + (sp, sp, sp)
    )
    mapped = shard_map(
        wrapper, mesh=mesh, in_specs=(sp, sp, sp, sp),
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
        pos += len(cls_keys)
        xtails = {k: out[pos + i] for i, k in enumerate(xt_keys)}
        pos += len(xt_keys)
        ztails = {k: out[pos + i] for i, k in enumerate(zt_keys)}
        pos += len(zt_keys)
        corners = {k: out[pos + i] for i, k in enumerate(co_keys)}
        pos += len(co_keys)
        for k in cls_keys:
            v = classes[k]
            if k[2] == 0:
                zt = ztails[k][:, :, None]  # (nx, ny_c, 1)
                v = jnp.concatenate([v, zt], axis=2)
            if k[0] == 0:
                xt = xtails[k]
                if k[2] == 0:
                    xt = jnp.concatenate(
                        [xt, corners[k][:, None]], axis=1
                    )
                v = jnp.concatenate([v, xt[None]], axis=0)
            classes[k] = v
    sids, order, px_s = out[pos], out[pos + 1], out[pos + 2]
    base_shape = tuple(int(n) for n in gres)
    for a in range(d):
        pad = [
            (0, face_shapes[a][i] - base_shape[i]) for i in range(d)
        ]
        gms[a] = jnp.pad(gms[a], pad)
        gvs[a] = jnp.pad(gvs[a], pad)
    si = SortInfo(
        sorted_ids=sids, order=order,
        ext=(wx + 2, ny + 2, wz + 2),
        px_sorted=px_s,
    )
    if volume is not None:
        return gms, gvs, classes, si
    return gms, gvs, si


def sharded_fluid_levelset_2d(
    p_x, p_m, mesh: Mesh, spec: BucketSpec2D, gres, bound_min,
    cell_size, gdx: float,
):
    """2D-mesh shard-local union-of-balls level set: local 5^3
    scatter-min + width-2 min-folds along x AND z."""
    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered_sep,
        segment_reduce_cf,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        padding_dump_ids,
    )

    ax_x, ax_z = mesh.axis_names
    d = len(gres)
    wx, wz = spec.slab_wx, spec.slab_wz
    ny = int(gres[1])
    background = 3.0 * gdx
    r = gdx * 0.5 * math.sqrt(float(d)) * 1.02
    offsets = list(itertools.product(range(-2, 3), repeat=d))

    def local(px, pm):
        lo_x = jax.lax.axis_index(ax_x) * wx
        lo_z = jax.lax.axis_index(ax_z) * wz
        bmin = jnp.asarray(bound_min, dtype=px.dtype)
        h = jnp.asarray(cell_size, dtype=px.dtype)
        hi_clip = jnp.asarray(gres, dtype=jnp.int32) - 1
        gi = jnp.clip(
            jnp.floor((px - bmin) / h).astype(jnp.int32), 0, hi_clip
        )
        # local base-grid ids (homes resident)
        ids = (
            jnp.clip(gi[:, 0] - lo_x, 0, wx - 1) * ny + gi[:, 1]
        ) * wz + jnp.clip(gi[:, 2] - lo_z, 0, wz - 1)
        ids = padding_dump_ids(ids, pm, (wx, ny, wz))
        order = jnp.argsort(ids)
        sorted_ids = ids[order]
        px_s = px[order]
        gi_s = gi[order]
        pm_s = pm[order]
        n_loc = px.shape[0]
        n_off = len(offsets)
        offs_arr = jnp.asarray(offsets, jnp.int32)
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
                + bound_min[ax] - pxb
            )
            dist2 = cd * cd if dist2 is None else dist2 + cd * cd
        vals = jnp.sqrt(dist2) - r
        vals = jnp.where(pm_s[:, None] > 0, vals, background)
        vals, sorted_ids = jax.lax.optimization_barrier(
            (vals, sorted_ids)
        )
        seg_cf = segment_reduce_cf(
            vals, sorted_ids, wx * ny * wz, (wx, ny, wz), "min",
            background,
        )
        acc = fold_scattered_sep(
            seg_cf, [tuple(range(-2, 3))] * d,
            (wx + 4, ny, wz + 4), "min", background,
            noclip_axes=(0, 2),
        )
        owned, _ = _halo_fold_ax(acc, 2, ax_x, 0, "min", background)
        owned, _ = _halo_fold_ax(owned, 2, ax_z, 2, "min", background)
        return owned

    sp = P((ax_x, ax_z))
    mapped = shard_map(
        local, mesh=mesh, in_specs=(sp, sp),
        out_specs=P(ax_x, None, ax_z),
    )
    return mapped(p_x, p_m)


def sharded_g2p_all_2d(
    gvs, mesh: Mesh, spec: BucketSpec2D, gres, biases, bound_min,
    cell_size, sort_info,
):
    """2D-mesh shard-local gather-free G2P: width-1 clamped halo
    exchanges along x and z, then the shared table/broadcast/weights
    pipeline on local data."""
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted, unsort_rows,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        _g2p_offsets, _g2p_reduce,
    )

    ax_x, ax_z = mesh.axis_names
    d = len(gres)
    wx, wz = spec.slab_wx, spec.slab_wz
    ny = int(gres[1])
    offs_lists = _g2p_offsets(biases, d)
    base_shape = tuple(int(n) for n in gres)
    gv_base = [g[tuple(slice(0, n) for n in base_shape)] for g in gvs]

    def local(sids, order, px_s, *gv_locs):
        chans = []
        for a in range(d):
            gh = _halo_exchange_clamped_ax(gv_locs[a], 1, ax_x, 0)
            gh = _halo_exchange_clamped_ax(gh, 1, ax_z, 2)
            padded = jnp.pad(gh, ((1, 1), (2, 2), (1, 1)), mode="edge")
            sizes = (wx + 2, ny + 2, wz + 2)
            for o in offs_lists[a]:
                start = (o[0] + 1, 1 + o[1], o[2] + 1)
                win = jax.lax.slice(
                    padded, start,
                    tuple(s + z for s, z in zip(start, sizes)),
                )
                chans.append(win.reshape(-1))
        table = jnp.stack(chans, axis=-1)
        vals = segment_broadcast_sorted(table, sids)
        res_sorted = _g2p_reduce(
            vals, px_s, offs_lists, biases, bound_min, cell_size
        )
        return unsort_rows(res_sorted, order)

    sp = P((ax_x, ax_z))
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(sp, sp, sp) + (P(ax_x, None, ax_z),) * d,
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


def sharded_scatter_mass_volume_2d(
    p_x, p_m, mesh: Mesh, spec: BucketSpec2D, gres, pvol, bound_min,
    cell_size,
):
    """2D-mesh shard-local density mass/volume scatter + cell sort."""
    from python_fluid_simulation_tpu.ops.scatter import (
        fold_scattered_sep,
        segment_reduce_cf,
    )
    from python_fluid_simulation_tpu.ops.transfers import (
        SortInfo, _corner_setup, _corner_weight,
    )

    ax_x, ax_z = mesh.axis_names
    d = len(gres)
    wx, wz = spec.slab_wx, spec.slab_wz
    ny = int(gres[1])
    corners = list(itertools.product((0, 1), repeat=d))

    def local(px, pm):
        gi, _, _ = _corner_setup(px, bound_min, cell_size, (0.5,) * d)
        sorted_ids, order, ext = _sort_local(
            px, pm, gi, wx, ny, wz, ax_x, ax_z
        )
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
        size = ext[0] * ext[1] * ext[2]
        seg_cf = segment_reduce_cf(sorted_vals, sorted_ids, size, ext)

        outs = []
        for chsel in (
            jnp.asarray(list(range(0, 2 * len(corners), 2))),
            jnp.asarray(list(range(1, 2 * len(corners), 2))),
        ):
            acc = fold_scattered_sep(
                seg_cf[chsel], [(-1, 0)] * d,
                (wx + 3, ny, wz + 3), "add", 0.0, noclip_axes=(0, 2),
            )
            ext_arr = jax.lax.slice_in_dim(acc, 0, wx + 2, axis=0)
            ext_arr = jax.lax.slice_in_dim(ext_arr, 0, wz + 2, axis=2)
            owned, _ = _halo_fold_ax(ext_arr, 1, ax_x, 0)
            owned, _ = _halo_fold_ax(owned, 1, ax_z, 2)
            outs.append(owned)
        return outs[0], outs[1], sorted_ids, order, px_sorted

    sp = P((ax_x, ax_z))
    gspec = P(ax_x, None, ax_z)
    mapped = shard_map(
        local, mesh=mesh, in_specs=(sp, sp),
        out_specs=(gspec, gspec, sp, sp, sp),
    )
    gm, gvol, sids, order, px_s = mapped(p_x, p_m)
    si = SortInfo(
        sorted_ids=sids, order=order,
        ext=(wx + 2, ny + 2, wz + 2),
        px_sorted=px_s,
    )
    return gm, gvol, si


def sharded_apply_displacement_2d(
    disp_faces, mesh: Mesh, spec: BucketSpec2D, gres, bound_min,
    cell_size, sort_info,
):
    """2D-mesh shard-local displacement gather (width-2 clamped
    exchanges on x and z; the x-face trailing x-plane and z-face
    trailing z-plane are real gather targets handed to the last shard
    of the owning axis)."""
    from python_fluid_simulation_tpu.ops.scatter import (
        segment_broadcast_sorted, unsort_rows,
    )
    from python_fluid_simulation_tpu.ops.transfers import _corner_setup

    ax_x, ax_z = mesh.axis_names
    d = len(gres)
    wx, wz = spec.slab_wx, spec.slab_wz
    ny = int(gres[1])
    nx, nz = int(gres[0]), int(gres[2])
    offs_lists = [
        list(itertools.product(*[(0, 1, 2) if k == a else (0, 1)
                                 for k in range(d)]))
        for a in range(d)
    ]
    # slice the SHARDED axes to base extents (their trailing planes ride
    # the tail path); the y-face keeps its full ny+1 y-extent (unsharded)
    base = [f[:nx, :, :nz] for f in disp_faces]
    tail_x = disp_faces[0][nx, :, :nz]  # (ny, nz): x-face plane nx
    tail_z = disp_faces[2][:nx, :, nz]  # (nx, ny): z-face plane nz

    def local(sids, order, px_s, t_x, t_z, *locs):
        n_x = jax.lax.axis_size(ax_x)
        n_z = jax.lax.axis_size(ax_z)
        last_x = jax.lax.axis_index(ax_x) == n_x - 1
        last_z = jax.lax.axis_index(ax_z) == n_z - 1
        chans = []
        for a in range(d):
            # inject the real trailing plane of the OWN axis before the
            # other axis' exchange runs, so boundary shards hand their
            # neighbours true tail values (not edge replicas)
            if a == 2:
                gh = _halo_exchange_clamped_ax(locs[a], 2, ax_z, 2)
                # columns nz, nz+1 on the last z-shard: the real tail
                gh = gh.at[:, :, -2].set(
                    jnp.where(last_z, t_z, gh[:, :, -2])
                )
                gh = gh.at[:, :, -1].set(
                    jnp.where(last_z, t_z, gh[:, :, -1])
                )
                gh = _halo_exchange_clamped_ax(gh, 2, ax_x, 0)
            else:
                gh = _halo_exchange_clamped_ax(locs[a], 2, ax_x, 0)
                if a == 0:
                    # rows nx, nx+1 on the last x-shard: the real tail
                    gh = gh.at[-2].set(jnp.where(last_x, t_x, gh[-2]))
                    gh = gh.at[-1].set(jnp.where(last_x, t_x, gh[-1]))
                gh = _halo_exchange_clamped_ax(gh, 2, ax_z, 2)
            pads = ((1, 1), (1, 2) if a == 1 else (2, 2), (1, 1))
            padded = jnp.pad(gh, pads, mode="edge")
            sizes = (wx + 2, ny + 2, wz + 2)
            for o in offs_lists[a]:
                start = (
                    o[0] + 2,
                    o[1] if a == 1 else 1 + o[1],
                    o[2] + 2,
                )
                win = jax.lax.slice(
                    padded, start,
                    tuple(s + z for s, z in zip(start, sizes)),
                )
                chans.append(win.reshape(-1))
        table = jnp.stack(chans, axis=-1)
        vals = segment_broadcast_sorted(table, sids)

        outs = []
        col = 0
        for a in range(d):
            bias = tuple(0.0 if k == a else 0.5 for k in range(d))
            gi_a, _, w_a = _corner_setup(
                px_s, bound_min, cell_size, bias
            )
            gi_c, _, _ = _corner_setup(
                px_s, bound_min, cell_size, (0.5,) * d
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
        return unsort_rows(disp_sorted, order)

    sp = P((ax_x, ax_z))
    mapped = shard_map(
        local, mesh=mesh,
        in_specs=(sp, sp, sp, P(None, ax_z), P(ax_x, None))
        + (P(ax_x, None, ax_z),) * d,
        out_specs=sp,
    )
    return mapped(
        sort_info.sorted_ids, sort_info.order, sort_info.px_sorted,
        tail_x, tail_z, *base,
    )
