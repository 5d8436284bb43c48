"""Explicit halo exchange over ICI + shard_map'd stencil solves.

This module is the hand-scheduled counterpart of the GSPMD path: inside a
``shard_map`` region each device owns a contiguous x-slab of the grid and
exchanges one-cell halos with its mesh neighbours via ``lax.ppermute``
(TPU: ICI neighbour hops — the role NCCL send/recv would play on GPUs;
the reference has no distributed layer at all, SURVEY §2.4).  CG dot
products become ``lax.psum`` over the mesh axis — the only *global*
communication in the whole algorithm.

Used for: (a) validating the communication pattern on a virtual CPU mesh,
(b) the engine's default halo transport.  The Pallas remote-DMA
alternative now exists (`halo_rdma.halo_exchange_rdma` — edge planes
pushed straight into the neighbour's buffer over ICI, no collective
runtime), bit-parity-validated against this ppermute path on the
8-device mesh; ppermute stays the default until multi-chip hardware is
available to measure the per-iteration latency win.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from python_fluid_simulation_tpu.solvers.pressure import (
    pressure_matvec_3d,
)

try:  # jax >= 0.4.32
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


import os as _os

# PFS_RDMA_HALO=1 routes width-1 axis-0 exchanges through the Pallas
# remote-DMA kernel (halo_rdma.py: neighbour barrier + make_async_
# remote_copy over ICI) instead of lax.ppermute — the hand-scheduled
# alternative that skips the collective runtime's per-call latency.
# Other shapes (width 2, minor axes) keep the ppermute path.  Parity is
# asserted in the driver dryrun ("rdma OK" line) and test_parallel.py.
# Read at TRACE time (inside jit tracing) so callers can flip it
# per-program without re-importing.
def _rdma_halo() -> bool:
    return _os.environ.get("PFS_RDMA_HALO", "0") != "0"


def _vma_kw() -> dict:
    """With the RDMA halo route on a NON-TPU backend, the Pallas
    distributed-interpret evaluator mis-tracks varying manual axes when
    a kernel compares axis_index with a literal (upstream jax issue —
    the error text itself suggests check_vma=False); relax the check for
    exactly that combination so the dryrun can drive the RDMA path on
    the virtual CPU mesh.  Hardware never interprets, so the check stays
    on everywhere real."""
    if _rdma_halo() and jax.default_backend() != "tpu":
        return {"check_vma": False}
    return {}


def halo_exchange(
    x: jnp.ndarray, axis_name: str, width: int = 1, array_axis: int = 0
):
    """Append `width` cells received from both neighbours along one mesh
    axis.

    Input: the local block; output extended by 2*width along
    ``array_axis`` with the leading halo = high edge of the low
    neighbour and the trailing halo = low edge of the high neighbour.
    Edge devices receive zeros (domain boundary — the solvers mask
    boundary cells anyway).
    """
    if _rdma_halo() and width == 1 and array_axis == 0 and x.ndim >= 2:
        from python_fluid_simulation_tpu.parallel.halo_rdma import (
            halo_exchange_rdma,
        )

        return halo_exchange_rdma(x, axis_name)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[array_axis]
    left_edge = jax.lax.slice_in_dim(x, 0, width, axis=array_axis)
    right_edge = jax.lax.slice_in_dim(
        x, size - width, size, axis=array_axis
    )
    # receive from left neighbour (their right edge): shift right
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    from_left = jnp.where(idx > 0, from_left, jnp.zeros_like(from_left))
    from_right = jnp.where(
        idx < n - 1, from_right, jnp.zeros_like(from_right)
    )
    return jnp.concatenate([from_left, x, from_right], axis=array_axis)


def psum_dot(a, b, axis_name: str):
    """Distributed <a, b>: local partial + psum over the mesh (ICI)."""
    local = sum(
        jnp.vdot(x, y, precision=jax.lax.Precision.HIGHEST)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
    return jax.lax.psum(local, axis_name)


def sharded_pressure_matvec(mesh: Mesh, w_faces, lphi):
    """A shard_map'd 7-point ghost-fluid matvec over x-slabs.

    Each device computes the stencil on its slab extended by 1-cell halos
    of (p, lphi) and the boundary face weights; face-weight arrays along x
    have nx+1 entries — the slab owns faces [lo, hi] inclusive, i.e. the
    local wx slab carries one extra trailing face received from the right.

    Returns a jitted callable p -> A p with the same sharded layout.
    Requires nx % n_devices == 0 (slab decomposition).
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    nx = lphi.shape[0]
    assert nx % n == 0, "grid x-extent must divide the mesh"

    wx, wy, wz = w_faces

    def local_matvec(p_loc, lphi_loc, wx_loc, wy_loc, wz_loc):
        # exchange 1-cell halos along x for every field: extended row i is
        # global cell (lo-1+i); wx_loc holds faces [lo, lo+nloc) so its
        # halo-extended form covers faces [lo-1, lo+nloc] — exactly the
        # faces the extended cells touch (cell g reads faces g and g+1)
        p_h = halo_exchange(p_loc, axis)
        lphi_h = halo_exchange(lphi_loc, axis, 1)
        wx_h = halo_exchange(wx_loc, axis, 1)
        wy_h = halo_exchange(wy_loc, axis, 1)
        wz_h = halo_exchange(wz_loc, axis, 1)
        out_h = pressure_matvec_3d(
            p_h,
            (wx_h, wy_h, wz_h),
            lphi_h,
        )
        out = out_h[1:-1]
        # interior_mask inside the matvec zeroed the halo-extended ends;
        # re-zero only the TRUE domain boundary slabs
        idx = jax.lax.axis_index(axis)
        nloc = out.shape[0]
        row = jnp.arange(nloc)
        keep = jnp.ones_like(out, dtype=bool)
        keep = keep & ~((idx == 0) & (row == 0))[:, None, None]
        keep = keep & ~((idx == jax.lax.axis_size(axis) - 1) & (row == nloc - 1))[
            :, None, None
        ]
        return jnp.where(keep, out, 0.0)

    spec_cell = P(axis, None, None)
    # wx has nx+1 faces (uneven across slabs); drop the global last face —
    # it is identically zero (never written by compute_solid_frac,
    # SolidFraction3D.py:21-25) and the rightmost device's halo exchange
    # re-materialises it as zero fill.
    wxm = wx[:-1]

    mapped = shard_map(
        local_matvec,
        mesh=mesh,
        in_specs=(spec_cell, spec_cell, spec_cell, spec_cell, spec_cell),
        out_specs=spec_cell,
        **_vma_kw(),
    )

    @jax.jit
    def matvec(p):
        return mapped(p, lphi, wxm, wy, wz)

    return matvec


def sharded_pressure_matvec_interior_oracle(w_faces, lphi):
    """Single-device reference for tests."""

    @jax.jit
    def matvec(p):
        return pressure_matvec_3d(p, w_faces, lphi)

    return matvec


def _pad_x(a, target: int, fill=0.0):
    """Zero-pad (or fill-pad) an array along axis 0 to `target` planes."""
    return _pad_axis(a, target, 0, fill)


def _pad_axis(a, target: int, axis: int, fill=0.0):
    if a.shape[axis] == target:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, target - a.shape[axis])
    return jnp.pad(a, pad, constant_values=fill)


def _padded_extent(nx: int, n_devices: int) -> int:
    return -(-nx // n_devices) * n_devices


def _mesh_spatial(mesh: Mesh):
    """[(mesh_axis_name, array_axis, n_devices_along_it)] of the spatial
    decomposition: 1D meshes shard array axis 0, 2D (x, z) meshes shard
    axes 0 and 2 (parallel.mesh.spatial_axes)."""
    from python_fluid_simulation_tpu.parallel.mesh import spatial_axes

    return [
        (name, arr_axis, mesh.shape[name])
        for name, arr_axis in spatial_axes(mesh)
    ]


def _pad_to_mesh(a, pairs, fill=0.0):
    """Pad each sharded array axis to a multiple of its mesh extent."""
    for _, arr_axis, n in pairs:
        a = _pad_axis(a, _padded_extent(a.shape[arr_axis], n), arr_axis, fill)
    return a


def _block_spec(pairs, ndim):
    spec = [None] * ndim
    for name, arr_axis, _ in pairs:
        spec[arr_axis] = name
    return P(*spec)


def _halo_all(x, pairs, width: int = 1):
    """Halo-exchange along every sharded spatial axis (one ppermute per
    axis; corner cells are never read by the 7-point/coupled stencils —
    all offsets move along a single axis — so no corner exchange)."""
    for name, arr_axis, _ in pairs:
        x = halo_exchange(x, name, width, arr_axis)
    return x


def _slice_offset(q, off, pairs, local_shape):
    """Read the ``off``-shifted block out of a halo-extended array:
    sharded axes slice the halo, unsharded axes zero-fill shift."""
    from python_fluid_simulation_tpu.ops.indexing import shift as _shift

    sharded = {arr_axis for _, arr_axis, _ in pairs}
    for a in sharded:
        q = jax.lax.slice_in_dim(
            q, 1 + off[a], 1 + off[a] + local_shape[a], axis=a
        )
    rest = tuple(
        0 if a in sharded else off[a] for a in range(len(off))
    )
    if any(rest):
        q = _shift(q, rest, 0.0)
    return q


def distributed_cell_poisson(
    mesh: Mesh,
    b,
    diag,
    coefs,
    precond_diag,
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-3,
    max_iter: int = 600,
):
    """The COMPLETE distributed Jacobi-PCG: the whole solve runs inside one
    shard_map region — per-iteration communication is exactly one 1-cell
    halo exchange of the search direction (ppermute over ICI) plus two
    scalar psum reductions, the design SURVEY §2.4 calls for.

    b/diag/precond_diag and each coefficient field are cell-centred global
    arrays (from pressure_coefficients / density_coefficients).  Arbitrary
    x-extents are supported: fields are zero-padded along x to a multiple
    of the mesh (pad rows carry diag=0/coef=0/precond=1 so the pad block
    is an inert identity subsystem that stays exactly zero through CG).
    Traceable — callable from inside an outer jit (the engine step).
    With a 2D (x, z) mesh the halo exchange runs along BOTH sharded axes
    (two ppermutes; the second moves the already-x-extended planes, so
    no separate corner exchange is needed) and the psums reduce over the
    whole mesh.  Returns (x, iters, residual).
    """
    pairs = _mesh_spatial(mesh)
    axis_names = tuple(name for name, _, _ in pairs)
    orig_shape = b.shape
    b_p = _pad_to_mesh(b, pairs)
    diag_p = _pad_to_mesh(diag, pairs)
    pd_p = _pad_to_mesh(precond_diag, pairs, fill=1.0)
    offs = tuple(off for off, _ in coefs)
    coef_fields = [_pad_to_mesh(c, pairs) for _, c in coefs]
    n_coef = len(coef_fields)

    def local_solve(b_l, diag_l, pd_l, *coef_ls):
        lshape = b_l.shape

        def matvec(p_l):
            p_h = _halo_all(p_l, pairs)
            out = diag_l * p_l
            for off, c_l in zip(offs, coef_ls):
                out = out + c_l * _slice_offset(p_h, off, pairs, lshape)
            return out

        def gdot(u, v):
            return psum_dot(u, v, axis_names)

        r0 = b_l
        z0 = r0 / pd_l
        delta0 = gdot(r0, z0)
        res0 = gdot(r0, r0)
        thresh = jnp.maximum(
            jnp.float32(tol) ** 2, jnp.float32(rel_tol) ** 2 * res0
        )

        def cond(c):
            _, _, _, _, res, k, delta = c
            return (res >= thresh) & (k < max_iter) & (delta != 0)

        def body(c):
            x, d, r, z, res, k, delta = c
            q = matvec(d)
            dq = gdot(d, q)
            alpha = jnp.where(dq != 0, delta / dq, 0.0)
            x = x + alpha * d
            r = r - alpha * q
            z = r / pd_l
            nd = gdot(r, z)
            nres = gdot(r, r)
            beta = jnp.where(delta != 0, nd / delta, 0.0)
            return (x, z + beta * d, r, z, nres, k + 1, nd)

        x0 = jnp.zeros_like(b_l)
        x, _, _, _, res, k, _ = jax.lax.while_loop(
            cond, body, (x0, z0, r0, z0, res0, jnp.int32(0), delta0)
        )
        return x, k, res, res0

    spec = _block_spec(pairs, b.ndim)
    mapped = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec,) * (3 + n_coef),
        out_specs=(spec, P(), P(), P()),
        **_vma_kw(),
    )
    x, k, res, res0 = mapped(b_p, diag_p, pd_p, *coef_fields)
    for a, (want, have) in enumerate(zip(orig_shape, x.shape)):
        if have != want:
            x = jax.lax.slice_in_dim(x, 0, want, axis=a)
    return x, k, res, res0


def sharded_cell_poisson_cg(
    mesh: Mesh,
    b,
    diag,
    coefs,
    precond_diag,
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-3,
    max_iter: int = 600,
):
    """Standalone (jit-wrapping) front-end of `distributed_cell_poisson`."""

    @jax.jit
    def solve():
        return distributed_cell_poisson(
            mesh, b, diag, coefs, precond_diag,
            tol=tol, rel_tol=rel_tol, max_iter=max_iter,
        )

    x, k, res, _ = solve()
    return x, k, res


def distributed_coupled_cg(
    mesh: Mesh,
    b_faces,
    x0_faces,
    diags,
    per_axis_terms,
    precond_diags,
    *,
    tol: float = 1e-3,
    rel_tol: float = 1e-3,
    max_iter: int = 600,
):
    """Distributed PCG for the coupled 3-field viscosity system.

    The reference's hottest kernel (matvecmul_{x,y,z}_kernel,
    ViscosityCGSolver3D.py:248-456) has no distributed counterpart — the
    reference is single-GPU.  Here each device owns an x-slab of all three
    staggered face arrays; one iteration is exactly THREE 1-plane halo
    exchanges (vx, vy, vz of the search direction) + two scalar psums.
    All cross-field term offsets have |Δx| ≤ 1 (the term table in
    solvers/viscosity.py), so width-1 halos suffice.

    Arguments are the materialised coefficient fields from
    `viscosity_term_fields`: diags/precond_diags are per-axis face arrays,
    per_axis_terms[a] is a list of (field, voff, coef) with coef shaped
    like face a.  Face arrays have different global extents per axis
    ((nx+1,ny,nz), (nx,ny+1,nz), (nx,ny,nz+1)); all sharded spatial axes
    are padded to one common multiple of the mesh so the blocks align
    (2D (x, z) meshes shard/halo BOTH axes; the sequential exchange
    extends corners for the cross-axis couplings).  Traceable.
    Returns (x_faces, iters, residual).
    """
    pairs = _mesh_spatial(mesh)
    axis_names = tuple(name for name, _, _ in pairs)
    sharded_axes = [arr_axis for _, arr_axis, _ in pairs]
    d = len(b_faces)
    shapes = [v.shape for v in b_faces]
    # common padded extent per sharded axis across all face shapes
    common = {}
    for _, arr_axis, n_dev in pairs:
        common[arr_axis] = _padded_extent(
            max(s[arr_axis] for s in shapes), n_dev
        )

    from python_fluid_simulation_tpu.ops.indexing import sample as _sample

    def pad_common(v, fill=0.0):
        for arr_axis, target in common.items():
            v = _pad_axis(v, target, arr_axis, fill)
        return v

    b_p = tuple(pad_common(v) for v in b_faces)
    x0_p = tuple(pad_common(v) for v in x0_faces)
    diag_p = tuple(pad_common(v) for v in diags)
    pd_p = tuple(pad_common(v, fill=1.0) for v in precond_diags)
    # flatten the term coefficients into one arg list for shard_map
    term_meta = []  # (a, field, voff)
    term_coefs = []
    for a in range(d):
        for field, voff, coef in per_axis_terms[a]:
            term_meta.append((a, field, tuple(int(o) for o in voff)))
            term_coefs.append(pad_common(coef))

    def local_solve(*args):
        bs = args[0:d]
        x0s = args[d : 2 * d]
        ds = args[2 * d : 3 * d]
        pds = args[3 * d : 4 * d]
        coefs_l = args[4 * d :]
        lshape = bs[0].shape

        def matvec(vs):
            vhs = [_halo_all(v, pairs) for v in vs]
            outs = [ds[a] * vs[a] for a in range(d)]
            for (a, field, voff), c_l in zip(term_meta, coefs_l):
                q = vhs[field]
                for ax in sharded_axes:
                    q = jax.lax.slice_in_dim(
                        q, 1 + voff[ax], 1 + voff[ax] + lshape[ax],
                        axis=ax,
                    )
                rest_off = tuple(
                    0 if ax in sharded_axes else voff[ax]
                    for ax in range(len(voff))
                )
                tgt = tuple(
                    lshape[ax] if ax in sharded_axes else bs[a].shape[ax]
                    for ax in range(len(voff))
                )
                q = _sample(q, rest_off, tgt, 0.0)
                outs[a] = outs[a] + c_l * q
            return tuple(outs)

        def gdot(us, vs):
            local = sum(
                jnp.vdot(u, v, precision=jax.lax.Precision.HIGHEST)
                for u, v in zip(us, vs)
            )
            return jax.lax.psum(local, axis_names)

        q0 = matvec(x0s)
        r0 = tuple(b - q for b, q in zip(bs, q0))
        z0 = tuple(r / pdd for r, pdd in zip(r0, pds))
        delta0 = gdot(r0, z0)
        res0 = gdot(r0, r0)
        thresh = jnp.maximum(
            jnp.float32(tol) ** 2, jnp.float32(rel_tol) ** 2 * res0
        )

        def cond(c):
            _, _, _, _, res, k, delta = c
            return (res >= thresh) & (k < max_iter) & (delta != 0)

        def body(c):
            x, dd, r, z, res, k, delta = c
            q = matvec(dd)
            dq = gdot(dd, q)
            alpha = jnp.where(dq != 0, delta / dq, 0.0)
            x = tuple(xx + alpha * d_ for xx, d_ in zip(x, dd))
            r = tuple(rr - alpha * qq for rr, qq in zip(r, q))
            z = tuple(rr / pdd for rr, pdd in zip(r, pds))
            nd = gdot(r, z)
            nres = gdot(r, r)
            beta = jnp.where(delta != 0, nd / delta, 0.0)
            dd = tuple(zz + beta * d_ for zz, d_ in zip(z, dd))
            return (x, dd, r, z, nres, k + 1, nd)

        x, _, _, _, res, k, _ = jax.lax.while_loop(
            cond, body, (x0s, z0, r0, z0, res0, jnp.int32(0), delta0)
        )
        return (*x, k, res, res0)

    specs = tuple(
        _block_spec(pairs, v.ndim)
        for v in (b_p + x0_p + diag_p + pd_p + tuple(term_coefs))
    )
    out_specs = tuple(
        _block_spec(pairs, v.ndim) for v in b_p
    ) + (P(), P(), P())
    mapped = shard_map(
        local_solve, mesh=mesh, in_specs=specs, out_specs=out_specs,
        **_vma_kw(),
    )
    out = mapped(*b_p, *x0_p, *diag_p, *pd_p, *term_coefs)
    xs, k, res, res0 = out[:d], out[d], out[d + 1], out[d + 2]

    def unpad(x, s):
        for a, want in enumerate(s):
            if x.shape[a] != want:
                x = jax.lax.slice_in_dim(x, 0, want, axis=a)
        return x

    xs = tuple(unpad(x, s) for x, s in zip(xs, shapes))
    return xs, k, res, res0
