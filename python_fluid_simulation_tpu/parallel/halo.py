"""Explicit halo exchange over ICI + shard_map'd stencil solves.

This module is the hand-scheduled counterpart of the GSPMD path: inside a
``shard_map`` region each device owns a contiguous x-slab of the grid and
exchanges one-cell halos with its mesh neighbours via ``lax.ppermute``
(TPU: ICI neighbour hops — the role NCCL send/recv would play on GPUs;
the reference has no distributed layer at all, SURVEY §2.4).  CG dot
products become ``lax.psum`` over the mesh axis — the only *global*
communication in the whole algorithm.

Used for: (a) validating the communication pattern on a virtual CPU mesh,
(b) the building block for Pallas remote-DMA halos later.
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


def halo_exchange(x: jnp.ndarray, axis_name: str, width: int = 1):
    """Append `width` cells received from both x-neighbours.

    Input: the local slab (n_loc, ...); output (n_loc + 2*width, ...) with
    [0:width] = right edge of the left neighbour, [-width:] = left edge of
    the right neighbour.  Edge devices receive zeros (domain boundary —
    the solvers mask boundary cells anyway).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    left_edge = x[:width]
    right_edge = x[-width:]
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
    return jnp.concatenate([from_left, x, from_right], axis=0)


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
    """The COMPLETE distributed Jacobi-PCG: the whole solve runs inside one
    shard_map region — per-iteration communication is exactly one 1-cell
    halo exchange of the search direction (ppermute over ICI) plus two
    scalar psum reductions, the design SURVEY §2.4 calls for.

    b/diag/precond_diag and each coefficient field are cell-centred global
    arrays (from pressure_coefficients / density_coefficients); x-extent
    must divide the mesh.  Returns (x, iters, residual).
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    nx = b.shape[0]
    assert nx % n == 0, "grid x-extent must divide the mesh"
    offs = tuple(off for off, _ in coefs)
    coef_fields = [c for _, c in coefs]
    n_coef = len(coef_fields)

    from python_fluid_simulation_tpu.ops.indexing import shift as _shift

    def local_solve(b_l, diag_l, pd_l, *coef_ls):
        nloc = b_l.shape[0]

        def matvec(p_l):
            p_h = halo_exchange(p_l, axis)
            out = diag_l * p_l
            for off, c_l in zip(offs, coef_ls):
                q = jax.lax.slice_in_dim(
                    p_h, 1 + off[0], 1 + off[0] + nloc, axis=0
                )
                if off[1] or off[2]:
                    q = _shift(q, (0, off[1], off[2]), 0.0)
                out = out + c_l * q
            return out

        def gdot(u, v):
            return psum_dot(u, v, axis)

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
        return x, k, res

    spec = P(axis, None, None)
    mapped = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec,) * (3 + n_coef),
        out_specs=(spec, P(), P()),
    )

    @jax.jit
    def solve():
        return mapped(b, diag, precond_diag, *coef_fields)

    return solve()
