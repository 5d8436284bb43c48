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
