"""Cut-cell solid fractions: edge/tri/face in-fractions + face weights.

TPU-native replacement for the reference's ``solver/SolidFractionCommon.py``
(3 device fns) and ``SolidFraction2D/3D.py`` (1 kernel each).  All functions
are elementwise over arrays of SDF samples, so the whole computation fuses
into one VPU loop — no kernels needed (SURVEY §2.3 replacement table).

The tri/face formulas reproduce the reference *exactly*, including its
branch selection (SolidFractionCommon.py:18-60).  Note a property of the
reference formula: for in_count==2 the selected edge joins the two inside
vertices (edge fraction 1 → returns 0) and for in_count==1 the two outside
vertices (edge fraction 0 → returns 0), so tri_in_fraction effectively
equals "all three inside".  We keep the full formula anyway for
bit-compatible behaviour.
"""

from __future__ import annotations

import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.indexing import parity_view, P3_NODE, P2_NODE


def edge_in_fraction(lval, rval):
    """Fraction of the edge on the inside (<0) of the SDF pair.

    Reference: SolidFractionCommon.py:4-16.
    """
    l_in = lval < 0
    r_in = rval < 0
    diff = -jnp.abs(lval - rval)
    safe = jnp.where(diff == 0, -1.0, diff)
    frac_l = lval / safe
    frac_r = rval / safe
    mixed = jnp.where(l_in, frac_l, frac_r)
    return jnp.where(
        l_in & r_in, 1.0, jnp.where(~l_in & ~r_in, 0.0, mixed)
    )


def tri_in_fraction(v0, v1, v2):
    """Reference: SolidFractionCommon.py:18-50 (see module docstring)."""
    v = [v0, v1, v2]
    in0, in1, in2 = (x < 0 for x in v)
    in_count = (
        in0.astype(jnp.int32) + in1.astype(jnp.int32) + in2.astype(jnp.int32)
    )

    # in_count == 2: out_v = index of the single outside vertex
    # (k1,k2) = the other two; result = 1 - edge_in_fraction(v[k1],v[k2])
    def pick(out_v):
        k1 = (out_v + 1) % 3
        k2 = (out_v + 2) % 3
        return 1.0 - edge_in_fraction(v[k1], v[k2])

    out_v0 = ~in0
    out_v1 = in0 & ~in1
    two_val = jnp.where(out_v0, pick(0), jnp.where(out_v1, pick(1), pick(2)))

    # in_count == 1: in_v = index of the single inside vertex
    def pick1(in_v):
        k1 = (in_v + 1) % 3
        k2 = (in_v + 2) % 3
        return edge_in_fraction(v[k1], v[k2])

    in_v0 = in0
    in_v1 = ~in0 & in1
    one_val = jnp.where(in_v0, pick1(0), jnp.where(in_v1, pick1(1), pick1(2)))

    zero = jnp.zeros_like(v0)
    return jnp.where(
        in_count == 3,
        jnp.ones_like(v0),
        jnp.where(
            in_count == 2, two_val, jnp.where(in_count == 1, one_val, zero)
        ),
    )


def face_in_fraction(bl, br, tl, tr):
    """4-triangle fan about the centroid. SolidFractionCommon.py:52-60."""
    ce = 0.25 * (bl + br + tl + tr)
    return 0.25 * (
        tri_in_fraction(bl, br, ce)
        + tri_in_fraction(br, tr, ce)
        + tri_in_fraction(tr, tl, ce)
        + tri_in_fraction(tl, bl, ce)
    )


def compute_solid_frac_3d(sphi: jnp.ndarray):
    """Per-face non-solid area weights (wx, wy, wz) from the dual-lattice
    solid SDF.

    Reference: SolidFraction3D.compute_solid_frac_kernel (:6-26).  Only the
    *low* face of each cell is written; the trailing face plane of each
    array keeps its zero initialisation (a solid face — consistent with the
    enclosing container), matching the reference's never-written
    ``wx[gres, :, :]`` plane.

    Args:   sphi (2nx+1, 2ny+1, 2nz+1)
    Returns wx (nx+1,ny,nz), wy (nx,ny+1,nz), wz (nx,ny,nz+1)
    """
    nodes = (
        sphi[P3_NODE] if isinstance(sphi, dict)
        else parity_view(sphi, P3_NODE)
    )  # (nx+1, ny+1, nz+1)
    nx, ny, nz = (s - 1 for s in nodes.shape)

    def corner(i, j, k):  # sphi[2x+2i, 2y+2j, 2z+2k] over cells (nx,ny,nz)
        return nodes[i : i + nx, j : j + ny, k : k + nz]

    c000, c001 = corner(0, 0, 0), corner(0, 0, 1)
    c010, c011 = corner(0, 1, 0), corner(0, 1, 1)
    c100, c101 = corner(1, 0, 0), corner(1, 0, 1)
    c110 = corner(1, 1, 0)

    # wx: face_in_fraction(tlb, blb, tlf, blf)  (SolidFraction3D.py:22)
    wx_in = 1.0 - face_in_fraction(c010, c000, c011, c001)
    # wy: face_in_fraction(brb, blb, brf, blf)  (:24)
    wy_in = 1.0 - face_in_fraction(c100, c000, c101, c001)
    # wz: face_in_fraction(trb, tlb, brb, blb)  (:26)
    wz_in = 1.0 - face_in_fraction(c110, c010, c100, c000)

    wx = jnp.pad(wx_in, ((0, 1), (0, 0), (0, 0)))
    wy = jnp.pad(wy_in, ((0, 0), (0, 1), (0, 0)))
    wz = jnp.pad(wz_in, ((0, 0), (0, 0), (0, 1)))
    return wx, wy, wz


def compute_solid_frac_2d(sphi: jnp.ndarray):
    """2D face weights from edge in-fractions of dual-lattice endpoints.

    Reference: SolidFraction2D.compute_solid_frac_kernel (:6-20):
      wx[x,y]   = 1 - edge_in_fraction(sphi[2x,  2y+2], sphi[2x,  2y])
      wx[x+1,y] = 1 - edge_in_fraction(sphi[2x+2,2y+2], sphi[2x+2,2y])
      wy[x,y]   = 1 - edge_in_fraction(sphi[2x+2,2y  ], sphi[2x,  2y])
      wy[x,y+1] = 1 - edge_in_fraction(sphi[2x+2,2y+2], sphi[2x,  2y+2])
    over cells x,y in [0, gres-2] (the kernel's ``x >= gres-1: return``,
    :9 — note the 3D kernel uses ``>`` instead and covers all cells).
    Faces outside the written range keep their zero initialisation.
    """
    nodes = parity_view(sphi, P2_NODE)  # (nx+1, ny+1)
    nx, ny = (s - 1 for s in nodes.shape)

    # wx[x,y] written for x in [0, nx-1], y in [0, ny-2]
    wx_in = 1.0 - edge_in_fraction(
        nodes[0:nx, 1:ny], nodes[0:nx, 0 : ny - 1]
    )
    # wy[x,y] written for x in [0, nx-2], y in [0, ny-1]
    wy_in = 1.0 - edge_in_fraction(
        nodes[1:nx, 0:ny], nodes[0 : nx - 1, 0:ny]
    )
    wx = jnp.pad(wx_in, ((0, 1), (0, 1)))
    wy = jnp.pad(wy_in, ((0, 1), (0, 1)))
    return wx, wy
