"""Cut-cell fraction oracles (closed forms per SolidFractionCommon.py)."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import (
    compute_solid_frac_2d,
    compute_solid_frac_3d,
    edge_in_fraction,
    face_in_fraction,
    tri_in_fraction,
)


def test_edge_in_fraction_cases():
    l = jnp.array([-1.0, 1.0, -1.0, 3.0, 0.0])
    r = jnp.array([-2.0, 2.0, 3.0, -1.0, 0.0])
    out = np.asarray(edge_in_fraction(l, r))
    # both in -> 1; both out -> 0; mixed -> |neg| / |l - r|
    np.testing.assert_allclose(out, [1.0, 0.0, 0.25, 0.25, 0.0], atol=1e-7)


def test_tri_in_fraction_matches_reference_branches():
    # all-in -> 1, all-out -> 0
    assert float(tri_in_fraction(jnp.float32(-1), jnp.float32(-2), jnp.float32(-3))) == 1.0
    assert float(tri_in_fraction(jnp.float32(1), jnp.float32(2), jnp.float32(3))) == 0.0
    # the reference's 2-in and 1-in branches pick the edge between the two
    # same-side vertices, collapsing to 0 (see fractions.py docstring)
    assert float(tri_in_fraction(jnp.float32(-1), jnp.float32(-2), jnp.float32(3))) == 0.0
    assert float(tri_in_fraction(jnp.float32(-1), jnp.float32(2), jnp.float32(3))) == 0.0


def test_face_in_fraction_levels():
    # fully inside / outside
    f = face_in_fraction(*[jnp.float32(-1)] * 4)
    assert float(f) == 1.0
    f = face_in_fraction(*[jnp.float32(1)] * 4)
    assert float(f) == 0.0
    # half plane: bl,br in; tl,tr out; centroid ce = 0 (not < 0)
    f = face_in_fraction(
        jnp.float32(-1), jnp.float32(-1), jnp.float32(1), jnp.float32(1)
    )
    assert float(f) == 0.0  # no fan triangle fully inside
    # deeper half plane: centroid negative -> bottom fan triangle inside
    f = face_in_fraction(
        jnp.float32(-3), jnp.float32(-3), jnp.float32(1), jnp.float32(1)
    )
    assert float(f) == 0.25


def _halfspace_sphi(dual_res, axis, plane):
    """sphi > 0 above `plane` (in dual index units), < 0 below."""
    idx = np.arange(dual_res[axis])
    shape = [1] * len(dual_res)
    shape[axis] = dual_res[axis]
    f = (idx - plane).astype(np.float64).reshape(shape)
    return np.broadcast_to(f, dual_res).copy()


def test_solid_frac_3d_halfspace():
    n = (4, 4, 4)
    dual = tuple(2 * k + 1 for k in n)
    # solid below dual-plane y=4.5: cells y in {0,1} have all corners
    # inside, cell 2 is mixed (skipped), cell 3 fully outside
    sphi = _halfspace_sphi(dual, 1, 4.5)
    wx, wy, wz = compute_solid_frac_3d(jnp.asarray(sphi))
    wx, wy, wz = np.asarray(wx), np.asarray(wy), np.asarray(wz)
    assert wx.shape == (5, 4, 4) and wy.shape == (4, 5, 4) and wz.shape == (4, 4, 5)
    # x-faces in fully-solid cells (y=0,1): weight 0; fully-fluid (y=3): 1
    np.testing.assert_allclose(wx[:4, 0:2, :], 0.0, atol=1e-7)
    np.testing.assert_allclose(wx[:4, 3, :], 1.0, atol=1e-7)
    # trailing plane never written
    np.testing.assert_allclose(wx[4], 0.0)
    np.testing.assert_allclose(wy[:, 4, :], 0.0)
    np.testing.assert_allclose(wz[..., 4], 0.0)


def test_solid_frac_3d_against_loop_oracle():
    rng = np.random.default_rng(0)
    n = (3, 4, 5)
    dual = tuple(2 * k + 1 for k in n)
    sphi = rng.standard_normal(dual)
    wx, wy, wz = compute_solid_frac_3d(jnp.asarray(sphi, dtype=jnp.float32))

    def edge(l, r):
        li, ri = l < 0, r < 0
        if li and ri:
            return 1.0
        if not li and not ri:
            return 0.0
        diff = -abs(l - r)
        return (l if li else r) / diff

    def tri(v0, v1, v2):
        v = [v0, v1, v2]
        ins = [x < 0 for x in v]
        c = sum(ins)
        if c == 3:
            return 1.0
        if c == 0:
            return 0.0
        if c == 2:
            out_v = 0 if not ins[0] else (2 if ins[1] else 1)
            return 1.0 - edge(v[(out_v + 1) % 3], v[(out_v + 2) % 3])
        in_v = 0 if ins[0] else (2 if not ins[1] else 1)
        return edge(v[(in_v + 1) % 3], v[(in_v + 2) % 3])

    def face(bl, br, tl, tr):
        ce = 0.25 * (bl + br + tl + tr)
        return 0.25 * (
            tri(bl, br, ce) + tri(br, tr, ce) + tri(tr, tl, ce) + tri(tl, bl, ce)
        )

    for x in range(n[0]):
        for y in range(n[1]):
            for z in range(n[2]):
                s = lambda i, j, k: sphi[2 * x + i, 2 * y + j, 2 * z + k]
                exp_wx = 1.0 - face(s(0, 2, 0), s(0, 0, 0), s(0, 2, 2), s(0, 0, 2))
                exp_wy = 1.0 - face(s(2, 0, 0), s(0, 0, 0), s(2, 0, 2), s(0, 0, 2))
                exp_wz = 1.0 - face(s(2, 2, 0), s(0, 2, 0), s(2, 0, 0), s(0, 0, 0))
                np.testing.assert_allclose(wx[x, y, z], exp_wx, atol=1e-5)
                np.testing.assert_allclose(wy[x, y, z], exp_wy, atol=1e-5)
                np.testing.assert_allclose(wz[x, y, z], exp_wz, atol=1e-5)


def test_solid_frac_2d_halfspace():
    n = (4, 4)
    dual = tuple(2 * k + 1 for k in n)
    sphi = _halfspace_sphi(dual, 1, 4.5)
    wx, wy = compute_solid_frac_2d(jnp.asarray(sphi))
    wx, wy = np.asarray(wx), np.asarray(wy)
    assert wx.shape == (5, 4) and wy.shape == (4, 5)
    # wx written over x in [0,3], y in [0,2]: solid rows y=0,1 -> 0
    np.testing.assert_allclose(wx[:4, 0:2], 0.0, atol=1e-7)
    # wy written over x in [0,2], y in [0,3]: solid rows (node row 2y
    # below the plane) y=0..2 -> 0; fluid row y=3 -> 1
    np.testing.assert_allclose(wy[:3, 0:2], 0.0, atol=1e-7)
    np.testing.assert_allclose(wy[:3, 3], 1.0, atol=1e-7)
    # unwritten trailing regions stay zero
    np.testing.assert_allclose(wx[4, :], 0.0)
    np.testing.assert_allclose(wx[:, 3], 0.0)
    np.testing.assert_allclose(wy[3, :], 0.0)
    np.testing.assert_allclose(wy[:, 4], 0.0)
