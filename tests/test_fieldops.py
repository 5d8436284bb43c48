"""Level set, fluid volume, extrapolation, boundary conditions."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.boundary import apply_boundary_condition
from python_fluid_simulation_tpu.ops.extrapolate import extrapolate
from python_fluid_simulation_tpu.ops.levelset import (
    compute_fluid_levelset,
    compute_fluid_volume,
    compute_fluid_volume_classes,
)

N = (8, 8, 8)
H = (0.125, 0.125, 0.125)
BMIN = (0.0, 0.0, 0.0)
GDX = 0.125


def test_levelset_single_particle():
    px = jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32)
    phi = np.asarray(compute_fluid_levelset(px, N, BMIN, H, GDX))
    r = GDX * 0.5 * np.sqrt(3) * 1.02
    # cell (4,4,4) center at 0.5625 -> dist = |0.0625|*sqrt(3) - r
    d = abs(0.5625 - 0.5) * np.sqrt(3)
    np.testing.assert_allclose(phi[4, 4, 4], d - r, atol=1e-6)
    # far cells keep the 3*gdx background
    np.testing.assert_allclose(phi[0, 0, 0], 3 * GDX, atol=1e-6)
    # the 5^3 stencil marks out to 2 cells around the home cell
    assert phi[4, 4, 4] < 0  # inside the particle ball
    assert phi[6, 4, 4] < 3 * GDX  # stencil reached


def test_levelset_min_over_particles():
    px = jnp.asarray([[0.5, 0.5, 0.5], [0.51, 0.5, 0.5]], jnp.float32)
    phi2 = np.asarray(compute_fluid_levelset(px, N, BMIN, H, GDX))
    phi_each = [
        np.asarray(compute_fluid_levelset(px[i : i + 1], N, BMIN, H, GDX))
        for i in range(2)
    ]
    np.testing.assert_allclose(
        phi2, np.minimum(phi_each[0], phi_each[1]), atol=1e-6
    )


def test_fluid_volume_conservation_and_clamp():
    rng = np.random.default_rng(0)
    px = jnp.asarray(0.3 + 0.4 * rng.random((100, 3)), jnp.float32)
    dual = tuple(2 * k + 1 for k in N)
    fine_h = tuple(h / 2 for h in H)
    pvol = 1e-6  # far below the fine cell volume -> no clamping
    vol = np.asarray(compute_fluid_volume(px, pvol, dual, BMIN, fine_h))
    np.testing.assert_allclose(vol.sum(), 100 * pvol, rtol=1e-4)
    # heavy clump -> clamped at fine cell volume
    px2 = jnp.asarray(np.full((500, 3), 0.5, np.float32))
    vol2 = np.asarray(compute_fluid_volume(px2, 1e-3, dual, BMIN, fine_h))
    fine_vol = fine_h[0] * fine_h[1] * fine_h[2]
    assert vol2.max() <= fine_vol + 1e-9


def test_fluid_volume_classes_match_dense():
    """compute_fluid_volume_classes == split_parity(compute_fluid_volume)
    for in-domain particles (including ones exactly on the domain
    bounds, whose out-of-range corner weights are exactly zero); only
    summation order differs (fp32, ~1e-10)."""
    from python_fluid_simulation_tpu.ops.indexing import split_parity

    rng = np.random.default_rng(3)
    gres = (6, 9, 7)
    bmin = (-0.2, 0.0, 0.1)
    h = 0.05
    fine_h = (h / 2,) * 3
    dual = tuple(2 * n + 1 for n in gres)
    ext = np.asarray([n * h for n in gres])
    px = jnp.asarray(
        np.asarray(bmin) + rng.random((400, 3)) * ext, jnp.float32
    )
    # padding particles (m=0) and exact-boundary particles
    px = jnp.concatenate(
        [
            px,
            jnp.asarray([bmin], jnp.float32),
            jnp.asarray([np.asarray(bmin) + ext], jnp.float32),
        ]
    )
    pm = jnp.asarray(
        (rng.random(px.shape[0]) > 0.1).astype(np.float32)
    )
    pvol = 1.3e-5
    dense = split_parity(
        compute_fluid_volume(px, pvol, dual, bmin, fine_h, pm=pm), 3
    )
    classes = compute_fluid_volume_classes(
        px, pvol, gres, bmin, fine_h, pm=pm
    )
    assert set(classes) == set(dense)
    for p in dense:
        np.testing.assert_allclose(
            np.asarray(classes[p]),
            np.asarray(dense[p]),
            rtol=1e-4,
            atol=1e-9,
        )


def test_extrapolate_layer_peel():
    v = jnp.zeros((7, 7, 7), jnp.float32).at[3, 3, 3].set(5.0)
    valid = jnp.zeros((7, 7, 7), bool).at[3, 3, 3].set(True)
    v1, valid1 = extrapolate(v, valid, 1)
    # direct neighbours take the value; diagonals not yet
    assert float(v1[4, 3, 3]) == 5.0 and bool(valid1[4, 3, 3])
    assert float(v1[4, 4, 3]) == 0.0 and not bool(valid1[4, 4, 3])
    v2, valid2 = extrapolate(v, valid, 2)
    assert float(v2[4, 4, 3]) == 5.0
    # boundary cells never updated
    assert not bool(valid2[0, 3, 3])


def test_extrapolate_averages_neighbors():
    v = (
        jnp.zeros((7, 7, 7), jnp.float32)
        .at[2, 3, 3].set(2.0)
        .at[4, 3, 3].set(6.0)
    )
    valid = (
        jnp.zeros((7, 7, 7), bool).at[2, 3, 3].set(True).at[4, 3, 3].set(True)
    )
    v1, _ = extrapolate(v, valid, 1)
    assert float(v1[3, 3, 3]) == 4.0


def _bc_setup(vx_val):
    """Fluid moving toward a solid floor below dual-plane y=4.5."""
    dual = tuple(2 * k + 1 for k in N)
    iy = np.arange(dual[1]).reshape(1, -1, 1)
    sphi = np.broadcast_to(
        ((iy - 4.5) * H[0] / 2).astype(np.float32), dual
    ).copy()
    sv = np.zeros(dual + (3,), np.float32)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    gv = [jnp.zeros(s, jnp.float32) for s in shapes]
    gm = [jnp.ones(s, jnp.float32) for s in shapes]
    gv[1] = jnp.full(shapes[1], vx_val, jnp.float32)
    return jnp.asarray(sphi), jnp.asarray(sv), gv, gm


def test_boundary_condition_cancels_inward_normal_velocity():
    sphi, sv, gv, gm = _bc_setup(-2.0)  # falling onto the floor
    out = apply_boundary_condition(gv, gm, sphi, sv, H[0])
    vy = np.asarray(out[1])
    # y-faces at dual y=4 (index 2) are within a cell of the solid and
    # moving inward: the inward component is damped by (1 - ndist)
    before = -2.0
    ndist = float(sphi[9, 4, 9]) / H[0]
    expected = before * ndist  # dv = -v*(1-ndist) for face-normal motion
    np.testing.assert_allclose(vy[4, 2, 4], expected, rtol=1e-4)
    # far faces unchanged
    np.testing.assert_allclose(vy[4, 6, 4], before, rtol=1e-6)


def test_boundary_condition_keeps_outward_velocity():
    sphi, sv, gv, gm = _bc_setup(+2.0)  # moving away from the floor
    out = apply_boundary_condition(gv, gm, sphi, sv, H[0])
    vy = np.asarray(out[1])
    np.testing.assert_allclose(vy[4, 2, 4], 2.0, rtol=1e-6)
