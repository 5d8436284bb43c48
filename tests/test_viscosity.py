"""Viscosity operator: symmetry, invariances, diffusion behaviour."""

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.solvers.viscosity import (
    viscosity_diag_3d,
    viscosity_matvec_3d,
    viscosity_rhs_3d,
    viscosity_solve_3d,
)

N = (6, 6, 6)
DUAL = tuple(2 * k + 1 for k in N)
CELL_VOL = 1.0


def _shapes():
    return [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]


def _rand_faces(seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in _shapes()
    )


def test_matvec_symmetry_random_geometry():
    rng = np.random.default_rng(1)
    sphi = jnp.asarray(rng.standard_normal(DUAL).astype(np.float32))
    vol = jnp.asarray(rng.random(DUAL).astype(np.float32))
    s_mu = 0.37
    u = _rand_faces(2)
    v = _rand_faces(3)
    au = viscosity_matvec_3d(u, s_mu, sphi, vol)
    av = viscosity_matvec_3d(v, s_mu, sphi, vol)
    # restrict to the operator's active subspace: re-apply to masked inputs
    # (matvec zeroes inactive outputs; symmetry must hold on active dofs)
    def mask(fs):
        zero = tuple(jnp.zeros_like(f) for f in fs)
        # active pattern = where matvec of ones is written
        ones = tuple(jnp.ones_like(f) for f in fs)
        act = viscosity_matvec_3d(ones, 0.0, sphi, jnp.ones_like(vol))
        return tuple(jnp.where(a != 0, f, 0.0) for a, f in zip(act, fs))

    um, vm = mask(u), mask(v)
    aum = viscosity_matvec_3d(um, s_mu, sphi, vol)
    avm = viscosity_matvec_3d(vm, s_mu, sphi, vol)
    lhs = sum(float(jnp.vdot(a, b)) for a, b in zip(aum, vm))
    rhs = sum(float(jnp.vdot(a, b)) for a, b in zip(um, avm))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-3)


def test_uniform_velocity_is_fixed_point_all_fluid():
    sphi = jnp.ones(DUAL, jnp.float32)  # all non-solid
    vol = jnp.ones(DUAL, jnp.float32)
    v = tuple(jnp.full(s, 1.7, jnp.float32) for s in _shapes())
    res = viscosity_solve_3d(
        0.01, 5.0, 1.0, v, sphi, vol, CELL_VOL, tol=1e-6, max_iter=500
    )
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(res.v_faces[a]), 1.7, rtol=1e-4
        )


def test_diag_matches_basis_matvec():
    rng = np.random.default_rng(4)
    sphi = jnp.asarray(rng.standard_normal(DUAL).astype(np.float32))
    vol = jnp.asarray(rng.random(DUAL).astype(np.float32))
    s_mu = 0.2
    diag = viscosity_diag_3d(s_mu, sphi, vol, _shapes())
    c = (3, 3, 3)
    for a in range(3):
        e = tuple(
            jnp.zeros(s, jnp.float32).at[c].set(1.0) if i == a
            else jnp.zeros(s, jnp.float32)
            for i, s in enumerate(_shapes())
        )
        ae = viscosity_matvec_3d(e, s_mu, sphi, vol)
        got = float(ae[a][c])
        if got != 0.0:  # active site
            np.testing.assert_allclose(got, float(diag[a][c]), rtol=1e-5)


def test_shear_layer_diffuses():
    """High viscosity smooths a step shear profile (vx varying along y)."""
    sphi = jnp.ones(DUAL, jnp.float32)
    vol = jnp.ones(DUAL, jnp.float32)
    shapes = _shapes()
    vy0 = jnp.arange(shapes[0][1]) >= shapes[0][1] // 2
    vx = jnp.broadcast_to(
        vy0.astype(jnp.float32).reshape(1, -1, 1), shapes[0]
    )
    v = (vx, jnp.zeros(shapes[1], jnp.float32), jnp.zeros(shapes[2], jnp.float32))
    res = viscosity_solve_3d(
        0.1, 10.0, 1.0, v, sphi, vol, CELL_VOL, tol=1e-7, max_iter=2000
    )
    out = np.asarray(res.v_faces[0])
    # interior profile is smoothed: the jump across the midline shrinks
    mid = shapes[0][1] // 2
    jump0 = 1.0
    jump1 = out[3, mid, 3] - out[3, mid - 1, 3]
    assert 0 < jump1 < 0.6 * jump0
    # total x-momentum on interior faces is conserved by diffusion
    assert abs(out[1:-1, 1:-1, 1:-1].mean() - float(vx[1:-1, 1:-1, 1:-1].mean())) < 5e-2


def test_solid_faces_untouched_and_dirichlet_drag():
    """Solid bottom half: solution only written at non-solid faces; fluid
    near the wall is dragged toward the (zero) wall velocity."""
    iy = np.arange(DUAL[1]).reshape(1, -1, 1)
    sphi_np = np.broadcast_to(
        (iy - (DUAL[1] // 2) - 0.5).astype(np.float32), DUAL
    ).copy()
    sphi = jnp.asarray(sphi_np)  # solid where dual y < mid
    vol = jnp.ones(DUAL, jnp.float32)
    shapes = _shapes()
    v = tuple(jnp.full(s, 1.0, jnp.float32) for s in shapes)
    res = viscosity_solve_3d(
        0.05, 20.0, 1.0, v, sphi, vol, CELL_VOL, tol=1e-7, max_iter=2000
    )
    vx = np.asarray(res.v_faces[0])
    # faces inside the solid keep their input value (apply writes only
    # non-solid faces, ViscosityCGSolver3D.py:458-470)
    solid_face = sphi_np[0::2, 1::2, 1::2] < 0
    np.testing.assert_allclose(vx[solid_face], 1.0)
    # the solid Dirichlet values are the EXTRAPOLATED fluid velocities
    # (solve :573: extrapolate before building b — the commented-out sv[]
    # reads in the RHS kernels :65-106 were replaced by extrapolated v),
    # so a uniform field is a fixed point even with solids present.
    interior = np.zeros_like(vx, bool)
    interior[1:-1, 1:-1, 1:-1] = True
    np.testing.assert_allclose(vx[interior & ~solid_face], 1.0, rtol=1e-4)


def test_viscosity_mg_precond_matches_jacobi():
    """precond_kind='mg' (block-diagonal per-axis MG) solves the same
    coupled system: same solution as the Jacobi-PCG path, and the V-cycle
    preconditioner stays a fixed SPD operator (CG converges)."""
    import numpy as np

    rng = np.random.default_rng(21)
    nn = (10, 8, 9)
    dual = tuple(2 * k + 1 for k in nn)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32) + 0.5)
    lvol = jnp.asarray(
        np.abs(rng.standard_normal(dual)).astype(np.float32) * 1e-4
    )
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    kw = dict(tol=1e-6, rel_tol=1e-6, max_iter=500, use_pallas="off")
    res_j = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, **kw
    )
    res_m = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3,
        precond_kind="mg", **kw
    )
    assert bool(res_m.stats.converged)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(res_m.v_faces[a]),
            np.asarray(res_j.v_faces[a]),
            rtol=5e-3,
            atol=5e-4,
        )


def test_batched_mg_matches_per_axis_cycles():
    """The batched viscosity V-cycle (one cycle for the 3 axis blocks)
    must equal three independent make_mg_preconditioner cycles."""
    import numpy as np
    import jax.numpy as jnp

    from python_fluid_simulation_tpu.ops.indexing import split_parity
    from python_fluid_simulation_tpu.solvers.multigrid import (
        make_batched_mg_preconditioner,
        make_mg_preconditioner,
    )
    from python_fluid_simulation_tpu.solvers.viscosity import (
        viscosity_term_fields,
    )

    rng = np.random.default_rng(2)
    gres = (10, 12, 10)
    dual = tuple(2 * n + 1 for n in gres)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    vol = jnp.asarray(rng.random(dual).astype(np.float32)) * 1e-3
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(gres))
        for a in range(3)
    ]
    diags, per_axis, _ = viscosity_term_fields(
        0.2, split_parity(sphi, 3), split_parity(vol, 3), shapes
    )
    systems = []
    for a in range(3):
        same = [
            (voff, coef)
            for field, voff, coef in per_axis[a]
            if field == a and sum(abs(o) for o in voff) == 1
        ]
        systems.append((diags[a], same))
    batched = make_batched_mg_preconditioner(systems)
    singles = [make_mg_preconditioner(d, c) for d, c in systems]
    rs = [
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    ]
    zb = batched(rs)
    for a in range(3):
        zs = singles[a](rs[a])
        np.testing.assert_allclose(
            np.asarray(zb[a]), np.asarray(zs), rtol=2e-4, atol=1e-6
        )


def test_viscosity_auto_precond_matches_jacobi():
    """precond_kind='auto' (lax.cond hysteresis preconditioner switch)
    reaches the same solution as the plain Jacobi path and converges,
    whichever branch the carried flag selects."""
    import numpy as np

    rng = np.random.default_rng(22)
    nn = (9, 8, 10)
    dual = tuple(2 * k + 1 for k in nn)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32) + 0.5)
    lvol = jnp.asarray(
        np.abs(rng.standard_normal(dual)).astype(np.float32) * 1e-4
    )
    shapes = [
        tuple(k + (1 if i == a else 0) for i, k in enumerate(nn))
        for a in range(3)
    ]
    v = tuple(
        jnp.asarray(rng.standard_normal(s).astype(np.float32))
        for s in shapes
    )
    kw = dict(tol=1e-6, rel_tol=1e-6, max_iter=500, use_pallas="off")
    res_j = viscosity_solve_3d(
        1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3, **kw
    )
    for flag in (True, False):  # force-mg and force-jacobi regimes
        res_a = viscosity_solve_3d(
            1.0 / 60, 1.0, 1000.0, v, sphi, lvol, 0.1**3,
            precond_kind="auto", auto_use_mg=jnp.asarray(flag), **kw
        )
        assert bool(res_a.stats.converged)
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(res_a.v_faces[a]),
                np.asarray(res_j.v_faces[a]),
                rtol=5e-3,
                atol=5e-4,
            )
