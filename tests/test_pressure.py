"""Pressure projection: operator symmetry, hydrostatic equilibrium,
post-projection divergence (SURVEY §4 plan)."""

import numpy as np
import jax
import jax.numpy as jnp

from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_3d
from python_fluid_simulation_tpu.solvers.pressure import (
    apply_pressure_3d,
    pressure_diag_3d,
    pressure_matvec_3d,
    pressure_rhs_3d,
    pressure_solve_3d,
)

N = (8, 10, 8)
H = (0.1, 0.1, 0.1)


def _open_tank():
    """Solid floor/walls (fluid rests ON solid faces), free surface on top.

    Solid occupies everything within 2 cells (4.5 dual units) of the
    bottom/side shell, so the faces of the first fluid cell layer (dual
    index 4) are fully solid: w = 0 there, as in the reference's flipped
    container scene (cell 10 :682)."""
    dual = tuple(2 * k + 1 for k in N)
    ix, iy, iz = np.meshgrid(*[np.arange(s) for s in dual], indexing="ij")
    d_wall = np.minimum.reduce(
        [ix, iz, dual[0] - 1 - ix, dual[2] - 1 - iz, iy]
    ).astype(np.float64)
    sphi = (d_wall - 4.5) * H[0] / 2
    sv = np.zeros(dual + (3,), np.float32)
    # fluid block resting on the floor and side walls, free surface above
    # (cells at index 2 have their outer faces at dual index 4 -> w = 0)
    lphi = np.ones(N, np.float32)
    lphi[2:-2, 2:6, 2:-2] = -1.0
    return (
        jnp.asarray(sphi, jnp.float32),
        jnp.asarray(sv),
        jnp.asarray(lphi),
    )


def _faces(v=0.0):
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N))
        for a in range(3)
    ]
    return [jnp.full(s, v, jnp.float32) for s in shapes]


def test_operator_symmetry_and_psd():
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    rng = np.random.default_rng(0)
    key_vals = [rng.standard_normal(N).astype(np.float32) for _ in range(2)]
    x = jnp.asarray(key_vals[0])
    y = jnp.asarray(key_vals[1])
    ax = pressure_matvec_3d(x, w, lphi)
    ay = pressure_matvec_3d(y, w, lphi)
    # symmetry on the active subspace: mask both vectors first
    mask = (lphi < 0).astype(jnp.float32)
    xm, ym = x * mask, y * mask
    axm = pressure_matvec_3d(xm, w, lphi)
    aym = pressure_matvec_3d(ym, w, lphi)
    lhs = float(jnp.vdot(axm, ym))
    rhs = float(jnp.vdot(xm, aym))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)
    # positive semi-definite on the active subspace
    assert float(jnp.vdot(xm, axm)) >= -1e-3


def test_diag_matches_matvec_of_basis_vector():
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    diag = pressure_diag_3d(w, lphi)
    # pick an active cell
    lphi_np = np.asarray(lphi)
    cells = np.argwhere(lphi_np < 0)
    c = tuple(cells[len(cells) // 2])
    e = jnp.zeros(N, jnp.float32).at[c].set(1.0)
    ae = pressure_matvec_3d(e, w, lphi)
    np.testing.assert_allclose(float(ae[c]), float(diag[c]), rtol=1e-5)


def _divergence(v_faces, w, lphi):
    """Weighted divergence as the RHS builder computes it (sv = 0)."""
    sv = jnp.zeros(tuple(2 * k + 1 for k in N) + (3,), jnp.float32)
    return pressure_rhs_3d(v_faces, sv, lphi, w, H)


def test_projection_kills_divergence():
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    rng = np.random.default_rng(1)
    v = [
        jnp.asarray(rng.standard_normal(f.shape).astype(np.float32))
        for f in _faces()
    ]
    div0 = _divergence(v, w, lphi)
    res = pressure_solve_3d(
        tuple(v), sv, lphi, w, H, tol=1e-6, rel_tol=1e-6, max_iter=4000
    )
    div1 = _divergence(list(res.v_faces), w, lphi)
    r0 = float(jnp.linalg.norm(div0.ravel()))
    r1 = float(jnp.linalg.norm(div1.ravel()))
    assert r1 < 5e-3 * r0, (r0, r1)
    assert int(res.stats.iters) > 0


def test_hydrostatic_column_pressure_gradient():
    """A still column under gravity: after projection the velocity field
    returns to ~0 (the discrete ∇p balances ρg)."""
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    g_dt = -10.0 * 0.01
    v = _faces()
    v[1] = v[1] + g_dt  # gravity kick on vy
    res = pressure_solve_3d(tuple(v), sv, lphi, w, H, tol=1e-7, max_iter=4000)
    vy = np.asarray(res.v_faces[1])
    # interior fluid faces should be nearly motionless after projection
    lphi_np = np.asarray(lphi)
    fluid_y = (lphi_np[:, :-1, :] < 0) & (lphi_np[:, 1:, :] < 0)
    inner = np.zeros_like(vy, bool)
    inner[:, 1:-1, :][fluid_y] = True
    assert np.abs(vy[inner]).max() < 5e-3 * abs(g_dt) * 100


def test_solve_is_jittable_and_dt_scaled_equivalent():
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    rng = np.random.default_rng(2)
    v = tuple(
        jnp.asarray(rng.standard_normal(f.shape).astype(np.float32))
        for f in _faces()
    )

    @jax.jit
    def run(vs, scaled):
        return pressure_solve_3d(
            vs, sv, lphi, w, H, tol=1e-6, max_iter=2000,
            dt_scale=None,
        ).v_faces

    plain = run(v, False)
    scaled = pressure_solve_3d(
        v, sv, lphi, w, H, tol=1e-6, max_iter=2000, dt_scale=1.0 / 300
    ).v_faces
    for a, b in zip(plain, scaled):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_mg_opts_variants_match_jacobi_solution():
    """precond_kind='mg' with cycle-shape overrides (SolverConfig.mg_opts)
    is still a fixed SPD preconditioner: every variant must converge to
    the same solution as the Jacobi-PCG baseline."""
    sphi, sv, lphi = _open_tank()
    w = compute_solid_frac_3d(sphi)
    rng = np.random.default_rng(7)
    v = tuple(
        jnp.asarray(rng.standard_normal(f.shape).astype(np.float32))
        for f in _faces()
    )
    base = pressure_solve_3d(
        v, sv, lphi, w, H, tol=1e-8, rel_tol=1e-10, max_iter=4000,
        use_pallas="off",
    )
    for opts in [None, (1, 4, 24), (1, 16, 8), (2, 16, 24)]:
        res = pressure_solve_3d(
            v, sv, lphi, w, H, tol=1e-8, rel_tol=1e-10, max_iter=4000,
            use_pallas="off", precond_kind="mg", mg_opts=opts,
        )
        assert int(res.stats.iters) < int(base.stats.iters), opts
        for a, b in zip(base.v_faces, res.v_faces):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4,
                err_msg=f"mg_opts={opts}",
            )
