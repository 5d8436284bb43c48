"""2D stack: SDF, fractions already covered; here solver + end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from python_fluid_simulation_tpu.ops import sdf2d
from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_2d
from python_fluid_simulation_tpu.solvers.pressure import (
    pressure_matvec_2d,
    pressure_solve_2d,
)
from python_fluid_simulation_tpu.solvers.viscosity import (
    viscosity_matvec_2d,
    viscosity_solve_2d,
)
from python_fluid_simulation_tpu.engine.step2d import (
    SimConfig2D,
    dam_break_scene_2d,
    make_step_2d,
    simulate_2d,
)
from python_fluid_simulation_tpu.config import (
    GridConfig2D,
    PhysicsConfig,
    SolverConfig,
)

N2 = (12, 12)


def test_sdf2d_circle_box():
    rbs = sdf2d.RigidBodySet2D()
    rbs.add("c", "sphere", [1.0], center=[2.0, 0.0])
    rbs.add("b", "box", [2.0, 2.0], flip=True)
    pts = jnp.array([[2.0, 0.5], [0.0, 0.0], [3.5, 0.0]], jnp.float32)
    sd, vel = sdf2d.evaluate_2d(rbs.table(), pts)
    # min over (circle, flipped box): the flipped 2x2 box is solid
    # everywhere outside itself, so exterior points go negative
    np.testing.assert_allclose(sd, [-1.0, 1.0, -2.5], atol=1e-6)


def test_sdf2d_project():
    rbs = sdf2d.RigidBodySet2D()
    rbs.add("b", "box", [2.0, 2.0], flip=True)
    pts = jnp.array([[1.5, 0.2], [0.1, 0.2]], jnp.float32)
    out = sdf2d.project_2d(rbs.table(), pts)
    np.testing.assert_allclose(out[0], [1.0, 0.2], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.1, 0.2], atol=1e-6)


def test_pressure_2d_symmetry():
    rng = np.random.default_rng(0)
    dual = tuple(2 * k + 1 for k in N2)
    sphi = jnp.asarray(rng.standard_normal(dual).astype(np.float32))
    lphi_np = rng.standard_normal(N2).astype(np.float32)
    lphi_np[0, :] = lphi_np[-1, :] = 1.0
    lphi_np[:, 0] = lphi_np[:, -1] = 1.0
    lphi = jnp.asarray(lphi_np)
    w = compute_solid_frac_2d(sphi)
    mask = (lphi_np < 0).astype(np.float32)
    x = jnp.asarray(rng.standard_normal(N2).astype(np.float32) * mask)
    y = jnp.asarray(rng.standard_normal(N2).astype(np.float32) * mask)
    lhs = float(jnp.vdot(pressure_matvec_2d(x, w, lphi), y))
    rhs = float(jnp.vdot(x, pressure_matvec_2d(y, w, lphi)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-5)


def test_viscosity_2d_uniform_fixed_point():
    dual = tuple(2 * k + 1 for k in N2)
    sphi = jnp.ones(dual, jnp.float32)  # 2D: fluid where sphi > 0
    vol = jnp.ones(dual, jnp.float32)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N2))
        for a in range(2)
    ]
    v = tuple(jnp.full(s, -0.7, jnp.float32) for s in shapes)
    res = viscosity_solve_2d(
        0.01, 3.0, 1.0, v, sphi, vol, 1.0, tol=1e-6, max_iter=500
    )
    for a in range(2):
        np.testing.assert_allclose(np.asarray(res.v_faces[a]), -0.7, rtol=1e-4)


def test_viscosity_2d_sign_convention():
    """2D treats sphi == 0 as SOLID (<=0); 3D as fluid (>=0)."""
    dual = tuple(2 * k + 1 for k in N2)
    sphi = jnp.zeros(dual, jnp.float32)
    vol = jnp.ones(dual, jnp.float32)
    shapes = [
        tuple(n + (1 if i == a else 0) for i, n in enumerate(N2))
        for a in range(2)
    ]
    v = tuple(jnp.ones(s, jnp.float32) for s in shapes)
    out = viscosity_matvec_2d(v, 0.1, sphi, vol, strict_fluid=True)
    for a in range(2):
        np.testing.assert_allclose(np.asarray(out[a]), 0.0)


@pytest.fixture(scope="module")
def scene2d():
    cfg = SimConfig2D(
        grid=GridConfig2D(
            bound_min=(0.0, 0.0), bound_size=(1.0, 1.0), dx=1.0 / 24
        ),
        physics=PhysicsConfig(mu=0.5, dt=1.0 / 120.0),
        solver=SolverConfig(max_iter=600),
        particle_dx=1.0 / 48,
    )
    return dam_break_scene_2d(cfg)


def test_2d_dam_break_steps(scene2d):
    cfg, state = scene2d
    final, metrics = simulate_2d(state, cfg, 8)
    x = np.asarray(final.particles.x)
    assert np.all(np.isfinite(x))
    assert x[:, 0].min() > -cfg.grid.dx
    assert x[:, 1].min() > -cfg.grid.dx
    # the block slumps: horizontal spread grows
    spread0 = float(np.std(np.asarray(state.particles.x)[:, 0]))
    spread1 = float(np.std(x[:, 0]))
    assert spread1 > spread0 * 0.99
    assert int(np.asarray(metrics["pressure_iters"]).sum()) > 0


def test_droplet_scene_runs():
    from python_fluid_simulation_tpu.engine.step2d import (
        droplet_scene_2d,
        simulate_2d,
    )

    cfg = SimConfig2D(
        grid=GridConfig2D(bound_min=(0.0, 0.0), bound_size=(1.0, 1.0),
                          dx=1.0 / 20),
        physics=PhysicsConfig(mu=0.2, dt=1.0 / 120.0),
        solver=SolverConfig(max_iter=400),
        particle_dx=1.0 / 40,
    )
    cfg, state = droplet_scene_2d(cfg)
    final, _ = simulate_2d(state, cfg, 5)
    x = np.asarray(final.particles.x)
    assert np.all(np.isfinite(x))
    # the droplet falls
    assert float(final.particles.v[:, 1].mean()) < 0.0
