"""Golden cross-check: the full engine step vs. an independent NumPy
(f64, loop-based) transliteration of the reference step (tests/oracle3d.py)
on a tiny dam-break scene, rolled several steps (SURVEY §4 / VERDICT
round-1 item 7; reference step: notebook cell 13 :4552-4693).

The build runs at tight solver tolerances so both implementations approach
the exact solutions of the same linear systems; remaining differences are
fp32-vs-f64 rounding through the field ops.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from python_fluid_simulation_tpu.config import (
    GridConfig3D,
    PhysicsConfig,
    SimConfig,
    SolverConfig,
)
from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
from python_fluid_simulation_tpu.engine.step import step_3d
from python_fluid_simulation_tpu.state import Particles, SimState

import oracle3d


def _cfg(mu):
    return SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 8,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=mu, dt=1.0 / 60.0),
        solver=SolverConfig(
            tol=1e-6, rel_tol=1e-6, max_iter=4000, pallas="off"
        ),
        particle_dx=1.0 / 16,
        dt_mode="fixed",
    )


def _scene_dicts(cfg, state):
    g = cfg.grid
    return (
        dict(
            res=g.res,
            bmin=g.bound_min,
            h=g.cell_size,
            dual_h=g.dual_cell_size,
            gdx=g.dx,
            pvol=cfg.particle_dx**3,
            box_center=[m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)],
            box_size=[s - 4 * g.dx for s in g.bound_size],
        ),
        dict(
            rho=cfg.physics.rho,
            mu=cfg.physics.mu,
            dt=cfg.physics.dt,
            gravity=cfg.physics.gravity,
            cell_vol=g.cell_vol,
        ),
    )


def _bodies_from_table(rb) -> list:
    """Decode the packed (B,10,4) table into oracle3d.project_bodies dicts."""
    rb = np.asarray(rb, np.float64)
    kinds = {0: "sphere", 1: "box", 2: "cylinder"}
    out = []
    for i in range(rb.shape[0]):
        code = int(rb[i, 0, 0])
        out.append(
            dict(
                kind=kinds[code // 2],
                flip=bool(code % 2),
                params=[float(x) for x in rb[i, 0, 1:4]],
                center=rb[i, 1:5, :][0:3, 3],
                R=rb[i, 5:9, :][0:3, 0:3],
            )
        )
    return out


def _roll_parity(cfg, state, n_steps, atol_x, atol_v, duration=None):
    """Roll engine + oracle side by side from the same state; assert
    positions/velocities (and the CFL dt when enabled) stay matched."""
    g = cfg.grid
    scene = dict(
        res=g.res,
        bmin=g.bound_min,
        h=g.cell_size,
        dual_h=g.dual_cell_size,
        gdx=g.dx,
        pvol=cfg.particle_dx ** 3,
        bodies=_bodies_from_table(state.solid.rb),
    )
    phys = dict(
        rho=cfg.physics.rho,
        mu=cfg.physics.mu,
        dt=cfg.physics.dt,
        gravity=cfg.physics.gravity,
        cell_vol=g.cell_vol,
    )
    if cfg.dt_mode == "cfl":
        phys["dt_mode"] = "cfl"
        phys["duration"] = duration if duration is not None else cfg.duration

    px = np.asarray(state.particles.x, np.float64)
    pv = np.asarray(state.particles.v, np.float64)
    pc = np.asarray(state.particles.c, np.float64)
    pm = np.asarray(state.particles.m, np.float64)
    sphi = np.asarray(state.solid.phi, np.float64)
    sv = np.asarray(state.solid.v, np.float64)

    s = state
    oracle_t = 0.0
    for step_i in range(n_steps):
        s, metrics = step_3d(s, cfg)
        phys["t"] = oracle_t
        px, pv, pc, dt_used = oracle3d.oracle_step(
            px, pv, pc, pm, sphi, sv, scene, phys, return_dt=True
        )
        oracle_t += dt_used
        if cfg.dt_mode == "cfl":
            np.testing.assert_allclose(
                float(metrics["dt"]), dt_used, rtol=1e-5,
                err_msg=f"CFL dt diverged @step {step_i}",
            )
        np.testing.assert_allclose(
            np.asarray(s.particles.x, np.float64), px, atol=atol_x,
            err_msg=f"positions diverged @step {step_i}",
        )
        np.testing.assert_allclose(
            np.asarray(s.particles.v, np.float64), pv, atol=atol_v,
            err_msg=f"velocities diverged @step {step_i}",
        )


@pytest.mark.slow
@pytest.mark.parametrize("mu", [0.0, 0.2])
def test_reference_step_parity(mu):
    cfg = _cfg(mu)
    state = dam_break_scene(cfg)
    scene, phys = _scene_dicts(cfg, state)

    px = np.asarray(state.particles.x, np.float64)
    pv = np.asarray(state.particles.v, np.float64)
    pc = np.asarray(state.particles.c, np.float64)
    pm = np.asarray(state.particles.m, np.float64)
    sphi = np.asarray(state.solid.phi, np.float64)
    sv = np.asarray(state.solid.v, np.float64)

    s = state
    for step_i in range(3):
        s, _ = step_3d(s, cfg)
        px, pv, pc = oracle3d.oracle_step(
            px, pv, pc, pm, sphi, sv, scene, phys
        )
        got_x = np.asarray(s.particles.x, np.float64)
        got_v = np.asarray(s.particles.v, np.float64)
        # positions move ~|v| dt ~ 3e-3/step; demand agreement to ~0.1% of
        # a cell per step (fp32 round-off + solver tolerance headroom)
        np.testing.assert_allclose(
            got_x, px, atol=2e-4, err_msg=f"positions diverged @step {step_i}"
        )
        np.testing.assert_allclose(
            got_v, pv, atol=5e-3, err_msg=f"velocities diverged @step {step_i}"
        )


@pytest.mark.slow
def test_funnel_scene_parity():
    """The reference's actual geometry class — flipped-box container + 4
    tilted funnel boxes (cell 10 :682-689) — cross-checked at a coarse dx
    with the fluid block straddling the funnel opening, viscous (mu=1.0).
    Exercises rotated-box projection, tilted cut-cell fractions, and the
    coupled viscosity solve against the loop oracle."""
    from python_fluid_simulation_tpu.engine.scenes import (
        buckling_rigid_bodies,
    )
    from python_fluid_simulation_tpu.state import (
        make_particles,
        make_solid_state,
        seed_particle_box,
    )

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(-0.3, 0.0, -0.3),
            bound_size=(0.6, 1.0, 0.6),
            dx=0.05,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=1.0, dt=1.0 / 300.0),
        solver=SolverConfig(
            tol=1e-6, rel_tol=1e-6, max_iter=4000, pallas="off"
        ),
        particle_dx=0.025,
        dt_mode="fixed",
    )
    rbs = buckling_rigid_bodies()
    solid = make_solid_state(cfg, rbs)
    pos = seed_particle_box(
        center=[0.0, 0.72, 0.0], size=[0.2, 0.16, 0.2],
        dx=cfg.particle_dx, rb_table=solid.rb, seed=3,
    )
    state = SimState(
        particles=make_particles(pos, cfg.physics.rho, cfg.particle_dx),
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )
    _roll_parity(cfg, state, n_steps=3, atol_x=2e-4, atol_v=5e-3)


@pytest.mark.slow
def test_cylinder_scene_parity():
    """Cylinder bodies through the full step: a FLIPPED cylinder container
    plus a tilted solid cylinder obstacle, with part of the seed block
    intentionally overlapping the obstacle (rb filter off) so step 1
    exercises the inside-cylinder projection branches (sdf3D.py:174-219)
    in both implementations."""
    from python_fluid_simulation_tpu.ops.sdf import RigidBodySet
    from python_fluid_simulation_tpu.state import (
        make_particles,
        make_solid_state,
        seed_particle_box,
    )

    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 8,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=0.0, dt=1.0 / 60.0),
        solver=SolverConfig(
            tol=1e-6, rel_tol=1e-6, max_iter=4000, pallas="off"
        ),
        particle_dx=1.0 / 16,
        dt_mode="fixed",
    )
    rbs = RigidBodySet()
    rbs.add(
        "container", "cylinder", [0.42, 0.82], flip=True,
        center=[0.5, 0.5, 0.5],
    )
    rbs.add(
        "post", "cylinder", [0.1, 0.4], center=[0.5, 0.35, 0.5],
        axis=[1.0, 0.0, 0.0], angle=30.0,
    )
    solid = make_solid_state(cfg, rbs)
    # no rb filter: a few particles start inside the post / outside the
    # container and must be projected out identically on step 1
    pos = seed_particle_box(
        center=[0.45, 0.55, 0.5], size=[0.4, 0.35, 0.35],
        dx=cfg.particle_dx, rb_table=None, seed=5,
    )
    state = SimState(
        particles=make_particles(pos, cfg.physics.rho, cfg.particle_dx),
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )
    _roll_parity(cfg, state, n_steps=3, atol_x=3e-4, atol_v=6e-3)


@pytest.mark.slow
def test_cfl_dt_parity():
    """dt_mode='cfl' (cell 13 :4572-4576): dt0 chosen so the CFL cap
    binds from step 2 on; both the selected dt and the trajectories must
    track the oracle."""
    cfg = SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 8,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=0.0, dt=0.15),
        solver=SolverConfig(
            tol=1e-6, rel_tol=1e-6, max_iter=4000, pallas="off"
        ),
        particle_dx=1.0 / 16,
        dt_mode="cfl",
        duration=10.0,
    )
    state = dam_break_scene(cfg)
    _roll_parity(
        cfg, state, n_steps=3, atol_x=5e-4, atol_v=8e-3, duration=10.0
    )
