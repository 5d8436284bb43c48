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
