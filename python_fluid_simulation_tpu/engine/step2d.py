"""2D engine step.

The reference ships 2D solvers (PressureCGSolver2D, ViscosityCGSolver2D,
DensityCGSolver2D, SolidFraction2D, sdf2D) but no 2D driver notebook —
this module supplies the missing orchestration, mirroring the 3D loop
(cell 13) structure with the 2D components and their sign conventions
(BASELINE.json config 2: "2D droplet/dam-break").

Design notes (no reference counterpart; documented choices):
  * fluid level set radius r = gdx·0.5·√2·1.02 (the √d generalisation of
    the 3D √3 factor, cell 4 :286);
  * boundary conditions use the dimension-generic near-solid correction
    (ops/boundary.py), the 2D analogue of cell 5.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from python_fluid_simulation_tpu.config import GridConfig2D, PhysicsConfig, SolverConfig
from python_fluid_simulation_tpu.ops import sdf2d
from python_fluid_simulation_tpu.ops.boundary import apply_boundary_condition
from python_fluid_simulation_tpu.ops.extrapolate import extrapolate
from python_fluid_simulation_tpu.ops.fractions import compute_solid_frac_2d
from python_fluid_simulation_tpu.ops.indexing import grid_positions
from python_fluid_simulation_tpu.ops.levelset import (
    compute_fluid_levelset,
    compute_fluid_volume,
)
from python_fluid_simulation_tpu.ops.transfers import g2p_axis, p2g_axis
from python_fluid_simulation_tpu.solvers.density import density_solve_2d
from python_fluid_simulation_tpu.solvers.pressure import pressure_solve_2d
from python_fluid_simulation_tpu.solvers.viscosity import viscosity_solve_2d
from python_fluid_simulation_tpu.state import Particles, SimState, SolidState


class SimConfig2D(NamedTuple):
    grid: GridConfig2D = GridConfig2D()
    physics: PhysicsConfig = PhysicsConfig()
    solver: SolverConfig = SolverConfig()
    particle_dx: float = 1.0 / 128.0
    dt_mode: str = "cfl"
    duration: float = 2.0


_FACE_BIAS = ((0.0, 0.5), (0.5, 0.0))


def make_solid_state_2d(cfg: SimConfig2D, rbs: sdf2d.RigidBodySet2D) -> SolidState:
    g = cfg.grid
    pos = grid_positions(g.dual_res, g.bound_min, g.dual_cell_size, (0.0, 0.0))
    rb = rbs.table()
    phi, vel = sdf2d.evaluate_2d(rb, pos)
    return SolidState(phi=phi, v=vel, rb=rb)


def dam_break_scene_2d(cfg: SimConfig2D | None = None, seed: int = 0):
    cfg = cfg or SimConfig2D()
    g = cfg.grid
    rbs = sdf2d.RigidBodySet2D()
    c = [m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)]
    inner = [s - 4 * g.dx for s in g.bound_size]
    rbs.add("container", "box", inner, flip=True, center=c)
    solid = make_solid_state_2d(cfg, rbs)

    # particle block in the lower-left corner
    rng = np.random.default_rng(seed)
    lo = [m + 2.5 * g.dx for m in g.bound_min]
    size = [0.35 * g.bound_size[0], 0.6 * g.bound_size[1]]
    nx, ny = (int(s / cfg.particle_dx) for s in size)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pos = np.stack(
        [
            lo[0] + (ii.ravel() + 0.5) * cfg.particle_dx,
            lo[1] + (jj.ravel() + 0.5) * cfg.particle_dx,
        ],
        axis=-1,
    ).astype(np.float32)
    sd, _ = sdf2d.evaluate_2d(solid.rb, jnp.asarray(pos))
    pos = pos[np.asarray(sd) >= 0]
    pos = pos + rng.standard_normal(pos.shape).astype(np.float32) * (
        cfg.particle_dx * 0.3
    )
    n = pos.shape[0]
    particles = Particles(
        x=jnp.asarray(pos),
        v=jnp.zeros((n, 2), jnp.float32),
        c=jnp.zeros((n, 2, 2), jnp.float32),
        m=jnp.full((n,), cfg.physics.rho * cfg.particle_dx**2, jnp.float32),
    )
    return cfg, SimState(
        particles=particles, solid=solid,
        t=jnp.float32(0.0), step_idx=jnp.int32(0),
    )


def droplet_scene_2d(cfg: SimConfig2D | None = None, seed: int = 0):
    """2D droplet: a disc of fluid falling into a shallow pool
    (BASELINE config 2's 'droplet' variant)."""
    cfg = cfg or SimConfig2D()
    g = cfg.grid
    rbs = sdf2d.RigidBodySet2D()
    c = [m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)]
    inner = [s - 4 * g.dx for s in g.bound_size]
    rbs.add("container", "box", inner, flip=True, center=c)
    solid = make_solid_state_2d(cfg, rbs)

    rng = np.random.default_rng(seed)
    pdx = cfg.particle_dx
    # shallow pool across the floor
    lo = [m + 2.5 * g.dx for m in g.bound_min]
    pool_w = g.bound_size[0] - 5 * g.dx
    pool_h = 0.15 * g.bound_size[1]
    nx, ny = int(pool_w / pdx), int(pool_h / pdx)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    pool = np.stack(
        [lo[0] + (ii.ravel() + 0.5) * pdx, lo[1] + (jj.ravel() + 0.5) * pdx],
        axis=-1,
    )
    # droplet disc
    cx = g.bound_min[0] + 0.5 * g.bound_size[0]
    cy = g.bound_min[1] + 0.7 * g.bound_size[1]
    r = 0.12 * min(g.bound_size)
    nd = int(2 * r / pdx) + 1
    di, dj = np.meshgrid(np.arange(nd), np.arange(nd), indexing="ij")
    drop = np.stack(
        [cx - r + (di.ravel() + 0.5) * pdx, cy - r + (dj.ravel() + 0.5) * pdx],
        axis=-1,
    )
    drop = drop[np.linalg.norm(drop - [cx, cy], axis=1) <= r]
    pos = np.concatenate([pool, drop]).astype(np.float32)
    sd, _ = sdf2d.evaluate_2d(solid.rb, jnp.asarray(pos))
    pos = pos[np.asarray(sd) >= 0]
    pos = pos + rng.standard_normal(pos.shape).astype(np.float32) * pdx * 0.3
    n = pos.shape[0]
    particles = Particles(
        x=jnp.asarray(pos),
        v=jnp.zeros((n, 2), jnp.float32),
        c=jnp.zeros((n, 2, 2), jnp.float32),
        m=jnp.full((n,), cfg.physics.rho * pdx**2, jnp.float32),
    )
    return cfg, SimState(
        particles=particles, solid=solid,
        t=jnp.float32(0.0), step_idx=jnp.int32(0),
    )


def _levelsets_2d(px, cfg: SimConfig2D):
    g = cfg.grid
    lphi = compute_fluid_levelset(px, g.res, g.bound_min, g.cell_size, g.dx)
    pvol = cfg.particle_dx ** 2
    lvol = compute_fluid_volume(
        px, pvol, g.dual_res, g.bound_min, g.dual_cell_size
    )
    return lphi, lvol


def step_2d(
    state: SimState, cfg: SimConfig2D
) -> Tuple[SimState, Dict[str, jnp.ndarray]]:
    g = cfg.grid
    ph = cfg.physics
    sol = cfg.solver
    p = state.particles
    sphi, sv = state.solid.phi, state.solid.v

    if cfg.dt_mode == "cfl":
        vmax = jnp.max(jnp.sqrt(jnp.sum(p.v**2, axis=-1)))
        dt = jnp.minimum(jnp.float32(ph.dt), g.dx / jnp.maximum(1e-10, vmax))
    else:
        dt = jnp.float32(ph.dt)

    px = p.x + p.v * dt
    px = sdf2d.project_2d(state.solid.rb, px)

    w_faces = compute_solid_frac_2d(sphi)

    lphi, lvol = _levelsets_2d(px, cfg)
    dres = density_solve_2d(
        ph.rho, dt, px, p.m, cfg.particle_dx**2, sphi, lphi, lvol,
        w_faces, g.bound_min, g.cell_size,
        tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
        jacobi_precond=sol.jacobi_precond,
    )
    px = dres.px
    lphi, lvol = _levelsets_2d(px, cfg)

    gm, gv = [], []
    for a in range(2):
        fshape = tuple(n + (1 if i == a else 0) for i, n in enumerate(g.res))
        m_a, v_a = p2g_axis(
            px, p.m, p.v, p.c[:, a, :], a, g.res, fshape,
            _FACE_BIAS[a], g.bound_min, g.cell_size,
        )
        gm.append(m_a)
        gv.append(v_a)

    gv[1] = gv[1] + ph.gravity * dt

    visc_iters = jnp.int32(0)
    if ph.mu > 0:
        vres = viscosity_solve_2d(
            dt, ph.mu, ph.rho, tuple(gv), sphi, lvol, g.cell_vol,
            tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
            jacobi_precond=sol.jacobi_precond,
        )
        gv = list(vres.v_faces)
        visc_iters = vres.stats.iters

    pres = pressure_solve_2d(
        tuple(gv), sv, lphi, w_faces, g.cell_size,
        tol=sol.tol, rel_tol=sol.rel_tol, max_iter=sol.max_iter,
        jacobi_precond=sol.jacobi_precond,
    )
    gv = list(pres.v_faces)

    for a in range(2):
        gv[a], _ = extrapolate(gv[a], gm[a] > 0, 2)

    gv = list(apply_boundary_condition(gv, gm, sphi, sv, g.dx))

    pv_cols, pc_rows = [], []
    for a in range(2):
        pv_a, pc_a = g2p_axis(
            px, gv[a], a, g.res, _FACE_BIAS[a], g.bound_min, g.cell_size
        )
        pv_cols.append(pv_a)
        pc_rows.append(pc_a)
    pv = jnp.stack(pv_cols, axis=-1)
    pc = jnp.stack(pc_rows, axis=1)

    new_state = SimState(
        particles=Particles(x=px, v=pv, c=pc, m=p.m),
        solid=state.solid,
        t=state.t + dt,
        step_idx=state.step_idx + 1,
    )
    metrics = {
        "dt": dt,
        "density_iters": dres.stats.iters,
        "viscosity_iters": visc_iters,
        "pressure_iters": pres.stats.iters,
    }
    return new_state, metrics


def make_step_2d(cfg: SimConfig2D):
    @jax.jit
    def _step(state):
        return step_2d(state, cfg)

    return _step


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def _simulate_2d_jit(state, cfg, num_steps):
    def body(s, _):
        return step_2d(s, cfg)

    return jax.lax.scan(body, state, None, length=num_steps)


def simulate_2d(state, cfg, num_steps: int):
    return _simulate_2d_jit(state, cfg, num_steps)
