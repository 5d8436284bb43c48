"""Scene presets.

Reference: notebook cell 10 (:650-812) builds exactly one scene — the 3D
viscous-buckling funnel.  Here scenes are functions SimConfig -> SimState
(plus small variants used by BASELINE.json configs 1-5).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from python_fluid_simulation_tpu.config import (
    GridConfig3D,
    PhysicsConfig,
    SimConfig,
    SolverConfig,
)
from python_fluid_simulation_tpu.ops.sdf import RigidBodySet
from python_fluid_simulation_tpu.state import (
    SimState,
    make_particles,
    make_solid_state,
    seed_particle_box,
)


def buckling_rigid_bodies() -> RigidBodySet:
    """Flipped box container + 4 tilted boxes forming a funnel hole.

    Reference: cell 10 :682-689 (obs_height = 0.7).
    """
    rbs = RigidBodySet()
    rbs.add(
        "cube", "box", [0.5, 0.8, 0.5], flip=True, center=[0, 0.5, 0],
        axis=[0, 1, 0], angle=0,
    )
    h = 0.7
    rbs.add(
        "cube1", "box", [0.67, 0.1, 1.0], center=[-0.34, h, 0],
        axis=[0, 0, 1], angle=-45,
    )
    rbs.add(
        "cube2", "box", [0.67, 0.1, 1.0], center=[0.34, h, 0],
        axis=[0, 0, 1], angle=45,
    )
    rbs.add(
        "cube3", "box", [1.0, 0.1, 0.7], center=[0, h, -0.3],
        axis=[1, 0, 0], angle=45,
    )
    rbs.add(
        "cube4", "box", [1.0, 0.1, 0.7], center=[0, h, 0.3],
        axis=[1, 0, 0], angle=-45,
    )
    return rbs


def buckling_config(
    dx: float = 0.0125,
    mu: float = 1.0,
    viscosity_mode: str = "apic",
    dt_mode: str = "cfl",
) -> SimConfig:
    """The reference scene: domain 0.6x1.0x0.6, GRES 48x80x48 at default dx."""
    return SimConfig(
        grid=GridConfig3D(
            bound_min=(-0.3, 0.0, -0.3), bound_size=(0.6, 1.0, 0.6), dx=dx
        ),
        physics=PhysicsConfig(rho=1000.0, mu=mu, dt=1.0 / 300.0),
        solver=SolverConfig(viscosity_mode=viscosity_mode),
        particle_dx=dx / 2.0,
        dt_mode=dt_mode,
        duration=3.0,
    )


def buckling_scene(cfg: SimConfig | None = None, seed: int = 0) -> SimState:
    """Reference scene state: fluid = jittered 0.3^3 box at (0, 0.65, 0)."""
    cfg = cfg or buckling_config()
    rbs = buckling_rigid_bodies()
    solid = make_solid_state(cfg, rbs)
    pos = seed_particle_box(
        center=[0.0, 0.65, 0.0],
        size=[0.3, 0.3, 0.3],
        dx=cfg.particle_dx,
        rb_table=solid.rb,
        seed=seed,
    )
    particles = make_particles(pos, cfg.physics.rho, cfg.particle_dx)
    return SimState(
        particles=particles,
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )


def dam_break_scene(cfg: SimConfig | None = None, seed: int = 0) -> SimState:
    """A simple 3D dam-break in a flipped-box container (BASELINE config 2
    analogue in 3D)."""
    cfg = cfg or SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0), bound_size=(1.0, 1.0, 1.0), dx=1 / 48
        ),
        physics=PhysicsConfig(mu=0.0),
        particle_dx=1 / 96,
        duration=2.0,
    )
    rbs = RigidBodySet()
    g = cfg.grid
    c = [m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)]
    inner = [s - 4 * g.dx for s in g.bound_size]
    rbs.add("container", "box", inner, flip=True, center=c)
    solid = make_solid_state(cfg, rbs)
    lo = [m + 2.5 * g.dx for m in g.bound_min]
    size = [0.35 * s for s in g.bound_size]
    pos = seed_particle_box(
        center=[lo[i] + 0.5 * size[i] for i in range(3)],
        size=size,
        dx=cfg.particle_dx,
        rb_table=solid.rb,
        seed=seed,
    )
    particles = make_particles(pos, cfg.physics.rho, cfg.particle_dx)
    return SimState(
        particles=particles,
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )


def scaled_buckling_config(res: int = 128, **kw) -> SimConfig:
    """BASELINE configs 3/5: the buckling scene scaled to res^3-class grids
    (dx chosen so the tallest axis has `res` cells).

    Preconditioner default at 96^3+ is MULTIGRID (round-3): with the
    V-cycle transfers and the Galerkin coarsening routed through the MXU
    (multigrid._restrict/_prolong/_coarsen) and the tail levels fused
    into single Pallas smoothing chains (ops/pallas_mg.py), MG-PCG costs
    ~0.12 ms/iteration at 128^3 — cheaper than a Jacobi-PCG iteration —
    and converges in ~10 vs ~81 pressure iterations: 278.9 vs 281.0
    ms/step end-to-end (10-step buckling_128 A/B, benchmarks/mg_bench.py).
    The round-2 balance (MG losing 2.5x) was entirely the lane-splitting
    reshape relayouts in restrict/prolong/coarsen, ~170x off bandwidth.
    Below 96^3 the solves are latency-dominated either way; Jacobi keeps
    the program smaller."""
    base = buckling_config(dx=1.0 / res, **kw)
    solver = base.solver
    if res >= 96:
        solver = dataclasses.replace(
            solver, max_iter=600, precond=_poisson_precond(base.grid.res)
        )
    return dataclasses.replace(
        base, particle_dx=0.5 / res, solver=solver
    )


def _poisson_precond(grid_res) -> str:
    """Default cell-Poisson preconditioner for a 96^3-class-or-larger
    grid.  MG wins at 128^3-class (see scaled_buckling_config), but its
    hierarchy (diag + 6 Galerkin coefficient fields per level, two
    hierarchies live per step: density then pressure) pushes an 8M-cell
    grid over the 16 GB chip: coiling_504 with precond='mg' fails XLA
    allocation at 16.54/15.75 GB, and Jacobi only needed 19 pressure
    iterations there anyway (big grids start pressure-easy).  Gate MG to
    <= 4M cells (2x headroom over the measured 1.05M-cell win, 2x under
    the measured 8M-cell OOM)."""
    cells = 1
    for n in grid_res:
        cells *= int(n)
    return "mg" if cells <= 4_000_000 else "jacobi"


def coiling_config(res: int = 256, mu: float = 5.0) -> SimConfig:
    """BASELINE config 5: high-viscosity coiling — a tall thin column of
    very viscous fluid falling onto the container floor (rope coiling).
    Domain 0.3 x 1.2 x 0.3 so `res` is the vertical cell count; large
    grids raise the CG iteration cap and are meant to shard over a
    mesh (parallel/)."""
    base = SimConfig(
        grid=GridConfig3D(
            bound_min=(-0.15, 0.0, -0.15),
            bound_size=(0.3, 1.2, 0.3),
            dx=1.2 / res,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=mu, dt=1.0 / 300.0),
        solver=SolverConfig(),
        particle_dx=0.6 / res,
        dt_mode="cfl",
        duration=3.0,
    )
    solver = base.solver
    if res >= 96:
        # viscosity_precond='auto': early-stage coiling converges in
        # ~20-110 Jacobi-PCG iterations (~2x faster per step than the MG
        # block preconditioner — 209 vs 411 ms/step at 64x256x64,
        # measured), but ONCE THE FLUID POOLS Jacobi needs 410+ iters
        # (hitting the 600 cap = silently unconverged steps) while MG
        # stays at ~28 for the same wall-clock.  The auto mode probes the
        # contraction rate each step and flips the preconditioner with a
        # lax.cond, so the default run converges end-to-end with no
        # manual knob (round-2 VERDICT item 5).
        # precond for the cell-Poisson solves: MG up to 4M cells (same
        # MXU-transfer V-cycle balance as scaled_buckling_config),
        # Jacobi above (the MG hierarchy OOMs a 16 GB chip at 8M cells
        # and wins nothing there — see _poisson_precond).
        solver = dataclasses.replace(
            solver, max_iter=600, viscosity_precond="auto",
            precond=_poisson_precond(base.grid.res),
        )
    return dataclasses.replace(base, solver=solver)


def coiling_scene(cfg: SimConfig | None = None, seed: int = 0) -> SimState:
    """Container + a thin tall fluid column centred in the domain."""
    cfg = cfg or coiling_config()
    g = cfg.grid
    rbs = RigidBodySet()
    c = [m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)]
    inner = [s - 4 * g.dx for s in g.bound_size]
    rbs.add("container", "box", inner, flip=True, center=c)
    solid = make_solid_state(cfg, rbs)
    column_w = 0.12 * g.bound_size[0] + 4 * cfg.particle_dx
    pos = seed_particle_box(
        center=[0.0, g.bound_min[1] + 0.75 * g.bound_size[1], 0.0],
        size=[column_w, 0.4 * g.bound_size[1], column_w],
        dx=cfg.particle_dx,
        rb_table=solid.rb,
        seed=seed,
    )
    particles = make_particles(pos, cfg.physics.rho, cfg.particle_dx)
    return SimState(
        particles=particles,
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )


def moving_box_config(dx: float = 1.0 / 16, mu: float = 0.2) -> SimConfig:
    """A descending box obstacle over a pool: the moving-solid engine
    path (SimConfig.moving_solid) — the reference's transform_rb/
    set_vel_rb API (sdf3D.py:329-336) driven inside the jitted step."""
    return SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0),
            bound_size=(1.0, 1.0, 1.0),
            dx=dx,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=mu, dt=1.0 / 120.0),
        solver=SolverConfig(max_iter=300),
        particle_dx=dx / 2,
        dt_mode="cfl",
        duration=1.0,
        moving_solid=True,
    )


def moving_box_scene(cfg: SimConfig | None = None, seed: int = 0) -> SimState:
    """Container + bottom pool + a box sinking toward the surface at
    0.5 m/s (velocity row drives both the per-step translation and the
    Dirichlet solid velocity in the solves)."""
    cfg = cfg or moving_box_config()
    g = cfg.grid
    rbs = RigidBodySet()
    c = [m + 0.5 * s for m, s in zip(g.bound_min, g.bound_size)]
    inner = [s - 4 * g.dx for s in g.bound_size]
    rbs.add("container", "box", inner, flip=True, center=c)
    rbs.add(
        "sinker", "box", [0.3, 0.2, 0.3],
        center=[c[0], g.bound_min[1] + 0.72 * g.bound_size[1], c[2]],
        velocity=[0.0, -0.5, 0.0],
    )
    solid = make_solid_state(cfg, rbs)
    pos = seed_particle_box(
        center=[c[0], g.bound_min[1] + 0.25 * g.bound_size[1], c[2]],
        size=[
            g.bound_size[0] - 5 * g.dx,
            0.35 * g.bound_size[1],
            g.bound_size[2] - 5 * g.dx,
        ],
        dx=cfg.particle_dx,
        rb_table=solid.rb,
        seed=seed,
    )
    return SimState(
        particles=make_particles(pos, cfg.physics.rho, cfg.particle_dx),
        solid=solid,
        t=jnp.float32(0.0),
        step_idx=jnp.int32(0),
    )
