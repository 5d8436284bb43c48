"""Surface-evolution cross-check vs the independent NumPy CPU reference.

benchmarks/cpu_reference.py is the vectorized-NumPy embodiment of the
reference algorithm used for the BASELINE north-star timing; here it
doubles as a second cross-implementation oracle (tests/oracle3d.py is
the first, but its per-cell Python loops cap it at ~3 steps of 8^3).
This runs a 20-step buckling simulation — column fall, funnel impact —
and demands the particle clouds stay coincident, backing the north
star's "identical surface evolution" clause (round-2 VERDICT item 3).
"""

import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks"),
)


def test_cpu_reference_20_step_surface_evolution():
    from cpu_reference import state_from_engine, step as np_step

    from python_fluid_simulation_tpu.engine import scenes
    from python_fluid_simulation_tpu.engine.step import simulate
    from python_fluid_simulation_tpu.ops.levelset import (
        compute_fluid_levelset,
    )

    cfg = scenes.buckling_config(dx=0.05, mu=1.0, viscosity_mode="apic")
    st = scenes.buckling_scene(cfg)
    n_steps = 20

    fin, _ = simulate(st, cfg, n_steps)
    ex = np.asarray(fin.particles.x)

    state = state_from_engine(cfg, st)
    for _ in range(n_steps):
        state, _ = np_step(state, cfg)
    nx = state["x"]

    # particle clouds coincident: max deviation well under a cell
    err = np.linalg.norm(ex - nx, axis=-1)
    assert err.max() < 0.02 * cfg.grid.dx, (err.mean(), err.max())

    # level-set surface agreement: identical sign pattern (the surface
    # is the phi=0 isosurface of the union-of-balls level set)
    g = cfg.grid
    phi_e = np.asarray(
        compute_fluid_levelset(
            fin.particles.x, g.res, g.bound_min, g.cell_size, g.dx,
            pm=fin.particles.m,
        )
    )
    from cpu_reference import fluid_levelset

    phi_n = fluid_levelset(
        nx, tuple(g.res), np.asarray(g.bound_min),
        np.asarray(g.cell_size), g.dx, state["m"],
    )
    agree = np.mean((phi_e < 0) == (phi_n < 0))
    assert agree == 1.0, agree
