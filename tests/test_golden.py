"""Golden-run regression: a tiny deterministic dam-break, compared to a
committed snapshot (SURVEY §4: golden regression on a ~16^3 scene).

The snapshot freezes the end-to-end behaviour of the full step (advect →
SDF project → levelset/volume → density → P2G → gravity → viscosity →
pressure → extrapolate → BC → G2P).  Regenerate deliberately with:
    python tests/test_golden.py regen
"""

import os

import numpy as np
import jax.numpy as jnp

from python_fluid_simulation_tpu.config import (
    GridConfig3D,
    PhysicsConfig,
    SimConfig,
    SolverConfig,
)
from python_fluid_simulation_tpu.engine.scenes import dam_break_scene
from python_fluid_simulation_tpu.engine.step import simulate

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_dam_break.npz")


def _cfg():
    return SimConfig(
        grid=GridConfig3D(
            bound_min=(0.0, 0.0, 0.0), bound_size=(1.0, 1.0, 1.0),
            dx=1.0 / 12,
        ),
        physics=PhysicsConfig(rho=1000.0, mu=0.5, dt=1.0 / 60.0),
        solver=SolverConfig(max_iter=400, pallas="off"),
        particle_dx=1.0 / 24,
        dt_mode="cfl",
        duration=10.0,
    )


def _run():
    cfg = _cfg()
    state = dam_break_scene(cfg, seed=3)
    final, metrics = simulate(state, cfg, 6)
    return state, final, metrics


def test_golden_regression():
    state0, final, metrics = _run()
    x = np.asarray(final.particles.x)
    v = np.asarray(final.particles.v)
    if not os.path.exists(GOLDEN):  # first run: create and pass
        np.savez_compressed(GOLDEN, x=x, v=v, t=np.asarray(final.t))
        return
    ref = np.load(GOLDEN)
    # fp32 across compiler versions: loose-but-meaningful tolerances
    np.testing.assert_allclose(x, ref["x"], atol=2e-3)
    np.testing.assert_allclose(v, ref["v"], atol=5e-2)
    np.testing.assert_allclose(float(final.t), float(ref["t"]), rtol=1e-5)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        if os.path.exists(GOLDEN):
            os.remove(GOLDEN)
        test_golden_regression()
        print(f"regenerated {GOLDEN}")
